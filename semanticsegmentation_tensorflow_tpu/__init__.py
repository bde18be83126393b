"""TPU-native semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
TensorFlow project (SeunghwanByun/SemanticSegmentation_Tensorflow): KITTI-road
training and inference for FCN-8s (VGG16 backbone), U-Net, SegNet
(max-pool-index unpooling), and a DeepLab-v3-style ASPP head.

Design (TPU-first, not a port):
  * NHWC layout, bf16 compute / f32 params & accumulation (MXU-friendly).
  * Whole train step is one jitted XLA program; batches are HBM-resident and
    donated; device-side fused augmentation (no per-step host feed_dict).
  * Data parallelism over an ICI `Mesh` via shard_map + psum gradient
    allreduce (reference is single-device; multi-chip is a framework goal,
    see BASELINE.json config 5).
  * Pallas kernels for the non-matmul hot paths (argmax+colormap overlay,
    fused normalize/augment preprocess).
"""

__version__ = "0.1.0"

from semanticsegmentation_tensorflow_tpu import config  # noqa: F401

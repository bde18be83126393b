"""Model zoo: the reference's four architectures, rebuilt TPU-first.

All models are flax.linen Modules with a shared contract:
  * input  [N, H, W, 3] float (H, W divisible by ``total_stride``)
  * output [N, H, W, num_classes] logits in float32
  * compute dtype bf16 (MXU), params + logits f32.
"""

from semanticsegmentation_tensorflow_tpu.models.fcn8s import FCN8s  # noqa: F401
from semanticsegmentation_tensorflow_tpu.models.unet import UNet  # noqa: F401
from semanticsegmentation_tensorflow_tpu.models.segnet import SegNet  # noqa: F401
from semanticsegmentation_tensorflow_tpu.models.deeplab import DeepLabASPP  # noqa: F401
from semanticsegmentation_tensorflow_tpu.models.registry import (  # noqa: F401
    build_model,
    MODELS,
)

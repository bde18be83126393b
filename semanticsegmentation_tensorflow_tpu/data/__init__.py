"""Data layer: dataset discovery, label codecs, augmentation, batching.

Host side does only what must be host-side (PNG decode); everything
per-pixel (normalize, flip, crop, one-hot) runs on device inside the jitted
train step — the TPU-native replacement for the reference's per-batch
feed_dict generator (SURVEY.md §3.5).
"""

from semanticsegmentation_tensorflow_tpu.data.palette import (  # noqa: F401
    KITTI_ROAD_PALETTE,
    encode_labels,
    decode_labels,
)
from semanticsegmentation_tensorflow_tpu.data.kitti import (  # noqa: F401
    KittiRoadDataset,
)
from semanticsegmentation_tensorflow_tpu.data.synthetic import (  # noqa: F401
    generate_synthetic_kitti,
    synthetic_batch,
)
from semanticsegmentation_tensorflow_tpu.data.augment import (  # noqa: F401
    make_augment_fn,
    normalize_images,
)
from semanticsegmentation_tensorflow_tpu.data.pipeline import (  # noqa: F401
    BatchLoader,
)
from semanticsegmentation_tensorflow_tpu.data.cityscapes import (  # noqa: F401
    CityscapesDataset,
    generate_synthetic_cityscapes,
)


def build_dataset(dataset: str, data_dir: str, image_size: tuple[int, int],
                  split: str = "train"):
    """Dataset factory keyed by DataConfig.dataset.

    ``split`` selects the labeled split to iterate (``train_images``).
    Cityscapes has a labeled ``val`` split; KITTI road's testing split has
    no public GT, so only ``train`` is valid there.
    """
    if dataset in ("kitti_road", "synthetic"):
        if split != "train":
            raise ValueError(
                f"KITTI road has no labeled {split!r} split (testing GT is "
                "withheld by the benchmark); only 'train' is available")
        return KittiRoadDataset(data_dir, image_size=image_size)
    if dataset == "cityscapes":
        return CityscapesDataset(data_dir, split=split, image_size=image_size)
    raise ValueError(f"unknown dataset {dataset!r}")

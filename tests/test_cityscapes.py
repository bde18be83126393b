import numpy as np

from semanticsegmentation_tensorflow_tpu.data.cityscapes import (
    NUM_TRAIN_CLASSES, CityscapesDataset, encode_cityscapes_gt,
    generate_synthetic_cityscapes,
)
from semanticsegmentation_tensorflow_tpu.data.pipeline import BatchLoader


def test_labelid_mapping():
    ids = np.array([[7, 8, 0], [26, 33, 5]], np.uint8)
    tid, valid = encode_cityscapes_gt(ids)
    np.testing.assert_array_equal(tid, [[0, 1, 0], [13, 18, 0]])
    np.testing.assert_array_equal(valid, [[True, True, False],
                                          [True, True, False]])
    assert tid.max() < NUM_TRAIN_CLASSES


def test_synthetic_cityscapes_roundtrip(tmp_path):
    d = generate_synthetic_cityscapes(str(tmp_path / "cs"), n_train=3,
                                      n_val=1, h=64, w=128)
    ds = CityscapesDataset(d, image_size=(64, 128))
    assert len(ds.train_images) == 3
    assert len(ds.test_images) == 1
    img, ids, valid = ds.load_example(ds.train_images[0])
    assert img.shape == (64, 128, 3)
    assert ids.dtype == np.int32 and ids.max() < NUM_TRAIN_CLASSES
    assert valid.dtype == bool


def test_batch_loader_works_with_cityscapes(tmp_path):
    d = generate_synthetic_cityscapes(str(tmp_path / "cs"), n_train=4,
                                      n_val=0, h=60, w=120)
    ds = CityscapesDataset(d, image_size=(60, 120))
    loader = BatchLoader(ds, batch_size=2, pad_multiple=16)
    b = next(iter(loader.epoch()))
    assert b["image"].shape == (2, 64, 128, 3)
    assert not np.asarray(b["valid"])[:, 60:, :].any()

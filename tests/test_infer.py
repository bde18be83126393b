import os

import numpy as np

from semanticsegmentation_tensorflow_tpu.data import generate_synthetic_kitti
from semanticsegmentation_tensorflow_tpu.data.kitti import KittiRoadDataset
from semanticsegmentation_tensorflow_tpu.infer import (
    Predictor, save_inference_samples,
)
from semanticsegmentation_tensorflow_tpu.models import UNet

import jax


def _predictor(image_size=(94, 150)):
    model = UNet(num_classes=2, base_features=8)
    h = -(-image_size[0] // 16) * 16
    w = -(-image_size[1] // 16) * 16
    vs = model.init(jax.random.key(0),
                    np.zeros((1, h, w, 3), np.float32), train=False)
    return Predictor(model, vs, image_size)


def test_predict_single_image_shapes():
    p = _predictor()
    img = np.random.default_rng(0).integers(0, 255, (94, 150, 3)).astype(np.uint8)
    overlay, labels = p(img)
    assert overlay.shape == (94, 150, 3) and overlay.dtype == np.uint8
    assert labels.shape == (94, 150) and set(np.unique(labels)) <= {0, 1}


def test_predict_batch():
    p = _predictor()
    imgs = np.zeros((3, 94, 150, 3), np.uint8)
    overlay, labels = p(imgs)
    assert overlay.shape == (3, 94, 150, 3)
    assert labels.shape == (3, 94, 150)


def test_save_inference_samples_writes_runs_dir(tmp_path):
    d = generate_synthetic_kitti(str(tmp_path / "dr"), n_train=1, n_test=3,
                                 h=94, w=150)
    ds = KittiRoadDataset(d, image_size=(94, 150))
    p = _predictor()
    outs = list(save_inference_samples(p, ds.test_images,
                                       runs_dir=str(tmp_path / "runs")))
    assert len(outs) == 3
    for src, dst in outs:
        assert os.path.exists(dst)
        assert os.path.basename(dst) == os.path.basename(src)


def test_save_inference_samples_propagates_decode_errors(tmp_path):
    p = _predictor()
    with np.testing.assert_raises(Exception):
        list(save_inference_samples(p, ["/nonexistent/x.png"],
                                    runs_dir=str(tmp_path / "r")))


def test_save_inference_samples_batched(tmp_path):
    """batch>1 with a ragged tail: all files written, same outputs as b=1."""
    d = generate_synthetic_kitti(str(tmp_path / "dr2"), n_train=1, n_test=5,
                                 h=94, w=150)
    ds = KittiRoadDataset(d, image_size=(94, 150))
    p = _predictor()
    out1 = dict(save_inference_samples(p, ds.test_images,
                                       runs_dir=str(tmp_path / "r1"),
                                       batch_size=1))
    out2 = dict(save_inference_samples(p, ds.test_images,
                                       runs_dir=str(tmp_path / "r2"),
                                       batch_size=2))
    assert set(out1) == set(out2) and len(out2) == 5
    from PIL import Image
    for src in out1:
        a = np.asarray(Image.open(out1[src]))
        b = np.asarray(Image.open(out2[src]))
        np.testing.assert_array_equal(a, b)


def test_sweep_overlay_matches_device_path(tmp_path):
    """The sweep (u8 labels down + host composite) reproduces the device
    overlay path: labels bit-equal, blend within +-1 u8 (FMA rounding)."""
    from PIL import Image
    from semanticsegmentation_tensorflow_tpu.ops.overlay import host_overlay

    d = generate_synthetic_kitti(str(tmp_path / "dr3"), n_train=1, n_test=2,
                                 h=94, w=150)
    ds = KittiRoadDataset(d, image_size=(94, 150))
    p = _predictor()
    outs = dict(save_inference_samples(p, ds.test_images,
                                       runs_dir=str(tmp_path / "r3")))
    for src, dst in outs.items():
        img = np.asarray(Image.open(src).convert("RGB"))
        dev_overlay, dev_labels = p(img)
        sweep_labels = np.asarray(p._fwd_labels(img[None]))[0]
        np.testing.assert_array_equal(sweep_labels, dev_labels.astype(np.uint8))
        written = np.asarray(Image.open(dst).convert("RGB"))
        host = host_overlay(img, sweep_labels, p._palette, p._alpha)
        np.testing.assert_array_equal(written, host)
        diff = np.abs(written.astype(np.int16) - dev_overlay.astype(np.int16))
        assert diff.max() <= 1


def test_fastpng_roundtrip():
    """utils/fastpng output is a standard PNG: PIL decodes it bit-exactly."""
    import io
    from PIL import Image
    from semanticsegmentation_tensorflow_tpu.utils.fastpng import encode_png

    rng = np.random.default_rng(0)
    for shape in ((7, 5, 3), (64, 257, 3), (1, 1, 3)):
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        back = np.asarray(Image.open(io.BytesIO(encode_png(arr))).convert("RGB"))
        np.testing.assert_array_equal(back, arr)
    # non-contiguous input (e.g. a slice of a batch)
    batch = rng.integers(0, 256, (2, 16, 9, 4)).astype(np.uint8)
    arr = batch[1, :, :, :3]
    back = np.asarray(Image.open(io.BytesIO(encode_png(arr))).convert("RGB"))
    np.testing.assert_array_equal(back, arr)


def test_mesh_predictor_matches_single_device():
    """Multi-chip batch-parallel inference (Predictor(mesh=...)): outputs
    bit-equal to the single-device Predictor, including a ragged batch
    that the mesh path pads internally (round 4 — serving analog of the
    shard_map train step)."""
    from semanticsegmentation_tensorflow_tpu.models import UNet
    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh

    image_size = (30, 46)
    model = UNet(num_classes=2, base_features=8)
    h = -(-image_size[0] // 16) * 16
    w = -(-image_size[1] // 16) * 16
    vs = model.init(jax.random.key(0),
                    np.zeros((1, h, w, 3), np.float32), train=False)
    single = Predictor(model, vs, image_size)
    mesh = make_mesh()
    sharded = Predictor(model, vs, image_size, mesh=mesh)

    rng = np.random.default_rng(0)
    for n in (8, 5, 1):          # full, ragged, single (pad to mesh size)
        imgs = rng.integers(0, 256, (n, *image_size, 3)).astype(np.uint8)
        ov_a, lb_a = single(imgs)
        ov_b, lb_b = sharded(imgs)
        assert ov_b.shape == (n, *image_size, 3)
        np.testing.assert_array_equal(lb_a, lb_b)
        np.testing.assert_array_equal(ov_a, ov_b)


def test_confidence_maps_match_softmax_oracle():
    """Predictor.confidence == round(P(class1)*255) of the logits path —
    the KITTI devkit submission format (uint8 prob map)."""
    import jax.numpy as jnp

    pred = _predictor()
    img = np.random.default_rng(5).integers(
        0, 255, (2, 94, 150, 3)).astype(np.uint8)
    conf = pred.confidence(img)
    assert conf.shape == (2, 94, 150) and conf.dtype == np.uint8
    logits = np.asarray(pred._logits_fn(pred._variables,
                                        jnp.asarray(img)), np.float32)
    p1 = np.asarray(jax.nn.softmax(logits, axis=-1))[..., 1]
    np.testing.assert_array_equal(conf, np.round(p1 * 255).astype(np.uint8))
    # single-image form squeezes
    c1 = pred.confidence(img[0])
    np.testing.assert_array_equal(c1, conf[0])


def test_mesh_fetch_labels_pads_ragged_batch():
    """The server feeds single images to a mesh Predictor; _fetch_labels
    must pad to the mesh size and trim (regression: unpadded batch-1
    requests failed to shard over a >1-device mesh)."""
    from jax.sharding import Mesh

    from semanticsegmentation_tensorflow_tpu.parallel.mesh import DATA_AXIS

    image_size = (94, 150)
    single = _predictor(image_size)
    mesh = Mesh(np.asarray(jax.devices()[:2]), (DATA_AXIS,))
    model = UNet(num_classes=2, base_features=8)
    vs = model.init(jax.random.key(0),
                    np.zeros((1, 96, 160, 3), np.float32), train=False)
    meshed = Predictor(model, vs, image_size, mesh=mesh)
    img = np.random.default_rng(7).integers(
        0, 255, (1, 94, 150, 3)).astype(np.uint8)
    lb_m = meshed._fetch_labels(img)
    lb_s = single._fetch_labels(img)
    assert lb_m.shape == (1, 94, 150)
    np.testing.assert_array_equal(lb_m, lb_s)

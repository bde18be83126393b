#!/usr/bin/env python
"""Headline benchmark: FCN-8s train-step throughput at KITTI resolution.

Measures fused fwd+bwd+update images/sec/chip for FCN-8s (VGG16, bf16 MXU) at
1242x375 padded to 1248x384 — the reference's headline workload
(BASELINE.json: "KITTI road 1242x375 images/sec/chip"). The reference
publishes no numbers (BASELINE.json `"published": {}`); `vs_baseline` is
therefore reported against the driver-set target of 95% of the bf16 roofline.

The benchmarked model is the REFERENCE-EXACT configuration (the
`fcn8s_kitti_parity` preset): VGG16 with the classic 4096-wide
convolutionalized fc6/fc7 and KEEP_PROB=0.5 dropout — what the TF scripts
actually run (SURVEY.md §3.4). Round 1 benched a slimmed fc_features=1024
variant; measuring the true workload is both the honest parity number and
what the weight-import path targets. The step computes loss only, like the
reference's train loop (train-time mIoU is an eval concern; the loop can
still request it with with_metrics=True).

The roofline denominator is pinned to the XLA-counted FLOPs of the CANONICAL
(unpacked) model — the semantic workload — not of whatever program runs
fastest: the production step uses the width-pair-packed stage1
(ops/packed_stem.py), which deliberately does ~4% more FLOPs to fill the
MXU lanes, and counting those would inflate the target. vs_baseline is
therefore a pure images/sec ratio against a fixed target.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
stderr carries the breakdown: step ms, achieved TFLOP/s, MFU, target img/s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# v5e peak bf16; detected per-platform below if possible
PEAK_BF16_TFLOPS = {"tpu v5 lite": 197.0, "tpu v5e": 197.0}
DEFAULT_PEAK = 197.0

# sources that define the CANONICAL counted program (the unpacked model +
# step). Perf-only paths (packed stem, pallas kernels) are deliberately
# excluded: they never run in the canonical count, and hashing them would
# force a pointless recount (an extra multi-minute XLA compile through the
# tunnel) on every kernel edit.
_COUNTED_SOURCES = (
    "semanticsegmentation_tensorflow_tpu/train/step.py",
    "semanticsegmentation_tensorflow_tpu/train/loss.py",
    "semanticsegmentation_tensorflow_tpu/train/state.py",
    "semanticsegmentation_tensorflow_tpu/models/fcn8s.py",
    "semanticsegmentation_tensorflow_tpu/models/vgg16.py",
    "semanticsegmentation_tensorflow_tpu/models/common.py",
    "semanticsegmentation_tensorflow_tpu/ops/fast_upsample.py",
    "semanticsegmentation_tensorflow_tpu/data/augment.py",
)


def _step_sources_hash() -> str:
    import hashlib
    import os

    base = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for rel in _COUNTED_SOURCES:
        with open(os.path.join(base, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def _check_tpu_tunnel() -> None:
    """Bounded-retry dead-relay guard — shared implementation in
    utils/runtime.py (every CLI entry point gets it via setup_runtime;
    this alias keeps the historical import path for benchmarks/all.py)."""
    from semanticsegmentation_tensorflow_tpu.utils.runtime import (
        check_tpu_tunnel,
    )

    check_tpu_tunnel()


def main() -> None:
    _check_tpu_tunnel()
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
    fc = 4096                    # reference-exact fc6/fc7 width
    tx = make_optimizer("adam", 1e-4)
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    step = make_train_step(num_classes=2, augment_fn=aug, with_metrics=False)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (batch, h, w)).astype(np.int32))
    hbm_batch = {"image": images, "label": labels}

    # Roofline denominator: FLOPs of the CANONICAL (unpacked) step — the
    # reference's semantic workload. This is a pure function of the config,
    # and computing it costs a full extra XLA compile (minutes through the
    # tunneled remote-compile service), so it is cached in a committed JSON
    # beside the other benchmark artifacts; delete the entry (or the file)
    # to force a recount.
    import os
    flops_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "canonical_flops.json")
    # the key pins EVERY config knob that changes the counted FLOPs, plus a
    # content hash of the sources that define the counted program — so an
    # edit to the step/model can never silently reuse a stale denominator
    flops_key = (f"fcn8s-b{batch}-{h}x{w}-fc{fc}-nc2-adam-aug-nometrics-"
                 + _step_sources_hash())
    try:
        with open(flops_path) as f:
            flops = float(json.load(f)[flops_key])
    except (OSError, KeyError, ValueError):
        canon = FCN8s(num_classes=2, fc_features=fc, packed_stage1=False)
        canon_state = create_train_state(canon, jax.random.key(0),
                                         (batch, h, w, 3), tx)
        canon_cost = (jax.jit(lambda s, b: step(s, b))
                      .lower(canon_state, hbm_batch).compile().cost_analysis())
        flops = float((canon_cost or {}).get("flops", 0.0))
        del canon_state
        if flops > 0:
            try:
                with open(flops_path) as f:
                    cache = json.load(f)
            except (OSError, ValueError):
                cache = {}
            cache[flops_key] = flops
            with open(flops_path, "w") as f:
                json.dump(cache, f, indent=2)

    # Lane-aware ceiling (the honest schedule-aware denominator, VERDICT r4
    # next #3): the flat 0.95*peak target assumes every FLOP of the step can
    # land on a fully-fed MXU, which no schedule can achieve for this model
    # (fc-conv wgrads and 64-wide stages can't fill all 128 lanes). The
    # lane-aware model (tools/roofline_model.py, reconciled against the
    # round-3/5 on-chip profiles) charges each matmul its real 128-lane
    # utilization plus HBM operand traffic. Its matmul-only ceiling for this
    # exact step is printed next to the flat target so both denominators are
    # visible every run; vs_baseline keeps the flat-peak contract. Computed
    # by a host-side jaxpr walk on abstract values (no device work), cached
    # under the same source-hash key as the canonical FLOPs.
    lane_imgs = None
    lane_key = flops_key + "-laneaware"
    try:
        with open(flops_path) as f:
            lane_imgs = float(json.load(f)[lane_key])
    except (OSError, KeyError, ValueError):
        try:
            import importlib.util
            spec = importlib.util.spec_from_file_location(
                "roofline_model",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "roofline_model.py"))
            rm = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(rm)
            canon = FCN8s(num_classes=2, fc_features=fc, packed_stage1=False)
            abs_state = jax.eval_shape(
                lambda k: create_train_state(canon, k, (batch, h, w, 3), tx),
                jax.random.key(0))
            abs_batch = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), hbm_batch)
            a = rm.analyze(step, abs_state, abs_batch)
            lane_imgs = batch / a["mm_ms"] * 1e3
            try:
                with open(flops_path) as f:
                    cache = json.load(f)
            except (OSError, ValueError):
                cache = {}
            cache[lane_key] = lane_imgs
            with open(flops_path, "w") as f:
                json.dump(cache, f, indent=2)
        except Exception as e:  # informational only — never kill the headline
            print(f"lane-aware ceiling unavailable: {e!r}", file=sys.stderr)

    # The production model: packed stage1 + Pallas pool (auto on TPU).
    # BENCH_MODEL_KWARGS (json dict) is the tuning harness's A/B knob for
    # perf flags (e.g. '{"packed_stage2_entry": true}') — it changes the
    # MEASURED model only, never the canonical denominator above.
    extra = json.loads(os.environ.get("BENCH_MODEL_KWARGS", "{}"))
    model = FCN8s(num_classes=2, fc_features=fc, **extra)
    # BENCH_OPT_KWARGS: optimizer-side A/B knob (e.g. '{"mu_dtype":
    # "bfloat16"}') — like BENCH_MODEL_KWARGS it changes only the MEASURED
    # step; the canonical denominator above always uses plain f32 Adam.
    opt_extra = json.loads(os.environ.get("BENCH_OPT_KWARGS", "{}"))
    meas_tx = make_optimizer("adam", 1e-4, **opt_extra) if opt_extra else tx
    state = create_train_state(model, jax.random.key(0), (batch, h, w, 3),
                               meas_tx)

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
    ms_per_step = dt / n_steps * 1000

    # the BASELINE metric is train + infer img/s; the JSON line keeps its
    # train contract (stable across rounds), the measured infer throughput
    # goes to the stderr breakdown. Device-resident batched label-map
    # forward — the serving-loop steady state (benchmarks/all.py has the
    # full host-in-the-loop variants).
    infer_ips = None
    try:
        from semanticsegmentation_tensorflow_tpu.data.augment import (
            normalize_images,
        )
        ib = 8

        @jax.jit
        def infer_step(params, image_u8):
            x = normalize_images(image_u8, dc.mean, dc.std)
            logits = model.apply({"params": params}, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        iimg = images[:ib]
        lbl = infer_step(state.params, iimg)
        np.asarray(lbl)  # value fetch = true sync (see NOTE above)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lbl = infer_step(state.params, iimg)
        np.asarray(lbl)
        infer_ips = ib * n_steps / (time.perf_counter() - t0)
    except Exception as e:  # never let the infer leg kill the headline
        print(f"infer measurement failed: {e!r}", file=sys.stderr)

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    peak_tflops = next((v for k, v in PEAK_BF16_TFLOPS.items() if k in kind),
                       DEFAULT_PEAK)
    if flops > 0:
        flops_per_img = flops / batch
        roofline_imgs = peak_tflops * 1e12 / flops_per_img
        target = 0.95 * roofline_imgs
        vs_baseline = imgs_per_sec / target
        achieved_tflops = imgs_per_sec * flops_per_img / 1e12
        mfu = achieved_tflops / peak_tflops
        infer_txt = ("" if infer_ips is None
                     else f" | infer (device, b8): {infer_ips:.1f} img/s")
        print(
            f"step: {ms_per_step:.2f} ms | {imgs_per_sec:.1f} img/s | "
            f"canonical {flops_per_img / 1e9:.1f} GFLOP/img -> achieved "
            f"{achieved_tflops:.1f} TFLOP/s = {mfu * 100:.1f}% MFU of "
            f"{peak_tflops:.0f} peak | target 0.95*roofline = "
            f"{target:.1f} img/s on {kind or 'unknown device'}"
            + infer_txt,
            file=sys.stderr)
        if lane_imgs:
            print(
                f"lane-aware roofline (tools/roofline_model.py): "
                f"matmul-only ceiling {lane_imgs:.0f} img/s -> measured = "
                f"{imgs_per_sec / lane_imgs * 100:.0f}% of it — the "
                "schedule-honest denominator (ARCHITECTURE.md 'Analytic "
                "lane-aware roofline'); vs_baseline keeps the flat-peak "
                "contract", file=sys.stderr)
    else:
        vs_baseline = 0.0
        print(f"step: {ms_per_step:.2f} ms | {imgs_per_sec:.1f} img/s | "
              "no XLA cost analysis available", file=sys.stderr)

    print(json.dumps({
        "metric": "fcn8s_kitti_1242x375_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()

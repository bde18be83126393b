#!/usr/bin/env python
"""Full benchmark sweep: train + inference across the model zoo.

Writes benchmarks/results.json and prints a table. `bench.py` (the driver's
single headline line) measures FCN-8s train throughput; this harness covers
the rest: per-model train img/s at KITTI resolution and the inference paths
(batched + the reference's single-image mode).

    python benchmarks/all.py [--quick]
    python benchmarks/all.py --only deeplab,deeplab_os16,int8   # splice-refresh

`--only` re-benches just the named rows and splices them into the existing
results.json (each refreshed row gets its own `when` stamp) — a full sweep
costs >1h of serialized TPU time through the tunnel, so single-knob changes
(e.g. a new model default) refresh only the rows they touch. Tokens: the
train-row display names (fcn8s, unet_cityscapes, unet_kitti_fullres,
segnet, deeplab, deeplab_os16) plus `infer`, `int8`, `sweep`.
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

# sources whose edits can change any model's counted FLOPs — the cache key
# for every canonical-FLOPs entry carries their content hash, so a stale
# roofline denominator can never be silently reused (ADVICE r2).
_MODEL_SOURCES = (
    "train/step.py", "train/loss.py", "train/state.py", "train/metrics.py",
    "models/fcn8s.py", "models/unet.py", "models/segnet.py",
    "models/deeplab.py", "models/vgg16.py", "models/common.py",
    "ops/pool.py", "ops/fast_upsample.py", "ops/packed_conv.py",
    "data/augment.py",
)


def _models_hash() -> str:
    import hashlib

    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "semanticsegmentation_tensorflow_tpu")
    h = hashlib.sha256()
    for rel in _MODEL_SOURCES:
        with open(os.path.join(pkg, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


_FLOPS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "canonical_flops.json")


def _canonical_flops_per_img(model_name: str, batch: int, h: int, w: int,
                             num_classes: int, step, batch_dict,
                             canon_kwargs: dict) -> float | None:
    """XLA-counted FLOPs/image of the CANONICAL model under the measured
    step — the semantic workload (perf reformulations like the packed stem
    deliberately run MORE flops; counting those would inflate MFU). Cached
    in canonical_flops.json: the count costs a full extra XLA compile
    (minutes through this tunneled remote-compile service)."""
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import create_train_state
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    key = (f"{model_name}-b{batch}-{h}x{w}-nc{num_classes}-adam-aug-metrics-"
           + "-".join(f"{k}={v}" for k, v in sorted(canon_kwargs.items()))
           + "-" + _models_hash())
    try:
        with open(_FLOPS_PATH) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if key in cache:
        return float(cache[key])
    try:
        canon = build_model(model_name, num_classes=num_classes,
                            **canon_kwargs)
        state = create_train_state(canon, jax.random.key(0),
                                   (batch, h, w, 3),
                                   make_optimizer("adam", 1e-4))
        cost = (jax.jit(lambda s, b: step(s, b))
                .lower(state, batch_dict).compile().cost_analysis())
        flops = float((cost or {}).get("flops", 0.0))
        del state
    except Exception as e:  # count failures must not kill the sweep
        print(f"  canonical-flops count failed for {model_name}: {e!r}",
              file=sys.stderr)
        return None
    if flops <= 0:
        return None
    cache[key] = flops / batch
    with open(_FLOPS_PATH, "w") as f:
        json.dump(cache, f, indent=2)
    return flops / batch


def _peak_tflops() -> float:
    from bench import DEFAULT_PEAK, PEAK_BF16_TFLOPS

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    return next((v for k, v in PEAK_BF16_TFLOPS.items() if k in kind),
                DEFAULT_PEAK)


def _bench_batch(batch: int, h: int, w: int, num_classes: int) -> dict:
    """Deterministic bench batch with a LEARNABLE label (label = channel-mean
    quantized into num_classes buckets, a pixelwise function of the input) —
    so the post-bench train-set mIoU is a meaningful numerics fingerprint:
    bit-equal perf flags leave it identical, numerics-changing ones shift it
    (VERDICT r3 #7: perf flags must never silently trade accuracy)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (batch, h, w, 3)).astype(np.uint8)
    lbl = (img.mean(axis=-1) * num_classes / 256.0).astype(np.int32)
    return {"image": jnp.asarray(img),
            "label": jnp.asarray(np.clip(lbl, 0, num_classes - 1))}


def bench_train(model_name: str, batch: int, h: int, w: int, steps: int,
                display: str | None = None, num_classes: int = 2,
                canon_kwargs: dict | None = None,
                compute_mfu: bool = True,
                opt_kwargs: dict | None = None, **kwargs) -> dict:
    from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    from semanticsegmentation_tensorflow_tpu.config import DataConfig

    model = build_model(model_name, num_classes=num_classes, **kwargs)
    # opt_kwargs (e.g. {"mu_dtype": "bfloat16"}): optimizer-side perf knobs
    # for the A/B harness — the canonical-FLOPs denominator below always
    # uses the plain f32 Adam (the semantic workload).
    state = create_train_state(model, jax.random.key(0), (batch, h, w, 3),
                               make_optimizer("adam", 1e-4,
                                              **(opt_kwargs or {})))
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    step = make_train_step(num_classes=num_classes, augment_fn=aug)
    b = _bench_batch(batch, h, w, num_classes)
    state, out = step(state, b)
    _sync(out["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = step(state, b)
    _sync(out["loss"])
    dt = time.perf_counter() - t0
    ips = batch * steps / dt
    row = {"name": f"{display or model_name}_train", "batch": batch,
           "images_per_sec": round(ips, 2),
           "ms_per_step": round(dt / steps * 1000, 2)}
    # train-set mIoU after the bench's deterministic steps: a free (the
    # step already computes the confusion matrix) accuracy fingerprint —
    # stable across bit-equal perf flags, shifted by numerics changes
    if "cm" in out:
        from semanticsegmentation_tensorflow_tpu.train.metrics import (
            iou_from_confusion,
        )
        _, miou = iou_from_confusion(jax.device_get(out["cm"]))
        row["train_miou"] = round(float(miou), 4)
    # roofline context per model (VERDICT r2: a throughput number without a
    # canonical-FLOPs denominator cannot be prioritized or judged). The A/B
    # flag harness passes compute_mfu=False: the canonical count costs a
    # multi-minute tunneled compile per combo and would cache FLOP-inflated
    # packed variants under 'canonical' keys (ADVICE r3).
    if compute_mfu:
        fpi = _canonical_flops_per_img(model_name, batch, h, w, num_classes,
                                       step, b,
                                       dict(canon_kwargs or {}, **kwargs))
        if fpi:
            peak = _peak_tflops()
            row["canonical_gflop_per_img"] = round(fpi / 1e9, 1)
            row["achieved_tflops"] = round(ips * fpi / 1e12, 1)
            row["mfu"] = round(ips * fpi / 1e12 / peak, 4)
    return row


def _make_predictor(batch: int, model_name: str = "fcn8s", **kw):
    """Shared Predictor setup for the inference benchmarks.

    Init is jitted: eager flax init round-trips the tunnel per-op (80-220s
    measured); one compiled program is ~10s.
    """
    import functools

    from semanticsegmentation_tensorflow_tpu.infer import Predictor
    from semanticsegmentation_tensorflow_tpu.models import build_model

    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )

    model = build_model(model_name, num_classes=2, **kw)
    h, w = padded_input_hw(model, (375, 1242))
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    vs = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), x)
    return Predictor(model, vs, (375, 1242))


def _make_fcn8s_predictor(batch: int):
    return _make_predictor(batch, "fcn8s")


def bench_infer_model(model_name: str, batch: int, steps: int) -> dict:
    """Device-resident label-map inference throughput for one zoo model
    (--infer-all; the e2e/overlay legs are FCN-only — bench_infer)."""
    pred = _make_predictor(batch, model_name)
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 375, 1242, 3)).astype(np.uint8))
    out = pred._fwd_labels(img)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = pred._fwd_labels(img)
    _sync(out)
    dt = time.perf_counter() - t0
    return {"name": f"{model_name}_infer_b{batch}", "batch": batch,
            "images_per_sec_device": round(batch * steps / dt, 2),
            "ms_per_image_device": round(dt / steps / batch * 1000, 2)}


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


def bench_infer_int8(batch: int, steps: int) -> dict:
    """int8 PTQ serving throughput (infer/quant.py): the same device-
    resident label-map program as ``fcn8s_infer_b{batch}``, quantized
    (per-channel int8 weights, calibrated per-tensor activations, s8xs8
    MXU convs). Perf-only leg — calibration uses the benchmark's random
    input (the scales' VALUES are irrelevant to throughput); the accuracy
    fingerprint lives in ``scripts/eval.py --int8``. Compare
    images_per_sec_device against the fp row to read the int8-MXU
    speedup."""
    import functools

    from semanticsegmentation_tensorflow_tpu.data.augment import (
        normalize_images,
    )
    from semanticsegmentation_tensorflow_tpu.infer import Predictor, quant
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    from semanticsegmentation_tensorflow_tpu.ops.shape import (
        pad_to_multiple,
    )

    from semanticsegmentation_tensorflow_tpu.models.registry import (
        quant_safe_kwargs,
    )

    # quant-safe build = what the --int8 CLIs actually serve (every conv
    # int8; the production packed paths are interceptor-invisible)
    model = build_model("fcn8s", num_classes=2,
                        **quant_safe_kwargs("fcn8s"))
    h, w = padded_input_hw(model, (375, 1242))
    vs = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), jnp.zeros((batch, h, w, 3), jnp.float32))
    img = np.random.default_rng(0).integers(
        0, 256, (batch, 375, 1242, 3)).astype(np.uint8)
    xin = np.asarray(pad_to_multiple(normalize_images(
        jnp.asarray(img), (123.68, 116.779, 103.939),
        (58.393, 57.12, 57.375)), 32))
    qv, apply_fn, scales = quant.quantize_for_inference(
        model, vs, [xin], (batch, h, w, 3))
    pred = Predictor(model, qv, (375, 1242), apply_fn=apply_fn)
    dimg = jnp.asarray(img)
    out = pred._fwd_labels(dimg)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = pred._fwd_labels(dimg)
    _sync(out)
    dt = time.perf_counter() - t0
    return {"name": f"fcn8s_int8_infer_b{batch}", "batch": batch,
            "act_scales": len(scales),
            "images_per_sec_device": round(batch * steps / dt, 2),
            "ms_per_image_device": round(dt / steps / batch * 1000, 2)}


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

    # Per-leg attribution (VERDICT r2 #7: persist WHY the e2e number is
    # what it is — on this dev environment the host->device upload through
    # the ~11 MB/s tunnel dominates; on a real host it would be PCIe).
    # Each leg is timed standalone over the same images.
    from semanticsegmentation_tensorflow_tpu.infer.predict import load_image
    from semanticsegmentation_tensorflow_tpu.ops.overlay import host_overlay
    from semanticsegmentation_tensorflow_tpu.utils.fastpng import write_png

    n_leg = min(n_images, 2 * batch)
    t = time.perf_counter()
    imgs = np.stack([load_image(p, pred.image_size) for p in paths[:n_leg]])
    decode_s = time.perf_counter() - t
    t = time.perf_counter()
    dev = jax.device_put(imgs)
    _sync(dev)
    upload_s = time.perf_counter() - t
    labels = None
    t = time.perf_counter()
    for i in range(0, n_leg, batch):
        # the sweep's real fetch leg: packed wire format + host unpack
        labels = pred._fetch_labels(dev[i:i + batch])
    compute_s = time.perf_counter() - t
    t = time.perf_counter()
    enc_dir = os.path.join(tmp_root, "enc")
    os.makedirs(enc_dir, exist_ok=True)
    for i in range(min(n_leg, batch)):
        write_png(os.path.join(enc_dir, f"{i}.png"),
                  host_overlay(imgs[i], labels[i % batch],
                               pred._palette, pred._alpha))
    encode_s = (time.perf_counter() - t) * n_leg / min(n_leg, batch)

    shutil.rmtree(src_dir)
    shutil.rmtree(runs_dir)
    return {"name": f"fcn8s_sweep_b{batch}", "batch": batch,
            "n_images": n_images,
            "images_per_sec_e2e": round(n_images / dt, 2),
            "ms_per_image_e2e": round(dt / n_images * 1000, 2),
            "legs_ms_per_image": {
                "decode": round(decode_s / n_leg * 1000, 2),
                "upload": round(upload_s / n_leg * 1000, 2),
                "device_fwd": round(compute_s / n_leg * 1000, 2),
                "overlay_encode": round(encode_s / n_leg * 1000, 2)}}


def splice_results(old: dict, new_rows: list, when: str) -> dict:
    """Merge `--only` re-benched rows into an existing results.json dict.

    Matching rows are replaced in place (file order preserved), genuinely
    new rows append, untouched rows keep their original capture context.
    Each refreshed row gets its own ``when`` stamp and the meta records
    ``refreshed`` so mixed-age files stay honest.
    """
    by_name = {r["name"]: r for r in old["results"]}
    for r in new_rows:
        r = dict(r, when=when)
        by_name[r["name"]] = r
    return {"meta": {**old["meta"], "refreshed": when},
            "results": list(by_name.values())}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer steps")
    p.add_argument("--infer-all", action="store_true",
                   help="also bench device inference for segnet/unet/"
                        "deeplab (one extra compile each)")
    p.add_argument("--only", default=None,
                   help="comma list of rows to re-bench and splice into the "
                        "existing results.json (train display names and/or "
                        "infer,int8,sweep); others are left untouched")
    args = p.parse_args()
    steps = 5 if args.quick else 12
    only = set(args.only.split(",")) if args.only else None

    def _want(token: str) -> bool:
        return only is None or token in only

    from bench import _check_tpu_tunnel
    _check_tpu_tunnel()   # fail fast, never hang, when the relay is dead

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    results = []
    # batch sizes are the measured-best per model on v5e (batch sweeps
    # 2026-08-17: fcn8s flat 16/24/32; segnet/unet flat 8/16 — bandwidth-
    # bound; deeplab os8 27->73 img/s going 4->8). The canonical (MFU
    # denominator) model disables perf reformulations that change the FLOP
    # count (packed stem); rows: (display, model, batch, h, w, nc, kwargs).
    unpacked = {"canon_kwargs": {"packed_stage1": False}}
    # canonical (denominator) models disable every FLOP-changing perf
    # reformulation: packed stem AND the round-3 packed decoder/stage0
    unet_canon = {"canon_kwargs": {"packed_stage0": False}}
    segnet_canon = {"canon_kwargs": {"packed_stage1": False,
                                     "packed_dec1": False,
                                     "packed_dec2": False}}
    for disp, name, bs, bh, bw, nc, kw in [
        ("fcn8s", "fcn8s", 16, 384, 1248, 2, dict(unpacked)),
        # U-Net at its preset workload (BASELINE config 3: Cityscapes
        # 19-class 256x512 crops — what unet_cityscapes trains) AND at
        # full KITTI resolution for cross-model comparison
        ("unet_cityscapes", "unet", 8, 256, 512, 19, dict(unet_canon)),
        # packed_stage0 measured -4.4% at this non-preset full-res shape
        # (models/unet.py flag docstring) — bench the measured-best config
        ("unet_kitti_fullres", "unet", 8, 384, 1248, 2,
         dict(unet_canon, packed_stage0=False)),
        ("segnet", "segnet", 8, 384, 1248, 2, dict(segnet_canon)),
        # deeplab defaults to the packed stage1 since round 5 — the FLOP
        # denominator stays the unpacked canonical build (same rule as
        # fcn8s/segnet: packing's tap regrouping changes the FLOP count)
        ("deeplab", "deeplab", 8, 384, 1248, 2, dict(unpacked)),
        ("deeplab_os16", "deeplab", 8, 384, 1248, 2,
         dict(unpacked, output_stride=16)),
    ]:
        if not _want(disp):
            continue
        canon_kwargs = kw.pop("canon_kwargs", None)
        r = bench_train(name, bs, bh, bw, steps, display=disp,
                        num_classes=nc, canon_kwargs=canon_kwargs, **kw)
        print(r)
        results.append(r)
    if _want("infer"):
        for bs in (1, 8):
            r = bench_infer(bs, steps)
            print(r)
            results.append(r)
    if _want("int8"):
        r = bench_infer_int8(8, steps)
        print(r)
        results.append(r)
    if args.infer_all:
        for name in ("segnet", "unet", "deeplab"):
            r = bench_infer_model(name, 8, steps)
            print(r)
            results.append(r)

    if _want("sweep"):
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            r = bench_sweep(16 if args.quick else 64, 8, td)
        print(r)
        results.append(r)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    meta = {"device": str(jax.devices()[0]), "when": time.strftime("%F %T")}
    if only is not None:
        with open(out_path) as f:
            old = json.load(f)
        merged = splice_results(old, results, meta["when"])
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=2)
    else:
        with open(out_path, "w") as f:
            json.dump({"meta": meta, "results": results}, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

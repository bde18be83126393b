#!/usr/bin/env python
"""Winograd per-layer TPU microbenchmark + on-chip numerics check.

Times each eligible VGG conv shape (fwd and fwd+bwd) three ways — direct
XLA conv, Winograd f2, Winograd f4 — on the real chip, and verifies the
kernel against the bf16 direct conv at each shape. This drives the
per-layer accept/reject decision for the production flag (the measured
table goes into ARCHITECTURE.md).

    python tools/bench_winograd.py [--quick] [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
    eligible, winograd_conv_bias_relu,
)
from semanticsegmentation_tensorflow_tpu.ops.winograd import (
    VARIANTS, direct_conv2d, winograd_conv2d, winograd_conv_large,
)

# (name, H, W, Cin, Cout[, ksize]) at bench batch 16, KITTI padded shapes
VARIANTS_TO_RUN = ("f2", "f4")
SKIP_DIRECT = False

LAYERS = [
    ("conv2_1", 192, 624, 64, 128),     # half-lane input: ineligible (ctrl)
    ("conv2_2", 192, 624, 128, 128),
    ("conv3_1", 96, 312, 128, 256),
    ("conv3_2", 96, 312, 256, 256),
    ("conv4_1", 48, 156, 256, 512),
    ("conv4_2", 48, 156, 512, 512),
    ("conv5_x", 24, 78, 512, 512),
    ("fc6", 12, 39, 512, 4096, 7),      # the 7x7 conv: f2r7 only
]


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_one(name, h, w, cin, cout, batch, steps, fwd_only, ksize=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, cin)) * 0.5,
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(ksize, ksize, cin, cout)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def direct(x, k, b):
        # bwd mode needs the conv's output dtype to match the operands
        # (see direct_conv2d's `preferred` doc); fwd keeps the f32
        # accumulate-then-cast the round-3 table was measured with
        pref = jnp.float32 if fwd_only else jnp.bfloat16
        return jax.nn.relu(
            direct_conv2d(x, k.astype(jnp.bfloat16),
                          preferred=pref).astype(jnp.bfloat16)
            + b.astype(jnp.bfloat16))

    row = {"layer": name, "shape": f"{h}x{w}x{cin}->{cout}"}
    impls = {} if SKIP_DIRECT else {"direct": direct}
    for v in VARIANTS_TO_RUN:
        # pallas fused kernel (3x3 only)
        if ksize == 3 and not v.endswith("x") and eligible(x.shape, k.shape, v):
            impls[v] = (lambda vv: lambda x, k, b:
                        winograd_conv_bias_relu(x, k, b, vv))(v)
        # XLA-native path: "<variant>x" labels, e.g. f2x / f4x / f2r7x
        if v.endswith("x") and VARIANTS[v[:-1]].r == ksize:
            impls[v] = (lambda vv: lambda x, k, b:
                        winograd_conv2d(x, k, b, vv, True))(v[:-1])
        # decomposed large-kernel path: "<variant>d", e.g. f2d / f4d
        if v.endswith("d") and ksize >= 5:
            impls[v] = (lambda vv: lambda x, k, b:
                        winograd_conv_large(x, k, b, vv, True))(v[:-1])

    ref = None
    for label, fn in impls.items():
        if fwd_only:
            f = jax.jit(fn)
        else:
            def f(x, k, b, fn=fn):
                def loss(x, k, b):
                    # keep the loss (and so the cotangent) in the fwd's
                    # own dtype: an f32 cotangent against bf16 operands
                    # makes XLA's conv-transpose reject the direct path
                    return jnp.sum(fn(x, k, b) ** 2).astype(jnp.float32)
                return jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
            f = jax.jit(f)
        t_c0 = time.perf_counter()
        out = f(x, k, b)
        _sync(jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(steps):
            out = f(x, k, b)
        _sync(jax.tree.leaves(out)[0])
        ms = (time.perf_counter() - t0) / steps * 1000
        row[label + "_ms"] = round(ms, 3)
        row[label + "_compile_s"] = round(compile_s, 1)
        # numerics vs the f32 direct conv, normalized (fwd only)
        y = jnp.asarray(fn(x, k, b), jnp.float32) if fwd_only else None
        if fwd_only:
            if ref is None:
                exact = jax.nn.relu(
                    direct_conv2d(x.astype(jnp.float32), k) + b)
                ref = (exact, float(jnp.std(exact)) + 1e-30)
            err = float(jnp.sqrt(jnp.mean((y - ref[0]) ** 2))) / ref[1]
            row[label + "_relrms"] = round(err, 6)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--layers", default=None,
                   help="comma-separated layer-name filter")
    p.add_argument("--variants", default="f2,f4",
                   help="winograd variants to bench")
    p.add_argument("--skip-direct", action="store_true",
                   help="skip the direct-conv baseline (its standalone jit "
                        "compile is minutes through the tunnel)")
    args = p.parse_args()
    global VARIANTS_TO_RUN, SKIP_DIRECT
    VARIANTS_TO_RUN = tuple(args.variants.split(","))
    SKIP_DIRECT = args.skip_direct
    from semanticsegmentation_tensorflow_tpu.utils.runtime import (
        setup_runtime,
    )
    setup_runtime()
    steps = 5 if args.quick else 20
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for name, h, w, cin, cout, *rest in LAYERS:
        if args.layers and name not in args.layers.split(","):
            continue
        row = bench_one(name, h, w, cin, cout, args.batch, steps,
                        args.fwd_only, ksize=rest[0] if rest else 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-op TPU profile of an arbitrary winograd/conv microbench case.

Reuses profile_step.aggregate_xplane (raw xplane proto parsing) to
attribute device time inside one jitted function — used to drive the
Winograd formulation choices (which XLA fusions actually materialize).

    python tools/profile_fn.py --impl f4x --layer conv4_1 [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_step import aggregate_xplane
from tools.bench_winograd import LAYERS
from semanticsegmentation_tensorflow_tpu.ops.winograd import (
    VARIANTS, direct_conv2d, winograd_conv2d, winograd_conv_large,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="f4x")
    p.add_argument("--layer", default="conv4_1")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    spec = {l[0]: l for l in LAYERS}[args.layer]
    name, h, w, cin, cout, *rest = spec
    ksize = rest[0] if rest else 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, h, w, cin)) * 0.5,
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(ksize, ksize, cin, cout)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    if args.impl == "direct":
        def fwd(x, k, b):
            return jax.nn.relu(
                direct_conv2d(x, k.astype(jnp.bfloat16)).astype(jnp.bfloat16)
                + b.astype(jnp.bfloat16))
    elif args.impl.endswith("d"):
        variant = args.impl[:-1]

        def fwd(x, k, b):
            return winograd_conv_large(x, k, b, variant, True)
    else:
        variant = args.impl[:-1] if args.impl.endswith("x") else args.impl
        assert variant in VARIANTS, args.impl

        def fwd(x, k, b):
            return winograd_conv2d(x, k, b, variant, True)

    if args.fwd_only:
        f = jax.jit(fwd)
    else:
        def f(x, k, b):
            def loss(x, k, b):
                return jnp.sum(fwd(x, k, b).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
        f = jax.jit(f)

    out = f(x, k, b)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # sync

    logdir = tempfile.mkdtemp(prefix="proffn_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            out = f(x, k, b)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    rows = aggregate_xplane(logdir)
    total = sum(t for _, t, _ in rows)
    print(f"# {args.layer} {args.impl} total {total / args.steps:.3f} "
          f"ms/step over {args.steps} steps")
    for n, t, c in rows[:args.top]:
        print(f"{t / args.steps:8.3f} ms  x{c:<4d} {n[:110]}")


if __name__ == "__main__":
    main()

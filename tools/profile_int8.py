#!/usr/bin/env python
"""Per-op TPU attribution of the int8 serving forward vs bf16.

Answers runbook item 9's key question: does XLA lower the s8xs8 convs to
the v5e int8 MXU path (expect conv fusions ~2x faster than the bf16 row)
or emulate them (reject + record)? Prints both profiles side by side.

    python tools/profile_int8.py [--model fcn8s] [--batch 8] [--top 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fcn8s")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--model-kw", default=None)
    args = p.parse_args()

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    import jax
    import jax.numpy as jnp

    from semanticsegmentation_tensorflow_tpu.config import parse_model_kw
    from semanticsegmentation_tensorflow_tpu.data.augment import (
        normalize_images,
    )
    from semanticsegmentation_tensorflow_tpu.infer import Predictor, quant
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    from semanticsegmentation_tensorflow_tpu.ops.shape import pad_to_multiple
    from tools.profile_step import aggregate_xplane

    from semanticsegmentation_tensorflow_tpu.models.registry import (
        merge_quant_safe_kwargs,
    )

    # quant-safe flags so the interceptor covers EVERY conv (the int8 CLIs
    # rebuild the same way); the bf16 reference keeps the production flags
    # — the A/B the profile answers is "int8 serving vs production bf16"
    qkw = merge_quant_safe_kwargs(args.model, parse_model_kw(args.model_kw))
    qmodel = build_model(args.model, num_classes=2, **qkw)
    model = build_model(args.model, num_classes=2,
                        **parse_model_kw(args.model_kw))
    h, w = padded_input_hw(model, (375, 1242))
    vs = jax.jit(functools.partial(model.init, train=False))(
        jax.random.key(0), jnp.zeros((args.batch, h, w, 3), jnp.float32))
    img = np.random.default_rng(0).integers(
        0, 256, (args.batch, 375, 1242, 3)).astype(np.uint8)
    xin = np.asarray(pad_to_multiple(normalize_images(
        jnp.asarray(img), (123.68, 116.779, 103.939),
        (58.393, 57.12, 57.375)), 32))
    qv, apply_fn, scales = quant.quantize_for_inference(
        qmodel, vs, [xin], (args.batch, h, w, 3))
    n_q = sum(1 for leaf in jax.tree.leaves(qv["params"])
              if leaf.dtype == np.int8)
    print(f"int8: {n_q} convs quantized, {len(scales)} activation scales")

    preds = {
        "bf16": Predictor(model, vs, (375, 1242)),
        "int8": Predictor(qmodel, qv, (375, 1242), apply_fn=apply_fn),
    }
    dimg = jnp.asarray(img)
    for tag, pred in preds.items():
        out = pred._fwd_labels(dimg)   # compile
        np.asarray(out)
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(args.steps):
                    out = pred._fwd_labels(dimg)
                np.asarray(out)
            dt = time.perf_counter() - t0
            print(f"\n=== {tag}: {args.steps} steps, "
                  f"{args.batch * args.steps / dt:.2f} img/s ===")
            rows = aggregate_xplane(td)
            total = sum(ms for _, ms, _ in rows)
            print(f"device total {total / args.steps:.2f} ms/step")
            for name, ms, cnt in rows[:args.top]:
                print(f"  {ms / args.steps:8.3f} ms  x{cnt:<4d} {name[:90]}")


if __name__ == "__main__":
    main()

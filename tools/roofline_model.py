#!/usr/bin/env python
"""Analytic per-model roofline from the train step's jaxpr (no device).

VERDICT r3 #2 asks for a ceiling argument per model (SegNet 0.42 MFU,
U-Net 0.42-0.46, DeepLab 0.54 had none). The on-chip per-op profile is the
ground truth, but the *shape* of the ceiling — how much of the step is MXU
FLOPs vs HBM traffic, and which ops dominate — is computable offline,
which matters with the TPU tunnel down.

Method: ``jax.make_jaxpr`` on the REAL train step (fwd + bwd + Adam +
confusion matrix — exactly what the benchmark times), recursively walk
every equation, and charge:

  * ``conv_general_dilated`` / ``dot_general``: exact MACs from the
    shapes + dimension numbers (the same count XLA's cost analysis
    reports), at PEAK * eff with eff = 0.90 — the measured 86-94% XLA
    conv-schedule efficiency from the round-3 FCN profile — plus operand
    + result bytes at HBM bandwidth;
  * every other equation: bytes of its RESULTS only (operands are some
    other op's results; elementwise chains fuse, so result bytes is the
    floor of what a perfectly-fused schedule must still write). Control-
    flow/layout no-ops (reshape/transpose/broadcast/convert...) are
    skipped as pure-layout.

Per matmul-op time = max(MXU, HBM); total = sum. This is a LOWER BOUND
model of the step, i.e. an img/s CEILING: real steps add relayouts,
fusion breaks, and scheduling gaps. Use it to (a) rank suspects before
profiling and (b) separate "X is at its bandwidth ceiling" from "X leaves
MXU time on the table" (benchmarks/ROUND4_RUNBOOK.md item 6).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

PEAK_TFLOPS = 197.0      # v5e bf16
HBM_GBPS = 819.0         # v5e
MXU_EFF = 0.90           # measured XLA conv-schedule efficiency (FCN profile)

# results of these primitives are layout/metadata only — no HBM write of
# new data in a fused schedule (XLA folds them into producers/consumers)
_LAYOUT_PRIMS = {
    "reshape", "transpose", "broadcast_in_dim", "convert_element_type",
    "squeeze", "expand_dims", "slice", "rev", "bitcast_convert_type",
    "copy", "stop_gradient", "custom_jvp_call", "custom_vjp_call",
    "custom_vjp_call_jaxpr", "pjit", "closed_call", "remat", "checkpoint",
    "dynamic_slice", "concatenate", "pad", "iota", "scan", "while", "cond",
}


def _sub_jaxprs(eqn):
    from jax.extend import core as jex_core

    for v in eqn.params.values():
        vals = v if isinstance(v, (list, tuple)) else (v,)
        for x in vals:
            if isinstance(x, jex_core.ClosedJaxpr):
                yield x.jaxpr
            elif isinstance(x, jex_core.Jaxpr):
                yield x


def _bytes_of(avals) -> float:
    total = 0.0
    for a in avals:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            try:
                item = np.dtype(a.dtype).itemsize
            except TypeError:   # extended dtypes (PRNG keys) — negligible
                item = 4
            total += float(np.prod(a.shape, dtype=np.float64)) * item
    return total


def _conv_macs(eqn) -> float:
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    # the rhs input-feature dim is ALREADY Cin/groups for grouped convs —
    # no further division by feature_group_count
    cin = rhs.shape[dn.rhs_spec[1]]
    spatial = 1.0
    for d in dn.rhs_spec[2:]:
        spatial *= rhs.shape[d]
    return float(np.prod(out.shape, dtype=np.float64)) * cin * spatial


def _dot_macs(eqn) -> float:
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    (lc, _), _ = eqn.params["dimension_numbers"]
    k = 1.0
    for d in lc:
        k *= lhs.shape[d]
    return float(np.prod(out.shape, dtype=np.float64)) * k


def analyze(step_fn, state, batch):
    jaxpr = jax.make_jaxpr(step_fn)(state, batch).jaxpr
    mm_rows = []            # (kind, shape-sig, flops, bytes, lane_eff)
    other_bytes = defaultdict(float)

    def lane_eff(co: int) -> float:
        """MXU lane utilization: output features map to the 128 lanes, so
        a 64-wide conv can use at most half of them (the measured basis of
        the width-pair packing wins); wide convs get the measured 0.90
        XLA-schedule efficiency."""
        return MXU_EFF * min(1.0, co / 128.0)

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            subs = list(_sub_jaxprs(eqn))
            if subs:
                for s in subs:
                    walk(s)
                continue
            if name == "conv_general_dilated":
                flops = 2.0 * _conv_macs(eqn)
                by = _bytes_of([v.aval for v in eqn.invars]
                               + [o.aval for o in eqn.outvars])
                rhs = eqn.invars[1].aval
                out = eqn.outvars[0].aval
                dn = eqn.params["dimension_numbers"]
                co = out.shape[dn.out_spec[1]]
                mm_rows.append((f"conv k={tuple(rhs.shape)} "
                                f"out={tuple(out.shape)}", flops, by,
                                lane_eff(co)))
            elif name == "dot_general":
                flops = 2.0 * _dot_macs(eqn)
                by = _bytes_of([v.aval for v in eqn.invars]
                               + [o.aval for o in eqn.outvars])
                out = eqn.outvars[0].aval
                co = out.shape[-1] if out.ndim else 1
                mm_rows.append((f"dot out={tuple(out.shape)}", flops, by,
                                lane_eff(co)))
            elif name in _LAYOUT_PRIMS:
                continue
            else:
                other_bytes[name] += _bytes_of(
                    o.aval for o in eqn.outvars)

    walk(jaxpr)

    # aggregate identical matmul signatures (e.g. repeated stage convs)
    agg = defaultdict(lambda: [0.0, 0.0, 0, 0.0])
    for sig, fl, by, eff in mm_rows:
        agg[sig][0] += fl
        agg[sig][1] += by
        agg[sig][2] += 1
        agg[sig][3] = eff

    rows = []
    mm_ms = mm_flops = mm_bytes = ideal_ms = 0.0
    for sig, (fl, by, cnt, eff) in agg.items():
        mxu = fl / (PEAK_TFLOPS * 1e12 * max(eff, 1e-3)) * 1e3
        hbm = by / (HBM_GBPS * 1e9) * 1e3
        rows.append((sig, cnt, fl, mxu, hbm))
        mm_ms += max(mxu, hbm)
        ideal_ms += max(fl / (PEAK_TFLOPS * 1e12 * MXU_EFF) * 1e3, hbm)
        mm_flops += fl
        mm_bytes += by
    rows.sort(key=lambda r: -max(r[3], r[4]))

    oth = sorted(other_bytes.items(), key=lambda kv: -kv[1])
    oth_bytes = sum(other_bytes.values())
    oth_ms = oth_bytes / (HBM_GBPS * 1e9) * 1e3
    return {"rows": rows, "mm_ms": mm_ms, "ideal_ms": ideal_ms,
            "mm_flops": mm_flops, "mm_bytes": mm_bytes, "other": oth,
            "other_ms": oth_ms}


def report(label, batch_n, a, top=10) -> str:
    total_ms = a["mm_ms"] + a["other_ms"]
    lines = [
        f"== {label} ==",
        f"matmul work {a['mm_flops'] / 1e12:.2f} TFLOP, "
        f"{a['mm_bytes'] / 1e9:.1f} GB operands; other-op results "
        f"{sum(b for _, b in a['other']) / 1e9:.1f} GB",
        f"roofline: matmuls {a['mm_ms']:.1f} ms (lane-aware; "
        f"{a['ideal_ms']:.1f} ms at uniform 0.9 eff) + other traffic "
        f"{a['other_ms']:.1f} ms = {total_ms:.1f} ms  ->  ceiling "
        f"~{batch_n / total_ms * 1e3:.0f} img/s "
        f"(matmul-only {batch_n / a['mm_ms'] * 1e3:.0f})",
        "top matmuls (count x sig, train step):",
    ]
    for sig, cnt, fl, mxu, hbm in a["rows"][:top]:
        bound = "MXU" if mxu >= hbm else "HBM"
        lines.append(f"  {cnt}x {sig:<58} {fl / 1e9:9.1f} GF "
                     f"mxu {mxu:6.2f} hbm {hbm:6.2f} ms [{bound}]")
    lines.append("top non-matmul result traffic:")
    for name, by in a["other"][:8]:
        lines.append(f"  {name:<30} {by / 1e9:7.2f} GB "
                     f"= {by / (HBM_GBPS * 1e9) * 1e3:6.2f} ms")
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--only", default=None, help="substring filter on label")
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semanticsegmentation_tensorflow_tpu.config import DataConfig
    from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    cases = [
        # canonical (unpacked) configs — the MFU-denominator workloads
        ("fcn8s b16 384x1248 fc4096 (canonical)", "fcn8s", 16, 384, 1248, 2,
         dict(fc_features=4096, packed_stage1=False)),
        ("segnet b8 384x1248 (canonical)", "segnet", 8, 384, 1248, 2,
         dict(packed_stage1=False, packed_dec1=False, packed_dec2=False)),
        ("unet b8 384x1248 fullres (canonical)", "unet", 8, 384, 1248, 2,
         dict(packed_stage0=False)),
        ("unet b8 256x512 nc19 preset (canonical)", "unet", 8, 256, 512, 19,
         dict(packed_stage0=False)),
        ("deeplab os8 b8 384x1248", "deeplab", 8, 384, 1248, 2, {}),
        ("deeplab os16 b8 384x1248", "deeplab", 8, 384, 1248, 2,
         dict(output_stride=16)),
        # production (packed-default) configs — what the benches measure;
        # packed stages appear with their real 2x FLOPs at full lanes, so
        # these floors are what the measured step should be compared to.
        # (The Pallas fused stage1 is opaque to a jaxpr walk — the packed
        # jnp formulation is the close stand-in.)
        ("fcn8s b16 fc4096 (production packed)", "fcn8s", 16, 384, 1248, 2,
         dict(fc_features=4096, packed_stage1=True)),
        ("segnet b8 (production packed)", "segnet", 8, 384, 1248, 2,
         dict(packed_stage1=True, packed_dec1=True)),
        ("unet b8 256x512 nc19 preset (production packed)", "unet",
         8, 256, 512, 19, dict(packed_stage0=True)),
    ]
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    for label, name, n, h, w, nc, kw in cases:
        if args.only and args.only not in label:
            continue
        model = build_model(name, num_classes=nc, **kw)
        state = jax.eval_shape(
            lambda m=model, s=(n, h, w, 3): create_train_state(
                m, jax.random.key(0), s, make_optimizer("adam", 1e-4)))
        # make_train_step jits; grab the underlying body via make_jaxpr on
        # the jitted callable (jaxpr tracing ignores the jit wrapper)
        step = make_train_step(num_classes=nc, augment_fn=aug)
        rng = np.random.default_rng(0)
        batch = {
            "image": jax.ShapeDtypeStruct((n, h, w, 3), jnp.uint8),
            "label": jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        }
        print(report(label, n, analyze(step, state, batch), args.top))
        print()


if __name__ == "__main__":
    main()

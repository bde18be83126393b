#!/usr/bin/env python
"""A/B-bench one model's perf flags on the real chip.

    python tools/bench_flags.py --model segnet --batch 8 \
        --ab packed_dec1,packed_dec2

Runs the model's bench_train row once per flag combination (all-on,
all-off, and each flag alone) and prints the table — the measurement
harness behind every packed/winograd accept-or-reject decision
(ARCHITECTURE.md records the outcomes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="segnet")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--h", type=int, default=384)
    p.add_argument("--w", type=int, default=1248)
    p.add_argument("--nc", type=int, default=2)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--ab", required=True,
                   help="comma-separated boolean model kwargs to A/B; a "
                        "flag may carry explicit values as "
                        "name=v1|v2|... (json-parsed, e.g. "
                        "packed_stage0=false|true|\"mixed\")")
    p.add_argument("--base", default="{}",
                   help="json dict of fixed model kwargs")
    p.add_argument("--opt", default="{}",
                   help="json dict of make_optimizer kwargs applied to every "
                        "combo (e.g. '{\"mu_dtype\": \"bfloat16\"}')")
    args = p.parse_args()

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from benchmarks.all import bench_train

    base = json.loads(args.base)
    if "=" in args.ab:
        # explicit value sweep: one flag, each listed value is a combo
        if "," in args.ab:
            raise SystemExit("--ab: a value sweep (name=v1|v2) cannot be "
                             "combined with a comma flag list; put fixed "
                             "flags in --base instead")
        name, _, vals = args.ab.partition("=")
        combos = [{name: json.loads(v)} for v in vals.split("|")]
    else:
        flags = args.ab.split(",")
        combos = [dict.fromkeys(flags, True), dict.fromkeys(flags, False)]
        if len(flags) > 1:
            for f in flags:
                combos.append({k: (k == f) for k in flags})
    for combo in combos:
        kw = dict(base, **combo)
        tag = "+".join(k if v is True else f"{k}={v}"
                       for k, v in combo.items() if v) or "none"
        # compute_mfu=False: the roofline denominator is a per-config
        # constant — recounting it per flag combo would cost a multi-minute
        # tunneled compile each AND pollute canonical_flops.json with
        # FLOP-inflated packed variants (ADVICE r3). train_miou stays: it is
        # the free numerics fingerprint for the A/B.
        row = bench_train(args.model, args.batch, args.h, args.w,
                          args.steps, display=f"{args.model}[{tag}]",
                          num_classes=args.nc, compute_mfu=False,
                          opt_kwargs=json.loads(args.opt), **kw)
        print(row, flush=True)


if __name__ == "__main__":
    main()

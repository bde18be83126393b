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
                   help="comma-separated boolean model kwargs to A/B")
    p.add_argument("--base", default="{}",
                   help="json dict of fixed model kwargs")
    args = p.parse_args()

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from benchmarks.all import bench_train

    flags = args.ab.split(",")
    base = json.loads(args.base)
    combos = [dict.fromkeys(flags, True), dict.fromkeys(flags, False)]
    if len(flags) > 1:
        for f in flags:
            combos.append({k: (k == f) for k in flags})
    for combo in combos:
        kw = dict(base, **combo)
        tag = "+".join(k for k, v in combo.items() if v) or "none"
        row = bench_train(args.model, args.batch, args.h, args.w,
                          args.steps, display=f"{args.model}[{tag}]",
                          num_classes=args.nc, canon_kwargs=None, **kw)
        row.pop("canonical_gflop_per_img", None)
        row.pop("achieved_tflops", None)
        row.pop("mfu", None)
        print(row, flush=True)


if __name__ == "__main__":
    main()

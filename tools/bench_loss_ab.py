#!/usr/bin/env python
"""Bench one train row under the current SEG_LOSS_IMPL setting.

    SEG_LOSS_IMPL=binary python tools/bench_loss_ab.py --model segnet

One process per impl (the flag is read at trace time), serialized on the
chip by the caller's queue script — the harness behind the loss-layout
accept/reject decisions (nhwc vs cmajor round 5a, vs binary round 5b;
ARCHITECTURE.md records the outcomes). Prints one JSON line.
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
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--kwargs", default="{}",
                   help="json dict of model kwargs (defaults = shipping)")
    args = p.parse_args()

    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from benchmarks.all import bench_train

    impl = os.environ.get("SEG_LOSS_IMPL", "nhwc")
    r = bench_train(args.model, args.batch, args.h, args.w, steps=args.steps,
                    display=f"{args.model}_loss_{impl}",
                    num_classes=args.nc, compute_mfu=False,
                    **json.loads(args.kwargs))
    r["loss_impl"] = impl
    print(json.dumps(r))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-op TPU profile of a train step: which XLA ops burn the time.

Captures a jax.profiler trace of N train steps and aggregates the 'XLA Ops'
line of the TPU device plane from the raw .xplane.pb (the tensorboard
profile-plugin converter is broken against TF 2.21, so we parse the proto
directly via tensorflow.tsl).

    python tools/profile_step.py --model fcn8s --batch 16
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def aggregate_xplane(logdir: str) -> list[tuple[str, float, int]]:
    """[(op_name, total_ms, count)] from the TPU 'XLA Ops' line, descending."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for plane in xspace.planes:
        if "TPU" not in plane.name or "device:" not in plane.name.lower():
            if not plane.name.startswith("/device:TPU"):
                continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # ps -> ms
                counts[name] += 1
    return sorted(((n, t, counts[n]) for n, t in totals.items()),
                  key=lambda x: -x[1])


def group_ops(rows, n_steps):
    """Group fusions by a readable key: named-layer hints in the op name."""
    groups: dict[str, float] = defaultdict(float)
    for name, ms, _ in rows:
        key = name.split(".")[0]
        groups[key] += ms
    return sorted(((k, v / n_steps) for k, v in groups.items()),
                  key=lambda x: -x[1])


def main() -> None:
    from semanticsegmentation_tensorflow_tpu.config import DataConfig
    from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fcn8s")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--nc", type=int, default=2, help="num classes")
    p.add_argument("--model-kw", default="",
                   help="comma k=v model kwargs, e.g. fc_features=4096")
    args = p.parse_args()

    setup_runtime()
    from semanticsegmentation_tensorflow_tpu.config import parse_model_kw
    kw = parse_model_kw(args.model_kw)
    model = build_model(args.model, num_classes=args.nc, **kw)
    tx = make_optimizer("adam", 1e-4)
    b, h, w = args.batch, args.height, args.width
    state = create_train_state(model, jax.random.key(0), (b, h, w, 3), tx)
    dc = DataConfig()
    aug = make_augment_fn(dc.mean, dc.std, crop_size=None)
    step = make_train_step(num_classes=args.nc, augment_fn=aug)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 256, (b, h, w, 3), np.uint8)),
        "label": jnp.asarray(rng.integers(0, args.nc, (b, h, w), np.int32)),
    }
    # compile + warm
    state, out = step(state, batch)
    float(out["loss"])

    logdir = tempfile.mkdtemp(prefix="prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, out = step(state, batch)
        float(out["loss"])  # value-fetch sync (block_until_ready unreliable)

    rows = aggregate_xplane(logdir)
    dev_total = sum(t for _, t, _ in rows) / args.steps
    print(f"\ndevice total: {dev_total:.2f} ms/step "
          f"({args.batch / dev_total * 1000:.1f} img/s)\n")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms, cnt in rows[: args.top]:
        per = ms / args.steps
        print(f"{per:9.3f}  {per / dev_total * 100:5.1f}  {name} (x{cnt})")


if __name__ == "__main__":
    main()

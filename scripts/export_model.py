#!/usr/bin/env python
"""Export a trained checkpoint as a standalone AOT serving artifact.

    python scripts/export_model.py --preset fcn8s_kitti \
        --checkpoint-dir checkpoints --out fcn8s.segx

The ``.segx`` file carries the inference program as versioned StableHLO
(``jax.export``) for BOTH cpu and tpu by default, plus the weights — the
serving side needs no model code (infer/export.py:ExportedPredictor).
The reference has no deployment story beyond re-building the graph from
source + checkpoint (SURVEY.md §3.2); this is its TPU-native replacement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--out", default=None,
                   help="output path (default <preset>.segx)")
    p.add_argument("--model-kw", default=None)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets baked into the "
                        "artifact")
    p.add_argument("--batch-size", type=int, default=None,
                   help="pin a fixed batch (default: symbolic batch — one "
                        "artifact serves any batch size)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA params (checkpoint must be trained "
                        "with --ema-decay)")
    args = p.parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    import jax

    from semanticsegmentation_tensorflow_tpu.config import (
        get_preset, parse_model_kw,
    )
    from semanticsegmentation_tensorflow_tpu.infer.export import export_model
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import (
        create_abstract_state, make_optimizer,
    )

    cfg = get_preset(args.preset)
    dc = cfg.data
    model = build_model(args.model or cfg.model, num_classes=dc.num_classes,
                        **dict(cfg.model_kwargs,
                               **parse_model_kw(args.model_kw)))
    h, w = padded_input_hw(model, dc.image_size)
    state = create_abstract_state(model, (1, h, w, 3),
                                  make_optimizer("adam", 1e-4),
                                  ema=args.ema)
    state = CheckpointManager(args.checkpoint_dir).restore(state)
    variables = {"params": state.eval_params(args.ema)}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    out = args.out or f"{args.preset}.segx"
    meta = export_model(
        model, variables, dc.image_size, out, mean=dc.mean, std=dc.std,
        platforms=tuple(s for s in args.platforms.split(",") if s),
        batch_size=args.batch_size, num_classes=dc.num_classes)
    sz = os.path.getsize(out)
    print(f"wrote {out} ({sz / 1e6:.1f} MB): batch={meta['batch_mode']}"
          f" platforms={','.join(meta['platforms'])}"
          f" image_size={meta['image_size']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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
    p.add_argument("--int8", action="store_true",
                   help="export the post-training int8 program + int8 "
                        "weights (~4x smaller artifact; TPU int8 MXU path). "
                        "Calibrate with --calib-dir, else weight-only.")
    p.add_argument("--calib-dir", default=None,
                   help="directory of images (png/jpg) for --int8 "
                        "activation calibration")
    p.add_argument("--calib", type=int, default=16,
                   help="max calibration images read from --calib-dir")
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
    model_kwargs = dict(cfg.model_kwargs, **parse_model_kw(args.model_kw))
    if args.int8:
        # quantization intercepts nn.Conv calls — rebuild unpacked so every
        # conv is visible (same param tree; registry.quant_safe_kwargs)
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            merge_quant_safe_kwargs,
        )
        model_kwargs = merge_quant_safe_kwargs(args.model or cfg.model,
                                               model_kwargs)
    model = build_model(args.model or cfg.model, num_classes=dc.num_classes,
                        **model_kwargs)
    h, w = padded_input_hw(model, dc.image_size)
    state = create_abstract_state(model, (1, h, w, 3),
                                  make_optimizer("adam", 1e-4),
                                  ema=args.ema)
    state = CheckpointManager(args.checkpoint_dir).restore(state)
    variables = {"params": state.eval_params(args.ema)}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    apply_fn = None
    if args.int8:
        import glob

        from semanticsegmentation_tensorflow_tpu.infer import quant

        stride = getattr(model, "total_stride", 32)
        calib, qat_scales = None, None
        sp = os.path.join(args.checkpoint_dir, "qat_scales.json")
        if os.path.exists(sp):
            qat_scales = quant.load_act_scales(sp)
            print(f"int8: QAT scales from {sp}")
        elif args.calib_dir:
            paths = sorted(
                p for ext in ("png", "jpg", "jpeg")
                for p in glob.glob(os.path.join(args.calib_dir, f"*.{ext}"))
            )[:args.calib]
            if not paths:
                raise SystemExit(f"--calib-dir {args.calib_dir}: no images")
            calib = quant.calib_batches_from_files(
                paths, dc.image_size, dc.mean, dc.std, stride)
        variables, apply_fn, scales = quant.quantize_for_inference(
            model, variables, calib, (1, h, w, 3), act_scales=qat_scales)
        print(f"int8: {len(scales)} activation scales"
              + (" (weight-only)" if not scales else ""))

    out = args.out or f"{args.preset}.segx"
    meta = export_model(
        model, variables, dc.image_size, out, mean=dc.mean, std=dc.std,
        platforms=tuple(s for s in args.platforms.split(",") if s),
        batch_size=args.batch_size, num_classes=dc.num_classes,
        apply_fn=apply_fn)
    sz = os.path.getsize(out)
    print(f"wrote {out} ({sz / 1e6:.1f} MB): batch={meta['batch_mode']}"
          f" platforms={','.join(meta['platforms'])}"
          f" image_size={meta['image_size']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

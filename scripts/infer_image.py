#!/usr/bin/env python
"""Single-image inference (the reference's inference-on-image entry point).

    python scripts/infer_image.py --preset fcn8s_kitti --image um_000000.png \
        --checkpoint-dir checkpoints --out overlay.png
"""

from __future__ import annotations

import os
import sys

# runnable as `python scripts/<name>.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="overlay.png")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--ema", action="store_true",
                   help="use the EMA params (checkpoint must be trained "
                        "with --ema-decay)")
    p.add_argument("--model-kw", default=None,
                   help="comma-separated model kwargs (k=v) — must match "
                        "the flags the checkpoint was trained with")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 forward (activations "
                        "calibrated on the input image itself)")
    p.add_argument("--tiled", action="store_true",
                   help="native-resolution sliding-window inference: keep "
                        "the input at its own size and tile it with "
                        "overlapped windows of the training resolution "
                        "(probability-averaged seams) instead of resizing")
    p.add_argument("--tile-overlap", type=int, default=None,
                   help="overlap in px between tiles (default: tile/4)")
    args = p.parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from PIL import Image

    from semanticsegmentation_tensorflow_tpu.config import (
        get_preset, parse_model_kw,
    )
    from semanticsegmentation_tensorflow_tpu.infer import Predictor
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train.state import create_abstract_state
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import CheckpointManager
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    cfg = get_preset(args.preset)
    model_name = args.model or cfg.model
    dc = cfg.data
    model_kwargs = dict(cfg.model_kwargs, **parse_model_kw(args.model_kw))
    if args.int8:
        # quantization intercepts nn.Conv calls — rebuild unpacked so every
        # conv is visible (same param tree; registry.quant_safe_kwargs)
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            merge_quant_safe_kwargs,
        )
        model_kwargs = merge_quant_safe_kwargs(model_name, model_kwargs)
    model = build_model(model_name, num_classes=dc.num_classes,
                        **model_kwargs)
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    h, w = padded_input_hw(model, dc.image_size)

    tx = make_optimizer("adam", 1e-4)
    ckpt = CheckpointManager(args.checkpoint_dir)
    if ckpt.latest_step() is None:
        print("warning: no checkpoint found; using random weights",
              file=sys.stderr)
        from semanticsegmentation_tensorflow_tpu.train.state import (
            create_train_state,
        )
        state = create_train_state(model, jax.random.key(0), (1, h, w, 3), tx)
    else:
        # abstract template: restore without paying a throwaway init compile
        state = ckpt.restore(create_abstract_state(model, (1, h, w, 3), tx,
                                                   ema=args.ema))
    variables = {"params": state.eval_params(args.ema)}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    apply_fn = None
    if args.int8:
        from semanticsegmentation_tensorflow_tpu.infer import quant

        stride = getattr(model, "total_stride", 32)
        calib = quant.calib_batches_from_files(
            [args.image], dc.image_size, dc.mean, dc.std, stride)
        variables, apply_fn, scales = quant.quantize_for_inference(
            model, variables, calib, (1, h, w, 3))
        print(f"int8: {len(scales)} activation scales")
    if args.tiled:
        from semanticsegmentation_tensorflow_tpu.infer import TiledPredictor

        predictor = TiledPredictor(model, variables, dc.image_size,
                                   overlap=args.tile_overlap, mean=dc.mean,
                                   std=dc.std, alpha=args.alpha,
                                   apply_fn=apply_fn)
        img = np.asarray(Image.open(args.image).convert("RGB"))
        overlay, labels = predictor(img)
        print(f"tiled: input {img.shape[0]}x{img.shape[1]}, "
              f"grid {predictor.grid[0]}x{predictor.grid[1]} tiles of "
              f"{predictor._tile[0]}x{predictor._tile[1]}")
    else:
        predictor = Predictor(model, variables, dc.image_size,
                              mean=dc.mean, std=dc.std, alpha=args.alpha,
                              apply_fn=apply_fn)
        overlay, labels = predictor.predict_file(args.image)
    Image.fromarray(overlay).save(args.out)
    road_frac = float(np.mean(labels != 0))
    print(f"wrote {args.out} (non-background fraction {road_frac:.3f})")
    ckpt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

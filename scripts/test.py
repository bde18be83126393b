#!/usr/bin/env python
"""Test-set sweep: overlays for every testing/image_2 PNG to runs/<ts>/
(the reference's `test` entry point / save_inference_samples, SURVEY.md §3.2).

    python scripts/test.py --preset fcn8s_kitti --data-dir data_road
"""

from __future__ import annotations

import os
import sys

# runnable as `python scripts/<name>.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--runs-dir", default="runs")
    p.add_argument("--batch", type=int, default=1,
                   help="batch the sweep (reference mode is 1 image at a "
                        "time; batch 8 is ~2x device throughput)")
    p.add_argument("--model-kw", default=None,
                   help="comma-separated model kwargs (k=v) — must match "
                        "the flags the checkpoint was trained with")
    p.add_argument("--ema", action="store_true",
                   help="serve the EMA params (checkpoint must be trained "
                        "with --ema-decay)")
    p.add_argument("--mesh", action="store_true",
                   help="shard each inference batch over all devices "
                        "(1-D data mesh; params replicated) — multi-chip "
                        "batch-parallel serving. Pair with --batch >= the "
                        "device count.")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 serving (per-channel weights, "
                        "per-tensor activations calibrated on the first "
                        "--calib sweep images; TPU int8 MXU path)")
    p.add_argument("--calib", type=int, default=8,
                   help="calibration images for --int8 (0 = weight-only)")
    p.add_argument("--confidence", action="store_true",
                   help="KITTI road devkit SUBMISSION mode: write uint8 "
                        "road-confidence PNGs (round(P(road)*255), devkit "
                        "filename convention um_000000 -> um_road_000000) "
                        "instead of overlays (binary models only)")
    args = p.parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    import jax

    from semanticsegmentation_tensorflow_tpu.config import (
        get_preset, parse_model_kw,
    )
    from semanticsegmentation_tensorflow_tpu.data import KittiRoadDataset
    from semanticsegmentation_tensorflow_tpu.infer import (
        Predictor, save_inference_samples,
    )
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train.state import create_abstract_state
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import CheckpointManager
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

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
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    h, w = padded_input_hw(model, dc.image_size)

    state = create_abstract_state(model, (1, h, w, 3),
                                  make_optimizer("adam", 1e-4), ema=args.ema)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore(state)
    variables = {"params": state.eval_params(args.ema)}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    mesh = None
    if args.mesh and len(jax.devices()) > 1:
        from semanticsegmentation_tensorflow_tpu.parallel import (
            make_mesh, round_up_to_mesh,
        )

        mesh = make_mesh()
        print(f"mesh inference over {mesh.size} devices")
        if args.batch % mesh.size:
            args.batch = round_up_to_mesh(args.batch, mesh)
            print(f"note: --batch rounded up to {args.batch} "
                  "(must be a mesh multiple)")
    ds = KittiRoadDataset(args.data_dir or dc.data_dir, image_size=dc.image_size)
    apply_fn = None
    from semanticsegmentation_tensorflow_tpu.infer.quant import (
        warn_qat_fp_eval,
    )

    warn_qat_fp_eval(args.checkpoint_dir, args.int8, verb="running")
    if args.int8:
        from semanticsegmentation_tensorflow_tpu.infer import quant

        stride = getattr(model, "total_stride", 32)
        calib, qat_scales = None, None
        sp = os.path.join(args.checkpoint_dir, "qat_scales.json")
        if os.path.exists(sp):
            qat_scales = quant.load_act_scales(sp)
            print(f"int8: QAT scales from {sp}")
        elif args.calib > 0:
            calib = quant.calib_batches_from_files(
                ds.test_images[:args.calib], dc.image_size, dc.mean,
                dc.std, stride)
        variables, apply_fn, scales = quant.quantize_for_inference(
            model, variables, calib, (1, h, w, 3), act_scales=qat_scales)
        print(f"int8 serving: {len(scales)} activation scales"
              + (" (weight-only)" if not scales else ""))
    predictor = Predictor(model, variables, dc.image_size, mean=dc.mean,
                          std=dc.std, mesh=mesh, apply_fn=apply_fn)
    t0, n = time.perf_counter(), 0
    if args.confidence:
        # devkit submission sweep: batched confidence maps, L-mode PNGs
        from PIL import Image

        from semanticsegmentation_tensorflow_tpu.data.kitti import load_image

        out_dir = os.path.join(args.runs_dir,
                               time.strftime("%Y%m%d-%H%M%S") + "_conf")
        os.makedirs(out_dir, exist_ok=True)
        paths = list(ds.test_images)
        import numpy as np
        for i in range(0, len(paths), args.batch):
            chunk = paths[i:i + args.batch]
            imgs = np.stack([load_image(q, dc.image_size) for q in chunk])
            conf = predictor.confidence(imgs)
            for q, c in zip(chunk, conf):
                stem = os.path.splitext(os.path.basename(q))[0]
                parts = stem.split("_", 1)  # um_000000 -> um_road_000000
                name = (f"{parts[0]}_road_{parts[1]}" if len(parts) == 2
                        else f"{stem}_road")
                dst = os.path.join(out_dir, name + ".png")
                Image.fromarray(c, mode="L").save(dst)
                n += 1
                print(f"{q} -> {dst}")
    else:
        for src, dst in save_inference_samples(predictor, ds.test_images,
                                               args.runs_dir,
                                               batch_size=args.batch):
            n += 1
            print(f"{src} -> {dst}")
    dt = time.perf_counter() - t0
    if n:
        print(f"{n} images in {dt:.2f}s ({n / dt:.2f} img/s)")
    ckpt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

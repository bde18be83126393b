#!/usr/bin/env python
"""Evaluate mIoU / pixel accuracy on a labeled split.

The reference computes no metrics in-repo (KITTI road eval is offline;
SURVEY.md §5), but mIoU parity is the BASELINE.json target, so the framework
owns the metric end-to-end.

    python scripts/eval.py --preset fcn8s_kitti --data-dir data_road
"""

from __future__ import annotations

import os
import sys

# runnable as `python scripts/<name>.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--split", default=None,
                   help="labeled split to evaluate (default: 'val' for "
                        "cityscapes, 'train' for kitti_road, which has no "
                        "public val GT)")
    p.add_argument("--model-kw", default=None,
                   help="comma-separated model kwargs (k=v) — must match "
                        "the flags the checkpoint was trained with")
    p.add_argument("--mesh", action="store_true",
                   help="shard eval batches over all devices (1-D data "
                        "mesh, psum'd confusion matrix) — metrics exact "
                        "incl. the wrap-padded final batch (valid=0 rows)")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA params (checkpoint must be "
                        "trained with --ema-decay)")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation: horizontal-flip "
                        "probability averaging (add scales with "
                        "--tta-scales)")
    p.add_argument("--road-metrics", action="store_true",
                   help="also report the official KITTI road devkit "
                        "measures (MaxF / AP / precision / recall / FPR / "
                        "FNR at the best threshold) from the road-"
                        "confidence histogram (binary models only)")
    p.add_argument("--tta-scales", default=None,
                   help="comma-separated multi-scale TTA factors, e.g. "
                        "0.75,1.0,1.25 (implies --tta)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization (per-channel "
                        "weights, calibrated per-tensor activations — "
                        "infer/quant.py); reports the quantized metrics, "
                        "i.e. the accuracy fingerprint of the int8 "
                        "serving path")
    p.add_argument("--calib-batches", type=int, default=4,
                   help="calibration batches for --int8 (0 = weight-only "
                        "quantization)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-process (pod) eval: join the jax.distributed "
                        "group first (implies --mesh; see scripts/train.py)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    if args.distributed:
        from semanticsegmentation_tensorflow_tpu.parallel.launch import (
            initialize_distributed,
        )
        proc, nproc = initialize_distributed(
            args.coordinator, args.num_processes, args.process_id)
        args.mesh = True
        print(f"distributed: process {proc}/{nproc}")

    from semanticsegmentation_tensorflow_tpu.config import (
        get_preset, parse_model_kw,
    )
    from semanticsegmentation_tensorflow_tpu.data import (
        build_dataset, normalize_images,
    )
    from semanticsegmentation_tensorflow_tpu.data.pipeline import BatchLoader
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import make_eval_step
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import CheckpointManager
    from semanticsegmentation_tensorflow_tpu.train.metrics import SegMetrics
    from semanticsegmentation_tensorflow_tpu.train.state import (
        create_abstract_state, make_optimizer,
    )

    cfg = get_preset(args.preset)
    dc = cfg.data
    model_kwargs = dict(cfg.model_kwargs, **parse_model_kw(args.model_kw))
    if args.int8:
        # route every conv through nn.Conv so the interceptor sees them all
        # (production packed flags left 13 of 18 FCN convs unquantized)
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
    stride = getattr(model, "total_stride", 32)
    h, w = padded_input_hw(model, dc.image_size)

    state = create_abstract_state(model, (args.batch_size, h, w, 3),
                                  make_optimizer("adam", 1e-4),
                                  ema=args.ema)
    if args.distributed:
        # align before orbax's init broadcast (30 s gloo context window;
        # see scripts/train.py)
        from semanticsegmentation_tensorflow_tpu.parallel.launch import barrier
        barrier("pre_checkpoint_manager")
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore(state)
    if args.ema:
        state = state.replace(params=state.eval_params(True))
    print(f"evaluating checkpoint step {int(state.step)}"
          + (" (EMA params)" if args.ema else ""))

    split = args.split or ("val" if dc.dataset == "cityscapes" else "train")
    ds = build_dataset(dc.dataset, args.data_dir or dc.data_dir,
                       dc.image_size, split=split)
    print(f"evaluating split={split!r} ({len(ds.train_images)} images)")
    qapply = None
    # measured rationale lives on the helper (H4, 2026-08-19: loss 455 fp
    # vs 0.69 with scales applied)
    from semanticsegmentation_tensorflow_tpu.infer.quant import (
        warn_qat_fp_eval,
    )

    warn_qat_fp_eval(args.checkpoint_dir, args.int8, verb="evaluating")
    if args.int8:
        import numpy as np

        from semanticsegmentation_tensorflow_tpu.infer import quant

        variables = {"params": state.params}
        if jax.tree.leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        calib, qat_scales = None, None
        scales_path = os.path.join(args.checkpoint_dir, "qat_scales.json")
        if os.path.exists(scales_path):
            # a QAT run persisted its training grid — evaluate on it
            qat_scales = quant.load_act_scales(scales_path)
            print(f"int8: QAT scales from {scales_path}")
        elif args.calib_batches > 0:
            cl = BatchLoader(ds, args.batch_size, pad_multiple=stride,
                             drop_remainder=False)
            calib = []
            for i, b in enumerate(cl.epoch()):
                if i >= args.calib_batches:
                    break
                calib.append(np.asarray(
                    normalize_images(b["image"], dc.mean, dc.std)))
        qv, qapply, scales = quant.quantize_for_inference(
            model, variables, calib,
            (args.batch_size, h, w, 3), act_scales=qat_scales)
        state = state.replace(params=qv["params"], apply_fn=qapply)
        n_q = sum(1 for leaf in jax.tree.leaves(qv["params"])
                  if leaf.dtype == np.int8)
        print(f"int8: {n_q} convs quantized, {len(scales)} activation "
              "scales" + (" (weight-only)" if not scales else ""))
    mesh = None
    if args.mesh and len(jax.devices()) > 1:
        from semanticsegmentation_tensorflow_tpu.parallel import (
            make_mesh, replicate, round_up_to_mesh,
        )

        mesh = make_mesh()
        if args.batch_size % mesh.size:
            args.batch_size = round_up_to_mesh(args.batch_size, mesh)
            print(f"note: --batch-size rounded up to {args.batch_size} "
                  "(must be a mesh multiple)")
        state = replicate(state, mesh)
        print(f"mesh eval over {mesh.size} devices")
    loader = BatchLoader(ds, args.batch_size, pad_multiple=stride,
                         drop_remainder=False, mesh=mesh)
    # eval is deterministic: plain normalize, no RNG, no augment interface
    normalize = jax.jit(lambda b: dict(
        b, image=normalize_images(b["image"], dc.mean, dc.std)))
    if args.road_metrics and dc.num_classes != 2:
        print("note: --road-metrics needs a binary model; ignored")
        args.road_metrics = False
    if args.tta or args.tta_scales:
        from semanticsegmentation_tensorflow_tpu.infer.tta import (
            make_tta_eval_step,
        )
        scales = (tuple(float(s) for s in args.tta_scales.split(","))
                  if args.tta_scales else (1.0,))
        print(f"TTA eval: scales={list(scales)} flip=True")
        eval_step = make_tta_eval_step(model, dc.num_classes,
                                       scales=scales, flip=True, mesh=mesh,
                                       road_hist=args.road_metrics,
                                       apply_fn=qapply)
    else:
        eval_step = make_eval_step(dc.num_classes, mesh=mesh,
                                   road_hist=args.road_metrics)

    import numpy as np
    metrics = SegMetrics.zero(dc.num_classes)
    road_hist = np.zeros((2, 256), np.int64) if args.road_metrics else None
    for batch in loader.epoch():
        out = eval_step(state, normalize(batch))
        metrics = metrics.update(out["cm"], out["loss"])
        if road_hist is not None:
            road_hist += np.asarray(jax.device_get(out["road_hist"]),
                                    np.int64)
    s = {k: jax.device_get(v) for k, v in metrics.summary().items()}
    print(f"loss={float(s['loss']):.4f} miou={float(s['miou']):.4f} "
          f"pixel_acc={float(s['pixel_acc']):.4f} iou={s['iou'].tolist()}")
    if road_hist is not None:
        from semanticsegmentation_tensorflow_tpu.train.metrics import (
            kitti_road_metrics,
        )
        m = kitti_road_metrics(road_hist)
        print("kitti-road: "
              f"MaxF={m['maxf']:.4f} AP={m['ap']:.4f} "
              f"PRE={m['precision']:.4f} REC={m['recall']:.4f} "
              f"FPR={m['fpr']:.4f} FNR={m['fnr']:.4f} "
              f"@tau={m['threshold']:.3f}")
    ckpt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Train entry point (mirrors the reference's per-model train scripts).

    python scripts/train.py --preset fcn8s_kitti --data-dir data_road
    python scripts/train.py --model segnet --epochs 10 --synthetic

Unlike the reference (one script per model with constants baked in,
SURVEY.md §1), one CLI drives all models via dataclass configs/presets.
"""

from __future__ import annotations

import os
import sys

# runnable as `python scripts/<name>.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import tempfile

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None, help="override preset model")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated synthetic KITTI fixtures")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--image-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="override the preset's pre-pad resize size")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-schedule", default=None,
                   choices=["constant", "poly", "cosine"],
                   help="LR decay over the run (default: preset's, normally "
                        "constant — the reference's behavior; poly is the "
                        "DeepLab-paper schedule)")
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="linear LR warmup steps before the schedule")
    p.add_argument("--class-balance", action="store_true",
                   help="median-frequency class balancing (SegNet paper): "
                        "scan train GTs once, weight each class's loss by "
                        "median_freq/freq")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="track an exponential moving average of params "
                        "(e.g. 0.999) for eval/serving; restore tools then "
                        "need --ema to match the checkpoint structure")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into k sequential microbatches, "
                        "accumulate grads, one optimizer update — effective "
                        "batch without the activation memory (composes with "
                        "--remat and the mesh modes)")
    p.add_argument("--shard-opt", action="store_true",
                   help="ZeRO-1: shard the optimizer moments over the 1-D "
                        "data mesh (1/n moment memory per chip; each shard "
                        "updates its param slice, params all_gather)")
    p.add_argument("--scale-jitter", default=None,
                   help="comma-separated random-scale-augmentation set, "
                        "e.g. 0.75,1.0,1.25 — one scale drawn per step "
                        "(static-shape lax.switch; zoom-out pads with "
                        "valid=0). Not with --spatial or "
                        "--pallas-preprocess.")
    p.add_argument("--val-frac", type=float, default=0.0,
                   help="hold out this fraction of the train images as a "
                        "validation split (KITTI has no labeled val GT), "
                        "evaluated every --val-every epochs; val_loss/"
                        "val_miou land in the epoch summary + JSONL log")
    p.add_argument("--val-every", type=int, default=1,
                   help="epochs between validation passes (--val-frac)")
    p.add_argument("--keep-best", action="store_true",
                   help="also checkpoint to <checkpoint-dir>/best whenever "
                        "val mIoU improves (needs --val-frac)")
    p.add_argument("--color-jitter", default=None,
                   help="photometric augmentation magnitudes "
                        "'brightness,contrast,saturation' (e.g. "
                        "0.2,0.2,0.2) — per-example, fused elementwise "
                        "into the step (not with --pallas-preprocess)")
    p.add_argument("--loss", default="ce", choices=("ce", "focal"),
                   help="training loss: per-pixel CE (reference) or focal "
                        "(Lin et al. — down-weights easy dominant-class "
                        "pixels; same masked-sum SPMD-exact form)")
    p.add_argument("--focal-gamma", type=float, default=2.0,
                   help="focal-loss focusing exponent (gamma=0 == CE)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: fake-quantize conv "
                        "weights (per-channel int8 grid) and activations "
                        "(calibrated per-tensor grid) with straight-"
                        "through gradients, so int8 serving (--int8 / "
                        "export --int8) matches the trained forward. "
                        "Typically follows FP pretraining (--resume). "
                        "Scales persist to <ckpt>/qat_scales.json and are "
                        "auto-reused by eval/test/export --int8.")
    p.add_argument("--qat-calib-batches", type=int, default=4,
                   help="batches used to calibrate QAT activation scales "
                        "when qat_scales.json doesn't exist yet")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device (no shard_map) even with >1 device")
    p.add_argument("--distributed", action="store_true",
                   help="multi-process (pod) run: join the jax.distributed "
                        "group before touching devices. Coordinator/size/"
                        "rank come from --coordinator/--num-processes/"
                        "--process-id, SEG_* env vars, or TPU-pod "
                        "auto-detection (parallel/launch.py)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (process 0's host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--pallas-preprocess", action="store_true",
                   help="use the Pallas preprocess kernel for the "
                        "normalize leg (bit-identical to the XLA path)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard image height across N chips (2-D data x "
                        "spatial mesh; disables random crop)")
    p.add_argument("--loader-workers", type=int, default=0,
                   help="decode each batch on N threads (PNG decode "
                        "releases the GIL; scales the cold-epoch host "
                        "pipeline with cores; 0 = inline)")
    p.add_argument("--cache-gb", type=float, default=None,
                   help="RAM budget for the decoded-image cache (LRU; "
                        "default 2.0, 0 disables). Raise it to pin a large "
                        "dataset like Cityscapes fully in RAM")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--model-kw", default=None,
                   help="comma-separated k=v model kwargs overriding the "
                        "preset (perf flags etc.), e.g. "
                        "'packed_stage1=false,fc_features=4096'")
    p.add_argument("--vgg-weights", default=None,
                   help=".npz of pretrained VGG16 weights (canonical keys; "
                        "produce with tools/import_tf_vgg.py)")
    p.add_argument("--strict-import", action="store_true",
                   help="error unless every backbone param is covered by "
                        "--vgg-weights (parity imports)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    if args.distributed:
        from semanticsegmentation_tensorflow_tpu.parallel.launch import (
            initialize_distributed, is_primary,
        )
        proc, nproc = initialize_distributed(
            args.coordinator, args.num_processes, args.process_id)
        print(f"distributed: process {proc}/{nproc}, "
              f"{len(jax.local_devices())} local of "
              f"{len(jax.devices())} global devices")
    else:
        def is_primary() -> bool:
            return True

    from semanticsegmentation_tensorflow_tpu.config import get_preset
    from semanticsegmentation_tensorflow_tpu.data import (
        build_dataset, generate_synthetic_cityscapes, generate_synthetic_kitti,
        make_augment_fn, normalize_images,
    )
    from semanticsegmentation_tensorflow_tpu.data.pipeline import BatchLoader
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.parallel import (
        make_mesh, make_mesh_2d, replicate,
    )
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import CheckpointManager
    from semanticsegmentation_tensorflow_tpu.train.loop import train
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    cfg = get_preset(args.preset)
    if args.model:
        cfg = dataclasses.replace(cfg, model=args.model)
    tr = cfg.train
    if args.epochs is not None:
        tr = dataclasses.replace(tr, epochs=args.epochs)
    if args.batch_size is not None:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.lr is not None:
        tr = dataclasses.replace(tr, learning_rate=args.lr)
    if args.lr_schedule is not None:
        tr = dataclasses.replace(tr, lr_schedule=args.lr_schedule)
    if args.warmup_steps is not None:
        tr = dataclasses.replace(tr, warmup_steps=args.warmup_steps)
    if args.class_balance:
        tr = dataclasses.replace(tr, class_balance=True)
    if args.checkpoint_dir is not None:
        tr = dataclasses.replace(tr, checkpoint_dir=args.checkpoint_dir)
    if args.seed is not None:
        tr = dataclasses.replace(tr, seed=args.seed)
    cfg = dataclasses.replace(cfg, train=tr)
    dc = cfg.data
    if args.image_size is not None:
        dc = dataclasses.replace(dc, image_size=tuple(args.image_size),
                                 crop_size=None)
        cfg = dataclasses.replace(cfg, data=dc)

    data_dir = args.data_dir or dc.data_dir
    if args.synthetic:
        if dc.dataset == "cityscapes":
            data_dir = generate_synthetic_cityscapes(
                tempfile.mkdtemp(prefix="synth_cs_"),
                n_train=max(8, tr.batch_size),
                h=dc.image_size[0], w=dc.image_size[1])
        else:
            data_dir = generate_synthetic_kitti(
                tempfile.mkdtemp(prefix="synth_kitti_"),
                n_train=max(8, tr.batch_size),
                h=dc.image_size[0], w=dc.image_size[1])

    # validate data before any device work (TPU compiles take minutes; a bad
    # --data-dir should fail in milliseconds)
    ds = build_dataset(dc.dataset, data_dir, dc.image_size)
    val_ds = None
    if args.val_frac:
        from semanticsegmentation_tensorflow_tpu.data.pipeline import (
            subset_dataset,
        )
        paths = list(ds.train_images)
        k = max(1, int(round(len(paths) * args.val_frac)))
        if k >= len(paths):
            p.error(f"--val-frac {args.val_frac} leaves no training images")
        val_ds = subset_dataset(ds, paths[-k:])
        ds = subset_dataset(ds, paths[:-k])
        print(f"val split: {k} images held out, {len(paths) - k} train")
    elif args.keep_best:
        p.error("--keep-best needs --val-frac")
    n_train = len(ds.train_images)

    from semanticsegmentation_tensorflow_tpu.config import parse_model_kw
    model_kwargs = dict(cfg.model_kwargs, **parse_model_kw(args.model_kw))
    if args.spatial > 1:
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            merge_spmd_safe_kwargs,
        )
        model_kwargs = merge_spmd_safe_kwargs(cfg.model, model_kwargs)
    if args.qat:
        # QAT trains under the serving grid: fake-quant intercepts nn.Conv
        # calls, so the packed/fused paths (invisible to the interceptor)
        # must be off or most convs train un-quantized while int8 serving
        # (which rebuilds the same way) quantizes them all.
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            merge_quant_safe_kwargs,
        )
        model_kwargs = merge_quant_safe_kwargs(cfg.model, model_kwargs)
    model = build_model(cfg.model, num_classes=dc.num_classes, **model_kwargs)
    stride = getattr(model, "total_stride", 32)

    n_dev = len(jax.devices())
    if args.no_mesh or n_dev == 1:
        mesh, mesh_kind = None, "none"
    elif args.spatial > 1:
        mesh = make_mesh_2d(n_dev // args.spatial, args.spatial)
        mesh_kind = f"data{n_dev // args.spatial}xspatial{args.spatial}"
        if dc.crop_size is not None:
            # random crops gather across spatial shards; train at full size
            dc = dataclasses.replace(dc, crop_size=None)
            cfg = dataclasses.replace(cfg, data=dc)
            print("note: --spatial disables random crop (full-size training)")
    else:
        mesh, mesh_kind = make_mesh(), "1d-data"
    print(f"model={cfg.model} devices={n_dev} "
          f"mesh={mesh_kind} train_images={n_train}")

    cache_kw = {}
    if args.cache_gb is not None:
        if args.cache_gb <= 0:
            cache_kw["cache"] = False
        else:
            cache_kw["cache_bytes"] = int(args.cache_gb * (1 << 30))
    loader = BatchLoader(ds, tr.batch_size, pad_multiple=stride,
                         seed=tr.seed, mesh=mesh,
                         workers=args.loader_workers, **cache_kw)

    if args.pallas_preprocess and args.spatial > 1:
        # the Pallas normalize kernel cannot be partitioned by XLA's SPMD
        # partitioner through the 2-D (height-sharded) jit — unlike the 1-D
        # shard_map path where it runs per-shard; fall back explicitly
        print("note: --pallas-preprocess is unsupported with --spatial>1 "
              "(SPMD cannot partition through pallas_call); using XLA path")
        args.pallas_preprocess = False
    jitter = (tuple(float(s) for s in args.scale_jitter.split(","))
              if args.scale_jitter else None)
    if jitter and (args.spatial > 1 or args.pallas_preprocess):
        print("note: --scale-jitter needs the jnp augment path on an "
              "unsharded image; ignored")
        jitter = None
    color = (tuple(float(v) for v in args.color_jitter.split(","))
             if args.color_jitter else None)
    if color and args.pallas_preprocess:
        print("note: --color-jitter needs the jnp augment path; ignored")
        color = None
    if args.pallas_preprocess:
        from semanticsegmentation_tensorflow_tpu.ops.pallas.preprocess import (
            make_pallas_augment_fn,
        )
        aug = make_pallas_augment_fn(dc.mean, dc.std, crop_size=dc.crop_size,
                                     random_flip=dc.random_flip)
    else:
        aug = make_augment_fn(dc.mean, dc.std, crop_size=dc.crop_size,
                              random_flip=dc.random_flip,
                              scale_jitter=jitter, color_jitter=color)
        if jitter:
            print(f"scale jitter: {list(jitter)} (one scale per step)")
        if color:
            print(f"color jitter: b/c/s = {list(color)}")
    if dc.crop_size:
        h, w = dc.crop_size
    else:
        h = -(-dc.image_size[0] // stride) * stride
        w = -(-dc.image_size[1] // stride) * stride

    tx = make_optimizer(tr.optimizer, tr.learning_rate, tr.weight_decay,
                        schedule=tr.lr_schedule,
                        total_steps=tr.epochs * loader.steps_per_epoch(),
                        warmup_steps=tr.warmup_steps)
    if tr.lr_schedule != "constant" or tr.warmup_steps:
        print(f"lr schedule: {tr.lr_schedule} over "
              f"{tr.epochs * loader.steps_per_epoch()} steps"
              + (f" (+{tr.warmup_steps} warmup)" if tr.warmup_steps else ""))

    class_weights = None
    if tr.class_balance:
        from semanticsegmentation_tensorflow_tpu.data.pipeline import (
            class_pixel_counts,
        )
        from semanticsegmentation_tensorflow_tpu.train.loss import (
            median_frequency_weights,
        )
        class_weights = median_frequency_weights(
            class_pixel_counts(ds, dc.num_classes))
        print("class balance (median-frequency): "
              + " ".join(f"{float(wt):.3f}" for wt in class_weights))

    state = create_train_state(model, jax.random.key(tr.seed),
                               (tr.batch_size, h, w, 3), tx,
                               ema_decay=args.ema_decay)
    if args.vgg_weights:
        from semanticsegmentation_tensorflow_tpu.models.vgg16 import (
            load_npz_weights,
        )
        report: dict = {}
        state = state.replace(params=load_npz_weights(
            state.params, args.vgg_weights, strict=args.strict_import,
            report=report))
        print(f"imported {len(report['matched'])} VGG16 tensors from "
              f"{args.vgg_weights}"
              + (f"; unmatched backbone params: "
                 f"{report['unmatched_params']}"
                 if report["unmatched_params"] else ""))
    if args.distributed:
        # align processes BEFORE the first cross-process collective (the
        # orbax manager init broadcast): XLA's gloo context init has a
        # hard 30 s rendezvous window, and the work above (dataset scan,
        # state-init compile) can drift processes past it
        from semanticsegmentation_tensorflow_tpu.parallel.launch import barrier
        barrier("pre_checkpoint_manager")
    ckpt = CheckpointManager(tr.checkpoint_dir)
    if args.resume:
        state = ckpt.restore(state, warn_dropped=True)
        print(f"resumed at step {int(state.step)}")
    if args.qat:
        import numpy as np

        from semanticsegmentation_tensorflow_tpu.data import normalize_images
        from semanticsegmentation_tensorflow_tpu.infer import quant

        scales_path = os.path.join(tr.checkpoint_dir, "qat_scales.json")
        if os.path.exists(scales_path):
            scales = quant.load_act_scales(scales_path)
            print(f"QAT: {len(scales)} activation scales from {scales_path}")
        else:
            variables = {"params": state.params}
            if jax.tree.leaves(state.batch_stats):
                variables["batch_stats"] = state.batch_stats
            calib = []
            for i, b in enumerate(loader.epoch()):
                if i >= args.qat_calib_batches:
                    break
                calib.append(np.asarray(
                    normalize_images(b["image"], dc.mean, dc.std)))
            scales = quant.calibrate_act_scales(model, variables, calib)
            os.makedirs(tr.checkpoint_dir, exist_ok=True)
            quant.save_act_scales(scales_path, scales)
            print(f"QAT: calibrated {len(scales)} activation scales -> "
                  f"{scales_path}")
        state = state.replace(
            apply_fn=quant.make_fake_quant_apply(model, scales))
    shard_opt = False
    if mesh is not None:
        shard_opt = args.shard_opt and mesh_kind == "1d-data"
        if args.shard_opt and not shard_opt:
            print("note: --shard-opt needs the 1-D data mesh; ignored")
        if shard_opt:
            from semanticsegmentation_tensorflow_tpu.parallel import (
                shard_state_zero1,
            )
            state = shard_state_zero1(state, mesh)
            print("ZeRO-1: optimizer state sharded over "
                  f"{mesh.size} devices")
        else:
            state = replicate(state, mesh)

    from semanticsegmentation_tensorflow_tpu.train.loop import LoopHooks
    from semanticsegmentation_tensorflow_tpu.utils.logging import MetricsLogger

    # pod runs: every process executes the loop (collectives require it)
    # but only process 0 writes logs/prints — N processes appending to one
    # shared-FS JSONL interleave corruptly
    logger = (MetricsLogger(os.path.join(tr.checkpoint_dir, "logs"))
              if is_primary() else None)

    def log_step(step, m):
        if logger is None:
            return
        logger.log(step, m)
        print(f"step {step}: " + " ".join(
            f"{k}={float(v):.4f}" for k, v in m.items()))

    hooks = LoopHooks(
        on_log=log_step,
        # epoch summaries keyed by GLOBAL step under epoch/-prefixed tags so
        # they never collide with the per-step series
        on_epoch=lambda epoch, s: logger.log(
            s.get("step", epoch),
            {f"epoch/{k}": v for k, v in s.items()
             if (not hasattr(v, "ndim") or getattr(v, "ndim", 1) == 0)
             and k != "step"}) if logger is not None else None,
    )

    step_fn = make_train_step(dc.num_classes, mesh=mesh, augment_fn=aug,
                              remat=tr.remat, class_weights=class_weights,
                              grad_accum=args.grad_accum,
                              shard_opt=shard_opt,
                              state=state if shard_opt else None,
                              loss=args.loss, focal_gamma=args.focal_gamma)
    val_fn, best_ckpt = None, None
    if val_ds is not None:
        from semanticsegmentation_tensorflow_tpu.train import make_eval_step
        from semanticsegmentation_tensorflow_tpu.train.metrics import (
            SegMetrics,
        )

        vmesh = mesh if mesh_kind == "1d-data" else None
        if mesh is not None and vmesh is None:
            print("note: validation runs unsharded under this mesh")
        val_loader = BatchLoader(val_ds, tr.batch_size, pad_multiple=stride,
                                 drop_remainder=False, mesh=vmesh)
        veval = make_eval_step(dc.num_classes, mesh=vmesh)
        vnorm = jax.jit(lambda b: dict(
            b, image=normalize_images(b["image"], dc.mean, dc.std)))

        def val_fn(state):
            # opt_state may be ZeRO-1-sharded; eval only reads params
            est = state.replace(opt_state={})
            m = SegMetrics.zero(dc.num_classes)
            for b in val_loader.epoch():
                out = veval(est, vnorm(b))
                m = m.update(out["cm"], out["loss"])
            s = m.summary()
            return {"val_loss": float(jax.device_get(s["loss"])),
                    "val_miou": float(jax.device_get(s["miou"]))}

        if args.keep_best:
            best_ckpt = CheckpointManager(
                os.path.join(tr.checkpoint_dir, "best"), max_to_keep=1)

    state, summary = train(
        state, step_fn, loader.epoch, epochs=tr.epochs,
        num_classes=dc.num_classes, log_every=tr.log_every,
        checkpoint_every=tr.checkpoint_every, ckpt=ckpt, hooks=hooks,
        val_every=args.val_every, val_fn=val_fn, best_ckpt=best_ckpt)
    print("final:", {k: (v.tolist() if hasattr(v, "tolist") else v)
                     for k, v in summary.items()})
    if logger is not None:
        logger.close()
    if best_ckpt is not None:
        best_ckpt.close()
    ckpt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

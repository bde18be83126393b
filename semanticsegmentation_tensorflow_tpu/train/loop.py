"""The training loop: epochs x batches, metrics, checkpoints.

Maps to the reference's ``train_nn`` (SURVEY.md §3.1) but with the whole
step fused on device: the loop body is enqueue-only (async dispatch), metric
reads sync at the logging cadence, batches come prefetched from BatchLoader.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

import jax


from semanticsegmentation_tensorflow_tpu.train.metrics import SegMetrics
from semanticsegmentation_tensorflow_tpu.train.state import TrainState


@dataclass
class LoopHooks:
    on_log: Callable[[int, dict], None] = lambda step, m: print(
        f"step {step}: " + " ".join(
            f"{k}={float(v):.4f}" for k, v in m.items() if v.ndim == 0))
    on_epoch: Callable[[int, dict], None] = lambda epoch, m: None
    extra: list = field(default_factory=list)


def train(state: TrainState, train_step: Callable, batches_per_epoch: Callable[[], Iterable],
          *, epochs: int, num_classes: int, log_every: int = 10,
          checkpoint_every: int = 0, ckpt=None,
          hooks: LoopHooks | None = None,
          val_every: int = 0, val_fn: Callable | None = None,
          best_ckpt=None) -> tuple[TrainState, dict]:
    """Runs the loop; returns (final state, last epoch summary).

    ``val_fn(state) -> {"val_loss": .., "val_miou": ..}`` runs every
    ``val_every`` epochs (merged into the epoch summary and the JSONL
    log); when ``best_ckpt`` (a second CheckpointManager, conventionally
    ``<ckpt_dir>/best``) is given, the state is saved there whenever
    val_miou improves — the reference trains blind and keeps only the
    last weights (SURVEY.md §3.1); this adds the standard keep-best-
    by-validation protocol.
    """
    hooks = hooks or LoopHooks()
    summary: dict = {}
    best_miou = -1.0
    step = int(jax.device_get(state.step))
    for epoch in range(epochs):
        metrics = SegMetrics.zero(num_classes)
        t0, n_imgs = time.perf_counter(), 0
        for batch in batches_per_epoch():
            n_imgs += int(batch["label"].shape[0])
            state, out = train_step(state, batch)
            # a make_train_step(with_metrics=False) step emits no confusion
            # matrix; accumulate the loss alone (mIoU/acc then read 0 in the
            # epoch summary, matching the reference's loss-only train loop)
            if "cm" in out:
                metrics = metrics.update(out["cm"], out["loss"])
            else:
                metrics = metrics._replace(
                    loss_sum=metrics.loss_sum + out["loss"],
                    count=metrics.count + 1)
            step += 1
            if log_every and step % log_every == 0:
                hooks.on_log(step, {"loss": jax.device_get(out["loss"])})
            if checkpoint_every and ckpt is not None and step % checkpoint_every == 0:
                ckpt.save(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        summary = {k: jax.device_get(v) for k, v in metrics.summary().items()}
        summary["images_per_sec"] = n_imgs / dt if dt > 0 else 0.0
        summary["epoch"] = epoch
        summary["step"] = step  # global step, for log keying
        if val_fn is not None and val_every and (epoch + 1) % val_every == 0:
            vm = val_fn(state)
            summary.update(vm)
            miou = float(vm.get("val_miou", -1.0))
            if best_ckpt is not None and miou > best_miou:
                best_miou = miou
                best_ckpt.save(state)
                summary["val_best"] = best_miou
        hooks.on_epoch(epoch, summary)
    if ckpt is not None:
        ckpt.save(state, wait=True)
    return state, summary

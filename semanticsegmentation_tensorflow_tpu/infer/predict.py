"""Prediction + overlay writing (the reference's test / inference-on-image
entry points, SURVEY.md §3.2-3.3).

The whole per-image pipeline — normalize, pad to stride alignment, forward,
crop logits, argmax, colormap, alpha blend — is ONE jitted device program;
only uint8 pixels cross the host boundary in either direction. Overlays are
written to ``runs/<timestamp>/`` like the reference.
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Iterator, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data.augment import normalize_images
from semanticsegmentation_tensorflow_tpu.data.kitti import load_image
from semanticsegmentation_tensorflow_tpu.data.palette import KITTI_OVERLAY_PALETTE
from semanticsegmentation_tensorflow_tpu.ops.overlay import argmax_colormap_overlay
from semanticsegmentation_tensorflow_tpu.ops.shape import pad_to_multiple, crop_to


class Predictor:
    """Jitted forward + overlay for a fixed image size."""

    def __init__(self, model: nn.Module, variables: dict,
                 image_size: tuple[int, int],
                 mean: Sequence[float] = (123.68, 116.779, 103.939),
                 std: Sequence[float] = (58.393, 57.12, 57.375),
                 overlay_palette: np.ndarray = KITTI_OVERLAY_PALETTE,
                 alpha: float = 0.5,
                 use_pallas: bool | None = None):
        self.image_size = image_size
        stride = getattr(model, "total_stride", 32)
        palette = jnp.asarray(overlay_palette)
        mean = tuple(mean); std = tuple(std)
        if use_pallas is None:  # auto: the kernel targets TPU
            use_pallas = jax.devices()[0].platform == "tpu"
        if use_pallas:
            from semanticsegmentation_tensorflow_tpu.ops.pallas.overlay import (
                argmax_colormap_overlay_pallas,
            )
            overlay_fn = argmax_colormap_overlay_pallas
        else:
            overlay_fn = argmax_colormap_overlay

        def fwd(image_u8: jax.Array) -> tuple[jax.Array, jax.Array]:
            x = normalize_images(image_u8, mean, std)
            x = pad_to_multiple(x, stride)
            logits = model.apply(variables, x, train=False)
            logits = crop_to(logits, *image_size)
            return overlay_fn(image_u8, logits, palette, alpha)

        self._fwd = jax.jit(fwd)

    def __call__(self, image_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """[H,W,3] or [N,H,W,3] uint8 -> (overlay u8, labels i32), same rank."""
        squeeze = image_u8.ndim == 3
        if squeeze:
            image_u8 = image_u8[None]
        overlay, labels = self._fwd(jnp.asarray(image_u8))
        overlay, labels = np.asarray(overlay), np.asarray(labels)
        return (overlay[0], labels[0]) if squeeze else (overlay, labels)

    def predict_file(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        return self(load_image(path, self.image_size))


def save_inference_samples(predictor: Predictor, image_paths: Iterable[str],
                           runs_dir: str = "runs", prefetch: int = 2,
                           batch_size: int = 1,
                           ) -> Iterator[tuple[str, str]]:
    """Run the test sweep; writes overlay PNGs to runs/<timestamp>/.

    Yields (image_path, output_path) as each file lands (streaming, like the
    reference's generator, SURVEY.md §3.2) — but with the host PNG decode
    running in a prefetch thread so it overlaps the device forward pass
    instead of serializing with it. ``batch_size`` > 1 batches the device
    forward (the reference runs 1 image at a time; batch 8 is ~2x device
    throughput — benchmarks/results.json). A short final batch is padded by
    repetition and the padding discarded, so the compiled shape is stable.
    """
    import queue
    import threading

    from PIL import Image

    out_dir = os.path.join(runs_dir, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(out_dir, exist_ok=True)

    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))

    def producer() -> None:
        try:
            for p in image_paths:
                q.put((p, load_image(p, predictor.image_size)))
            q.put(None)
        except BaseException as e:  # propagate decode errors to the consumer
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()

    pending: list[tuple[str, np.ndarray]] = []
    done = False
    while not done:
        item = q.get()
        if item is None:
            done = True
        elif isinstance(item, BaseException):
            raise item
        else:
            pending.append(item)
        if not pending or (len(pending) < batch_size and not done):
            continue
        names = [p for p, _ in pending]
        imgs = np.stack([im for _, im in pending])
        n_real = len(names)
        if n_real < batch_size:  # pad the ragged tail to the compiled shape
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch_size - n_real, axis=0)])
        overlays, _ = predictor(imgs)
        for i in range(n_real):
            out_path = os.path.join(out_dir, os.path.basename(names[i]))
            Image.fromarray(overlays[i]).save(out_path)
            yield names[i], out_path
        pending = []

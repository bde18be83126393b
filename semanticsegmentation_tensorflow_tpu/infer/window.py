"""Sliding-window (tiled) inference for native-resolution images.

The reference resizes every input to the training resolution (SURVEY.md
§3.2's fixed-size placeholder), throwing away detail on larger images.
The standard segmentation answer is tiled inference: run the net on
overlapping fixed-size windows and average the per-window probabilities
where they overlap. TPU-first formulation:

* the tile grid for an (H, W) input is computed at TRACE time — tile
  offsets are Python ints, so the whole pipeline (extract tiles ->
  batched forward -> fold -> argmax) is ONE jitted program of static
  shapes. XLA sees `dynamic_slice`/`dynamic_update_slice` at constant
  offsets (free layout-wise) and a single batched conv DAG over
  [T, th, tw, 3] — the MXU-efficient shape it was trained at;
* overlaps average PROBABILITIES (softmax before fold, the TTA/MS-eval
  convention). Uniform window weighting: coverage counts divide out, and
  for argmax the divide is skipped entirely (positive scaling preserves
  the max);
* one compiled program per distinct input (H, W) — cached, like the
  Predictor's per-shape jit cache.

Composes with the int8 serving path (pass ``apply_fn`` from
infer/quant.make_apply + its quantized variables).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data.augment import normalize_images
from semanticsegmentation_tensorflow_tpu.data.palette import KITTI_OVERLAY_PALETTE
from semanticsegmentation_tensorflow_tpu.ops.overlay import argmax_colormap_overlay


def tile_offsets(full: int, tile: int, overlap: int) -> list[int]:
    """Static window start offsets covering [0, full) with >= ``overlap``
    px of overlap between neighbors; the last window is right-aligned so
    coverage is exact without padding."""
    if full <= tile:
        return [0]
    step = max(1, tile - overlap)
    offs = list(range(0, full - tile, step))
    offs.append(full - tile)
    return offs


class TiledPredictor:
    """Native-resolution inference by overlapped tiling.

    ``tile_size`` defaults to the training resolution (rounded up to the
    model's stride); ``overlap`` in pixels (default: a quarter tile) hides
    window-boundary artifacts — predictions in the overlap band are the
    probability average of both windows. ``__call__`` takes ONE [H, W, 3]
    uint8 image of any size >= a stride tile and returns (overlay,
    labels) at full resolution.
    """

    def __init__(self, model: nn.Module, variables: dict,
                 tile_size: tuple[int, int],
                 overlap: int | None = None,
                 mean: Sequence[float] = (123.68, 116.779, 103.939),
                 std: Sequence[float] = (58.393, 57.12, 57.375),
                 overlay_palette: np.ndarray = KITTI_OVERLAY_PALETTE,
                 alpha: float = 0.5,
                 apply_fn=None):
        stride = getattr(model, "total_stride", 32)
        rup = lambda v: -(-v // stride) * stride  # noqa: E731
        self._tile = (rup(tile_size[0]), rup(tile_size[1]))
        self._overlap = (min(self._tile) // 4 if overlap is None
                         else int(overlap))
        if not 0 <= self._overlap < min(self._tile):
            raise ValueError(f"overlap {self._overlap} must be in "
                             f"[0, {min(self._tile)})")
        self._mean, self._std = tuple(mean), tuple(std)
        self._palette = jnp.asarray(overlay_palette)
        self._alpha = alpha
        self._apply = apply_fn if apply_fn is not None else model.apply
        self._variables = jax.device_put(variables)
        self._cache: dict[tuple[int, int], object] = {}

    def _build(self, h: int, w: int):
        th, tw = self._tile
        ph, pw = max(h, th), max(w, tw)  # pad small inputs up to one tile
        ys = tile_offsets(ph, th, self._overlap)
        xs = tile_offsets(pw, tw, self._overlap)

        def fwd(variables, image_u8):
            x = normalize_images(image_u8[None], self._mean, self._std)[0]
            x = jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
            tiles = jnp.stack([
                jax.lax.dynamic_slice(x, (y, xo, 0), (th, tw, x.shape[-1]))
                for y in ys for xo in xs])
            logits = self._apply(variables, tiles, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            nc = probs.shape[-1]
            acc = jnp.zeros((ph, pw, nc), jnp.float32)
            for i, y in enumerate(ys):
                for j, xo in enumerate(xs):
                    tile_p = probs[i * len(xs) + j]
                    acc = jax.lax.dynamic_update_slice(
                        acc,
                        jax.lax.dynamic_slice(
                            acc, (y, xo, 0), (th, tw, nc)) + tile_p,
                        (y, xo, 0))
            acc = acc[:h, :w]  # uniform weights: argmax needs no divide
            overlay, labels = argmax_colormap_overlay(
                image_u8[None], acc[None], self._palette, self._alpha)
            return overlay[0], labels[0]

        return jax.jit(fwd)

    @property
    def grid(self):
        """(rows, cols) of the tile grid for the last-compiled shape —
        introspection/tests only."""
        return self._last_grid

    def __call__(self, image_u8: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
        if image_u8.ndim != 3:
            raise ValueError("TiledPredictor takes one [H, W, 3] image")
        h, w = image_u8.shape[:2]
        key = (h, w)
        if key not in self._cache:
            self._cache[key] = self._build(h, w)
        th, tw = self._tile
        ph, pw = max(h, th), max(w, tw)
        self._last_grid = (len(tile_offsets(ph, th, self._overlap)),
                           len(tile_offsets(pw, tw, self._overlap)))
        overlay, labels = self._cache[key](self._variables,
                                           jnp.asarray(image_u8))
        return np.asarray(overlay), np.asarray(labels)

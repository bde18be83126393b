"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; the same code compiles on TPU — exercised by bench/TPU runs)."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.ops.overlay import (
    argmax_colormap_overlay,
)
from semanticsegmentation_tensorflow_tpu.ops.pallas.overlay import (
    argmax_colormap_overlay_pallas,
)


def _inputs(n=2, h=64, w=128, c=3, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8))
    logits = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    palette = jnp.asarray(rng.integers(0, 255, (c, 3)).astype(np.uint8))
    return img, logits, palette


def test_overlay_kernel_matches_reference():
    img, logits, palette = _inputs()
    ref_overlay, ref_labels = argmax_colormap_overlay(img, logits, palette, 0.5)
    out_overlay, out_labels = argmax_colormap_overlay_pallas(
        img, logits, palette, 0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_labels), np.asarray(ref_labels))
    # uint8 rounding: allow off-by-one from fp order differences
    diff = np.abs(np.asarray(out_overlay).astype(int)
                  - np.asarray(ref_overlay).astype(int))
    assert diff.max() <= 1


def test_overlay_kernel_blend_class0_mode():
    img, logits, palette = _inputs(n=1, c=2, seed=3)
    ref, _ = argmax_colormap_overlay(img, logits, palette, 0.7, blend_class0=True)
    out, _ = argmax_colormap_overlay_pallas(img, logits, palette, 0.7,
                                            blend_class0=True, interpret=True)
    assert np.abs(np.asarray(out).astype(int) - np.asarray(ref).astype(int)).max() <= 1


def test_overlay_kernel_unaligned_height():
    # h=48 with row_tile=32 -> ragged last block
    img, logits, palette = _inputs(n=1, h=48, w=96, seed=5)
    ref, _ = argmax_colormap_overlay(img, logits, palette, 0.5)
    out, _ = argmax_colormap_overlay_pallas(img, logits, palette, 0.5,
                                            row_tile=32, interpret=True)
    assert np.abs(np.asarray(out).astype(int) - np.asarray(ref).astype(int)).max() <= 1

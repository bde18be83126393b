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


class TestPallasPreprocess:
    def _batch(self, n=4, h=48, w=64):
        rng = np.random.default_rng(7)
        return {
            "image": jnp.asarray(rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)),
            "label": jnp.asarray(rng.integers(0, 2, (n, h, w)).astype(np.int32)),
            "valid": jnp.asarray(np.ones((n, h, w), bool)),
        }

    def test_matches_jnp_augment_bitwise(self):
        from semanticsegmentation_tensorflow_tpu.data.augment import make_augment_fn
        from semanticsegmentation_tensorflow_tpu.ops.pallas.preprocess import (
            make_pallas_augment_fn,
        )
        mean, std = (120.0, 115.0, 100.0), (60.0, 55.0, 50.0)
        crop = (32, 48)
        key = jax.random.key(42)
        batch = self._batch()
        ref = make_augment_fn(mean, std, crop_size=crop)(key, batch)
        out = make_pallas_augment_fn(mean, std, crop_size=crop,
                                     interpret=True)(key, batch)
        np.testing.assert_array_equal(np.asarray(out["label"]),
                                      np.asarray(ref["label"]))
        np.testing.assert_array_equal(np.asarray(out["valid"]),
                                      np.asarray(ref["valid"]))
        np.testing.assert_allclose(np.asarray(out["image"]),
                                   np.asarray(ref["image"]), rtol=1e-6)

    def test_normalize_kernel_direct(self):
        from semanticsegmentation_tensorflow_tpu.ops.pallas.preprocess import (
            pallas_normalize,
        )
        img = self._batch()["image"]
        out = pallas_normalize(img, (10.0, 20.0, 30.0), (2.0, 4.0, 5.0),
                               interpret=True)
        assert out.shape == img.shape and out.dtype == jnp.float32
        ref = (np.asarray(img).astype(np.float32)
               - np.asarray([10.0, 20.0, 30.0])) / np.asarray([2.0, 4.0, 5.0])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    def test_pallas_augment_rejects_float_images(self):
        from semanticsegmentation_tensorflow_tpu.ops.pallas.preprocess import (
            make_pallas_augment_fn,
        )
        b = self._batch()
        b["image"] = b["image"].astype(jnp.float32)
        aug = make_pallas_augment_fn((0, 0, 0), (1, 1, 1), crop_size=(16, 16),
                                     interpret=True)
        import pytest
        with pytest.raises(TypeError):
            aug(jax.random.key(0), b)

"""Sliding-window (tiled) native-resolution inference (infer/window.py)."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.data.augment import normalize_images
from semanticsegmentation_tensorflow_tpu.infer.window import (
    TiledPredictor, tile_offsets,
)
from semanticsegmentation_tensorflow_tpu.models import build_model

jax.config.update("jax_platforms", "cpu")

MEAN = (123.68, 116.779, 103.939)
STD = (58.393, 57.12, 57.375)


class _Pointwise(nn.Module):
    """1x1-conv net: receptive field 1, stride 1 — tiling must be EXACT."""

    total_stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(nn.Conv(8, (1, 1), name="c0")(x))
        return nn.Conv(3, (1, 1), name="head")(x)


class TestOffsets:
    def test_cover_and_right_align(self):
        offs = tile_offsets(100, 40, 10)
        assert offs[0] == 0 and offs[-1] == 100 - 40
        # full coverage with >= requested overlap between neighbors
        for a, b in zip(offs, offs[1:]):
            assert b - a <= 40 - 10
        assert tile_offsets(30, 40, 10) == [0]  # input smaller than tile
        assert tile_offsets(40, 40, 10) == [0]  # exact fit


class TestTiled:
    def test_single_tile_equals_predictor(self):
        from semanticsegmentation_tensorflow_tpu.infer import Predictor

        model = build_model("unet", num_classes=2, base_features=8)
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 64, 3)))
        img = np.random.default_rng(0).integers(
            0, 255, (32, 64, 3)).astype(np.uint8)
        ov_a, lb_a = Predictor(model, v, (32, 64))(img)
        tiled = TiledPredictor(model, v, (32, 64))
        ov_b, lb_b = tiled(img)
        assert tiled.grid == (1, 1)
        np.testing.assert_array_equal(np.asarray(lb_a, np.int32),
                                      np.asarray(lb_b, np.int32))
        np.testing.assert_array_equal(ov_a, ov_b)

    def test_pointwise_model_tiling_is_exact(self):
        """Receptive field 1 -> per-pixel outputs are tiling-invariant:
        the overlapped average must reproduce the full-image argmax
        everywhere, seams included."""
        m = _Pointwise()
        v = m.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        img = np.random.default_rng(1).integers(
            0, 255, (50, 70, 3)).astype(np.uint8)
        tiled = TiledPredictor(m, v, (32, 32), overlap=8, mean=MEAN,
                               std=STD)
        ov, lb = tiled(img)
        assert tiled.grid[0] > 1 and tiled.grid[1] > 1  # real tiling
        x = normalize_images(jnp.asarray(img)[None], MEAN, STD)
        full = np.asarray(jnp.argmax(m.apply(v, x[0][None]), -1))[0]
        np.testing.assert_array_equal(np.asarray(lb, np.int32),
                                      full.astype(np.int32))
        assert ov.shape == img.shape

    def test_input_smaller_than_tile(self):
        m = _Pointwise()
        v = m.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)))
        img = np.random.default_rng(2).integers(
            0, 255, (20, 25, 3)).astype(np.uint8)
        ov, lb = TiledPredictor(m, v, (32, 32), mean=MEAN, std=STD)(img)
        assert ov.shape == (20, 25, 3) and lb.shape == (20, 25)

    def test_composes_with_int8(self):
        from semanticsegmentation_tensorflow_tpu.infer import quant

        model = build_model("unet", num_classes=2, base_features=8)
        shape = (1, 32, 32, 3)
        v = model.init(jax.random.key(3), jnp.zeros(shape))
        qv, apply_fn, _ = quant.quantize_for_inference(
            model, v, None, shape)  # weight-only
        img = np.random.default_rng(3).integers(
            0, 255, (48, 80, 3)).astype(np.uint8)
        ov, lb = TiledPredictor(model, qv, (32, 32), overlap=8,
                                apply_fn=apply_fn)(img)
        assert lb.shape == (48, 80) and np.isfinite(
            np.asarray(ov, np.float32)).all()

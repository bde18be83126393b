import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsegmentation_tensorflow_tpu.ops import (
    max_pool, max_pool_with_argmax, max_unpool, pad_to_multiple, crop_to,
    argmax_colormap_overlay,
)


class TestPooling:
    def test_max_pool_matches_naive(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 12, 3))
        out = max_pool(x, 2)
        ref = jnp.max(x.reshape(2, 4, 2, 6, 2, 3), axis=(2, 4))
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_argmax_pool_values_match_plain_pool(self):
        x = jax.random.normal(jax.random.key(1), (2, 16, 8, 4))
        pooled, idx = max_pool_with_argmax(x, 2)
        np.testing.assert_allclose(pooled, max_pool(x, 2), rtol=1e-6)
        assert idx.dtype == jnp.int8
        assert idx.shape == pooled.shape
        assert int(idx.max()) <= 3 and int(idx.min()) >= 0

    def test_unpool_roundtrip_places_max_correctly(self):
        # positive values: zero-fill elsewhere must not win the re-pool
        x = jnp.abs(jax.random.normal(jax.random.key(2), (1, 4, 4, 2))) + 0.1
        pooled, idx = max_pool_with_argmax(x, 2)
        un = max_unpool(pooled, idx, 2)
        # unpooled tensor: max value at original position, zero elsewhere
        assert un.shape == x.shape
        # re-pooling recovers the pooled values
        np.testing.assert_allclose(max_pool(un, 2), pooled, rtol=1e-6)
        # exactly one nonzero per window per channel
        nz = (un != 0).reshape(1, 2, 2, 2, 2, 2).sum(axis=(2, 4))
        assert int(nz.max()) == 1

    def test_unpool_ties_match_tf_first_index(self):
        # constant window -> TF argmax picks the first (row-major) element
        x = jnp.ones((1, 2, 2, 1))
        pooled, idx = max_pool_with_argmax(x, 2)
        assert int(idx[0, 0, 0, 0]) == 0
        un = max_unpool(pooled, idx, 2)
        np.testing.assert_array_equal(
            np.asarray(un[0, :, :, 0]), [[1, 0], [0, 0]])

    def test_unpool_gradient_flows_to_max_position_only(self):
        x = jax.random.normal(jax.random.key(3), (1, 4, 4, 1))

        def f(x):
            p, i = max_pool_with_argmax(x, 2)
            return jnp.sum(max_unpool(p, i, 2))

        g = jax.grad(f)(x)
        p, _ = max_pool_with_argmax(x, 2)
        # gradient is 1 exactly at argmax positions
        assert int((g != 0).sum()) == p.size

    def test_pool_rejects_unaligned(self):
        with pytest.raises(ValueError):
            max_pool_with_argmax(jnp.zeros((1, 5, 4, 1)), 2)


class TestShape:
    def test_pad_to_multiple_kitti(self):
        x = jnp.zeros((1, 375, 1242, 3))
        y = pad_to_multiple(x, 32)
        assert y.shape == (1, 384, 1248, 3)
        assert crop_to(y, 375, 1242).shape == x.shape

    def test_pad_noop_when_aligned(self):
        x = jnp.zeros((1, 64, 128, 3))
        assert pad_to_multiple(x, 32) is x

    def test_edge_padding_replicates(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
        y = pad_to_multiple(x, 4)
        np.testing.assert_allclose(y[0, 3, :, 0], x[0, 2, :, 0])


class TestOverlay:
    def test_overlay_blends_only_nonzero_classes(self):
        img = jnp.full((1, 4, 4, 3), 100, jnp.uint8)
        logits = jnp.zeros((1, 4, 4, 2)).at[0, :2, :, 1].set(10.0)
        palette = jnp.asarray([[0, 0, 0], [0, 255, 0]], jnp.uint8)
        overlay, labels = argmax_colormap_overlay(img, logits, palette, alpha=0.5)
        np.testing.assert_array_equal(np.asarray(labels[0, 0]), [1, 1, 1, 1])
        # class-1 rows: blended toward green
        assert int(overlay[0, 0, 0, 1]) == 177  # 100*0.5 + 255*0.5 = 177.5 -> clip
        assert int(overlay[0, 0, 0, 0]) == 50
        # class-0 rows: untouched
        np.testing.assert_array_equal(np.asarray(overlay[0, 3]),
                                      np.full((4, 3), 100, np.uint8))

    def test_overlay_batched_and_jittable(self):
        img = jnp.zeros((2, 8, 8, 3), jnp.uint8)
        logits = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
        palette = jnp.asarray(np.random.randint(0, 255, (3, 3)), jnp.uint8)
        f = jax.jit(lambda i, l: argmax_colormap_overlay(i, l, palette))
        overlay, labels = f(img, logits)
        assert overlay.shape == (2, 8, 8, 3) and overlay.dtype == jnp.uint8
        np.testing.assert_array_equal(
            np.asarray(labels), np.argmax(np.asarray(logits), -1))


def test_max_pool_hybrid_backward_matches_reduce_window_vjp():
    """The dense custom backward must equal XLA's select_and_scatter VJP."""
    from semanticsegmentation_tensorflow_tpu.ops.pool import _reduce_window_max
    x = jax.random.normal(jax.random.key(5), (2, 8, 12, 3))

    g1 = jax.grad(lambda t: jnp.sum(max_pool(t, 2) ** 2))(x)
    g2 = jax.grad(lambda t: jnp.sum(_reduce_window_max(t, 2, 2, "SAME") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_max_pool_hybrid_backward_tie_semantics():
    # constant window: select_and_scatter routes grad to the FIRST element;
    # the dense backward must match
    x = jnp.ones((1, 2, 2, 1))
    g = jax.grad(lambda t: jnp.sum(max_pool(t, 2)))(x)
    np.testing.assert_array_equal(np.asarray(g[0, :, :, 0]), [[1, 0], [0, 0]])

"""Numeric parity against TensorFlow — the reference's actual runtime.

The reference is TF (BASELINE.json); its op semantics are the parity target
("bit-comparable label maps"). These tests run the installed CPU TensorFlow
next to our JAX ops on identical inputs/weights:

  * conv2d SAME                  vs flax nn.Conv
  * conv2d_transpose SAME        vs flax ConvTranspose AND FastConvTranspose
  * max_pool_with_argmax         vs ops.max_pool_with_argmax (values + local
                                    index semantics incl. tie-breaking)
  * atrous (dilated) conv        vs kernel_dilation conv
  * softmax_cross_entropy        vs train.loss
  * bilinear resize              vs models.common.upsample_bilinear

TF import is slow on this 1-core host, so everything shares one module-scoped
import, and the suite skips cleanly if TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp
import flax.linen as nn

from semanticsegmentation_tensorflow_tpu.ops.fast_upsample import FastConvTranspose
from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool_with_argmax
from semanticsegmentation_tensorflow_tpu.train.loss import softmax_cross_entropy_loss

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


def test_conv2d_same_matches_tf():
    x = _rand(2, 13, 17, 5)
    k = _rand(3, 3, 5, 7)
    tf_out = tf.nn.conv2d(x, k, strides=1, padding="SAME").numpy()
    model = nn.Conv(7, (3, 3), padding="SAME", use_bias=False)
    jax_out = model.apply({"params": {"kernel": jnp.asarray(k)}},
                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jax_out), tf_out, rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("stride", [2, 8])
def test_conv2d_transpose_same_matches_tf(stride):
    """TF conv2d_transpose(kernel [kh, kw, OUT, IN]) == flax ConvTranspose
    (kernel [kh, kw, IN, OUT]) after a spatial flip + in/out axis swap
    (TF applies the gradient-of-conv convention; flax's default does not
    flip). Weight-import code must apply this mapping."""
    cin, cout, k = 3, 4, 2 * stride
    x = _rand(2, 6, 9, cin)
    kern = _rand(k, k, cout, cin)  # TF layout
    tf_out = tf.nn.conv2d_transpose(
        x, kern, output_shape=(2, 6 * stride, 9 * stride, cout),
        strides=stride, padding="SAME").numpy()

    # flip spatial axes, then [kh,kw,out,in] -> [kh,kw,in,out]
    jk = jnp.transpose(jnp.asarray(kern[::-1, ::-1]), (0, 1, 3, 2))
    ref = nn.ConvTranspose(cout, (k, k), strides=(stride, stride),
                           padding="SAME", use_bias=False)
    out_ref = ref.apply({"params": {"kernel": jk}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_ref), tf_out, rtol=2e-5,
                               atol=2e-5)

    fast = FastConvTranspose(cout, stride, use_bias=False, dtype=jnp.float32)
    out_fast = fast.apply({"params": {"kernel": jk}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_fast), tf_out, rtol=2e-5,
                               atol=2e-5)


def test_max_pool_with_argmax_matches_tf():
    x = _rand(2, 8, 12, 3)
    tf_pooled, tf_idx = tf.nn.max_pool_with_argmax(
        x, ksize=2, strides=2, padding="SAME")
    pooled, idx = max_pool_with_argmax(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(pooled), tf_pooled.numpy(),
                               rtol=1e-6)
    # TF returns flat indices into [H, W, C] (default include_batch=False);
    # convert ours (within-window row-major) to TF's flat convention
    n, hp, wp, c = pooled.shape
    ours = np.asarray(idx, np.int64)
    oy = np.arange(hp)[None, :, None, None] * 2 + ours // 2
    ox = np.arange(wp)[None, None, :, None] * 2 + ours % 2
    ch = np.arange(c)[None, None, None, :]
    flat = (oy * 12 + ox) * 3 + ch
    np.testing.assert_array_equal(flat, tf_idx.numpy())


def test_max_pool_argmax_tie_breaking_matches_tf():
    x = np.ones((1, 4, 4, 1), np.float32)  # all ties
    _, tf_idx = tf.nn.max_pool_with_argmax(x, 2, 2, "SAME")
    _, idx = max_pool_with_argmax(jnp.asarray(x), 2)
    # both pick the first (row-major) element of each window
    assert (np.asarray(idx) == 0).all()
    expected_first = np.asarray([[0, 2], [8, 10]]).reshape(1, 2, 2, 1)
    np.testing.assert_array_equal(tf_idx.numpy(), expected_first)


def test_atrous_conv_matches_tf():
    x = _rand(1, 16, 16, 4)
    k = _rand(3, 3, 4, 6)
    rate = 2
    tf_out = tf.nn.atrous_conv2d(x, k, rate=rate, padding="SAME").numpy()
    model = nn.Conv(6, (3, 3), kernel_dilation=(rate, rate), padding="SAME",
                    use_bias=False)
    jax_out = model.apply({"params": {"kernel": jnp.asarray(k)}},
                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jax_out), tf_out, rtol=2e-5,
                               atol=2e-5)


def test_softmax_cross_entropy_matches_tf():
    logits = _rand(2, 4, 6, 3)
    labels = RNG.integers(0, 3, (2, 4, 6))
    onehot = np.eye(3, dtype=np.float32)[labels]
    tf_ce = tf.nn.softmax_cross_entropy_with_logits(
        labels=onehot.reshape(-1, 3), logits=logits.reshape(-1, 3))
    tf_loss = float(tf.reduce_mean(tf_ce))
    ours = float(softmax_cross_entropy_loss(jnp.asarray(logits),
                                            jnp.asarray(onehot)))
    np.testing.assert_allclose(ours, tf_loss, rtol=1e-5)


def test_bilinear_resize_matches_tf():
    from semanticsegmentation_tensorflow_tpu.models.common import (
        upsample_bilinear,
    )
    x = _rand(1, 8, 8, 2)
    tf_out = tf.image.resize(x, (32, 32), method="bilinear").numpy()
    jax_out = upsample_bilinear(jnp.asarray(x), 4)
    # jax.image.resize 'bilinear' == TF resize half-pixel convention
    np.testing.assert_allclose(np.asarray(jax_out), tf_out, rtol=1e-4,
                               atol=1e-4)

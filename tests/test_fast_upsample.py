"""FastConvTranspose must equal flax ConvTranspose bit-for-bit (f32, CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsegmentation_tensorflow_tpu.ops.fast_upsample import FastConvTranspose


@pytest.mark.parametrize("stride,cin,cout,h,w", [
    (2, 2, 2, 6, 9),
    (2, 5, 3, 8, 8),
    (8, 2, 2, 6, 13),
    (4, 3, 7, 5, 5),
])
def test_matches_conv_transpose(stride, cin, cout, h, w):
    x = jax.random.normal(jax.random.key(0), (2, h, w, cin), jnp.float32)
    ref = nn.ConvTranspose(cout, (2 * stride, 2 * stride),
                           strides=(stride, stride), padding="SAME")
    vs = ref.init(jax.random.key(1), x)
    fast = FastConvTranspose(cout, stride, dtype=jnp.float32)
    y_ref = ref.apply(vs, x)
    y_fast = fast.apply(vs, x)  # same param names/shapes
    assert y_fast.shape == y_ref.shape == (2, h * stride, w * stride, cout)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    stride, cin, cout = 2, 3, 2
    x = jax.random.normal(jax.random.key(0), (1, 6, 6, cin), jnp.float32)
    ref = nn.ConvTranspose(cout, (4, 4), strides=(2, 2), padding="SAME")
    vs = ref.init(jax.random.key(1), x)
    fast = FastConvTranspose(cout, stride, dtype=jnp.float32)

    g_ref = jax.grad(lambda v: jnp.sum(ref.apply(v, x) ** 2))(vs)
    g_fast = jax.grad(lambda v: jnp.sum(fast.apply(v, x) ** 2))(vs)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

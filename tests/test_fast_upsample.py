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


@pytest.mark.parametrize("cin,cout,h,w", [
    (5, 3, 6, 9),
    (128, 64, 4, 7),
])
def test_fast_conv_transpose_2x2_matches_flax(cin, cout, h, w):
    """fast_conv_transpose_2x2 (the U-Net up1..up{d} fast path) ==
    nn.ConvTranspose(F, (2,2), strides=(2,2), SAME) on the same params."""
    from semanticsegmentation_tensorflow_tpu.ops.fast_upsample import (
        fast_conv_transpose_2x2,
    )
    x = jax.random.normal(jax.random.key(0), (2, h, w, cin), jnp.float32)
    ref = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), padding="SAME")
    vs = ref.init(jax.random.key(1), x)
    y_ref = ref.apply(vs, x)
    y_fast = fast_conv_transpose_2x2(x, vs["params"]["kernel"],
                                     vs["params"]["bias"], jnp.float32)
    assert y_fast.shape == y_ref.shape == (2, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_unet_fast_upconv_matches():
    """UNet(fast_upconv=True): identical param tree, equal logits."""
    from semanticsegmentation_tensorflow_tpu.models.unet import UNet

    kw = dict(num_classes=3, base_features=8, depth=3, dtype=jnp.float32,
              packed_stage0=False)
    x = jax.random.normal(jax.random.key(0), (1, 16, 24, 3))
    base = UNet(fast_upconv=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    fast = UNet(fast_upconv=True, **kw)
    vs2 = fast.init(jax.random.key(1), x, train=False)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    y0 = base.apply(vs, x, train=False)
    y1 = fast.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


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

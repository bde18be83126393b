"""Fused Pallas Winograd kernels vs the jnp oracle (interpret mode on the
CPU test env — the same kernels compile for TPU; value/grad equality here
pins the kernel's math, tolerance covers dot summation order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
    eligible, winograd_conv3x3, winograd_conv_bias_relu,
)
from semanticsegmentation_tensorflow_tpu.ops.winograd import (
    direct_conv2d, winograd_conv2d_ref,
)


def _data(key, n, h, w, c, co, dtype=jnp.float32):
    kx, kw, kb = jax.random.split(jax.random.key(key), 3)
    x = jax.random.normal(kx, (n, h, w, c), jnp.float32).astype(dtype)
    wgt = 0.3 * jax.random.normal(kw, (3, 3, c, co), jnp.float32)
    b = 0.1 * jax.random.normal(kb, (co,), jnp.float32)
    return x, wgt, b


@pytest.mark.parametrize("variant", ["f2", "f4"])
@pytest.mark.parametrize("n,h,w,c,co", [
    (2, 8, 16, 8, 8),      # multi-row-block grid
    (1, 4, 8, 8, 16),      # single block, cin != cout
    (16, 8, 8, 8, 8),      # batch tiling (nt=8 divides 16)
])
def test_fwd_matches_reference(variant, n, h, w, c, co):
    x, wgt, _ = _data(0, n, h, w, c, co)
    got = winograd_conv3x3(x, wgt, variant, True)
    want = direct_conv2d(x, wgt)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("variant", ["f2", "f4"])
def test_fwd_bias_relu_matches_reference(variant):
    x, wgt, b = _data(1, 2, 8, 12, 8, 8)
    got = winograd_conv_bias_relu(x, wgt, b, variant, True)
    want = jax.nn.relu(direct_conv2d(x, wgt) + b)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("variant", ["f2", "f4"])
def test_grads_match_direct(variant):
    """dx/dw/db of the fused op == the direct conv+bias+relu layer's
    gradients (the custom VJP routes dx through the rotated-kernel fwd
    kernel and dw through the V^T dM accumulation kernel)."""
    x, wgt, b = _data(2, 2, 8, 8, 8, 8)

    def fused(x, w, b):
        return jnp.sum(jnp.sin(
            winograd_conv_bias_relu(x, w, b, variant, True)
            .astype(jnp.float32)))

    def direct(x, w, b):
        return jnp.sum(jnp.sin(jax.nn.relu(direct_conv2d(x, w) + b)))

    g1 = jax.grad(fused, argnums=(0, 1, 2))(x, wgt, b)
    g2 = jax.grad(direct, argnums=(0, 1, 2))(x, wgt, b)
    for a, bb, name in zip(g1, g2, "x w b".split()):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(bb, np.float32),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_raw_conv_grads_match_direct():
    """The deferred-bias form (no epilogue): dx and dw only."""
    x, wgt, _ = _data(3, 1, 8, 8, 8, 8)

    def fused(x, w):
        return jnp.sum(jnp.cos(
            winograd_conv3x3(x, w, "f2", True).astype(jnp.float32)))

    def direct(x, w):
        return jnp.sum(jnp.cos(direct_conv2d(x, w)))

    g1 = jax.grad(fused, argnums=(0, 1))(x, wgt)
    g2 = jax.grad(direct, argnums=(0, 1))(x, wgt)
    for a, b, name in zip(g1, g2, "x w".split()):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_bf16_kernel_matches_bf16_reference():
    """In the production dtype, the kernel equals the bf16-MXU reference
    (same transform-f32 / contract-bf16 policy) to bf16 resolution."""
    x, wgt, _ = _data(4, 2, 8, 8, 8, 8, dtype=jnp.bfloat16)
    got = np.asarray(winograd_conv3x3(x, wgt, "f2", True), np.float32)
    want = np.asarray(winograd_conv2d_ref(
        x.astype(jnp.float32), wgt, "f2", mxu_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_eligibility_gate():
    assert eligible((16, 192, 624, 128), (3, 3, 128, 128))
    assert not eligible((16, 192, 624, 64), (3, 3, 64, 128))   # half lanes
    assert not eligible((16, 191, 624, 128), (3, 3, 128, 128))  # H % m
    assert not eligible((16, 24, 78, 512), (3, 3, 512, 512), "f4")  # W % 4
    assert eligible((16, 24, 78, 512), (3, 3, 512, 512), "f2")


# ---------------------------------------------------------------------------
# model integration: the flag changes the program, never the parameters
# ---------------------------------------------------------------------------

def test_convblock_winograd_same_params_and_values():
    """ConvBlock(winograd='f2') == ConvBlock() at 128 lanes: identical
    param tree AND init values (same flax paths -> same init rng), outputs
    equal to winograd tolerance, grads flow to canonical params."""
    from semanticsegmentation_tensorflow_tpu.models.common import ConvBlock

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 128), jnp.float32)
    ref = ConvBlock(128, n_convs=2, dtype=jnp.float32)
    win = ConvBlock(128, n_convs=2, winograd="f2", dtype=jnp.float32)
    vr = ref.init(jax.random.key(1), x)
    vw = win.init(jax.random.key(1), x)
    assert jax.tree.structure(vr) == jax.tree.structure(vw)
    for a, b in zip(jax.tree.leaves(vr), jax.tree.leaves(vw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    yr = ref.apply(vr, x)
    yw = win.apply(vr, x)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yr),
                               rtol=2e-3, atol=2e-3)

    gr = jax.grad(lambda v: jnp.sum(jnp.sin(ref.apply(v, x))))(vr)
    gw = jax.grad(lambda v: jnp.sum(jnp.sin(win.apply(v, x))))(vr)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_pooled_convblock_winograd_matches():
    """PooledConvBlock with winograd: inner convs fused-epilogue, last conv
    raw with the bias+relu still deferred past the pool."""
    from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
        PooledConvBlock,
    )

    x = jax.random.normal(jax.random.key(2), (1, 8, 8, 128), jnp.float32)
    ref = PooledConvBlock(128, n_convs=2, dtype=jnp.float32)
    win = PooledConvBlock(128, n_convs=2, winograd="f2", dtype=jnp.float32)
    v = ref.init(jax.random.key(3), x)
    assert (jax.tree.structure(v)
            == jax.tree.structure(win.init(jax.random.key(3), x)))
    np.testing.assert_allclose(np.asarray(win.apply(v, x)),
                               np.asarray(ref.apply(v, x)),
                               rtol=2e-3, atol=2e-3)


def test_fcn8s_winograd_param_tree_identical():
    """The model flag is checkpoint-neutral (abstract init only — no
    compute; the real-value equivalence is the module tests above)."""
    from semanticsegmentation_tensorflow_tpu.models import FCN8s

    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    t1 = jax.eval_shape(FCN8s(num_classes=2, fc_features=64).init,
                        jax.random.key(0), x)
    t2 = jax.eval_shape(
        FCN8s(num_classes=2, fc_features=64, winograd="f2").init,
        jax.random.key(0), x)
    assert jax.tree.structure(t1) == jax.tree.structure(t2)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("name,kw", [
    ("segnet", {}), ("unet", {}), ("deeplab", {}),
    ("deeplab", {"output_stride": 16}),
])
def test_all_models_winograd_checkpoint_neutral(name, kw):
    """winograd='f2' never changes any model's param tree (abstract init)."""
    from semanticsegmentation_tensorflow_tpu.models import build_model

    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    t1 = jax.eval_shape(build_model(name, num_classes=3, **kw).init,
                        jax.random.key(0), x)
    t2 = jax.eval_shape(
        build_model(name, num_classes=3, winograd="f2", **kw).init,
        jax.random.key(0), x)
    assert jax.tree.structure(t1) == jax.tree.structure(t2)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        assert a.shape == b.shape and a.dtype == b.dtype

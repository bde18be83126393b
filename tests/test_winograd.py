"""Winograd F(m,3) reformulation: exactness vs the direct conv (the
semantic workload), gradient exactness, and the bf16 numerics bound the
production kernel relies on (VERDICT r2 #1: "transform in f32, per-tile
error bounds vs the direct conv")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.ops.winograd import (
    VARIANTS, direct_conv2d, rot180_swap, transform_kernel,
    winograd_conv2d_ref,
)


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.key(key), shape,
                                     dtype=jnp.float32)


@pytest.mark.parametrize("variant", ["f2", "f4"])
@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 8, 8),        # tile-aligned
    (10, 14, 8, 16),     # needs output-tile padding both dims
    (4, 78, 8, 8),       # stage5-like non-multiple-of-4 width
])
def test_winograd_matches_direct_conv_f32(variant, h, w, cin, cout):
    x = _rand(0, (2, h, w, cin))
    k = _rand(1, (3, 3, cin, cout), scale=0.3)
    got = winograd_conv2d_ref(x, k, variant)
    want = direct_conv2d(x, k)
    # identical math up to f32 summation order; the transform amplifies
    # rounding by the B/A row sums, hence the loose-ish f32 tolerance
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["f2", "f4"])
def test_winograd_gradients_match_direct_conv(variant):
    """Autodiff through the reference equals the direct conv's gradients
    (same reformulation holds for dx and dw — the Pallas backward reuses
    exactly this structure)."""
    x = _rand(2, (1, 8, 12, 8))
    k = _rand(3, (3, 3, 8, 8), scale=0.3)

    def loss_w(f):
        return lambda xx, kk: jnp.sum(jnp.sin(f(xx, kk)))

    gx1, gk1 = jax.grad(loss_w(
        lambda xx, kk: winograd_conv2d_ref(xx, kk, variant)),
        argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_w(direct_conv2d), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx1, gx2, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(gk1, gk2, rtol=3e-4, atol=3e-4)


def test_rot180_swap_computes_input_gradient():
    """SAME-conv of the cotangent with rot180_swap(w) IS dx — the identity
    the fused backward uses to reuse the forward kernel."""
    x = _rand(4, (1, 8, 8, 8))
    k = _rand(5, (3, 3, 8, 8), scale=0.3)
    g = _rand(6, (1, 8, 8, 8))
    _, vjp = jax.vjp(lambda xx: direct_conv2d(xx, k), x)
    (dx,) = vjp(g)
    dx2 = direct_conv2d(g, rot180_swap(k))
    np.testing.assert_allclose(dx, dx2, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant,max_ratio", [("f2", 2.5), ("f4", 9.0)])
def test_bf16_winograd_error_bounded_vs_bf16_direct(variant, max_ratio):
    """The production precision policy: transforms in f32, contraction in
    bf16. The resulting error vs the f32 direct conv must stay within a
    bounded factor of the bf16 DIRECT conv's own error. Measured 2026-08-17
    (white-noise inputs, the worst case): f2 ~1.7x (numerically free),
    f4 mixed-points ~7.2x (why f2 is the default and f4 is opt-in);
    realistic post-relu activations measure lower for both."""
    x = _rand(7, (2, 16, 16, 64))
    k = _rand(8, (3, 3, 64, 64), scale=0.2)
    exact = direct_conv2d(x, k)
    scale = float(jnp.std(exact)) + 1e-30

    err_direct = float(jnp.sqrt(jnp.mean(
        (direct_conv2d(x, k, dtype=jnp.bfloat16) - exact) ** 2))) / scale
    err_wino = float(jnp.sqrt(jnp.mean(
        (winograd_conv2d_ref(x, k, variant, mxu_dtype=jnp.bfloat16)
         - exact) ** 2))) / scale
    assert err_wino < max_ratio * max(err_direct, 1e-6), \
        (variant, err_wino, err_direct)
    assert err_wino < 2.5e-2  # genuinely small relative to the signal


def _relrms(got, want):
    scale = float(jnp.std(want)) + 1e-30
    return float(jnp.sqrt(jnp.mean(
        (jnp.asarray(got, jnp.float32) - want) ** 2))) / scale


@pytest.mark.parametrize("r,h,w", [(7, 12, 39), (7, 8, 8), (5, 10, 14),
                                   (9, 9, 12)])
def test_decomposed_large_kernel_matches_direct(r, h, w):
    """fc6's 7x7 (and generic odd r>=5) via the F(3,3) Winograd-domain
    tile conv: error vs the f32 direct conv stays within a bounded factor
    of the bf16 direct conv's own error (measured ~3.1-3.8x with the
    scanned point set — why it replaces the rejected F(2,7))."""
    from semanticsegmentation_tensorflow_tpu.ops.winograd import (
        winograd_conv_large,
    )
    x = _rand(10, (2, h, w, 16))
    k = _rand(11, (r, r, 16, 24), scale=0.1)
    b = _rand(12, (24,), scale=0.1)
    exact = jax.nn.relu(direct_conv2d(x, k) + b)
    err_direct = _relrms(
        jax.nn.relu(direct_conv2d(x, k, dtype=jnp.bfloat16)
                    + b.astype(jnp.bfloat16)), exact)
    got = winograd_conv_large(x.astype(jnp.bfloat16), k, b)
    assert got.dtype == jnp.bfloat16
    err = _relrms(got, exact)
    # measured ratios: ~3.1-3.8x at r=7 (the production fc6 case), ~5.1x
    # at r=5 (kernel padded to 6 -> quarter of each block is zeros)
    assert err < 6.0 * max(err_direct, 1e-6), (err, err_direct)
    assert err < 1.5e-2


def test_decomposed_large_kernel_exact_in_f32():
    """The tile-conv decomposition is algebraically exact: with f32
    contraction inputs it reproduces the direct conv to f32 roundoff."""
    from semanticsegmentation_tensorflow_tpu.ops.winograd import (
        _dwm_conv_raw, VARIANTS,
    )
    x = _rand(20, (1, 10, 13, 8))
    k = _rand(21, (7, 7, 8, 8), scale=0.2)
    got, _ = _dwm_conv_raw(x, k, VARIANTS["f3"], mxu_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(direct_conv2d(x, k)),
                               rtol=3e-4, atol=3e-4)


def test_decomposed_large_kernel_gradients():
    """Custom-VJP blocks + autodiff strips together produce the direct
    conv's gradients (bf16-grade tolerance — the contraction dtype).
    relu=False: near-zero relu mask flips between bf16 and f32 forwards
    would dominate the comparison (an inherent threshold effect of ANY
    reduced-precision conv, not a property of this decomposition)."""
    from semanticsegmentation_tensorflow_tpu.ops.winograd import (
        winograd_conv_large,
    )
    x = _rand(13, (1, 8, 10, 8))
    k = _rand(14, (7, 7, 8, 8), scale=0.1)
    b = _rand(15, (8,), scale=0.1)

    def loss(f):
        return lambda xx, kk, bb: jnp.sum(
            jnp.sin(f(xx, kk, bb).astype(jnp.float32)))

    gx1, gk1, gb1 = jax.grad(
        loss(lambda xx, kk, bb: winograd_conv_large(
            xx.astype(jnp.bfloat16), kk, bb, relu=False)),
        argnums=(0, 1, 2))(x, k, b)
    gx2, gk2, gb2 = jax.grad(
        loss(lambda xx, kk, bb: direct_conv2d(xx, kk) + bb),
        argnums=(0, 1, 2))(x, k, b)
    # bf16-grade bounds at F(3,3) amplification (~3x the direct-bf16
    # error; tiny 8-channel tensors make the relative noise floor high)
    assert _relrms(gx1.astype(jnp.float32), gx2) < 4e-2
    assert _relrms(gk1, gk2) < 4e-2
    # db is an exact sum of the cotangent, but the cotangent itself is
    # cos(y) of the bf16-decomposed forward — same error class as gx/gk
    assert _relrms(gb1, gb2) < 4e-2


def test_variant_tables_are_exact():
    """The Toom-Cook builder already asserts the algebra at import; spot
    check shapes and the known F(2,3) matrices here."""
    f2 = VARIANTS["f2"]
    assert (f2.m, f2.a) == (2, 4)
    # the defining numerics property of the f2 default: 0/+-1 entries only
    # in both data-side transforms (no bf16 amplification)
    assert set(np.unique(np.abs(f2.BT))) <= {0.0, 1.0}
    assert set(np.unique(np.abs(f2.AT))) <= {0.0, 1.0}
    f4 = VARIANTS["f4"]
    assert (f4.m, f4.a) == (4, 6)
    assert np.abs(f4.BT).max() <= 8.0


def test_transform_kernel_shape_and_linearity():
    k = _rand(9, (3, 3, 4, 5))
    u = transform_kernel(k, "f4")
    assert u.shape == (6, 6, 4, 5)
    u2 = transform_kernel(2.0 * k, "f4")
    np.testing.assert_allclose(np.asarray(u2), 2.0 * np.asarray(u),
                               rtol=1e-6)
    assert transform_kernel(k, "f2").shape == (4, 4, 4, 5)


@pytest.mark.parametrize("variant,h,w", [("f2", 8, 12), ("f4", 10, 14)])
def test_production_winograd_conv2d_matches_direct(variant, h, w):
    """The materialized XLA production path (custom VJP): values within
    bf16-Winograd tolerance of the f32 direct conv, gradients match the
    direct conv's to bf16-grade bounds (relu=False to avoid threshold
    flips — see test_decomposed_large_kernel_gradients). f4 at a
    non-tile-aligned shape exercises the pad-and-crop path."""
    from semanticsegmentation_tensorflow_tpu.ops.winograd import (
        winograd_conv2d,
    )
    x = _rand(30, (2, h, w, 8))
    k = _rand(31, (3, 3, 8, 8), scale=0.2)
    b = _rand(32, (8,), scale=0.1)

    got = winograd_conv2d(x.astype(jnp.bfloat16), k, b, variant, True)
    want = jax.nn.relu(direct_conv2d(x, k) + b)
    assert got.dtype == jnp.bfloat16
    # f4's opt-in numerics cost (~5-7x the direct-bf16 error, module
    # docstring); tiny 8-channel tensors sit near the bf16 noise floor
    assert _relrms(got, want) < (1.5e-2 if variant == "f2" else 3e-2)

    def loss(f):
        return lambda xx, kk, bb: jnp.sum(
            jnp.sin(f(xx, kk, bb).astype(jnp.float32)))

    g1 = jax.grad(loss(lambda xx, kk, bb: winograd_conv2d(
        xx.astype(jnp.bfloat16), kk, bb, variant, False)),
        argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(loss(lambda xx, kk, bb: direct_conv2d(xx, kk) + bb),
                  argnums=(0, 1, 2))(x, k, b)
    tol = 2e-2 if variant == "f2" else 5e-2   # f4's larger bf16 amplification
    assert _relrms(g1[0].astype(jnp.float32), g2[0]) < tol
    assert _relrms(g1[1], g2[1]) < tol
    assert _relrms(g1[2], g2[2]) < tol


def test_model_level_winograd_xla_routing():
    """ConvBlock with winograd='f2x' (force the materialized XLA path on
    eligible full-lane layers) stays close to the direct-path block —
    the routing suffix contract of models/common.winograd_impl."""
    from semanticsegmentation_tensorflow_tpu.models.common import ConvBlock

    x = _rand(33, (1, 8, 8, 128)) * 0.5
    base = ConvBlock(128, n_convs=1, dtype=jnp.float32)
    vs = base.init(jax.random.key(2), x)
    wino = ConvBlock(128, n_convs=1, winograd="f2x", dtype=jnp.float32)
    vs2 = wino.init(jax.random.key(2), x)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    y0 = base.apply(vs, x)
    y1 = wino.apply(vs, x)
    assert _relrms(y1, jnp.asarray(y0, jnp.float32)) < 1.5e-2


def test_direct_conv2d_bf16_operands_differentiable():
    """Regression for the bench tool's fwd+bwd crash: jax.grad over a conv
    whose preferred_element_type (f32) differs from its bf16 operands
    builds a mixed-dtype wgrad conv the transpose rule rejects. With
    `preferred` set to the operand dtype the conv must be differentiable,
    and its grads must match the f32 path (bf16 tolerance)."""
    x = _rand(7, (1, 8, 12, 8)).astype(jnp.bfloat16)
    k = _rand(8, (3, 3, 8, 8), scale=0.3).astype(jnp.bfloat16)

    def loss(xx, kk):
        return jnp.sum(direct_conv2d(xx, kk, preferred=jnp.bfloat16)
                       .astype(jnp.float32))

    gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
    gx32, gk32 = jax.grad(
        lambda xx, kk: jnp.sum(direct_conv2d(xx, kk)), argnums=(0, 1))(
        x.astype(jnp.float32), k.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(gx, np.float32), gx32,
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gk, np.float32), gk32,
                               rtol=0.05, atol=0.05)

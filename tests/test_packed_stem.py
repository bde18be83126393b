"""Equivalence of the width-pair-packed stage1 (ops/packed_stem.py) with the
canonical ConvBlock+max_pool formulation: same param tree, same init, same
values (up to float summation order), same gradients — including
select_and_scatter's first-max-wins pooling tie semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsegmentation_tensorflow_tpu.models.common import ConvBlock
from semanticsegmentation_tensorflow_tpu.models.fcn8s import FCN8s
from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16
from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
    PackedStage1, pack_stem_conv1, pack_stem_conv2, pool_pairs,
)
from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool


def _canonical_stage1(variables, x):
    """The unpacked reference computation with the same params."""
    import flax.linen as nn

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBlock(64, n_convs=2, dtype=jnp.float32, name="s")(x)
            return max_pool(x, 2)

    # remap param tree: PackedStage1 children conv0/conv1 == ConvBlock's
    params = {"s": variables["params"]}
    return Ref().apply({"params": params}, x)


@pytest.fixture(scope="module")
def stage1_setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
    mod = PackedStage1(64, dtype=jnp.float32)
    variables = mod.init(jax.random.key(0), x)
    return mod, variables, x


def test_same_param_tree_and_init(stage1_setup):
    mod, variables, x = stage1_setup
    import flax.linen as nn

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBlock(64, n_convs=2, dtype=jnp.float32, name="stage1")(x)
            return max_pool(x, 2)

    ref_vars = Ref().init(jax.random.key(0), x)
    packed_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    ref_params = ref_vars["params"]["stage1"]
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_params)
    assert [p for p, _ in packed_flat] == [p for p, _ in ref_flat]
    for (_, a), (_, b) in zip(packed_flat, ref_flat):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_forward_matches_canonical(stage1_setup):
    mod, variables, x = stage1_setup
    got = mod.apply(variables, x)
    want = _canonical_stage1(variables, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_canonical(stage1_setup):
    mod, variables, x = stage1_setup

    def loss_packed(p, x):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    def loss_ref(p, x):
        return jnp.sum(_canonical_stage1({"params": p}, x) ** 2)

    gp = jax.grad(loss_packed)(variables["params"], x)
    gr = jax.grad(loss_ref)(variables["params"], x)
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    for (pa, a), (pb, b) in zip(flat_p, flat_r):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=str(pa))


def test_pool_tie_semantics_match_select_and_scatter():
    """Ties (e.g. relu-saturated zeros) must route gradient to the FIRST max
    in row-major window order, exactly like select_and_scatter."""
    rng = np.random.default_rng(1)
    # force many exact ties: quantized values incl. zeros
    full = jnp.asarray(
        rng.integers(0, 3, (2, 8, 12, 64)).astype(np.float32))

    def via_canonical(x):
        return jnp.sum(max_pool(x, 2) * jnp.arange(64.0))

    def via_packed(x):
        # pack full-res [N,H,W,C] into pairs [N,H,W/2,2C]
        n, h, w, c = x.shape
        packed = x.reshape(n, h, w // 2, 2 * c)
        return jnp.sum(pool_pairs(packed) * jnp.arange(64.0))

    g1 = jax.grad(via_canonical)(full)
    n, h, w, c = full.shape
    g2 = jax.grad(via_packed)(full)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_kernel_packing_shapes():
    k1 = jnp.arange(3 * 3 * 3 * 4, dtype=jnp.float32).reshape(3, 3, 3, 4)
    kp1 = pack_stem_conv1(k1)
    assert kp1.shape == (3, 4, 3, 8)
    # even output half ignores window col 3; odd ignores col 0
    assert np.all(np.asarray(kp1[:, 3, :, :4]) == 0)
    assert np.all(np.asarray(kp1[:, 0, :, 4:]) == 0)
    k2 = jnp.arange(3 * 3 * 4 * 4, dtype=jnp.float32).reshape(3, 3, 4, 4)
    kp2 = pack_stem_conv2(k2)
    assert kp2.shape == (3, 3, 8, 8)
    # structural zeros: half the taps
    assert float(jnp.sum(kp2 == 0)) >= kp2.size / 2


def test_vgg16_packed_matches_unpacked():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    m_ref = VGG16(fc_features=32, width_mult=0.25, dropout_rate=0.0,
                  dtype=jnp.float32, packed_stage1=False)
    m_pkd = VGG16(fc_features=32, width_mult=0.25, dropout_rate=0.0,
                  dtype=jnp.float32, packed_stage1=True)
    variables = m_ref.init(jax.random.key(0), x)
    v2 = m_pkd.init(jax.random.key(0), x)
    # identical param trees incl. init values
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, v2)
    ref = m_ref.apply(variables, x)
    pkd = m_pkd.apply(variables, x)
    for key in ref:
        np.testing.assert_allclose(np.asarray(pkd[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)


def test_fcn8s_packed_checkpoint_compatible():
    """A checkpoint trained unpacked loads into the packed model unchanged."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    m_ref = FCN8s(num_classes=2, fc_features=32, width_mult=0.25,
                  dtype=jnp.float32, packed_stage1=False)
    m_pkd = FCN8s(num_classes=2, fc_features=32, width_mult=0.25,
                  dtype=jnp.float32, packed_stage1=True)
    variables = m_ref.init(jax.random.key(0), x, train=False)
    ref = m_ref.apply(variables, x, train=False)
    pkd = m_pkd.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(pkd), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_deferred_pool_bias_bit_exact():
    """relu(pool(z)+b) must equal pool(relu(z+b)) BIT-FOR-BIT (max commutes
    with the monotone bias-add rounding and relu), in f32 and bf16."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        m_ref = VGG16(fc_features=32, width_mult=0.25, dropout_rate=0.0,
                      dtype=dt, packed_stage1=False, deferred_pool_bias=False)
        m_new = VGG16(fc_features=32, width_mult=0.25, dropout_rate=0.0,
                      dtype=dt, packed_stage1=False, deferred_pool_bias=True)
        variables = m_ref.init(jax.random.key(0), x)
        v2 = m_new.init(jax.random.key(0), x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), variables, v2)
        # zero-init biases make the commute trivially true; randomize them
        import flax
        flat = flax.traverse_util.flatten_dict(variables["params"], sep="/")
        flat = {k: (jnp.asarray(rng.normal(size=v.shape), v.dtype)
                    if k.endswith("bias") else v) for k, v in flat.items()}
        variables = {"params": flax.traverse_util.unflatten_dict(flat, sep="/")}
        ref = m_ref.apply(variables, x)
        new = m_new.apply(variables, x)
        for key in ref:
            np.testing.assert_array_equal(
                np.asarray(ref[key]), np.asarray(new[key]), err_msg=str((key, dt)))


def test_pallas_pool_bit_identical_to_jnp():
    """The Pallas pool kernel (interpret mode off-TPU) must match the jnp
    pool_pairs bit-for-bit in values AND gradients (incl. tie routing)."""
    from semanticsegmentation_tensorflow_tpu.ops.pallas.pool import (
        pool_pairs_pallas,
    )
    rng = np.random.default_rng(4)
    # quantized values force plenty of exact ties
    y = jnp.asarray(rng.integers(-3, 4, (2, 16, 24, 128)).astype(np.float32))

    def loss_jnp(y):
        return jnp.sum(pool_pairs(y) * jnp.arange(64.0))

    def loss_pallas(y):
        return jnp.sum(pool_pairs_pallas(y, True) * jnp.arange(64.0))

    np.testing.assert_array_equal(
        np.asarray(pool_pairs(y)), np.asarray(pool_pairs_pallas(y, True)))
    g1 = jax.grad(loss_jnp)(y)
    g2 = jax.grad(loss_pallas)(y)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_odd_width_raises():
    mod = PackedStage1(8, dtype=jnp.float32)
    v = mod.init(jax.random.key(0), jnp.zeros((1, 8, 12, 3)))
    with pytest.raises(ValueError):
        # VGG16 falls back for odd sizes; the raw module refuses
        mod.apply(v, jnp.zeros((1, 8, 11, 3)))


# ---------------------------------------------------------------------------
# fused Pallas stage1 tail (ops/pallas/stage1.py)
# ---------------------------------------------------------------------------

def _fused_and_ref():
    from semanticsegmentation_tensorflow_tpu.ops.pallas.stage1 import (
        fused_stage1_tail, reference_stage1_tail,
    )
    return fused_stage1_tail, reference_stage1_tail


def test_fused_stage1_tail_matches_reference():
    fused, ref = _fused_and_ref()
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(2, 8, 16, 128)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)), jnp.float32) * 0.1
    b2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.1
    b1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.1

    out = fused(z1, k2, b2, b1, True)
    expect = ref(z1, k2, b2, b1)
    assert out.shape == (2, 4, 16, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.vdot(fused(*a, True), cot),
                  (0, 1, 2, 3))(z1, k2, b2, b1)
    g2 = jax.grad(lambda *a: jnp.vdot(ref(*a), cot),
                  (0, 1, 2, 3))(z1, k2, b2, b1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_stage1_tail_exact_routing_with_ties():
    """Integer-valued inputs make the conv sums exact in every impl, so the
    pooled values AND the first-max-wins routing (gradients) must be
    bit-identical to the jnp packed path — including deliberate ties."""
    fused, ref = _fused_and_ref()
    rng = np.random.default_rng(1)
    # small integers: conv of 3x3x64 ints in [-2,2] stays well inside exact
    # f32/bf16-accumulated range
    z1 = jnp.asarray(rng.integers(-2, 3, (1, 6, 8, 128)), jnp.float32)
    # rank-deficient kernel with repeated taps -> many exact pooling ties
    k2 = jnp.asarray(rng.integers(-1, 2, (3, 3, 64, 64)), jnp.float32)
    k2 = k2.at[1].set(k2[0])
    b2 = jnp.zeros((64,), jnp.float32)
    b1 = jnp.asarray(rng.integers(-1, 2, (64,)), jnp.float32)

    np.testing.assert_array_equal(np.asarray(fused(z1, k2, b2, b1, True)),
                                  np.asarray(ref(z1, k2, b2, b1)))
    # integer cotangent: every product/sum in the backward is then exact in
    # f32, so any difference would be a genuine routing (tie) divergence
    cot = jnp.asarray(rng.integers(-3, 4, (1, 3, 8, 64)), jnp.float32)
    g1 = jax.grad(lambda z: jnp.vdot(fused(z, k2, b2, b1, True), cot))(z1)
    g2 = jax.grad(lambda z: jnp.vdot(ref(z, k2, b2, b1), cot))(z1)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_fused_stage1_tail_batch_tiling():
    """N that doesn't tile evenly into the width budget still works (the
    wrapper picks a divisor tile)."""
    fused, ref = _fused_and_ref()
    rng = np.random.default_rng(2)
    z1 = jnp.asarray(rng.normal(size=(3, 4, 10, 128)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)), jnp.float32) * 0.1
    b2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.1
    b1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.1
    np.testing.assert_allclose(np.asarray(fused(z1, k2, b2, b1, True)),
                               np.asarray(ref(z1, k2, b2, b1)),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# SegNet-mode fused tail (biased codes) + packed SegNet stage1
# ---------------------------------------------------------------------------

def test_fused_segnet_tail_matches_reference():
    """Values, indices AND index-routed gradients of the biased-codes
    kernel match the canonical relu->conv->+b->relu->max_pool_with_argmax
    path, bit-exactly on integer-valued (tie-rich) inputs."""
    from semanticsegmentation_tensorflow_tpu.ops.pallas.stage1 import (
        fused_segnet_stage1_tail, reference_segnet_stage1_tail,
    )
    rng = np.random.default_rng(3)
    z1 = jnp.asarray(rng.integers(-2, 3, (2, 6, 8, 128)), jnp.float32)
    k2 = jnp.asarray(rng.integers(-1, 2, (3, 3, 64, 64)), jnp.float32)
    k2 = k2.at[1].set(k2[0])              # repeated taps -> many exact ties
    b2 = jnp.asarray(rng.integers(-2, 3, (64,)), jnp.float32)
    b1 = jnp.asarray(rng.integers(-2, 3, (64,)), jnp.float32)

    out, idx = fused_segnet_stage1_tail(z1, k2, b2, b1, True)
    ref_out, ref_idx = reference_segnet_stage1_tail(z1, k2, b2, b1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))

    cot = jnp.asarray(rng.integers(-3, 4, out.shape), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.vdot(
        fused_segnet_stage1_tail(*a, True)[0], cot),
        (0, 1, 2, 3))(z1, k2, b2, b1)
    g2 = jax.grad(lambda *a: jnp.vdot(
        reference_segnet_stage1_tail(*a)[0], cot),
        (0, 1, 2, 3))(z1, k2, b2, b1)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segnet_packed_matches_unpacked():
    """Packed SegNet == unpacked SegNet: identical param tree/init, equal
    outputs (full decoder — exercises the index parity end to end), equal
    gradients."""
    from semanticsegmentation_tensorflow_tpu.models.segnet import SegNet

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    m_ref = SegNet(num_classes=2, dtype=jnp.float32, packed_stage1=False)
    m_pkd = SegNet(num_classes=2, dtype=jnp.float32, packed_stage1=True)
    variables = m_ref.init(jax.random.key(0), x)
    v2 = m_pkd.init(jax.random.key(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, v2)
    ref = m_ref.apply(variables, x)
    pkd = m_pkd.apply(variables, x)
    np.testing.assert_allclose(np.asarray(pkd), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x) ** 2)

    gr = jax.grad(loss(m_ref))(variables["params"])
    gp = jax.grad(loss(m_pkd))(variables["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gp)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4, err_msg=str(pa))


def test_max_pool_with_argmax_grad_routes_by_index():
    """TF MaxPoolGradWithArgmax parity: the cotangent goes to the RECORDED
    argmax position, not split across exact ties (jnp.max's default)."""
    from semanticsegmentation_tensorflow_tpu.ops.pool import (
        max_pool_with_argmax,
    )

    x = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])[None, :, :, None]
    g = jax.grad(lambda x: jnp.sum(max_pool_with_argmax(x, 2)[0]))(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], np.asarray([[1.0, 0.0], [0.0, 0.0]]))


def test_fused_stage1_tail_spmd_mode_matches_reference():
    """The SPMD halo-array mode (custom_partitioning path) is value- and
    gradient-identical to the clamped-halo mode and the jnp reference —
    with a NONZERO b1, which catches the edge-halo bias interaction (a
    zero-filled pre-bias halo row would wrongly contribute relu(b1); the
    arrays carry -inf at the global edges for exact SAME-pad zeros)."""
    fused, ref = _fused_and_ref()
    rng = np.random.default_rng(9)
    z1 = jnp.asarray(rng.normal(size=(2, 8, 16, 128)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)), jnp.float32) * 0.1
    b2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.1
    b1 = jnp.abs(jnp.asarray(rng.normal(size=(64,)), jnp.float32)) + 0.5

    out = fused(z1, k2, b2, b1, True, True)   # interpret, spmd
    expect = ref(z1, k2, b2, b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.vdot(fused(*a, True, True), cot),
                  (0, 1, 2, 3))(z1, k2, b2, b1)
    g2 = jax.grad(lambda *a: jnp.vdot(ref(*a), cot),
                  (0, 1, 2, 3))(z1, k2, b2, b1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_segnet_tail_spmd_mode_matches_reference():
    from semanticsegmentation_tensorflow_tpu.ops.pallas.stage1 import (
        fused_segnet_stage1_tail, reference_segnet_stage1_tail,
    )
    rng = np.random.default_rng(10)
    z1 = jnp.asarray(rng.integers(-2, 3, (1, 6, 8, 128)), jnp.float32)
    k2 = jnp.asarray(rng.integers(-1, 2, (3, 3, 64, 64)), jnp.float32)
    b2 = jnp.asarray(rng.integers(-2, 3, (64,)), jnp.float32)
    b1 = jnp.asarray(rng.integers(1, 3, (64,)), jnp.float32)  # nonzero!

    out, idx = fused_segnet_stage1_tail(z1, k2, b2, b1, True, True)
    ref_out, ref_idx = reference_segnet_stage1_tail(z1, k2, b2, b1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_deeplab_packed_stage1_checkpoint_compatible():
    """DeepLab now defaults to the fused packed stage1 (round 5: its os8
    profile showed the unpacked stage1 cluster at ~19 ms of a 105.8 ms
    step while FCN's packed pair costs 14.3 ms at double the batch).
    Same param tree and same function as the unpacked build."""
    from semanticsegmentation_tensorflow_tpu.models.deeplab import (
        DeepLabASPP,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    m_ref = DeepLabASPP(num_classes=2, width_mult=0.25, aspp_features=16,
                        rates=(2, 4), dropout_rate=0.0, dtype=jnp.float32,
                        packed_stage1=False)
    m_pkd = DeepLabASPP(num_classes=2, width_mult=0.25, aspp_features=16,
                        rates=(2, 4), dropout_rate=0.0, dtype=jnp.float32,
                        packed_stage1=True)
    variables = m_ref.init(jax.random.key(0), x, train=False)
    v2 = m_pkd.init(jax.random.key(0), x, train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, v2)
    ref = m_ref.apply(variables, x, train=False)
    pkd = m_pkd.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(pkd), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

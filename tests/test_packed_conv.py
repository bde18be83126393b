"""Equivalence of the generalized width-pair packing (ops/packed_conv.py)
with the canonical formulations: packed unpool == unpool (bit-for-bit,
same routing), packed conv block == ConvBlock (same param tree, values
up to float summation order, matching gradients), and the packed SegNet
decoder flag is value- and checkpoint-compatible with the unpacked model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsegmentation_tensorflow_tpu.models.common import ConvBlock
from semanticsegmentation_tensorflow_tpu.models.segnet import SegNet
from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
    PackedConvBlock, pack_conv1x1_kernel, pack_conv_kernel, pack_pairs,
    packed_unpool,
)
from semanticsegmentation_tensorflow_tpu.ops.packed_stem import unpack_pairs
from semanticsegmentation_tensorflow_tpu.ops.pool import (
    max_pool_with_argmax, max_unpool,
)


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    np.testing.assert_array_equal(np.asarray(unpack_pairs(pack_pairs(x))),
                                  np.asarray(x))


def test_packed_unpool_matches_unpool():
    """unpack(packed_unpool(p, ix)) == max_unpool(p, ix) bit-for-bit,
    including tie routing (indices come from a real argmax pool)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 4, size=(2, 8, 12, 5)).astype(np.float32))
    pooled, ix = max_pool_with_argmax(x, 2)
    want = max_unpool(pooled, ix, 2)
    got = unpack_pairs(packed_unpool(pooled, ix))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_unpool_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 4)).astype(np.float32))
    pooled, ix = max_pool_with_argmax(x, 2)

    def loss_packed(p):
        return jnp.sum(jnp.sin(unpack_pairs(packed_unpool(p, ix))))

    def loss_ref(p):
        return jnp.sum(jnp.sin(max_unpool(p, ix, 2)))

    g1 = jax.grad(loss_packed)(pooled)
    g2 = jax.grad(loss_ref)(pooled)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_pack_conv_kernel_shapes_and_zeros():
    k = jnp.asarray(np.random.default_rng(3).normal(size=(3, 3, 4, 6)),
                    jnp.float32)
    kp = pack_conv_kernel(k)
    assert kp.shape == (3, 3, 8, 12)
    # exactly half the packed kernel is structural zeros
    assert float(jnp.sum(kp == 0.0)) >= kp.size / 2
    k1 = jnp.asarray(np.random.default_rng(4).normal(size=(1, 1, 4, 6)),
                     jnp.float32)
    kp1 = pack_conv1x1_kernel(k1)
    assert kp1.shape == (1, 1, 8, 12)


@pytest.mark.parametrize("ci,co,n_convs", [(4, 4, 2), (8, 4, 2), (4, 6, 3)])
def test_packed_conv_block_matches_convblock(ci, co, n_convs):
    """PackedConvBlock == ConvBlock on the unpacked view: same param
    tree/init (flax path-derived rng), same values up to summation order,
    matching gradients — including Ci != Co first convs (the SegNet dec2 /
    U-Net upconv shapes)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 6, 10, ci)).astype(np.float32))
    packed = PackedConvBlock(co, n_convs=n_convs, dtype=jnp.float32)
    vs = packed.init(jax.random.key(7), pack_pairs(x))
    ref = ConvBlock(co, n_convs=n_convs, dtype=jnp.float32)
    vs_ref = ref.init(jax.random.key(7), x)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs_ref)
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(vs_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got = unpack_pairs(packed.apply(vs, pack_pairs(x)))
    want = ref.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda p, xx: jnp.sum(jnp.sin(fn(p, xx)))

    g1 = jax.grad(loss(lambda p, xx: packed.apply(p, pack_pairs(xx))),
                  argnums=(0, 1))(vs, x)
    g2 = jax.grad(loss(lambda p, xx: ref.apply(p, xx)), argnums=(0, 1))(vs, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_segnet_packed_decoder_matches_unpacked():
    """The packed_dec1/packed_dec2 flags change neither the param tree
    nor (up to float summation order) the logits; checkpoints are
    interchangeable."""
    kw = dict(num_classes=3, width_mult=1.0, packed_stage1=False,
              pallas_pool=False, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    # width_mult=1 keeps dec1/dec2 at the canonical 64 channels the flags
    # need, but makes this the slowest CPU test in the file — tiny inputs
    base = SegNet(packed_dec1=False, packed_dec2=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    packed = SegNet(packed_dec1=True, packed_dec2=True, **kw)
    vs2 = packed.init(jax.random.key(1), x, train=False)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    y0 = base.apply(vs, x, train=False)
    y1 = packed.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_vgg16_packed_stage2_entry_matches():
    """packed_stage2_entry computes the same stage2 (same param tree,
    values up to summation order) with conv2_1 in the packed domain."""
    from semanticsegmentation_tensorflow_tpu.models.vgg16 import VGG16

    kw = dict(fc_features=16, width_mult=0.25, dropout_rate=0.0,
              packed_stage1=False, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 32, 64, 3))
    base = VGG16(packed_stage2_entry=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    packed = VGG16(packed_stage2_entry=True, **kw)
    vs2 = packed.init(jax.random.key(1), x, train=False)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    e0 = base.apply(vs, x, train=False)
    e1 = packed.apply(vs, x, train=False)
    for key in ("pool2", "conv7"):
        np.testing.assert_allclose(np.asarray(e0[key]), np.asarray(e1[key]),
                                   rtol=2e-4, atol=2e-4)


def test_packed_conv_transpose_matches_flax():
    """packed_conv_transpose_2x2 == nn.ConvTranspose((2,2), stride 2,
    SAME) on the unpacked view, same canonical params."""
    import flax.linen as nn
    from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
        packed_conv_transpose_2x2,
    )

    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="SAME")
    x = jax.random.normal(jax.random.key(0), (2, 4, 5, 7))
    vs = m.init(jax.random.key(1), x)
    want = m.apply(vs, x)
    got = unpack_pairs(packed_conv_transpose_2x2(
        x, vs["params"]["kernel"], vs["params"]["bias"], jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_unet_packed_stage0_matches_unpacked():
    """The packed_stage0 flag: identical param tree, logits equal up to
    float summation order."""
    from semanticsegmentation_tensorflow_tpu.models.unet import UNet

    kw = dict(num_classes=3, base_features=64, depth=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 16, 24, 3))
    base = UNet(packed_stage0=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    packed = UNet(packed_stage0=True, **kw)
    vs2 = packed.init(jax.random.key(1), x, train=False)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    y0 = base.apply(vs, x, train=False)
    y1 = packed.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-4, atol=3e-4)


def test_unet_packed_stage0_mixed_matches_unpacked():
    """packed_stage0='mixed' (packed down0/up0/concat, canonical upconv0 +
    head — the full-res A/B named in ARCHITECTURE.md / VERDICT r3 #3):
    identical param tree, logits equal up to float summation order."""
    from semanticsegmentation_tensorflow_tpu.models.unet import UNet

    kw = dict(num_classes=3, base_features=64, depth=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 16, 24, 3))
    base = UNet(packed_stage0=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    mixed = UNet(packed_stage0="mixed", **kw)
    vs2 = mixed.init(jax.random.key(1), x, train=False)
    assert jax.tree.map(lambda t: t.shape, vs) == \
        jax.tree.map(lambda t: t.shape, vs2)
    y0 = base.apply(vs, x, train=False)
    y1 = mixed.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-4, atol=3e-4)


def test_unet_packed_stage0_mixed_gradients_match():
    from semanticsegmentation_tensorflow_tpu.models.unet import UNet

    kw = dict(num_classes=2, base_features=64, depth=1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (1, 8, 12, 3))
    base = UNet(packed_stage0=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    mixed = UNet(packed_stage0="mixed", **kw)

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, x, train=False) ** 2)

    g0 = jax.grad(loss(base))(vs)
    g1 = jax.grad(loss(mixed))(vs)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_unet_packed_stage0_gradients_match():
    from semanticsegmentation_tensorflow_tpu.models.unet import UNet

    kw = dict(num_classes=2, base_features=64, depth=1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (1, 8, 12, 3))
    base = UNet(packed_stage0=False, **kw)
    vs = base.init(jax.random.key(1), x, train=False)
    packed = UNet(packed_stage0=True, **kw)

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, x, train=False) ** 2)

    g0 = jax.grad(loss(base))(vs)
    g1 = jax.grad(loss(packed))(vs)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_packed_concat_matches_canonical_concat():
    """unpack(packed_concat(pack(a), pack(b))) == concat([a, b], -1) —
    the lane-interleave the U-Net skip join depends on."""
    from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
        packed_concat,
    )
    a = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    b = -jnp.arange(2 * 3 * 4 * 7, dtype=jnp.float32).reshape(2, 3, 4, 7)
    got = unpack_pairs(packed_concat(pack_pairs(a), pack_pairs(b)))
    want = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

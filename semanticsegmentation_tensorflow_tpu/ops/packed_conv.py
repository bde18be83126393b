"""Generalized width-pair packing: full MXU lanes for any 64-channel
full-resolution conv stack, not just the VGG encoder stage1.

Round 2 proved the trick on the encoder stem (ops/packed_stem.py): pack
PAIRS of adjacent output columns into the channel dim (64 ch x 2 cols =
128 lanes, exactly full), convolve packed-to-packed with the canonical
kernel scattered into the pair structure (half structural zeros — 2x the
canonical FLOPs at ~3x the utilization, a large measured net win), and
unpack with a free reshape. This module generalizes the machinery to the
half-lane stacks the round-2 profile says still crawl (VERDICT r2 #2):

* SegNet's decoder stage1 (unpool -> three full-res 64-ch convs -> 1x1
  head): ``packed_unpool`` emits the packed layout DIRECTLY — the 2x2
  window's column pair IS the pack dimension, so packing costs nothing —
  and ``PackedConvBlock`` + ``pack_conv1x1_kernel`` keep the whole stage
  at full lanes (models/segnet.py ``packed_dec1``).
* U-Net's down0 / upconv0 (models/unet.py) and FCN's conv2_1 consuming
  the already-pair-structured pool1 output (models/vgg16.py
  ``packed_stage2_entry``): ``pack_pairs`` is a pure reshape, so entering
  the packed domain is free wherever the producer's width is even.

Layout contract (same as ops/packed_stem.py): packed channel
``dx * C + c`` of packed column ``X`` holds canonical channel ``c`` of
full-res column ``2X + dx``; N/H/row-major order is untouched, so
``pack_pairs`` / ``unpack_pairs`` are pure reshapes.

Exactness: packed paths consume the CANONICAL parameters and rearrange
them inside the forward — identical param trees, checkpoints, optimizer
states; gradients flow through the rearrangement onto the canonical
weights (the sum over tap copies IS the canonical weight gradient).
Values equal the unpacked path up to float summation order.
Equivalence tests: tests/test_packed_conv.py.

Reference parity: these compute the same conv/unpool stacks the
reference's SegNet/U-Net scripts build with tf.layers conv2d +
max_pool_with_argmax-driven unpooling (SURVEY.md §3.4; the mount is
empty per SURVEY.md §0 — semantics pinned by BASELINE.json configs 3-4).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from semanticsegmentation_tensorflow_tpu.dtypes import DEFAULT_DTYPE
from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
    _ConvParams, unpack_pairs,
)

_DN = ("NHWC", "HWIO", "NHWC")


def pack_pairs(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,H,W/2,2C] width-pair packing (pure reshape:
    column pairs are adjacent in row-major order)."""
    n, h, w, c = x.shape
    assert w % 2 == 0, f"pair packing needs even width, got {w}"
    return x.reshape(n, h, w // 2, 2 * c)


def pack_conv_kernel(k: jax.Array) -> jax.Array:
    """[kh,3,Ci,Co] SAME conv kernel -> [kh,3,2Ci,2Co] packed->packed.

    Generalizes ops/packed_stem.pack_stem_conv2 to Ci != Co. Packed input
    channel ``dx*Ci + c`` holds full-res column ``2X + dx``. The even
    output (col 2X) taps full-res cols 2X-1 (pack X-1, odd half), 2X and
    2X+1 (pack X); the odd output (col 2X+1) taps 2X, 2X+1 (pack X) and
    2X+2 (pack X+1, even half). Half the packed kernel is structural
    zeros (the 2x-FLOPs / 3x-utilization trade the module docstring
    describes)."""
    kh, kw, ci, co = k.shape
    assert kw == 3, "pair packing is specialised to 3-wide kernels"
    kp = jnp.zeros((kh, 3, 2 * ci, 2 * co), k.dtype)
    # even output half: canonical taps dx=-1,0,+1 = k[:,0],k[:,1],k[:,2]
    kp = kp.at[:, 0, ci:, 0:co].set(k[:, 0])    # col 2X-1 = pack X-1 odd
    kp = kp.at[:, 1, 0:ci, 0:co].set(k[:, 1])   # col 2X   = pack X   even
    kp = kp.at[:, 1, ci:, 0:co].set(k[:, 2])    # col 2X+1 = pack X   odd
    # odd output half
    kp = kp.at[:, 1, 0:ci, co:].set(k[:, 0])    # col 2X   = pack X   even
    kp = kp.at[:, 1, ci:, co:].set(k[:, 1])     # col 2X+1 = pack X   odd
    kp = kp.at[:, 2, 0:ci, co:].set(k[:, 2])    # col 2X+2 = pack X+1 even
    return kp


def pack_conv1x1_kernel(k: jax.Array) -> jax.Array:
    """[1,1,Ci,Co] -> [1,1,2Ci,2Co] block-diagonal packed 1x1 (each pack
    half maps through the canonical kernel independently — a 1x1 conv
    never crosses columns)."""
    kh, kw, ci, co = k.shape
    assert kh == kw == 1
    kp = jnp.zeros((1, 1, 2 * ci, 2 * co), k.dtype)
    kp = kp.at[:, :, 0:ci, 0:co].set(k)
    kp = kp.at[:, :, ci:, co:].set(k)
    return kp


# ---------------------------------------------------------------------------
# packed unpool (SegNet decoder entry)
# ---------------------------------------------------------------------------

from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_unpool(pooled: jax.Array, argmax: jax.Array,
                  window: int = 2) -> jax.Array:
    """SegNet 2x2 unpool emitting the width-pair-packed layout directly:
    [N,Hp,Wp,C] + int8 within-window argmax -> [N,2Hp,Wp,2C], where
    packed channel ``dx*C + c`` of packed column X holds full-res column
    ``2X + dx`` — i.e. ``unpack_pairs(packed_unpool(p, ix)) ==
    max_unpool(p, ix)`` bit-for-bit (tests/test_packed_conv.py).

    The 2x2 window's column pair IS the pack dimension, so no extra
    layout work exists: each lane half is a row-repeat + index select at
    half the full-res size (vs the full unpool's 4x repeat). Backward
    (custom): two strided row-slices per lane half at pooled size —
    no scatter anywhere (the design rule of ops/pool.py)."""
    assert window == 2, "packed unpool is specialised to 2x2 pools"
    ix = jnp.repeat(argmax, 2, axis=1)            # [N,2Hp,Wp,C]
    p = jnp.repeat(pooled, 2, axis=1)
    hp = pooled.shape[1]
    # in-window row of each output row: 0,1,0,1,...
    dy = jnp.tile(jnp.arange(2, dtype=jnp.int8), hp)[None, :, None, None]
    zero = jnp.zeros_like(p)
    even = jnp.where(ix == 2 * dy, p, zero)       # in-window col 0
    odd = jnp.where(ix == 2 * dy + 1, p, zero)    # in-window col 1
    return jnp.concatenate([even, odd], axis=-1)


def _punpool_fwd(pooled, argmax, window):
    return packed_unpool(pooled, argmax, window), argmax


def _punpool_bwd(window, argmax, g):
    import numpy as np

    n, h, w, c2 = g.shape
    c = c2 // 2
    acc = None
    for dy in range(2):
        for dx in range(2):
            # pooled-size slice via explicit strided lax.slice — jnp's
            # strided indexing lowers to a gather with materialized index
            # arrays (see ops/pool._unpool_bwd, round-4 jaxpr audit)
            gs = lax.slice(g, (0, dy, 0, dx * c), (n, h, w, (dx + 1) * c),
                           (1, 2, 1, 1))
            sel = jnp.where(argmax == dy * 2 + dx, gs, jnp.zeros_like(gs))
            acc = sel if acc is None else acc + sel
    return (acc, np.zeros(argmax.shape, jax.dtypes.float0))


packed_unpool.defvjp(_punpool_fwd, _punpool_bwd)


# ---------------------------------------------------------------------------
# packed conv block
# ---------------------------------------------------------------------------


class PackedConvBlock(nn.Module):
    """``ConvBlock(features, n_convs)`` computed in the width-pair-packed
    domain: input [N,H,Wp,2Ci] -> output [N,H,Wp,2F].

    Parameter tree identical to ``ConvBlock`` (``conv{i}/kernel`` of the
    CANONICAL [3,3,Ci,F] shape + bias — flax derives init rng from the
    path, so init values are bit-identical too); kernels are scattered
    into the pair structure inside the forward. No BN (the packed paths
    are perf routes for the reference-parity no-BN configs, like
    ops/packed_stem.PackedStage1)."""

    features: int
    n_convs: int = 2
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        for i in range(self.n_convs):
            ci = x.shape[-1] // 2
            k, b = _ConvParams(ci, self.features, name=f"conv{i}")()
            z = lax.conv_general_dilated(
                x, pack_conv_kernel(k).astype(dt), window_strides=(1, 1),
                padding=((1, 1), (1, 1)), dimension_numbers=_DN)
            x = nn.relu(z + jnp.tile(b, 2).astype(dt))
        return x


def packed_conv1x1(x: jax.Array, k: jax.Array, b: jax.Array,
                   dtype) -> jax.Array:
    """1x1 conv applied in the packed domain (the SegNet classifier head):
    x [N,H,Wp,2Ci], canonical k [1,1,Ci,Co] / b [Co] -> [N,H,Wp,2Co]."""
    z = lax.conv_general_dilated(
        x.astype(dtype), pack_conv1x1_kernel(k).astype(dtype),
        window_strides=(1, 1), padding="VALID", dimension_numbers=_DN)
    return z + jnp.tile(b, 2).astype(dtype)


# ---------------------------------------------------------------------------
# U-Net pieces (models/unet.py ``packed_stage0``)
# ---------------------------------------------------------------------------


def packed_concat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel-concat in the packed domain: packed a [N,H,Wp,2Ca] ++
    packed b [N,H,Wp,2Cb] -> packed [N,H,Wp,2(Ca+Cb)] whose UNPACKED view
    is ``concat([unpack(a), unpack(b)], -1)`` — the lane halves of both
    inputs must interleave (dx-major layout)."""
    ca, cb = a.shape[-1] // 2, b.shape[-1] // 2
    return jnp.concatenate(
        [a[..., :ca], b[..., :cb], a[..., ca:], b[..., cb:]], axis=-1)


def packed_conv_transpose_2x2(x: jax.Array, k: jax.Array, b: jax.Array,
                              dtype) -> jax.Array:
    """``nn.ConvTranspose(F, (2,2), strides=(2,2), SAME)`` emitting the
    width-pair-packed layout directly: x [N,Hp,Wp,C] (canonical, low res)
    -> [N,2Hp,Wp,2F] packed full res.

    A 2x2/2 transposed conv has NO tap overlap: out[2i+dy, 2j+dx, f] =
    sum_c x[i,j,c] kflip[dy,dx,c,f] + b (impulse-probed against flax,
    tests/test_packed_conv.py) — a 1x1 conv to (dy,dx,f) channels plus a
    row interleave. The column pair (dx) IS the pack dim, so packing is
    free; only the row interleave moves data. Canonical params k
    [2,2,C,F] / b [F] (checkpoint-compatible with nn.ConvTranspose)."""
    n, hp, wp, c = x.shape
    f = k.shape[-1]
    kf = k[::-1, ::-1]                          # transpose-conv flip
    # [1,1,C,(dy,dx,f)]
    k1 = jnp.transpose(kf, (2, 0, 1, 3)).reshape(1, 1, c, 4 * f)
    z = lax.conv_general_dilated(
        x.astype(dtype), k1.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=_DN)  # [N,Hp,Wp,4F]
    z = z.reshape(n, hp, wp, 2, 2 * f)          # (dy) x (dx,f)
    z = jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(n, 2 * hp, wp, 2 * f)
    return z + jnp.tile(b, 2).astype(dtype)


class PackedUNetDown0(nn.Module):
    """U-Net down0 (ConvBlock(F, 2) -> skip tap -> 2x2 pool), width-pair
    packed. Returns ``(skip, pooled)``: the skip is the canonical
    full-res activation (unpacked view — consumed full-res by the
    decoder anyway), the pooled output uses the packed pool
    (ops/packed_stem.pool_pairs: bias+relu deferred past the pool —
    exact, see PooledConvBlock). Param tree identical to
    ``ConvBlock(features, 2)`` at ``conv0``/``conv1``."""

    features: int = 64
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
            pack_stem_conv1, pool_pairs,
        )

        f = self.features
        k1, b1 = _ConvParams(x.shape[-1], f, name="conv0")()
        k2, b2 = _ConvParams(f, f, name="conv1")()
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"packed down0 needs even H, W; got {x.shape[1:3]}")
        dt = self.dtype
        z1 = lax.conv_general_dilated(
            x.astype(dt), pack_stem_conv1(k1).astype(dt),
            window_strides=(1, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN)
        z1 = nn.relu(z1 + jnp.tile(b1, 2).astype(dt))
        z2 = lax.conv_general_dilated(
            z1, pack_conv_kernel(k2).astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        skip = nn.relu(unpack_pairs(z2) + b2.astype(dt))
        pooled = nn.relu(pool_pairs(z2) + b2.astype(dt))
        return skip, pooled

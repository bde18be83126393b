"""Width-pair-packed VGG stage1: full MXU lanes for the 64-channel stage.

Why: at 64 output channels, every stage1 tensor on TPU is laid out with its
channel dim padded to the 128-lane register width, so the convs run at
~25-35% MXU utilization and pool1's select-and-scatter backward crawls —
measured at ~37% of the whole FCN-8s train step (tools/profile_step.py,
round 2) while stages 3-5 run at ~98% MXU.

Fix: compute stage1 with PAIRS of adjacent output columns packed into the
channel dim (64 ch x 2 columns = 128 lanes, exactly full):

  conv1_1: [N,H,W,3] --(3x4 kernel, stride (1,2))--> [N,H,W/2,128]
           where out[..., X, dx*64+c] == full-res out[..., 2X+dx, c]
  conv1_2: packed->packed 3x3 conv whose [3,3,128,128] kernel is the
           canonical [3,3,64,64] kernel scattered into the pair structure
           (half the taps are structural zeros)
  pool1:   the 2x2/2 max pool needs exactly (row pair) x (column pair) —
           the column pair is ALREADY the channel packing, so pooling is a
           reshape + max over two static axes, and its backward is a dense
           one-hot select. No select_and_scatter anywhere.

The packed convs do 4/3x (conv1_1) / 2x (conv1_2) the canonical FLOPs —
zeros the MXU multiplies anyway — but run at ~3x the utilization, and the
full-resolution pooling backward disappears; net measured win on the v5e
step is large (see BENCH history).

Exactness: the packed path consumes the CANONICAL parameters ([3,3,3,64],
[3,3,64,64] + biases) and rearranges them inside the forward, so param
trees, checkpoints, weight imports and optimizer states are identical to
the unpacked path, and gradients flow through the rearrangement back onto
the canonical weights (the sum over tap copies — exactly the canonical
weight gradient). Values match the unpacked path up to float summation
order (same products, different accumulation tree); the pooling backward
reproduces select_and_scatter's first-max-wins tie semantics exactly via a
custom VJP. Equivalence tests: tests/test_packed_stem.py.

Reference parity: this computes the same VGG16 stage1 the reference's
FCN/VGG scripts build with tf.layers conv2d+max_pooling2d (SURVEY.md §3.4;
the reference mount is empty, SURVEY.md §0 — semantics pinned by
BASELINE.json:7 "VGG16 backbone").
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from semanticsegmentation_tensorflow_tpu.dtypes import DEFAULT_DTYPE

_DN = ("NHWC", "HWIO", "NHWC")


def pack_stem_conv1(k: jax.Array) -> jax.Array:
    """[kh,3,Cin,F] SAME conv kernel -> [kh,4,Cin,2F] packed-pair kernel.

    Output pack X covers full-res columns (2X, 2X+1); with width padding
    (1,1) and stride 2 the window reads full-res columns 2X-1..2X+2, so the
    even output's three taps land at window cols 0..2 and the odd output's
    at 1..3.
    """
    kh, kw, cin, f = k.shape
    assert kw == 3, "pair packing is specialised to 3-wide kernels"
    kp = jnp.zeros((kh, 4, cin, 2 * f), k.dtype)
    kp = kp.at[:, 0:3, :, 0:f].set(k)
    kp = kp.at[:, 1:4, :, f:].set(k)
    return kp


def pack_stem_conv2(k: jax.Array) -> jax.Array:
    """[kh,3,F,F] SAME conv kernel -> [kh,3,2F,2F] packed->packed kernel.

    Packed input channel dx*F+c holds full-res column 2X+dx. The even
    output (col 2X) taps cols 2X-1 (pack X-1, odd half), 2X and 2X+1
    (pack X); the odd output (col 2X+1) taps 2X, 2X+1 (pack X) and 2X+2
    (pack X+1, even half). Half of the packed kernel is structural zeros.
    """
    kh, kw, f, fo = k.shape
    assert kw == 3 and f == fo
    kp = jnp.zeros((kh, 3, 2 * f, 2 * f), k.dtype)
    # even output half: canonical taps dx=-1,0,+1 = k[:,0],k[:,1],k[:,2]
    kp = kp.at[:, 0, f:, 0:f].set(k[:, 0])    # col 2X-1 = pack X-1 odd
    kp = kp.at[:, 1, 0:f, 0:f].set(k[:, 1])   # col 2X   = pack X   even
    kp = kp.at[:, 1, f:, 0:f].set(k[:, 2])    # col 2X+1 = pack X   odd
    # odd output half
    kp = kp.at[:, 1, 0:f, f:].set(k[:, 0])    # col 2X   = pack X   even
    kp = kp.at[:, 1, f:, f:].set(k[:, 1])     # col 2X+1 = pack X   odd
    kp = kp.at[:, 2, 0:f, f:].set(k[:, 2])    # col 2X+2 = pack X+1 even
    return kp


def unpack_pairs(y: jax.Array) -> jax.Array:
    """[N,H,Wp,2F] width-pair-packed -> [N,H,W,F] full resolution.

    Packed channel dx*F+c holds full-res column 2X+dx, so unpacking is a
    pure reshape (X and dx are adjacent in row-major order)."""
    n, h, wp, c2 = y.shape
    f = c2 // 2
    return y.reshape(n, h, wp, 2, f).reshape(n, h, 2 * wp, f)


def _row_pool(m: jax.Array) -> jax.Array:
    """Max over adjacent row pairs: [N,H,Wp,C] -> [N,H/2,Wp,C]. Native
    reduce_window, whose JAX VJP is select_and_scatter_add (first max in
    scan order wins — the semantics we must preserve)."""
    return lax.reduce_window(
        m, -jnp.inf if jnp.issubdtype(m.dtype, jnp.floating)
        else jnp.iinfo(m.dtype).min,
        lax.max, window_dimensions=(1, 2, 1, 1),
        window_strides=(1, 2, 1, 1), padding="VALID")


@jax.custom_vjp
def pool_pairs(y: jax.Array) -> jax.Array:
    """2x2/2 max pool of the packed representation.

    y: [N,H,Wp,2F] packed pairs -> [N,H/2,Wp,F] (the canonical pool1
    output, unpacked). The column pair of each window is already the
    channel packing, so the pool is a lane-half max followed by a row-pair
    reduce_window — no transposes or windowed relayouts (a 6-D transpose
    formulation measured +11 ms/step in layout copies; a fully-repacked
    variant triggered pathological XLA layout choices and cost +24 ms).

    Backward routes the cotangent to the FIRST max in (dy, dx) row-major
    window order — exactly XLA select_and_scatter's (and TF MaxPoolGrad's)
    tie behaviour: the row is chosen by reduce_window's own
    select_and_scatter_add VJP (first row wins), the column within it by
    an ``even >= odd`` select (even column wins).
    """
    f = y.shape[-1] // 2
    return _row_pool(jnp.maximum(y[..., :f], y[..., f:]))


def _pool_pairs_fwd(y):
    f = y.shape[-1] // 2
    e, o = y[..., :f], y[..., f:]
    m = jnp.maximum(e, o)
    return _row_pool(m), (y, m)


def _pool_pairs_bwd(res, g):
    y, m = res
    f = y.shape[-1] // 2
    _, rw_vjp = jax.vjp(_row_pool, m)
    (gm,) = rw_vjp(g)                       # first-win over rows (dy)
    ge = y[..., :f] >= y[..., f:]           # first-win over columns (dx)
    return (jnp.concatenate(
        [jnp.where(ge, gm, 0), jnp.where(ge, 0, gm)], axis=-1),)


pool_pairs.defvjp(_pool_pairs_fwd, _pool_pairs_bwd)


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree (kernel/bias, same init).

    Exists so the packed path declares parameters at the SAME flax paths
    (stage1/conv0/kernel, ...) with the same shapes and init distributions
    as the unpacked ConvBlock — flax derives init RNG from the path, so the
    initial values are bit-identical too.
    """

    in_features: int
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, self.kernel_size,
                        self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class PooledConvBlock(nn.Module):
    """ConvBlock + 2x2/2 max pool with the last bias+relu AFTER the pool.

    Exact: ``relu(pool(z) + b) == pool(relu(z + b))`` bit-for-bit — the max
    commutes with the per-channel bias add (constant within a window), with
    the monotone bf16 rounding of that add, and with the monotone relu —
    while the bias add, the relu mask, and the bias-grad reduction all run
    at 1/4 resolution. Parameter tree identical to
    ``ConvBlock(features, n_convs)`` (+ the pool has no params). Not valid
    for argmax-carrying pools (SegNet): relu reorders negatives, moving the
    argmax; plain max_pool forward values are unaffected.
    """

    features: int
    n_convs: int = 2
    dilation: int = 1
    # 'f2'/'f4': route eligible convs through the fused Winograd kernels
    # (ops/pallas/winograd.py) — fewer MXU multiplies, canonical params.
    # The last conv uses the raw (no-epilogue) form so its bias+relu stay
    # deferred past the pool.
    winograd: str | None = None
    # compute the FIRST conv width-pair-packed (ops/packed_conv.py):
    # for stage2's conv2_1 consuming the 64-channel pool1 output, the
    # packed form runs both sides at full MXU lanes — in particular its
    # input GRADIENT (profiled at 2.9 ms vs ~1.4 ideal at half lanes,
    # VERDICT r2 #2) becomes a full-lane conv. Same canonical params;
    # entering/leaving the packed domain is a free reshape.
    packed_entry: bool = False
    dtype: jnp.dtype = DEFAULT_DTYPE

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from semanticsegmentation_tensorflow_tpu.models.common import (
            conv3x3_bias_relu, winograd_impl,
        )
        from semanticsegmentation_tensorflow_tpu.ops.pool import max_pool

        d = self.dilation
        start = 0
        if (self.packed_entry and d == 1 and self.n_convs >= 2
                and x.shape[2] % 2 == 0):
            from semanticsegmentation_tensorflow_tpu.ops.packed_conv import (
                pack_conv_kernel, pack_pairs,
            )
            k0, b0 = _ConvParams(x.shape[-1], self.features, name="conv0")()
            z = lax.conv_general_dilated(
                pack_pairs(x.astype(self.dtype)),
                pack_conv_kernel(k0).astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=_DN)
            x = nn.relu(unpack_pairs(z) + b0.astype(self.dtype))
            start = 1
        for i in range(start, self.n_convs - 1):
            ki, bi = _ConvParams(x.shape[-1], self.features,
                                 name=f"conv{i}")()
            x = conv3x3_bias_relu(x, ki, bi, dtype=self.dtype, dilation=d,
                                  winograd=self.winograd)
        k, b = _ConvParams(x.shape[-1], self.features,
                           name=f"conv{self.n_convs - 1}")()
        impl = winograd_impl(x.shape, k.shape, self.winograd, d)
        if impl == "xla":
            from semanticsegmentation_tensorflow_tpu.ops.winograd import (
                winograd_conv2d,
            )
            z = winograd_conv2d(x.astype(self.dtype), k,
                                jnp.zeros((k.shape[-1],), jnp.float32),
                                self.winograd.rstrip("x"), False)
        elif impl == "pallas":
            from semanticsegmentation_tensorflow_tpu.ops.pallas.winograd import (
                winograd_conv3x3,
            )
            z = winograd_conv3x3(x.astype(self.dtype), k, self.winograd,
                                 jax.default_backend() != "tpu")
        else:
            z = lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype),
                window_strides=(1, 1),
                padding=((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=_DN)
        return nn.relu(max_pool(z, 2) + b.astype(self.dtype))


class PackedStage1(nn.Module):
    """conv3x3 -> relu -> conv3x3 -> relu -> maxpool2x2, pair-packed.

    Drop-in replacement for ``ConvBlock(features, n_convs=2)`` + ``max_pool``
    with an identical parameter tree. Requires even input width.

    ``pallas_pool``: use the fused Pallas stage1 tail
    (ops/pallas/stage1.py: relu -> conv1_2 at 4/3 canonical FLOPs via
    grouped full-lane dots -> pool -> bias -> relu in one kernel pair, with
    first-max-wins routing identical to the jnp path). None = auto (on for
    the TPU backend, and only for the canonical features=64). Set False
    when the model runs under a compiler-partitioned (2-D spatial) mesh —
    XLA's SPMD partitioner cannot partition through a pallas_call.
    """

    features: int = 64
    dtype: jnp.dtype = DEFAULT_DTYPE
    pallas_pool: bool | None = None
    # SPMD halo-array mode for the fused kernel (custom_partitioning over
    # row blocks) — REQUIRED under a height-sharded (2-D spatial) mesh,
    # a few ms/step slower single-device (ops/pallas/stage1.py).
    pallas_spmd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f = self.features
        k1, b1 = _ConvParams(x.shape[-1], f, name="conv0")()
        k2, b2 = _ConvParams(f, f, name="conv1")()
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"packed stage1 needs even H, W; got {x.shape[1:3]}")

        dt = self.dtype
        x = x.astype(dt)
        z1 = lax.conv_general_dilated(
            x, pack_stem_conv1(k1).astype(dt), window_strides=(1, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        use_pallas = self.pallas_pool
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and f == 64
        elif use_pallas and f != 64:
            raise ValueError(
                f"pallas_pool=True requires the canonical features=64 "
                f"(got {f}); the fused stage1 kernel is specialised to the "
                "128-lane packed width")
        if use_pallas:
            from semanticsegmentation_tensorflow_tpu.ops.pallas.stage1 import (
                fused_stage1_tail,
            )
            # off-TPU an explicit pallas_pool=True runs the kernel in
            # interpret mode (slow but correct) instead of failing to lower.
            # b1 stays un-added: the kernel folds it (its XLA transpose was
            # a profiled ~1.3 ms full-size reduce of dz1).
            return fused_stage1_tail(z1, k2, b2, b1,
                                     jax.default_backend() != "tpu",
                                     self.pallas_spmd)
        z1 = z1 + jnp.tile(b1, 2).astype(dt)
        y = lax.conv_general_dilated(
            nn.relu(z1), pack_stem_conv2(k2).astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        # bias + relu moved AFTER the pool — exact: max commutes with the
        # per-channel bias add (constant within a window) and with the
        # monotone relu, so relu(pool(z) + b) == pool(relu(z + b)) value-
        # and gradient-wise, while the bias add, the relu mask, and the
        # bias-grad reduction all run at 1/4 resolution (measured -5 ms).
        return nn.relu(pool_pairs(y) + b2.astype(dt))


class PackedSegNetStage1(nn.Module):
    """SegNet encoder stage1: conv3x3 -> relu -> conv3x3 -> +b -> relu ->
    2x2 argmax pool, width-pair-packed.

    Drop-in replacement for ``ConvBlock(features, n_convs=2)`` +
    ``max_pool_with_argmax`` with an identical parameter tree; returns
    (pooled, within-window argmax u8) with the reference's
    max_pool_with_argmax semantics (row-major window order, first max
    wins — models/segnet.py). Unlike the FCN stage1 the bias+relu CANNOT
    be deferred past the pool here: the pooled VALUE commutes but the
    recorded index does not (relu reorders negatives), so the fused kernel
    runs in ``biased_codes`` mode (ops/pallas/stage1.py).
    """

    features: int = 64
    dtype: jnp.dtype = DEFAULT_DTYPE
    pallas_pool: bool | None = None
    # see PackedStage1.pallas_spmd
    pallas_spmd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        from semanticsegmentation_tensorflow_tpu.ops.pool import (
            max_pool_with_argmax,
        )

        f = self.features
        k1, b1 = _ConvParams(x.shape[-1], f, name="conv0")()
        k2, b2 = _ConvParams(f, f, name="conv1")()
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"packed stage1 needs even H, W; got {x.shape[1:3]}")

        dt = self.dtype
        x = x.astype(dt)
        z1 = lax.conv_general_dilated(
            x, pack_stem_conv1(k1).astype(dt), window_strides=(1, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        use_pallas = self.pallas_pool
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and f == 64
        elif use_pallas and f != 64:
            raise ValueError(
                f"pallas_pool=True requires the canonical features=64 "
                f"(got {f}); the fused stage1 kernel is specialised to the "
                "128-lane packed width")
        if use_pallas:
            from semanticsegmentation_tensorflow_tpu.ops.pallas.stage1 import (
                fused_segnet_stage1_tail,
            )
            pooled, idx = fused_segnet_stage1_tail(
                z1, k2, b2, b1, jax.default_backend() != "tpu",
                self.pallas_spmd)
            return pooled, idx.astype(jnp.int8)
        z1 = z1 + jnp.tile(b1, 2).astype(dt)
        y = lax.conv_general_dilated(
            nn.relu(z1), pack_stem_conv2(k2).astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        full = nn.relu(unpack_pairs(y) + b2.astype(dt))
        return max_pool_with_argmax(full, 2)

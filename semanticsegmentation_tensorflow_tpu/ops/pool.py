"""Pooling ops, including SegNet-style max-pool-with-argmax / unpooling.

The reference (SegNet variant, BASELINE.json config 4) relies on TF's
``tf.nn.max_pool_with_argmax`` + a python scatter-based unpool. XLA/TPU has no
native argmax-pooling, and a scatter is hostile to the VPU. We instead exploit
that the pools are non-overlapping 2x2/stride-2: reshape the activation into
explicit windows (a pure layout change XLA compiles to free relayouts),
reduce/argmax over the static window axis, and unpool with a one-hot multiply
back into the window layout. No gather/scatter anywhere; everything stays
dense, vectorized, and fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _to_windows(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """[N,H,W,C] -> [N,H/wh,W/ww,wh*ww,C] non-overlapping windows."""
    n, h, w, c = x.shape
    if h % wh or w % ww:
        raise ValueError(f"spatial dims {(h, w)} not divisible by window {(wh, ww)}")
    x = x.reshape(n, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, H', W', wh, ww, C
    return x.reshape(n, h // wh, w // ww, wh * ww, c)


def _from_windows(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """Inverse of :func:`_to_windows`."""
    n, hp, wp, k, c = x.shape
    assert k == wh * ww
    x = x.reshape(n, hp, wp, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hp * wh, wp * ww, c)


def _reduce_window_max(x: jax.Array, window: int, stride: int,
                       padding: str) -> jax.Array:
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def max_pool(x: jax.Array, window: int = 2, stride: int | None = None,
             padding: str = "SAME") -> jax.Array:
    """Plain max pooling, NHWC, with XLA's native VJP (select_and_scatter).

    Two scatter-free alternatives were measured and REJECTED on v5e: a
    windowed-reshape forward+backward (111 -> 90 img/s on the FCN-8s step)
    and a hybrid (reduce_window forward, dense one-hot backward via
    custom_vjp; 110 -> 90 img/s) — the custom_vjp boundary blocks XLA's
    fusion of the pooling backward into the surrounding gradient fusions,
    costing more than select_and_scatter itself. Equality/tie-semantics
    tests for the backward live in tests/test_ops.py.
    """
    stride = stride or window
    return _reduce_window_max(x, window, stride, padding)


from functools import partial as _vjp_partial


@_vjp_partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_with_argmax(x: jax.Array, window: int = 2) -> tuple[jax.Array, jax.Array]:
    """Non-overlapping max pool returning (pooled, argmax-in-window).

    ``argmax`` is an int8 index in ``[0, window*window)`` per pooled element —
    the within-window flat position of the max (row-major, ties -> lowest
    index, matching TF's behaviour). Carrying the *local* index instead of
    TF's global flat index keeps the tensor tiny (int8) and makes the decoder
    unpool a dense one-hot multiply instead of a scatter.

    The custom VJP routes the cotangent to the RECORDED argmax position —
    TF MaxPoolGradWithArgmax semantics. (jnp.max's own VJP splits exact
    ties evenly, 0.5/0.5, which both diverges from TF and disagrees with
    the index the decoder unpools by.)
    """
    xw = _to_windows(x, window, window)  # [N,H',W',k,C]
    pooled = jnp.max(xw, axis=3)
    argmax = jnp.argmax(xw, axis=3).astype(jnp.int8)
    return pooled, argmax


def _mpa_fwd(x, window):
    pooled, argmax = max_pool_with_argmax(x, window)
    return (pooled, argmax), argmax


def _mpa_bwd(window, argmax, g):
    g_pooled, _ = g  # argmax output is int -> float0 cotangent
    return (max_unpool(g_pooled, argmax, window),)


max_pool_with_argmax.defvjp(_mpa_fwd, _mpa_bwd)


def max_unpool(pooled: jax.Array, argmax: jax.Array, window: int = 2) -> jax.Array:
    """Inverse of :func:`max_pool_with_argmax` (zeros elsewhere).

    Dense formulation, no scatter anywhere. Forward: repeat ``pooled`` and
    ``argmax`` into the full-resolution grid and select where the in-window
    position matches the recorded index. Backward (custom): the windowed
    gather as ``window**2`` strided slices of the cotangent + index selects,
    at pooled (1/4) size.

    Two rejected alternatives, measured on v5e at SegNet dec1 shape
    ([8,192,624,64] -> [8,384,1248,64], 2026-08-17): a one_hot(int32)
    multiply + 6-D window transpose — ``jax.nn.one_hot`` upcasts the index
    to i32, so XLA broadcasts an s32 tensor to FULL output size (4 bytes x
    4x positions = 16x the pooled bytes; the single biggest op in the
    SegNet profile at 3.9 ms) and the window transpose is another full-size
    relayout copy (fwd 19.3 ms standalone); the same with an int8 one-hot
    (fwd 12.2 ms). This formulation: fwd 9.5 ms standalone. Values and
    routing are bit-identical in all three (place-or-zero by the same
    index).
    """
    return _unpool(pooled, lax.stop_gradient(argmax).astype(jnp.int8), window)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _unpool(pooled: jax.Array, argmax: jax.Array, window: int) -> jax.Array:
    k = window
    n, hp, wp, c = pooled.shape
    ix_up = jnp.repeat(jnp.repeat(argmax, k, axis=1), k, axis=2)
    p_up = jnp.repeat(jnp.repeat(pooled, k, axis=1), k, axis=2)
    pos = (jnp.arange(k, dtype=jnp.int8)[:, None] * k
           + jnp.arange(k, dtype=jnp.int8)[None, :])
    pos_up = jnp.tile(pos, (hp, wp))[None, :, :, None]
    return jnp.where(ix_up == pos_up, p_up, jnp.zeros_like(p_up))


def _unpool_fwd(pooled, argmax, window):
    return _unpool(pooled, argmax, window), argmax


def _unpool_bwd(window, argmax, g):
    import numpy as np

    k = window
    n, h, w, c = g.shape
    acc = None
    for dr in range(k):
        for dc in range(k):
            # explicit strided lax.slice: jnp's strided basic indexing
            # lowers to a GATHER with a materialized (H/k, W/k, 2) index
            # array — 4 per unpool in the SegNet decoder backward, slow on
            # TPU (round-4 jaxpr audit, tools/roofline_model.py)
            gs = lax.slice(g, (0, dr, dc, 0), (n, h, w, c), (1, k, k, 1))
            sel = jnp.where(argmax == dr * k + dc, gs, jnp.zeros_like(gs))
            acc = sel if acc is None else acc + sel
    return (acc, np.zeros(argmax.shape, jax.dtypes.float0))


_unpool.defvjp(_unpool_fwd, _unpool_bwd)

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


def max_pool_with_argmax(x: jax.Array, window: int = 2) -> tuple[jax.Array, jax.Array]:
    """Non-overlapping max pool returning (pooled, argmax-in-window).

    ``argmax`` is an int8 index in ``[0, window*window)`` per pooled element —
    the within-window flat position of the max (row-major, ties -> lowest
    index, matching TF's behaviour). Carrying the *local* index instead of
    TF's global flat index keeps the tensor tiny (int8) and makes the decoder
    unpool a dense one-hot multiply instead of a scatter.
    """
    xw = _to_windows(x, window, window)  # [N,H',W',k,C]
    pooled = jnp.max(xw, axis=3)
    argmax = jnp.argmax(xw, axis=3).astype(jnp.int8)
    return pooled, argmax


def max_unpool(pooled: jax.Array, argmax: jax.Array, window: int = 2) -> jax.Array:
    """Inverse of :func:`max_pool_with_argmax` (zeros elsewhere).

    Dense formulation: broadcast ``pooled`` against a one-hot of ``argmax``
    over the static window axis, then undo the window layout. XLA fuses the
    one-hot + multiply + transpose into a single relayout-ish kernel; there is
    no scatter so it vectorizes on the VPU and differentiates cleanly (the
    VJP is exactly the windowed gather, which XLA also keeps dense).
    """
    k = window * window
    onehot = jax.nn.one_hot(argmax.astype(jnp.int32), k, axis=3, dtype=pooled.dtype)
    xw = pooled[:, :, :, None, :] * onehot  # [N,H',W',k,C]
    return _from_windows(xw, window, window)

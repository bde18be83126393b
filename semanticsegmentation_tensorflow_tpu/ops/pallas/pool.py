"""Pallas TPU kernel: fused 2x2/2 max pool of the width-pair-packed stage1.

The jnp formulation of ops/packed_stem.pool_pairs runs as ~5 XLA elementwise
passes over 64-channel full-resolution tensors, each lane-padded 2x by the
(8,128) tiling — measured ~18 ms/step of the FCN-8s train step. This kernel
does the whole pool in one pass per direction:

  forward:  read a packed [rows, Wp, 2F] tile, lane-half max (column pair),
            row-pair max, write [rows/2, Wp, F]. One read of the conv
            output, one quarter-size write.
  backward: recompute the routing from the saved conv output (cheaper than
            materializing an index tensor: no extra fwd write, one extra
            read in bwd) and scatter the cotangent to the FIRST max in
            (dy, dx) row-major window order — exactly XLA
            select_and_scatter's (and TF MaxPoolGrad's) tie behaviour.

All indexing is static (Mosaic on this v5e stack miscompiles/crashes on
dynamic lane/sublane slicing — see ops/pallas/preprocess.py); max/compare
are exact in bf16, so forward values and gradients are bit-identical to the
jnp path (asserted in tests/test_packed_stem.py), making the kernel a pure
perf dispatch, not a semantics switch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(h: int, target: int = 8) -> int:
    """Largest even row-tile <= target dividing h."""
    th = min(target, h)
    while h % th or th % 2:
        th -= 1
        if th < 2:
            raise ValueError(f"height {h} not tileable into even rows")
    return th


def _fwd_kernel(y_ref, out_ref):
    th = y_ref.shape[1]
    f = y_ref.shape[-1] // 2
    y = y_ref[0].reshape(th // 2, 2, y_ref.shape[2], 2 * f)
    m = jnp.maximum(y[..., :f], y[..., f:])       # column-pair max
    out_ref[0] = jnp.maximum(m[:, 0], m[:, 1])    # row-pair max


def _bwd_kernel(y_ref, g_ref, gy_ref):
    th = y_ref.shape[1]
    wp = y_ref.shape[2]
    f = y_ref.shape[-1] // 2
    # comparisons in f32: Mosaic on this v5e stack rejects bf16 compares
    # ("Target does not support this comparison"); f32 equality of exact
    # bf16 values is identical. Converted per-quarter to stay inside the
    # 16M scoped-VMEM limit.
    y = y_ref[0].reshape(th // 2, 2, wp, 2 * f)
    e0 = y[:, 0, :, :f].astype(jnp.float32)       # (dy=0, dx=0)
    o0 = y[:, 0, :, f:].astype(jnp.float32)       # (dy=0, dx=1)
    e1 = y[:, 1, :, :f].astype(jnp.float32)       # (dy=1, dx=0)
    o1 = y[:, 1, :, f:].astype(jnp.float32)       # (dy=1, dx=1)
    p = jnp.maximum(jnp.maximum(e0, o0), jnp.maximum(e1, o1))
    g = g_ref[0]
    # first max in (dy, dx) row-major order wins
    w0 = e0 == p
    w1 = (o0 == p) & ~w0
    w2 = (e1 == p) & ~(w0 | w1)
    w3 = (o1 == p) & ~(w0 | w1 | w2)
    z = jnp.zeros_like(g)
    row0 = jnp.concatenate(
        [jnp.where(w0, g, z), jnp.where(w1, g, z)], axis=-1)
    row1 = jnp.concatenate(
        [jnp.where(w2, g, z), jnp.where(w3, g, z)], axis=-1)
    gy_ref[0] = jnp.stack([row0, row1], axis=1).reshape(th, wp, 2 * f)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def pool_pairs_pallas(y: jax.Array, interpret: bool = False) -> jax.Array:
    """[N,H,Wp,2F] packed pairs -> [N,H/2,Wp,F]; see module docstring."""
    return _pool_fwd_call(y, interpret)


def _pool_fwd_call(y, interpret):
    n, h, wp, c2 = y.shape
    f = c2 // 2
    th = _row_tile(h)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h // 2, wp, f), y.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec((1, th, wp, c2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th // 2, wp, f), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y)


def _pool_fwd(y, interpret):
    return _pool_fwd_call(y, interpret), y


def _pool_bwd(interpret, y, g):
    n, h, wp, c2 = y.shape
    f = c2 // 2
    th = _row_tile(h)
    gy = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, g.dtype),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, c2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th // 2, wp, f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wp, c2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, g.astype(y.dtype))
    return (gy,)


pool_pairs_pallas.defvjp(_pool_fwd, _pool_bwd)

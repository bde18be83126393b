"""Winograd fast convolution for 3x3 SAME convs: the FLOP-reduction
reformulation of the VGG conv stacks.

Why: the stage2-5 3x3 convolutions dominate FCN-8s's canonical FLOPs
(~60% of 1151 GFLOP/img at KITTI resolution — ARCHITECTURE.md roofline).
Round 2 exhausted the *latency* wins (layout, fusion, packing); reaching the
driver's >=95%-of-roofline target requires doing fewer multiplications for
the same math. Winograd F(m,3) computes each m x m output tile of a 3x3
convolution with (m+2)^2 multiplies instead of 9 m^2:

    Y = A^T [ (G g G^T) (.) (B^T d B) ] A        per m x m tile,

where d is the (m+2)x(m+2) input tile (stride-m overlapping), g the 3x3
kernel, and (.) an elementwise product that, with channels, becomes a
per-coordinate [tiles, Cin] @ [Cin, Cout] contraction — (m+2)^2 dense MXU
matmuls.

Variants (measured on this repo's numerics harness, tests/test_winograd.py):

* ``f2`` — F(2x2, 3x3), points {0, +-1}: 16 multiplies / 4 outputs = 2.25x
  fewer MXU FLOPs. B^T/A^T entries are 0/+-1, so the Winograd domain barely
  amplifies bf16 rounding: measured ~1.5-1.7x the rel-RMS error of the bf16
  DIRECT conv (i.e. numerically free). The production default.
* ``f4`` — F(4x4, 3x3), points {0, -1, 1, 1/2, -2}: 36/16 = 4x fewer MXU
  FLOPs. The classic {0,+-1,+-2} points measured 8.5-11.4x the direct-bf16
  error; these mixed points (the known error-optimized choice — fractional
  points shrink the B^T/A^T entry growth) measured 5.6-7.3x (~1.4% rel
  RMS). Opt-in: more MXU saving, real numerics cost.

TPU reality check (and why the production path is a *fused Pallas kernel*,
ops/pallas/winograd.py): materializing the transformed tensors in HBM costs
(m+2)^2/m^2 x the input size in extra traffic each way, which at VGG's
shapes is slower than the multiplies it saves — the transforms only pay
when V and M live entirely in VMEM. This module owns the math: the
transform matrices, the exact-but-slow jnp reference (the correctness
oracle for the kernel), and the weight-side transforms shared by both
paths.

Numerics policy (both paths): transforms in f32, only the per-coordinate
contraction in bf16 (the MXU input dtype the direct conv uses too), f32
accumulation. Error bounds vs the direct conv are asserted in
tests/test_winograd.py.

Semantics: NHWC, 3x3 kernel, stride 1, SAME zero padding — exactly
``lax.conv_general_dilated(..., padding=((1,1),(1,1)))``, the reference's
``tf.layers.conv2d(..., padding='same')`` (SURVEY.md §3.4; mount empty per
SURVEY.md §0, semantics pinned by BASELINE.json:7).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

R = 3  # kernel size


class WinogradVariant(NamedTuple):
    name: str
    m: int                # output tile
    a: int                # input tile = m + 2
    BT: np.ndarray        # [a, a] input transform (d -> B^T d B)
    G: np.ndarray         # [a, 3] kernel transform (g -> G g G^T)
    AT: np.ndarray        # [m, a] output transform (M -> A^T M A)


def _toom_cook(points: list[float], m: int) -> WinogradVariant:
    """Construct F(m,3) matrices from m+1 finite interpolation points (the
    implicit last point is infinity). Standard Toom-Cook/Lavin scheme: A^T
    and G are Vandermonde-derived; B^T is solved exactly from the
    correctness constraint  A^T[(G e_l) (.) (B^T e_k)] = conv(e_k, e_l)
    (linear in B^T; residual checked at build time)."""
    n = m + R - 1
    assert len(points) == n - 1
    at = np.zeros((m, n))
    for i in range(m):
        for j, p in enumerate(points):
            at[i, j] = p ** i
    at[m - 1, n - 1] = 1.0
    g = np.zeros((n, R))
    for j, p in enumerate(points):
        norm = np.prod([p - q for q in points if q != p])
        g[j] = [p ** i for i in range(R)]
        g[j] /= norm
    g[n - 1] = [0.0] * (R - 1) + [1.0]
    bt = np.zeros((n, n))
    for k in range(n):
        rows, rhs = [], []
        for i in range(m):
            for l in range(R):
                rows.append(at[i] * g[:, l])
                rhs.append(1.0 if k == i + l else 0.0)
        sol, res, *_ = np.linalg.lstsq(np.asarray(rows), np.asarray(rhs),
                                       rcond=None)
        bt[:, k] = sol
    # snap to exact dyadic rationals (all entries are k/2^s for these point
    # sets) and verify the algebra exactly
    bt = np.round(bt * 64) / 64
    for k in range(n):
        for i in range(m):
            for l in range(R):
                want = 1.0 if k == i + l else 0.0
                got = float(np.sum(at[i] * g[:, l] * bt[:, k]))
                assert abs(got - want) < 1e-10, (points, m, k, i, l, got)
    return WinogradVariant(f"f{m}", m, n,
                           bt.astype(np.float32), g.astype(np.float32),
                           at.astype(np.float32))


# F(2,3) {0, 1, -1}: B^T/A^T entries 0/+-1 — near-lossless in bf16.
F2 = _toom_cook([0.0, 1.0, -1.0], m=2)
# F(4,3) mixed points {0, -1, 1, 1/2, -2}: measured ~1.6x lower bf16 error
# than the classic {0, +-1, +-2} at the same 4x FLOP cut.
F4 = _toom_cook([0.0, -1.0, 1.0, 0.5, -2.0], m=4)

VARIANTS: dict[str, WinogradVariant] = {"f2": F2, "f4": F4}


def transform_kernel(w: jax.Array, variant: str = "f2") -> jax.Array:
    """[3,3,Cin,Cout] -> U [a,a,Cin,Cout] = G w G^T (f32).

    Shared by the reference and the Pallas path; tiny (per-weight, not
    per-pixel), so it runs in XLA and its autodiff gives the exact
    dW = G^T dU G without a hand-written backward."""
    g = jnp.asarray(VARIANTS[variant].G)
    return jnp.einsum("ir,js,rsco->ijco", g, g, w.astype(jnp.float32))


def rot180_swap(w: jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] -> the kernel whose SAME conv computes the input
    gradient of w's SAME conv: spatially flipped, in/out channels swapped."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _tile_input(x: jax.Array, ht: int, wt: int, m: int, a: int) -> jax.Array:
    """SAME-padded NHWC -> overlapping a x a tiles d [a,a,N,ht,wt,C].

    x must already be zero-padded by 1 on each spatial edge and sized
    (m*ht+2, m*wt+2). a^2 strided slices — fine for a reference."""
    rows = []
    for r in range(a):
        cols = []
        for s in range(a):
            cols.append(x[:, r:r + m * ht:m, s:s + m * wt:m, :])
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def winograd_conv2d_ref(x: jax.Array, w: jax.Array, variant: str = "f2",
                        mxu_dtype=None) -> jax.Array:
    """Reference Winograd F(m,3) SAME conv (NHWC, stride 1).

    Transforms in f32; the per-coordinate channel contraction runs in
    ``mxu_dtype`` (None = f32; pass jnp.bfloat16 to reproduce the
    production kernel's MXU precision) with f32 accumulation. Returns f32.
    Exact (up to float summation order) reformulation of
    lax.conv_general_dilated — the oracle tests prove it.
    """
    var = VARIANTS[variant]
    m, a = var.m, var.a
    n, h, wd, c = x.shape
    assert w.shape[:2] == (R, R) and w.shape[2] == c
    co = w.shape[3]
    ht, wt = -(-h // m), -(-wd // m)
    # SAME pad (1) + pad up to whole m x m output tiles
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1 + m * ht - h), (1, 1 + m * wt - wd), (0, 0)))
    d = _tile_input(xp, ht, wt, m, a)                  # [a,a,N,ht,wt,C]
    bt = jnp.asarray(var.BT)
    v = jnp.einsum("ir,js,rsnhwc->ijnhwc", bt, bt, d)  # B^T d B
    u = transform_kernel(w, variant)                   # [a,a,C,Co]
    if mxu_dtype is not None:
        v, u = v.astype(mxu_dtype), u.astype(mxu_dtype)
    mm = jnp.einsum("ijnhwc,ijco->ijnhwo", v, u,
                    preferred_element_type=jnp.float32)
    at = jnp.asarray(var.AT)
    y = jnp.einsum("pi,lj,ijnhwo->nhpwlo", at, at, mm)  # [N,ht,m,wt,m,Co]
    y = y.reshape(n, m * ht, m * wt, co)
    return y[:, :h, :wd, :]


def direct_conv2d(x: jax.Array, w: jax.Array, dtype=None) -> jax.Array:
    """The direct SAME conv this module reformulates (oracle)."""
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)

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

R = 3  # default kernel size (VGG 3x3 stacks)


class WinogradVariant(NamedTuple):
    name: str
    m: int                # output tile
    r: int                # kernel size
    a: int                # input tile = m + r - 1
    BT: np.ndarray        # [a, a] input transform (d -> B^T d B)
    G: np.ndarray         # [a, r] kernel transform (g -> G g G^T)
    AT: np.ndarray        # [m, a] output transform (M -> A^T M A)


def _toom_cook(points: list[float], m: int, r: int = R) -> WinogradVariant:
    """Construct F(m,r) matrices from m+r-2 finite interpolation points (the
    implicit last point is infinity). Standard Toom-Cook/Lavin scheme: A^T
    and G are Vandermonde-derived; B^T is solved exactly from the
    correctness constraint  A^T[(G e_l) (.) (B^T e_k)] = conv(e_k, e_l)
    (linear in B^T; residual checked at build time)."""
    n = m + r - 1
    assert len(points) == n - 1
    at = np.zeros((m, n))
    for i in range(m):
        for j, p in enumerate(points):
            at[i, j] = p ** i
    at[m - 1, n - 1] = 1.0
    g = np.zeros((n, r))
    for j, p in enumerate(points):
        norm = np.prod([p - q for q in points if q != p])
        g[j] = [p ** i for i in range(r)]
        g[j] /= norm
    g[n - 1] = [0.0] * (r - 1) + [1.0]
    bt = np.zeros((n, n))
    for k in range(n):
        rows, rhs = [], []
        for i in range(m):
            for l in range(r):
                rows.append(at[i] * g[:, l])
                rhs.append(1.0 if k == i + l else 0.0)
        sol, res, *_ = np.linalg.lstsq(np.asarray(rows), np.asarray(rhs),
                                       rcond=None)
        bt[:, k] = sol
    # snap to exact dyadic rationals where they are (all entries are k/2^s
    # for the r=3 point sets; larger r needs finer grids), then verify the
    # algebra to fp tolerance
    for s in (6, 8, 10, 12):
        snapped = np.round(bt * 2 ** s) / 2 ** s
        if np.allclose(snapped, bt, atol=1e-9):
            bt = snapped
            break
    for k in range(n):
        for i in range(m):
            for l in range(r):
                want = 1.0 if k == i + l else 0.0
                got = float(np.sum(at[i] * g[:, l] * bt[:, k]))
                assert abs(got - want) < 1e-6, (points, m, k, i, l, got)
    name = f"f{m}" if r == R else f"f{m}r{r}"
    return WinogradVariant(name, m, r, n,
                           bt.astype(np.float32), g.astype(np.float32),
                           at.astype(np.float32))


# F(2,3) {0, 1, -1}: B^T/A^T entries 0/+-1 — near-lossless in bf16.
F2 = _toom_cook([0.0, 1.0, -1.0], m=2)
# F(3,3) symmetric fractional points {1, -1, 1/2, -1/2} (no zero point):
# scanned best of 11 candidate sets for bf16 error through the DWM
# tile-conv path (~3.1-3.8x the direct-bf16 error vs 4.4-5.6x for the
# classic {0,+-1,2}) — the large-kernel decomposition's building block
# (m=3 matches the 3-row kernel-block offsets, aligning all blocks on
# ONE tile grid; see winograd_conv_large).
F3 = _toom_cook([1.0, -1.0, 0.5, -0.5], m=3)
# F(4,3) mixed points {0, -1, 1, 1/2, -2}: measured ~1.6x lower bf16 error
# than the classic {0, +-1, +-2} at the same 4x FLOP cut.
F4 = _toom_cook([0.0, -1.0, 1.0, 0.5, -2.0], m=4)
# F(2,7) for the FCN fc6 7x7 conv: 16 multiplies per 2x2 outputs vs 49
# per output = 3.06x fewer MXU FLOPs. REJECTED for production (kept for
# the benchmark harness): measured relrms 0.087 vs direct-bf16 0.0028
# (the nested 8-point transforms amplify rounding ~30x) AND 17.9 ms vs
# 9.4 direct at the fc6 shape (tools/bench_winograd.py, v5e).
F2R7 = _toom_cook([0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0], m=2, r=7)

VARIANTS: dict[str, WinogradVariant] = {
    "f2": F2, "f3": F3, "f4": F4, "f2r7": F2R7,
}


def transform_kernel(w: jax.Array, variant: str = "f2") -> jax.Array:
    """[3,3,Cin,Cout] -> U [a,a,Cin,Cout] = G w G^T (f32).

    Shared by the reference and the Pallas path; tiny (per-weight, not
    per-pixel), so it runs in XLA and its autodiff gives the exact
    dW = G^T dU G without a hand-written backward."""
    g = jnp.asarray(VARIANTS[variant].G)
    return jnp.einsum("ir,js,rsco->ijco", g, g, w.astype(jnp.float32))


def rot180_swap(w: jax.Array) -> jax.Array:
    """[r,r,Cin,Cout] -> the kernel whose SAME conv computes the input
    gradient of w's SAME conv: spatially flipped, in/out channels swapped.
    (Exact for odd r, where SAME padding is symmetric.)"""
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
    m, a, r = var.m, var.a, var.r
    n, h, wd, c = x.shape
    assert w.shape[:2] == (r, r) and w.shape[2] == c
    co = w.shape[3]
    ht, wt = -(-h // m), -(-wd // m)
    p0 = r // 2
    # SAME pad (r//2) + pad up to whole m x m output tiles
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (p0, p0 + m * ht - h), (p0, p0 + m * wt - wd),
                  (0, 0)))
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


def direct_conv2d(x: jax.Array, w: jax.Array, dtype=None,
                  preferred=jnp.float32) -> jax.Array:
    """The direct SAME conv this module reformulates (oracle).

    `preferred` is the conv output/accumulation request (MXU accumulation
    is f32 in hardware either way). Pass the operand dtype when the conv
    must be differentiable: with mixed output/operand dtypes JAX's conv
    transpose rule builds a bf16×f32 wgrad conv, which
    lax.conv_general_dilated rejects.
    """
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    p0 = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((p0, p0), (p0, p0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


# ---------------------------------------------------------------------------
# production XLA-native path
# ---------------------------------------------------------------------------
#
# Why a second production path next to the fused Pallas kernel
# (ops/pallas/winograd.py): on the compute-bound wide layers (Cin >= 512,
# and fc6's 7x7) the Winograd-domain tensors V and M are only ~2.25x the
# activation size at f4 (a^2/m^2) and ~1x the *weight*-dominated fc6 FLOPs,
# so paying their HBM round-trip still nets out far ahead of the 4x (f4) /
# 3.06x (f2r7) MXU-multiply reduction — while XLA's batched dot_general and
# fusion machinery generate better MXU/VPU schedules for the big
# contractions than the hand-written kernel achieves (measured: the fused
# kernel runs conv4_2 at 7.6 ms where this path + direct run ~2-3 ms).
# The transforms are einsums XLA fuses into the slice/cast producers;
# V and M are stored bf16 (the MXU input dtype), combine arithmetic in f32.
#
# The custom VJP keeps the FLOP reduction in the backward:
#   dx = winograd_same_conv(dz, rot180_swap(w))   (exact SAME-conv identity)
#   dU[i,j] = V[i,j]^T @ dM[i,j],  dM = A-side transform of dz
#   dw = G^T dU G
# instead of letting autodiff transpose the strided-slice tiling (an
# overlap-add scatter XLA executes as a^2 full-size pads+adds).


def _pad_to_tiles(x: jax.Array, m: int, r: int) -> jax.Array:
    """Pad NHWC x for the tiled transform: SAME halo (r//2 each side)
    plus zero fill up to whole m x m output tiles. Output rows =
    m*ht + (r-1)."""
    n, h, wd, c = x.shape
    ht, wt = -(-h // m), -(-wd // m)
    p0 = r // 2
    return jnp.pad(x, ((0, 0), (p0, m * ht + r - 1 - h - p0),
                       (p0, m * wt + r - 1 - wd - p0), (0, 0)))


def _transform_input(xp: jax.Array, var: WinogradVariant) -> jax.Array:
    """Padded NHWC -> V [a*a, N*ht*wt, C] bf16.

    The a^2 stride-m slices read xp with a^2/m^2 amplification; XLA fuses
    slice -> f32 combine -> bf16 cast into one V-writing fusion."""
    m, a = var.m, var.a
    n, hp, wp, c = xp.shape
    ht, wt = (hp - (a - m)) // m, (wp - (a - m)) // m
    d = _tile_input(xp, ht, wt, m, a)                  # [a,a,N,ht,wt,C]
    bt = jnp.asarray(var.BT)
    v = jnp.einsum("ir,js,rsnhwc->ijnhwc", bt, bt,
                   d.astype(jnp.float32))
    return v.astype(jnp.bfloat16).reshape(a * a, n * ht * wt, c)


def _transform_cotangent(g: jax.Array, var: WinogradVariant) -> jax.Array:
    """dz NHWC (padded to m-multiples, no halo) -> dM [a*a, N*ht*wt, F]
    bf16: dM[i,j] = sum_{p,l} AT[p,i] AT[l,j] dz[p,l] per tile."""
    m, a = var.m, var.a
    n, h, wd, f = g.shape
    ht, wt = h // m, wd // m
    gt = g.reshape(n, ht, m, wt, m, f).astype(jnp.float32)
    at = jnp.asarray(var.AT)
    dm = jnp.einsum("pi,lj,nhpwlf->ijnhwf", at, at, gt)
    return dm.astype(jnp.bfloat16).reshape(a * a, n * ht * wt, f)


def _untransform_output(mm: jax.Array, var: WinogradVariant,
                        n: int, h: int, wd: int) -> jax.Array:
    """M [a*a, N*ht*wt, F] -> y [N, h, wd, F] f32 (cropped)."""
    m, a = var.m, var.a
    ht, wt = -(-h // m), -(-wd // m)
    f = mm.shape[-1]
    at = jnp.asarray(var.AT)
    mt = mm.reshape(a, a, n, ht, wt, f).astype(jnp.float32)
    y = jnp.einsum("pi,lj,ijnhwf->nhpwlf", at, at, mt)
    y = y.reshape(n, m * ht, m * wt, f)
    return y[:, :h, :wd, :]


def _winograd_raw(x: jax.Array, u: jax.Array, var: WinogradVariant):
    """Core: x NHWC bf16, u [a*a, C, F] bf16 -> y f32 [N,h,w,F] and the
    saved V (for the weight gradient)."""
    n, h, wd, c = x.shape
    xp = _pad_to_tiles(x, var.m, var.r)
    v = _transform_input(xp, var)                      # [a^2, T, C]
    mm = lax.dot_general(v, u, (((2,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    mm = mm.astype(jnp.bfloat16)
    return _untransform_output(mm, var, n, h, wd), v


def _u_of(w: jax.Array, var: WinogradVariant) -> jax.Array:
    u = transform_kernel(w, var.name)                  # [a,a,C,F] f32
    a = var.a
    return u.reshape(a * a, w.shape[2], w.shape[3]).astype(jnp.bfloat16)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def winograd_conv2d(x: jax.Array, w: jax.Array, b: jax.Array,
                    variant: str = "f4", relu: bool = False) -> jax.Array:
    """Production XLA-native Winograd SAME conv (stride 1, odd r).

    x NHWC bf16; w [r,r,Cin,Cout] f32 (canonical parameters — identical
    checkpoints to nn.Conv); b [Cout] f32 (pass zeros for a raw conv;
    the add folds away in XLA). Returns bf16.
    Epilogue (bias add, relu) fuses into the output-transform fusion.
    Replaces ``relu(direct_conv2d(x, w) + b)`` — the reference's
    ``tf.layers.conv2d(..., padding='same', activation=relu)``
    (SURVEY.md §3.4) — at 1/2.25 (f2), 1/4 (f4), 1/3.06 (f2r7) the MXU
    multiplies in fwd AND both backward passes (custom VJP below).
    """
    y, _ = _wino_fwd(x, w, b, variant, relu)
    return y


def _wino_fwd(x, w, b, variant, relu):
    var = VARIANTS[variant]
    u = _u_of(w, var)
    y, v = _winograd_raw(x, u, var)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype)
    # residuals: V (bf16, the fwd's own intermediate — rematerializing it
    # costs the input transform again; saving it costs a^2/m^2 x activation
    # HBM) is NOT saved: measured cheaper to rebuild from x in bwd than to
    # spill/reload at these shapes. Save x, w, y (relu mask).
    del v
    return y, (x, w, y if relu else None)


def _wino_bwd(variant, relu, res, g):
    x, w, y = res
    var = VARIANTS[variant]
    n, h, wd, c = x.shape
    g = g.astype(x.dtype)
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros_like(g))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    # dx: SAME conv with the rotated/swapped kernel, Winograd again
    u2 = _u_of(rot180_swap(w), var)
    dx, _ = _winograd_raw(g, u2, var)
    dx = dx.astype(x.dtype)
    # dw: dU[k] = V[k]^T @ dM[k]; dw = G^T dU G
    xp = _pad_to_tiles(x, var.m, var.r)
    v = _transform_input(xp, var)                      # [a^2, T, C]
    m = var.m
    ht, wt = -(-h // m), -(-wd // m)
    gp = jnp.pad(g, ((0, 0), (0, m * ht - h), (0, m * wt - wd), (0, 0)))
    dm = _transform_cotangent(gp, var)                 # [a^2, T, F]
    du = lax.dot_general(v, dm, (((1,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    gm = jnp.asarray(var.G)
    du = du.reshape(var.a, var.a, c, w.shape[3])
    dw = jnp.einsum("ir,js,ijco->rsco", gm, gm, du).astype(w.dtype)
    return dx, dw, db.astype(w.dtype)


winograd_conv2d.defvjp(_wino_fwd, _wino_bwd)


# ---------------------------------------------------------------------------
# decomposed large-kernel Winograd (fc6's 7x7): Winograd-domain tile conv
# ---------------------------------------------------------------------------
#
# F(2,7)'s transform points amplify bf16 rounding ~30x the direct conv —
# unusable (measured, see F2R7 above). The fix is the decomposable-Winograd
# idea: split the r x r kernel into 3x3 blocks at row/col offsets {0,3,6,..}
# and run each block through F(3,3). Because the block offsets (multiples
# of 3) EQUAL the output tile size m=3, every block lives on the SAME tile
# grid, shifted by a whole number of tiles — so the input transform is
# computed ONCE, and the per-coordinate contraction becomes a 3x3 (nb x nb)
# CONVOLUTION over tile indices:
#
#   M[ij, t] = sum_{d} V[ij, t + d] @ U[ij, d]        d in {0..nb-1}^2
#
# i.e. a batch-of-25 standard XLA convs [N,Th,Tw,Cin] * [nb,nb,Cin,Cout]
# — MXU-native, one V, one M, one untransform. Kernels whose r is not a
# multiple of 3 are zero-padded up (7 -> 9); the padding rides along for
# free inside the block transforms.
#
# Multiply count per 3x3 output tile at r=7: 9 blocks x 25 coords = 225
# vs 9 x 49 = 441 direct = 1.96x fewer MXU multiplies, at F(3,3) numerics
# (measured ~3.1-3.8x the direct-bf16 error with the scanned point set —
# between production-default f2 and opt-in f4).
#
# Two REJECTED formulations (both measured on v5e, tools/bench_winograd.py,
# fc6 12x39x512->4096 b16 fwd: direct 9.4 ms):
#   * monolithic F(2,7): 17.9 ms AND relrms 0.087 — see F2R7 above.
#   * four F(2,3) 3x3 blocks + direct edge strips ("f2d"/"f4d" in the
#     bench harness): 25.4 / 18.6 ms — each block materializes its own
#     [a^2, T, 4096] M tensor (4 x 252 MB round-trips) and the f32
#     accumulator adds four more full-size passes; the FLOP saving drowns.
#
# fc6 is the profiled step's hottest op (~24 ms at 86-94% MXU, batch-16
# fc4096) and — unlike the stage2-5 convs — is DOT-dominated: at 12x39
# spatial the single V/M pair here is small relative to the weight-heavy
# compute, so the materialized form keeps the multiply reduction.


def _dwm_conv_raw(x: jax.Array, w: jax.Array, var: WinogradVariant,
                  mxu_dtype=jnp.bfloat16):
    """Core: SAME r x r conv (odd r >= 5) via the Winograd-domain tile
    conv. x NHWC (any float dtype), w f32; the tile-conv contraction runs
    in ``mxu_dtype`` (production bf16; f32 for the exactness oracle).
    Returns (y f32, V [a*a, N, Th, Tw, C])."""
    m, a = var.m, var.a
    # block offsets are multiples of 3, so tile-grid alignment needs m == 3
    assert (var.r, var.m) == (3, 3), "tile-conv decomposition needs F(3,3)"
    n, h, wd, c = x.shape
    r, f = w.shape[0], w.shape[3]
    nb = -(-r // 3)
    p0 = r // 2
    tho, two = -(-h // m), -(-wd // m)          # output tiles
    th, tw = tho + nb - 1, two + nb - 1         # input tiles (halo'd)
    hp, wp = m * th + 2, m * tw + 2
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (p0, hp - p0 - h), (p0, wp - p0 - wd), (0, 0)))
    d = _tile_input(xp, th, tw, m, a)           # [a,a,N,Th,Tw,C]
    bt = jnp.asarray(var.BT)
    v = jnp.einsum("ir,js,rsnhwc->ijnhwc", bt, bt, d)
    v = v.astype(mxu_dtype).reshape(a * a, n, th, tw, c)
    u = _dwm_kernel(w, var).astype(mxu_dtype)   # [a*a, nb, nb, C, F]
    mm = jax.vmap(_tile_conv)(v, u)             # [a*a, N, tho, two, F] f32
    mm = mm.astype(mxu_dtype).reshape(a, a, n, tho, two, f)
    at = jnp.asarray(var.AT)
    y = jnp.einsum("pi,lj,ijnhwf->nhpwlf", at, at, mm.astype(jnp.float32))
    y = y.reshape(n, m * tho, m * two, f)
    return y[:, :h, :wd, :], v


def _tile_conv(vk: jax.Array, uk: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        vk, uk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _dwm_kernel(w: jax.Array, var: WinogradVariant) -> jax.Array:
    """[r,r,C,F] -> U [a*a, nb, nb, C, F] f32: zero-pad r up to 3*nb,
    split into nb x nb 3x3 blocks, transform each (G g G^T) in f32."""
    r, _, c, f = w.shape
    nb = -(-r // 3)
    a = var.a
    wpad = jnp.pad(w.astype(jnp.float32),
                   ((0, 3 * nb - r), (0, 3 * nb - r), (0, 0), (0, 0)))
    blocks = wpad.reshape(nb, 3, nb, 3, c, f).transpose(0, 2, 1, 3, 4, 5)
    g = jnp.asarray(var.G)
    u = jnp.einsum("ir,js,derscf->ijdecf", g, g, blocks)
    return u.reshape(a * a, nb, nb, c, f)


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def winograd_conv_large(x: jax.Array, w: jax.Array, b: jax.Array,
                        variant: str = "f3", relu: bool = True) -> jax.Array:
    """SAME conv with an odd r >= 5 square kernel (fc6's 7x7) via the
    Winograd-domain tile convolution (derivation in the section comment
    above): ~51% of the direct MXU multiplies at r=7. Canonical
    parameters: w [r,r,Cin,Cout] f32, identical checkpoints to nn.Conv;
    b [Cout]. Returns x.dtype.

    Replaces the reference's ``tf.layers.conv2d(pool5, fc, 7, padding=
    'same', activation=relu)`` fc6 (SURVEY.md §3.1; mount empty per
    SURVEY.md §0) with error bounded by the F(3,3) numerics tests
    (tests/test_winograd.py::test_decomposed_large_kernel*). The custom
    VJP keeps the multiply reduction in both backward passes: dx is the
    SAME conv with the rotated/swapped kernel (same tile-conv path), dw
    accumulates dU[ij, d] = V[ij, t+d]^T @ dM[ij, t] per block, then
    dw = G^T dU G — never transposing the strided-slice tiling."""
    y, _ = _dwm_fwd(x, w, b, variant, relu)
    return y


def _dwm_fwd(x, w, b, variant, relu):
    r = w.shape[0]
    assert w.shape[1] == r and r % 2 == 1 and r >= 5, w.shape
    var = VARIANTS[variant]
    y, _ = _dwm_conv_raw(x.astype(jnp.bfloat16), w, var)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype)
    # V is cheaper to rebuild in bwd than to spill (same policy as
    # winograd_conv2d above); save x, w, y (relu mask).
    return y, (x, w, y if relu else None)


def _dwm_bwd(variant, relu, res, g):
    x, w, y = res
    var = VARIANTS[variant]
    m, a = var.m, var.a
    n, h, wd, c = x.shape
    r, f = w.shape[0], w.shape[3]
    nb = -(-r // 3)
    g = g.astype(x.dtype)
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros_like(g))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    # dx: SAME conv with the rotated/swapped kernel — exact for odd r
    dx, _ = _dwm_conv_raw(g, rot180_swap(w), var)
    dx = dx.astype(x.dtype)
    # dw: rebuild V, AT-transform the cotangent, per-block contraction
    tho, two = -(-h // m), -(-wd // m)
    th, tw = tho + nb - 1, two + nb - 1
    hp, wp = m * th + 2, m * tw + 2
    p0 = r // 2
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (p0, hp - p0 - h), (p0, wp - p0 - wd), (0, 0)))
    d = _tile_input(xp, th, tw, m, a)
    bt = jnp.asarray(var.BT)
    v = jnp.einsum("ir,js,rsnhwc->ijnhwc", bt, bt, d)
    v = v.astype(jnp.bfloat16).reshape(a * a, n, th, tw, c)
    gp = jnp.pad(g, ((0, 0), (0, m * tho - h), (0, m * two - wd), (0, 0)))
    dm = _transform_cotangent(gp, var)            # [a*a, N*tho*two, F] bf16
    dus = []
    for dh in range(nb):
        for dwi in range(nb):
            vs = lax.slice(v, (0, 0, dh, dwi, 0),
                           (a * a, n, dh + tho, dwi + two, c))
            vs = vs.reshape(a * a, n * tho * two, c)
            dus.append(lax.dot_general(
                vs, dm, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
    du = jnp.stack(dus, 0).reshape(nb, nb, a, a, c, f)
    gm = jnp.asarray(var.G)
    dwp = jnp.einsum("ir,js,deijcf->drescf", gm, gm, du)
    dwp = dwp.reshape(3 * nb, 3 * nb, c, f)[:r, :r]
    return dx, dwp.astype(w.dtype), db.astype(w.dtype)


winograd_conv_large.defvjp(_dwm_fwd, _dwm_bwd)


def xla_eligible(x_shape, w_shape, variant: str) -> bool:
    """Whether the XLA-native path applies: odd square kernel matching the
    variant's r, stride-1 SAME, and wide-enough channels that the V/M HBM
    round-trip is paid for (measured: Cin >= 256 and Cout >= 512 for f4;
    fc6's r=7 always pays)."""
    var = VARIANTS[variant]
    kh, kw, ci, co = w_shape
    if not (kh == kw == var.r and ci == x_shape[3]):
        return False
    if var.r != 3:
        return True
    return ci >= 256 and co >= 512

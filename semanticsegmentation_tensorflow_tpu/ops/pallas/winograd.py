"""Fused Pallas Winograd F(m,3) conv kernels: 3x3 SAME conv at 1/2.25
(f2) or 1/4 (f4) the MXU multiplies, with all transforms in VMEM.

Why a kernel and not XLA ops: the Winograd-domain tensors V and M are
(m+2)^2/m^2 times the activation size; materializing them in HBM costs more
bandwidth than the multiplies saved (measured reasoning in
ops/winograd.py). Here each grid cell loads a band of input rows once,
builds the width-then-height transformed V in VMEM (pure +-1/2^k
multiply-adds on the VPU — ops/winograd.py pins the matrices), runs the
(m+2)^2 per-coordinate [tiles, Cin] @ [Cin, Cout] contractions on the MXU
in bf16/f32-accum, inverse-transforms, and writes only the canonical
output. The bias+relu epilogue and the backward's relu masking are fused
too, so no extra full-resolution elementwise passes touch HBM.

Kernel trio (all sharing the transform helpers):
  * ``_fwd_kernel`` — forward; also serves as the INPUT-gradient kernel
    (dx of a SAME 3x3 conv is a SAME 3x3 conv with the rotated/swapped
    kernel — tests/test_winograd.py::test_rot180_swap...), in a masked
    mode that applies the saved output's relu mask to the incoming
    cotangent in VMEM (dz = dy * (out > 0)) instead of reading a
    materialized dz from HBM.
  * ``_wgrad_kernel`` — dU[k] += V[k]^T @ dM[k] accumulated across the
    grid (the exact gradient of the Winograd form; the tiny inverse
    weight transform dW = G^T dU G runs in XLA outside), plus db.

Layout: inputs are consumed through the HWNC view that is a FREE bitcast
of the {3,0,2,1} layout XLA picks for conv outputs (verified for the
stage1 kernel, ops/pallas/stage1.py), with W further split [wt, m] (a
free outer-dim reshape) so the width-overlapping Winograd taps become
static slices + one-tile shifts instead of strided gathers.

Numerics contract: transforms f32, contraction bf16 with f32 accumulation
— identical precision policy to ops/winograd.winograd_conv2d_ref, which
is the oracle these kernels are tested against (bit-comparable up to dot
summation order; tests/test_pallas_winograd.py).

Mosaic constraints honoured (memory: tpu-env-quirks): no sub-32-bit
compares (relu masks compare in f32), no 16-bit rotates (shifts are
slice+concat on an outer dim), block second-minor dims multiples of 8,
raised VMEM limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semanticsegmentation_tensorflow_tpu.ops.winograd import (
    VARIANTS, rot180_swap, transform_kernel,
)


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------

def _shift_w(t: jax.Array, off: int) -> jax.Array:
    """t [wt, nt, C] -> t' with t'[tj] = t[tj + off], zero at the edges
    (the conv's SAME zero padding). off in {-1, 0, +1}."""
    if off == 0:
        return t
    z = jnp.zeros_like(t[:1])
    if off < 0:
        return jnp.concatenate([z, t[:-1]], axis=0)
    return jnp.concatenate([t[1:], z], axis=0)


def _combine(coeffs, tensors):
    """sum_i coeffs[i] * tensors[i], skipping structural zeros and
    strength-reducing +-1 (the whole point of the f2 tables)."""
    acc = None
    for c, t in zip(coeffs, tensors):
        c = float(c)
        if c == 0.0 or t is None:
            continue
        term = t if c == 1.0 else (-t if c == -1.0 else c * t)
        if _ABLATE == "notrans":
            return term
        acc = term if acc is None else acc + term
    assert acc is not None
    return acc


def _width_transform(row: jax.Array, bt) -> list[jax.Array]:
    """row [wt, m, nt, C] (bf16/f32) -> a tensors ty[j] [wt, nt, C] f32:
    ty[j] = sum_s BT[j, s] * d[., s] where d[tj, s] = row[tj*m + s - 1]
    (SAME padding -> zero-shifted at the W edges)."""
    a = bt.shape[0]
    m = a - 2
    taps = []
    for s in range(a):
        off, q = divmod(s - 1, m)
        taps.append(_shift_w(row[:, q], off).astype(jnp.float32))
    return [_combine(bt[j], taps) for j in range(a)]


# Ablation knob for the tuning harness ONLY (attributes in-kernel time):
# 'nodot' replaces the MXU contractions with a cheap slice/broadcast,
# 'notrans' collapses every transform combine to its first nonzero term
# (keeps the copies, drops the VPU multiply-adds). Never set in production.
import os as _os_ab

_ABLATE = _os_ab.environ.get("WINOGRAD_ABLATE", "")
if _ABLATE:  # numerics are deliberately WRONG under ablation — never silent
    import warnings as _warnings_ab

    _warnings_ab.warn(
        f"WINOGRAD_ABLATE={_ABLATE!r} is set: winograd_conv_bias_relu will "
        "return deliberately WRONG results (timing-attribution ablation for "
        "the tuning harness only). Unset it for any real run.")


def _dot(v: jax.Array, u: jax.Array) -> jax.Array:
    """[wt, nt, C] x [C, Co] -> [wt, nt, Co] f32 (flattened MXU dot)."""
    wt, nt, c = v.shape
    co = u.shape[-1]
    if _ABLATE == "nodot":
        if co == c:
            return v.astype(jnp.float32)
        return jnp.broadcast_to(
            jnp.sum(v, axis=-1, keepdims=True).astype(jnp.float32),
            (wt, nt, co))
    r = jnp.dot(v.reshape(wt * nt, c), u,
                preferred_element_type=jnp.float32)
    return r.reshape(wt, nt, u.shape[-1])


def _dotT(v: jax.Array, g: jax.Array) -> jax.Array:
    """v^T @ g over positions: [wt,nt,C] x [wt,nt,Co] -> [C,Co] f32."""
    wt, nt, c = v.shape
    return lax.dot_general(
        v.reshape(wt * nt, c), g.reshape(wt * nt, g.shape[-1]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward / input-gradient kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, variant, kk, masked, epilogue):
    """Grid (ht/K, N/nt). Computes K mxm-output tile rows per program.

    refs (in order): xtop, xcen, xbot[, otop, ocen, obot], u, b, out.
    x blocks are [rows, wt, m, nt, C] with 1-row halos (clamped at the
    edges; masked out here). In ``masked`` mode x is the incoming
    cotangent dy and o is the saved forward output: rows load as
    dz = dy * (o > 0) — the fused relu backward.

    epilogue: 'none' (raw conv, for the deferred-bias pool path) or
    'bias_relu' (relu(z + b), the VGG inner-conv form).
    """
    var = VARIANTS[variant]
    m, a, bt, at = var.m, var.a, var.BT, var.AT
    if masked:
        xtop, xcen, xbot, otop, ocen, obot, u, b, out = refs
    else:
        xtop, xcen, xbot, u, b, out = refs
        otop = ocen = obot = None
    p = pl.program_id(0)
    npr = pl.num_programs(0)
    dt = xcen.dtype
    top_ok = (p > 0).astype(jnp.float32)
    bot_ok = (p < npr - 1).astype(jnp.float32)

    def load(i):                       # local input row index -1 .. m*K
        if i < 0:
            x, o, ok = xtop[0], None if otop is None else otop[0], top_ok
        elif i >= m * kk:
            x, o, ok = xbot[0], None if obot is None else obot[0], bot_ok
        else:
            x, o, ok = xcen[i], None if ocen is None else ocen[i], None
        if masked:
            x = jnp.where(o.astype(jnp.float32) > 0, x, jnp.zeros_like(x))
        if ok is not None:
            x = x * ok.astype(dt)
        return x

    ty: dict[int, list] = {}           # per-physical-row width transforms
    for k in range(kk):
        for i in range(m * k - 1, m * k + m + 1):
            if i not in ty:
                ty[i] = _width_transform(load(i), bt)

        y_acc = [[None] * m for _ in range(m)]   # [p_r][l]
        for i in range(a):
            # V[i, j] = sum_r BT[i, r] * ty[row r][j]
            m_acc = [None] * m                   # [l], for this i
            for j in range(a):
                v = _combine(bt[i], [ty[m * k - 1 + r][j] for r in range(a)])
                mm = _dot(v.astype(dt), u[a * i + j])
                for l in range(m):
                    c = float(at[l, j])
                    if c == 0.0:
                        continue
                    term = mm if c == 1.0 else (-mm if c == -1.0 else c * mm)
                    m_acc[l] = term if m_acc[l] is None else m_acc[l] + term
            for p_r in range(m):
                c = float(at[p_r, i])
                if c == 0.0:
                    continue
                for l in range(m):
                    term = (m_acc[l] if c == 1.0 else
                            (-m_acc[l] if c == -1.0 else c * m_acc[l]))
                    y_acc[p_r][l] = (term if y_acc[p_r][l] is None
                                     else y_acc[p_r][l] + term)

        for p_r in range(m):
            ys = []
            for l in range(m):
                y = y_acc[p_r][l]
                if epilogue == "bias_relu":
                    y = jnp.maximum(y + b[0].astype(jnp.float32), 0.0)
                ys.append(y.astype(dt))
            out[m * k + p_r] = jnp.stack(ys, axis=1)

        for i in list(ty):              # slide the row window
            if i < m * (k + 1) - 1:
                del ty[i]


# ---------------------------------------------------------------------------
# weight-gradient kernel
# ---------------------------------------------------------------------------

def _wgrad_kernel(*refs, variant, kk, masked):
    """Grid (ht/K, N/nt). dU[k] += V[k]^T @ dM[k], db += sum dz.

    refs: xtop, xcen, xbot, gcen[, ocen], du, db. dz tiles are
    NON-overlapping (no halos for g/o); x needs the same 1-row halos as
    the forward. dM[i,j] = sum_{p,l} AT[p,i] AT[l,j] dz[p,l] — the A-side
    transform of the cotangent, computed width-first like the forward's
    B-side."""
    if masked:
        xtop, xcen, xbot, gcen, ocen, du, db = refs
    else:
        xtop, xcen, xbot, gcen, du, db = refs
        ocen = None
    var = VARIANTS[variant]
    m, a, bt, at = var.m, var.a, var.BT, var.AT
    p = pl.program_id(0)
    nb = pl.program_id(1)
    npr = pl.num_programs(0)
    dt = xcen.dtype

    @pl.when((p == 0) & (nb == 0))
    def _():
        du[...] = jnp.zeros_like(du)
        db[...] = jnp.zeros_like(db)

    top_ok = (p > 0).astype(dt)
    bot_ok = (p < npr - 1).astype(dt)

    def load_x(i):
        if i < 0:
            return xtop[0] * top_ok
        if i >= m * kk:
            return xbot[0] * bot_ok
        return xcen[i]

    def load_dz(i):                     # center rows only
        g = gcen[i]
        if masked:
            g = jnp.where(ocen[i].astype(jnp.float32) > 0, g,
                          jnp.zeros_like(g))
        return g

    acc_du = [du[t] for t in range(a * a)]
    acc_db = db[...]
    ty: dict[int, list] = {}
    for k in range(kk):
        for i in range(m * k - 1, m * k + m + 1):
            if i not in ty:
                ty[i] = _width_transform(load_x(i), bt)
        # width-side of dM per physical dz row: dmw[p_r][j] =
        # sum_l AT[l, j] * dz[:, l]; dz rows are the m center rows m*k+p_r
        dmw = []
        for p_r in range(m):
            dzrow = load_dz(m * k + p_r)                 # [wt, m, nt, Co]
            taps = [dzrow[:, l].astype(jnp.float32) for l in range(m)]
            dmw.append([_combine(at[:, j], taps) for j in range(a)])
            acc_db = acc_db + jnp.sum(
                sum(taps).reshape(-1, dzrow.shape[-1]), axis=0,
                keepdims=True)
        for i in range(a):
            for j in range(a):
                v = _combine(bt[i], [ty[m * k - 1 + r][j] for r in range(a)])
                dm = _combine(at[:, i], [dmw[p_r][j] for p_r in range(m)])
                acc_du[a * i + j] = acc_du[a * i + j] + _dotT(
                    v.astype(dt), dm.astype(dt))
        for i in list(ty):
            if i < m * (k + 1) - 1:
                del ty[i]

    for t in range(a * a):
        du[t] = acc_du[t]
    db[...] = acc_db


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pick_nt(n: int, per_nt_bytes: int, budget: int) -> int:
    """Batch tile: divisors of n that are multiples of 8 (Mosaic block
    constraint) or n itself; largest fitting the VMEM budget."""
    valid = [c for c in range(1, n + 1)
             if n % c == 0 and (c % 8 == 0 or c == n)]
    fitting = [c for c in valid if per_nt_bytes * c <= budget]
    return max(fitting) if fitting else min(valid)


def _pick_k(ht: int, max_k: int) -> int:
    k = 1
    while k * 2 <= max_k and ht % (k * 2) == 0:
        k *= 2
    return k


def _spec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda p, b: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _halo_specs(wt, m, nt, c, nrows, total_rows):
    """(top, center, bottom): [nrows,...] center at block p plus 1-row
    halos at rows nrows*p-1 / nrows*(p+1), clamped (kernels mask them)."""
    top = _spec((1, wt, m, nt, c),
                lambda p, b: (jnp.maximum(nrows * p - 1, 0), 0, 0, b, 0))
    cen = _spec((nrows, wt, m, nt, c), lambda p, b: (p, 0, 0, b, 0))
    bot = _spec((1, wt, m, nt, c),
                lambda p, b: (jnp.minimum(nrows * (p + 1), total_rows - 1),
                              0, 0, b, 0))
    return [top, cen, bot]


def _to_tiles(x: jax.Array, m: int) -> jax.Array:
    """NHWC -> [H, wt, m, N, C] (free bitcast of XLA's conv layout +
    free outer-dim split; see module docstring)."""
    n, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w // m, m, n, c)


def _from_tiles(t: jax.Array) -> jax.Array:
    h, wt, m, n, c = t.shape
    return jnp.transpose(t.reshape(h, wt * m, n, c), (2, 0, 1, 3))


# VMEM working-set budget per batch-tile unit: the ty window dominates
# ((a + m) rows x a coords x wt * C f32); cap nt so it stays ~20 MB.
# Env overrides exist for the tuning harness (tools/bench_winograd.py);
# production defaults are the measured-best values.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("WINOGRAD_VMEM_BUDGET",
                                   24 * 1024 * 1024))
_MAX_K = int(_os.environ.get("WINOGRAD_MAX_K", 2))


def _fwd_call(xt, u, b, ot, *, variant, epilogue, interpret, max_k=None):
    max_k = _MAX_K if max_k is None else max_k
    var = VARIANTS[variant]
    m, a = var.m, var.a
    h, wt, m_, n, c = xt.shape
    co = u.shape[-1]
    assert m_ == m and h % m == 0
    ht = h // m
    kk = _pick_k(ht, max_k)
    per_nt = (a + m) * a * wt * c * 4
    nt = _pick_nt(n, per_nt, _VMEM_BUDGET)
    grid = (ht // kk, n // nt)
    masked = ot is not None

    in_specs = _halo_specs(wt, m, nt, c, m * kk, h)
    args = [xt, xt, xt]
    if masked:
        in_specs += _halo_specs(wt, m, nt, c, m * kk, h)
        args += [ot, ot, ot]
    in_specs += [_const_spec((a * a, c, co)), _const_spec((1, co))]
    args += [u, b.reshape(1, -1)]
    out_specs = _spec((m * kk, wt, m, nt, co), lambda p, b_: (p, 0, 0, b_, 0))
    out_shape = jax.ShapeDtypeStruct((h, wt, m, n, co), xt.dtype)
    flops = 2 * a * a * ht * wt * n * c * co
    return pl.pallas_call(
        partial(_fwd_kernel, variant=variant, kk=kk, masked=masked,
                epilogue=epilogue),
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xt.size * 2 + xt.size * co // c * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _wgrad_call(xt, gt, ot, *, variant, interpret, max_k=None):
    max_k = _MAX_K if max_k is None else max_k
    var = VARIANTS[variant]
    m, a = var.m, var.a
    h, wt, m_, n, c = xt.shape
    co = gt.shape[-1]
    ht = h // m
    kk = _pick_k(ht, max_k)
    per_nt = (a + m) * a * wt * c * 4
    nt = _pick_nt(n, per_nt, _VMEM_BUDGET)
    grid = (ht // kk, n // nt)
    masked = ot is not None

    in_specs = _halo_specs(wt, m, nt, c, m * kk, h)
    in_specs += [_spec((m * kk, wt, m, nt, co),
                       lambda p, b_: (p, 0, 0, b_, 0))]
    args = [xt, xt, xt, gt]
    if masked:
        in_specs += [_spec((m * kk, wt, m, nt, co),
                           lambda p, b_: (p, 0, 0, b_, 0))]
        args += [ot]
    out_specs = [_const_spec((a * a, c, co)), _const_spec((1, co))]
    out_shape = [jax.ShapeDtypeStruct((a * a, c, co), jnp.float32),
                 jax.ShapeDtypeStruct((1, co), jnp.float32)]
    flops = 2 * a * a * (h // m) * wt * n * c * co // (m)
    return pl.pallas_call(
        partial(_wgrad_kernel, variant=variant, kk=kk, masked=masked),
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xt.size * 4, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# public ops (custom VJP)
# ---------------------------------------------------------------------------

def _u_for(w, variant, dtype):
    var = VARIANTS[variant]
    u = transform_kernel(w, variant).astype(dtype)
    return u.reshape(var.a * var.a, w.shape[2], w.shape[3])


def eligible(x_shape, w_shape, variant: str = "f2",
             min_ch: int = 128) -> bool:
    """Whether the fused kernel applies: 3x3 kernel, spatial dims divisible
    by the tile size, both channel widths filling the 128 lanes (narrower
    convs are the packed stem's domain, not Winograd's)."""
    var = VARIANTS[variant]
    n, h, w, c = x_shape
    kh, kw, ci, co = w_shape
    return (kh == 3 and kw == 3 and ci == c and h % var.m == 0
            and w % var.m == 0 and c % min_ch == 0 and co % min_ch == 0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def winograd_conv_bias_relu(x, w, b, variant="f2", interpret=False):
    """relu(SAME-conv3x3(x, w) + b), Winograd-fused (one kernel, no
    full-resolution elementwise passes). x NHWC bf16; w [3,3,Cin,Cout]
    (canonical parameters — checkpoints identical to nn.Conv); b [Cout].
    """
    out, _ = _wcbr_fwd(x, w, b, variant, interpret)
    return out


def _wcbr_fwd(x, w, b, variant, interpret):
    dt = x.dtype
    xt = _to_tiles(x, VARIANTS[variant].m)
    u = _u_for(w, variant, dt)
    out_t = _fwd_call(xt, u, b.astype(dt), None, variant=variant,
                      epilogue="bias_relu", interpret=interpret)
    return _from_tiles(out_t), (x, w, b, out_t)


def _wcbr_bwd(variant, interpret, res, g):
    x, w, b, out_t = res
    dt = x.dtype
    m = VARIANTS[variant].m
    gt = _to_tiles(g.astype(dt), m)
    xt = _to_tiles(x, m)
    # dx: SAME conv of dz with the rotated/swapped kernel, dz masked in-VMEM
    u2 = _u_for(rot180_swap(w), variant, dt)
    zerob = jnp.zeros((w.shape[2],), dt)
    dx_t = _fwd_call(gt, u2, zerob, out_t, variant=variant,
                     epilogue="none", interpret=interpret)
    du, db = _wgrad_call(xt, gt, out_t, variant=variant, interpret=interpret)
    dw = _dw_from_du(du, w, variant)
    return (_from_tiles(dx_t), dw, db.reshape(-1).astype(b.dtype))


def _dw_from_du(du, w, variant):
    var = VARIANTS[variant]
    g = jnp.asarray(var.G)
    du = du.reshape(var.a, var.a, w.shape[2], w.shape[3])
    return jnp.einsum("ir,js,ijco->rsco", g, g, du).astype(w.dtype)


winograd_conv_bias_relu.defvjp(_wcbr_fwd, _wcbr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def winograd_conv3x3(x, w, variant="f2", interpret=False):
    """Raw SAME-conv3x3(x, w), Winograd-fused — the deferred-bias form
    consumed by the pooled VGG stages (ops/packed_stem.PooledConvBlock:
    relu(pool(z) + b) == pool(relu(z + b)) bit-exactly)."""
    out, _ = _wc_fwd(x, w, variant, interpret)
    return out


def _wc_fwd(x, w, variant, interpret):
    dt = x.dtype
    xt = _to_tiles(x, VARIANTS[variant].m)
    u = _u_for(w, variant, dt)
    zerob = jnp.zeros((w.shape[3],), dt)
    out_t = _fwd_call(xt, u, zerob, None, variant=variant,
                      epilogue="none", interpret=interpret)
    return _from_tiles(out_t), (x, w)


def _wc_bwd(variant, interpret, res, g):
    x, w = res
    dt = x.dtype
    m = VARIANTS[variant].m
    gt = _to_tiles(g.astype(dt), m)
    xt = _to_tiles(x, m)
    u2 = _u_for(rot180_swap(w), variant, dt)
    zerob = jnp.zeros((w.shape[2],), dt)
    dx_t = _fwd_call(gt, u2, zerob, None, variant=variant,
                     epilogue="none", interpret=interpret)
    du, _ = _wgrad_call(xt, gt, None, variant=variant, interpret=interpret)
    return (_from_tiles(dx_t), _dw_from_du(du, w, variant))


winograd_conv3x3.defvjp(_wc_fwd, _wc_bwd)

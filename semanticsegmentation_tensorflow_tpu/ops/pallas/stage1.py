"""Fused Pallas stage1 tail: packed conv1_2 + 2x2 pool + bias + relu.

Replaces the XLA [conv1_2-packed -> pool -> bias -> relu] tail of the
width-pair-packed VGG stage1 (ops/packed_stem.py) with one Pallas kernel
pair (fwd + bwd). Three wins over the XLA formulation, all measured on the
round-2 profile (tools/profile_step.py):

1. **1.33x FLOPs instead of 2x.** The packed->packed [3,3,128,128] conv is
   half structural zeros (2x the canonical 35 GFLOP/img). Grouping the taps
   differently removes a quarter of them: with A/B = the even/odd column
   halves of the packed tensor y, the packed output row is

       z[X] = sum_dy  y[X]  @ M[dy]  +  Q[X] @ S[dy],
       M[dy] = [[k(dy,1), k(dy,0)], [k(dy,2), k(dy,1)]]   (dense)
       S[dy] = [[k(dy,0), 0], [0, k(dy,2)]]               (half zeros)
       Q[X]  = [B[X-1] | A[X+1]]   (built in VMEM from y's halo — free of
                                    the HBM round-trip that kills this
                                    formulation in pure XLA)

   i.e. 6 full-lane [*,128]@[128,128] MXU dots per row at 4/3 the canonical
   FLOPs (M dense useful, S half-useful) vs 2x for the single packed conv.
2. **No layout copies.** The conv1_1 output is consumed through a
   transpose-to-HWNC view whose default layout is bit-identical to the
   {3,0,2,1} layout XLA picks for conv outputs, so the transposes compile
   to bitcasts — the measured 3 ms relayout copy in front of the previous
   pool custom-call disappears.
3. **Fused pool + routing codes.** The pool, its bias+relu epilogue, and a
   2-bit argmax routing code (u8) are produced in the same pass, so the
   backward routes gradients with a cheap select instead of recomputing or
   running select_and_scatter at full resolution.

Exactness contract: consumes the CANONICAL [3,3,64,64] conv1_2 kernel and
[64] bias. Values match the jnp packed path up to f32 summation order (the
same products, grouped into different dots); the pool routing reproduces
select_and_scatter / TF MaxPoolGrad first-max-wins tie semantics exactly in
(dy, dx) row-major window order, on the bf16 values, matching
ops/packed_stem.pool_pairs. Gradients for k2/b2/z1 are mathematically exact
(same routing, f32-accumulated dots).

Reference parity: computes the same VGG16 stage1 tail the reference's
scripts build with tf.layers conv2d + max_pooling2d (SURVEY.md §3.4; the
reference mount is empty per SURVEY.md §0 — semantics pinned by
BASELINE.json:7 "VGG16 backbone").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning

F = 64  # canonical stage1 feature width; packed width is 2F = 128


def _build_mats(k2: jax.Array, dtype) -> tuple[jax.Array, jax.Array]:
    """Canonical [3,3,F,F] kernel -> (M, S) [3,2F,2F] packed-tap matrices."""
    k = k2.astype(dtype)
    z = jnp.zeros_like(k[:, 0])
    m = jnp.concatenate([
        jnp.concatenate([k[:, 1], k[:, 0]], axis=2),   # A -> (even | odd)
        jnp.concatenate([k[:, 2], k[:, 1]], axis=2),   # B -> (even | odd)
    ], axis=1)
    s = jnp.concatenate([
        jnp.concatenate([k[:, 0], z], axis=2),          # B[X-1] -> even
        jnp.concatenate([z, k[:, 2]], axis=2),          # A[X+1] -> odd
    ], axis=1)
    return m, s


def _dk_from_mats(dm: jax.Array, ds: jax.Array) -> jax.Array:
    """(dM, dS) [3,2F,2F] f32 -> canonical dk2 [3,3,F,F] (sum of the tap
    copies — exactly the canonical kernel gradient)."""
    f = F
    dk0 = dm[:, :f, f:] + ds[:, :f, :f]
    dk1 = dm[:, :f, :f] + dm[:, f:, f:]
    dk2 = dm[:, f:, :f] + ds[:, f:, f:]
    return jnp.stack([dk0, dk1, dk2], axis=1)


def _lane_iota(shape: tuple[int, ...]) -> jax.Array:
    return lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _w_iota(shape: tuple[int, ...]) -> jax.Array:
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """pltpu.roll for [W, nt, C] that works on 16-bit data.

    This Mosaic version only implements rotates on 32-bit data; for 16-bit
    types with an even sublane count (axis 1) we bitcast to i32 — which
    packs sublane PAIRS into one 32-bit word, leaving axis 0 and the lanes
    1:1 — rotate, and bitcast back. Fallback: slice + concat.
    """
    assert axis != 1, "axis 1 is the sublane-packing axis"
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift, axis=axis)
    if x.dtype.itemsize == 2 and x.shape[1] % 2 == 0:
        x32 = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(x32, shift, axis=axis), x.dtype)
    if shift == 0:
        return x
    sl = [slice(None)] * x.ndim
    sr = [slice(None)] * x.ndim
    sl[axis] = slice(x.shape[axis] - shift, None)
    sr[axis] = slice(None, x.shape[axis] - shift)
    return jnp.concatenate([x[tuple(sl)], x[tuple(sr)]], axis=axis)


def _half_swap(x: jax.Array) -> jax.Array:
    """Swap the two F-lane halves: out[..., :F] = x[..., F:] and vice versa."""
    return _roll(x, F, axis=2)


def _build_q(y: jax.Array) -> jax.Array:
    """y [W, nt, 2F] -> Q [W, nt, 2F] = [B[X-1] | A[X+1]] with zero edges."""
    w = y.shape[0]
    t = _half_swap(y)                       # [B | A] in lanes
    tp = _roll(t, 1, axis=0)                # B[X-1] in low lanes
    tm = _roll(t, w - 1, axis=0)            # A[X+1] in high lanes
    lanes = _lane_iota(y.shape)
    wi = _w_iota(y.shape)
    z = jnp.zeros_like(y)
    return jnp.where(lanes < F,
                     jnp.where(wi > 0, tp, z),
                     jnp.where(wi < w - 1, tm, z))


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """[W,nt,2F] @ [2F,2F] -> [W,nt,2F] f32 (flattened MXU dot)."""
    w, nt, c = a.shape
    r = jnp.dot(a.reshape(w * nt, c), b, preferred_element_type=jnp.float32)
    return r.reshape(w, nt, c)


def _dotT(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^T @ b over positions: [W,nt,2F] x [W,nt,C'] -> [2F,C'] f32."""
    w, nt, c = a.shape
    return lax.dot_general(
        a.reshape(w * nt, c), b.reshape(w * nt, b.shape[-1]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(ytop, ycen, ybot, mw, sw, b2, b1, out, codes, *,
                biased_codes=False, edge_masks=True, fold_b1=True):
    """Grid (Hp/K, N/nt). Inputs: the pre-relu conv1_1 rows for K pool
    rows — a [2K,...] center block plus 1-row top/bottom halo blocks —
    and the packed tap matrices + bias. Outputs: K pooled+bias+relu rows
    [K,W,nt,F] bf16 and the 2-bit routing codes (u8) for the backward.
    Blocking K pool rows per program cuts the halo read amplification
    from 2x (one-row programs) to (2K+2)/2K.

    Two halo modes (the single difference between the single-device and
    SPMD paths): ``edge_masks=True`` reads edge-CLAMPED 1-row blocks of
    the main array and masks them to zero at the boundary programs (the
    round-2 fast path — zero extra HBM traffic); ``edge_masks=False``
    reads dedicated per-block halo-row ARRAYS (built by plain XLA slicing
    outside, zero rows already at the global edges), which makes every
    block depend only on same-index input blocks — embarrassingly
    parallel, so the custom_partitioning wrapper can shard H across a
    spatial mesh axis with no in-kernel edge cases. The array mode costs
    a few extra slicing/relayout fusions (measured ~2-4 ms/step at bench
    shapes), so it is reserved for the sharded path.

    ``biased_codes`` (SegNet mode): pool relu(z + b) and compute the codes
    on those biased values, so the codes ARE max_pool_with_argmax's
    within-window indices (the decoder unpools by them). The default
    (FCN) mode pools the pre-bias z and applies +b -> relu after — values
    bit-equal (the deferred-bias commute, ops/packed_stem.PooledConvBlock)
    but the codes then index the pre-relu ordering, which relu reorders
    for negatives; only the FCN mode may defer. The backward is identical
    in both modes: the ``pooled > 0`` mask equals the selected element's
    relu mask either way.

    ``fold_b1`` (static; == the SPMD mode, see fused_stage1_tail): when
    True, z1 arrives WITHOUT the conv1_1 bias and the kernel applies
    relu(z + b1) — required under sharding, where db1 then falls out as
    per-block partials. When False (single-device), z1 arrives pre-biased
    (the add fuses into conv1_1's XLA epilogue for free) and the kernel
    runs plain relu(z) — the per-element +b1 adds and the db1 VPU
    accumulation measured ~2 ms/step of the bwd kernel (VERDICT r3 #4),
    vs ~1.3 ms for the XLA dz1-sum they replace."""
    dt = ycen.dtype
    k2r = ycen.shape[0]                     # 2K conv rows
    b1full = b1[0].astype(dt) if fold_b1 else None  # pre-tiled [2F]
    if edge_masks:
        p = pl.program_id(0)
        npr = pl.num_programs(0)
        top_ok = (p > 0).astype(dt)
        bot_ok = (p < npr - 1).astype(dt)

    def load(i):                            # local conv-input row -1..2K
        # fold_b1: z1 arrives WITHOUT the conv1_1 bias (folded here):
        # relu(z + b1). Edge masking applies after — a masked halo row
        # contributes zero, exactly the SAME-pad semantics.
        if i < 0:
            y, ok = ytop[0], (top_ok if edge_masks else None)
        elif i >= k2r:
            y, ok = ybot[0], (bot_ok if edge_masks else None)
        else:
            y, ok = ycen[i], None
        r = jnp.maximum(y + b1full, 0) if fold_b1 else jnp.maximum(y, 0)
        if ok is not None:
            r = r * ok
        return r, _build_q(r)

    win: dict[int, tuple] = {}
    for k in range(k2r // 2):
        for i in range(2 * k - 1, 2 * k + 3):
            if i not in win:
                win[i] = load(i)

        # conv row h: z[h] = sum_dy y[h+dy-1] @ M[dy] + Q[h+dy-1] @ S[dy]
        def conv_row(h):
            acc = None
            for dy in range(3):
                r, q = win[h + dy - 1]
                t = _dot(r, mw[dy]) + _dot(q, sw[dy])
                acc = t if acc is None else acc + t
            return acc.astype(dt)           # bf16, like the XLA conv output

        za = conv_row(2 * k)
        zb = conv_row(2 * k + 1)
        if biased_codes:                    # SegNet: bias+relu BEFORE pool
            # b2 arrives pre-tiled to [1, 2F] (Mosaic rejects an in-kernel
            # lane-offset concatenate of the [F] half with itself)
            bfull = b2[0].astype(dt)
            za = jnp.maximum(za + bfull, 0)
            zb = jnp.maximum(zb + bfull, 0)

        # comparisons in f32 (Mosaic on this stack rejects sub-32-bit
        # compares; f32 equality of exact bf16 values is identical — see
        # ops/pallas/pool.py)
        v00 = za[..., :F].astype(jnp.float32)
        v01 = za[..., F:].astype(jnp.float32)
        v10 = zb[..., :F].astype(jnp.float32)
        v11 = zb[..., F:].astype(jnp.float32)
        m = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
        # first-max-wins in (dy, dx) row-major window order — exactly XLA
        # select_and_scatter / TF MaxPoolGrad tie semantics, on bf16 values
        w0 = v00 == m
        w1 = (v01 == m) & ~w0
        w2 = (v10 == m) & ~(w0 | w1)
        w3 = ~(w0 | w1 | w2)
        code = (w1.astype(jnp.int32) + 2 * w2.astype(jnp.int32)
                + 3 * w3.astype(jnp.int32))
        codes[k] = code.astype(jnp.uint8)
        out[k] = (m.astype(dt) if biased_codes
                  else jnp.maximum(m.astype(dt) + b2[0], 0))

        for i in list(win):                 # slide the row window
            if i < 2 * k + 1:
                del win[i]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(gtop, gcen, gbot, otop, ocen, obot, ctop, ccen, cbot,
                ztop, zcen, zbot, mwt, swt, b1, dz1, dm, ds, db2, db1, *,
                edge_masks=True, fold_b1=True):
    """Grid (Hp/K, N/nt). Inputs: grad/out/codes for pool rows Kp-1..Kp+K
    (a [K,...] center block + 1-row halo blocks — clamped+masked or from
    dedicated halo arrays, see _fwd_kernel's ``edge_masks``) and the
    pre-relu conv1_1 rows 2Kp-1..2Kp+2K (ditto). Outputs: dz1 rows
    [2K,W,nt,2F] (pre-relu conv1_1 grad) and PER-ROW-BLOCK f32 partials
    dM/dS/db2 (block p accumulates its own slot across the batch grid
    dim; the tiny sum over blocks runs in XLA outside — which is what
    makes the op shardable along H with no in-kernel reduction across
    shards). The halo dz rows are rebuilt by the neighbour programs too —
    a couple of redundant VPU selects buy non-overlapping output blocks."""
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        dm[...] = jnp.zeros_like(dm)
        ds[...] = jnp.zeros_like(ds)
        db2[...] = jnp.zeros_like(db2)
        # db1 is zero-initialized UNCONDITIONALLY so the fold_b1=False mode
        # (which skips the accumulation below) still returns defined zeros,
        # never uninitialized VMEM — _fused_bwd ignores it in that mode
        db1[...] = jnp.zeros_like(db1)

    dt = zcen.dtype
    kk = gcen.shape[0]                      # K pool rows
    if edge_masks:
        p = pl.program_id(0)
        npr = pl.num_programs(0)
        top_ok = (p > 0).astype(dt)
        bot_ok = (p < npr - 1).astype(dt)

    def grelu(q):                           # local pool row -1..K
        # relu mask compared in f32 (no sub-32-bit compares on this stack)
        if q < 0:
            g, o, ok = gtop[0], otop[0], top_ok if edge_masks else None
        elif q >= kk:
            g, o, ok = gbot[0], obot[0], bot_ok if edge_masks else None
        else:
            g, o, ok = gcen[q], ocen[q], None
        r = jnp.where(o.astype(jnp.float32) > 0, g, jnp.zeros_like(g))
        return r if ok is None else r * ok

    def code_row(q):
        return (ctop[0] if q < 0 else cbot[0] if q >= kk
                else ccen[q]).astype(jnp.int32)

    def make_dz(h):                         # local conv row -1..2K
        """Scatter pooled grad into conv row h = 2q + a via the code."""
        q, a = h >> 1, h & 1
        gr = grelu(q)
        gfull = jnp.concatenate([gr, gr], axis=-1)
        cfull = jnp.concatenate([code_row(q)] * 2, axis=-1)
        tgt = 2 * a + (_lane_iota(gfull.shape) >= F).astype(jnp.int32)
        return jnp.where(cfull == tgt, gfull,
                         jnp.zeros_like(gfull)).astype(dt)

    # conv1_1 bias (folded; z rows arrive pre-biased when fold_b1=False —
    # see _fwd_kernel's fold_b1 note)
    b1full = b1[0].astype(dt) if fold_b1 else None

    def make_yq(i):                         # local conv-input row -1..2K
        if i < 0:
            z, ok = ztop[0], (top_ok if edge_masks else None)
        elif i >= 2 * kk:
            z, ok = zbot[0], (bot_ok if edge_masks else None)
        else:
            z, ok = zcen[i], None
        r = jnp.maximum(z + b1full, 0) if fold_b1 else jnp.maximum(z, 0)
        if ok is not None:
            r = r * ok
        return r, _build_q(r)

    # input grad: dy[h] = sum_dy dz[h+1-dy] @ M[dy]^T + Q-inverse of
    # dQ[h] = sum_dy dz[h+1-dy] @ S[dy]^T
    def igrad_row(dz3):                     # dz rows (h-1, h, h+1)
        dy = (_dot(dz3[2], mwt[0]) + _dot(dz3[1], mwt[1])
              + _dot(dz3[0], mwt[2]))
        dq = (_dot(dz3[2], swt[0]) + _dot(dz3[1], swt[1])
              + _dot(dz3[0], swt[2]))
        # dQ[X, :F] belongs to B[X-1] -> shift down; dQ[X, F:] to A[X+1]
        w = dq.shape[0]
        lanes = _lane_iota(dq.shape)
        wi = _w_iota(dq.shape)
        dqb = _roll(dq, w - 1, axis=0)      # dQ[X+1] -> position X (for B)
        dqa = _roll(dq, 1, axis=0)          # dQ[X-1] -> position X (for A)
        z = jnp.zeros_like(dq)
        side = jnp.where(lanes < F,
                         jnp.where(wi > 0, _half_swap(dqa), z),
                         jnp.where(wi < w - 1, _half_swap(dqb), z))
        return dy + side

    acc_dm = [dm[0, t] for t in range(3)]
    acc_ds = [ds[0, t] for t in range(3)]
    acc_db1 = None
    dzw: dict[int, jax.Array] = {}
    yqw: dict[int, tuple] = {}
    for h in range(2 * kk):                 # local conv row = dz1 row
        for i in (h - 1, h, h + 1):
            if i not in dzw:
                dzw[i] = make_dz(i)
            if i not in yqw:
                yqw[i] = make_yq(i)
        # relu mask of the (biased) pre-relu conv1_1 row — the same bf16
        # add as the forward, compared in f32
        dy = igrad_row((dzw[h - 1], dzw[h], dzw[h + 1]))
        zb = (zcen[h] + b1full) if fold_b1 else zcen[h]
        dzv = jnp.where(zb.astype(jnp.float32) > 0, dy,
                        jnp.zeros_like(dy)).astype(dt)
        dz1[h] = dzv
        if fold_b1:
            # accumulate FULL-SHAPE (cheap VPU adds); the cross-position
            # reduce runs once per program at the end — per-row reshape+
            # reduce measured +2 ms/step on the whole kernel. (fold_b1=
            # False skips this entirely: db1 = the XLA sum over dz1.)
            acc_db1 = dzv.astype(jnp.float32) if acc_db1 is None \
                else acc_db1 + dzv.astype(jnp.float32)
        # kernel grad: dM[dy] += y[h+dy-1]^T @ dz[h], dS[dy] += Q^T @ dz[h]
        for t in range(3):
            r, q = yqw[h + t - 1]
            acc_dm[t] = acc_dm[t] + _dotT(r, dzw[h])
            acc_ds[t] = acc_ds[t] + _dotT(q, dzw[h])
        for i in list(dzw):                 # slide the windows
            if i < h:
                del dzw[i]
                del yqw[i]

    for t in range(3):
        dm[0, t] = acc_dm[t]
        ds[0, t] = acc_ds[t]
    gsum = None
    for q in range(kk):                     # db2 over the CENTER pool rows
        gr = grelu(q).astype(jnp.float32)
        gsum = gr if gsum is None else gsum + gr
    w_, nt_, _ = gsum.shape
    db2[0] = db2[0] + jnp.sum(gsum.reshape(w_ * nt_, F), axis=0,
                              keepdims=True)
    if fold_b1:
        db1[0] = db1[0] + jnp.sum(acc_db1.reshape(w_ * nt_, 2 * F), axis=0,
                                  keepdims=True)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _pick_nt(n: int, w: int, budget: int) -> int:
    """Batch tile for the HWNC blocks. Mosaic requires a block's
    second-minor dim to be a multiple of 8 or the full array dim, so valid
    tiles are divisors of n that are 8-aligned, plus n itself. Among those,
    prefer the largest with w*nt within the VMEM budget, else the smallest
    valid one."""
    valid = [c for c in range(1, n + 1)
             if n % c == 0 and (c % 8 == 0 or c == n)]
    fitting = [c for c in valid if w * c <= budget]
    return max(fitting) if fitting else min(valid)


def _pick_k(hp: int, max_k: int = 4) -> int:
    """Pool rows per program: largest power of two <= max_k dividing Hp.

    Two measured constraints pick the caps. VMEM: the bwd holds ~3x the
    blocks of the fwd (grad/out/code halos + the 2K-row dz1 output + f32
    dot intermediates); at bench shapes bwd K=8 requests 269MB and K=4
    150MB of the 128MB physical VMEM (compile failures), so bwd caps at 2.
    Mosaic compile time: the fully unrolled body compiles in 16s (K=2),
    43s (K=4), 141s (K=8) through this remote-compile service; K=8's
    extra read-amp saving over K=4 is ~0.5ms/step (<0.5%), not worth
    +100s on every cold compile, so the fwd caps at 4."""
    k = 1
    while k * 2 <= max_k and hp % (k * 2) == 0:
        k *= 2
    return k


def _spec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda p, b: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _halo_rows(xt: jax.Array, nrows: int,
               edge_fill: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Per-block 1-row halos of a row-major [H,...] array with H = npr *
    nrows: tops[p] = xt[nrows*p - 1], bots[p] = xt[nrows*(p+1)], with
    ``edge_fill`` rows beyond the global boundary. Plain XLA strided
    slices — under an H-sharded mesh the SPMD partitioner turns the
    one-row boundary reads into the collective-permute halo exchange,
    which keeps the pallas grid itself embarrassingly parallel.

    ``edge_fill``: the kernels apply relu(z + b1) to PRE-BIAS conv1_1
    halo rows, so a zero edge row would wrongly contribute relu(b1);
    -inf makes the biased relu exactly zero — the SAME-pad semantics.
    grad/out/code halos keep 0 (their kernels mask on ``out > 0``, and
    the uint8 codes cannot hold -inf)."""
    npr = xt.shape[0] // nrows
    zrow = jnp.full_like(xt[:1], edge_fill)
    tops = jnp.concatenate([zrow, xt[nrows - 1::nrows][:npr - 1]], axis=0)
    bots = jnp.concatenate([xt[nrows::nrows], zrow], axis=0)
    return tops, bots


def _clamped_halo_specs(w, nt, c, nrows, total_rows):
    """Clamped (edge_masks mode) halo specs into the MAIN array: 1-row
    blocks at global rows nrows*p-1 / nrows*(p+1), clamped at the edges
    (the kernels mask the clamped rows out). Zero extra HBM traffic."""
    top = _spec((1, w, nt, c),
                lambda p, b: (jnp.maximum(nrows * p - 1, 0), 0, b, 0))
    bot = _spec((1, w, nt, c),
                lambda p, b: (jnp.minimum(nrows * (p + 1), total_rows - 1),
                              0, b, 0))
    return top, bot


def _fwd_call(z1t, tops, bots, mw, sw, bvec, b1vec, *, k, interpret,
              biased_codes=False, spmd=False):
    h, w, n, c = z1t.shape
    hp = h // 2
    nt = _pick_nt(n, w, 2560)
    grid = (hp // k, n // nt)

    if spmd:
        tspec = bspec_ = _spec((1, w, nt, c), lambda p, b: (p, 0, b, 0))
    else:
        tspec, bspec_ = _clamped_halo_specs(w, nt, c, 2 * k, h)
        tops = bots = z1t
    in_specs = [tspec,
                _spec((2 * k, w, nt, c), lambda p, b: (p, 0, b, 0)),
                bspec_,
                _const_spec((3, c, c)), _const_spec((3, c, c)),
                _const_spec((1, bvec.shape[-1])), _const_spec((1, c))]
    out_specs = [
        _spec((k, w, nt, F), lambda p, b: (p, 0, b, 0)),
        _spec((k, w, nt, F), lambda p, b: (p, 0, b, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hp, w, n, F), z1t.dtype),
        jax.ShapeDtypeStruct((hp, w, n, F), jnp.uint8),
    ]
    flops = 2 * (12 * w * nt * c * c) * hp * (n // nt)
    return pl.pallas_call(
        partial(_fwd_kernel, biased_codes=biased_codes,
                edge_masks=not spmd, fold_b1=spmd),
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=z1t.size * 4, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tops, z1t, bots, mw, sw, bvec, b1vec)


def _bwd_call(gt, gtop, gbot, ot, otop, obot, ct, ctop, cbot,
              z1t, ztop, zbot, mwt, swt, b1vec, *, k, interpret,
              spmd=False):
    h, w, n, c = z1t.shape
    hp = h // 2
    nt = _pick_nt(n, w, 1280)
    npr = hp // k
    grid = (npr, n // nt)

    if spmd:
        def halo_trio(cc, nrows, total):
            s1 = _spec((1, w, nt, cc), lambda p, b: (p, 0, b, 0))
            return [s1,
                    _spec((nrows, w, nt, cc), lambda p, b: (p, 0, b, 0)),
                    s1]
    else:
        def halo_trio(cc, nrows, total):
            top, bot = _clamped_halo_specs(w, nt, cc, nrows, total)
            return [top,
                    _spec((nrows, w, nt, cc), lambda p, b: (p, 0, b, 0)),
                    bot]
        gtop = gbot = gt
        otop = obot = ot
        ctop = cbot = ct
        ztop = zbot = z1t

    in_specs = (halo_trio(F, k, hp) + halo_trio(F, k, hp)
                + halo_trio(F, k, hp) + halo_trio(c, 2 * k, h)
                + [_const_spec((3, c, c)), _const_spec((3, c, c)),
                   _const_spec((1, c))])
    # dM/dS/db2 come out as PER-ROW-BLOCK partials (summed in XLA by the
    # caller): block p owns slot p, accumulating across the batch grid dim
    # by revisiting — no cross-block reduction inside the kernel, so the
    # custom_partitioning wrapper can shard the row-block dim freely.
    out_specs = [
        _spec((2 * k, w, nt, c), lambda p, b: (p, 0, b, 0)),
        _spec((1, 3, c, c), lambda p, b: (p, 0, 0, 0)),
        _spec((1, 3, c, c), lambda p, b: (p, 0, 0, 0)),
        _spec((1, 1, F), lambda p, b: (p, 0, 0)),
        _spec((1, 1, c), lambda p, b: (p, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((h, w, n, c), z1t.dtype),
        jax.ShapeDtypeStruct((npr, 3, c, c), jnp.float32),
        jax.ShapeDtypeStruct((npr, 3, c, c), jnp.float32),
        jax.ShapeDtypeStruct((npr, 1, F), jnp.float32),
        jax.ShapeDtypeStruct((npr, 1, c), jnp.float32),
    ]
    flops = 2 * (24 * w * nt * c * c) * hp * (n // nt)
    return pl.pallas_call(
        partial(_bwd_kernel, edge_masks=not spmd, fold_b1=spmd),
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=z1t.size * 6, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gtop, gt, gbot, otop, ot, obot, ctop, ct, cbot, ztop, z1t, zbot,
      mwt, swt, b1vec)


# ---------------------------------------------------------------------------
# SPMD wrappers: the pallas calls above are embarrassingly parallel over
# (row blocks, batch tiles) once the halo rows arrive as separate arrays,
# so custom_partitioning can shard them along H ('spatial') and N ('data')
# by simply running the same call on each shard. The Shardy sharding rule
# ties the blocked H dim to the halo arrays' block dim via a compound
# factor ("(p i) ... , p ... -> ..."); the halo arrays themselves are built
# by plain XLA slicing (see _halo_rows), where the partitioner inserts the
# one-row collective-permute exchange. dM/dS/db2 leave the kernel as
# per-row-block partials summed in XLA, so no in-kernel cross-shard
# reduction exists anywhere. (VERDICT r2 #7: the fused stage1 previously
# forced the jnp fallback under the 2-D spatial mesh.)
# ---------------------------------------------------------------------------

_CP_CACHE: dict = {}


def _cp_wrap(fn, rule, **factor_sizes):
    wrapped = custom_partitioning(fn)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        rs = result_shape if isinstance(result_shape, (list, tuple)) \
            else [result_shape]
        result_shardings = type(rs)(r.sharding for r in rs)
        return mesh, fn, result_shardings, arg_shardings

    def infer(mesh, arg_shapes, result_shape):
        # propagate the main operand's sharding; Shardy refines via `rule`
        rs = result_shape if isinstance(result_shape, (list, tuple)) \
            else [result_shape]
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = getattr(arg_shapes[0].sharding, "spec", P())
        outs = []
        for r in rs:
            s = tuple(spec) + (None,) * (r.ndim - len(tuple(spec)))
            outs.append(NamedSharding(mesh, P(*s[:r.ndim])))
        return type(rs)(outs) if len(outs) > 1 else outs[0]

    wrapped.def_partition(partition, infer_sharding_from_operands=infer,
                          sharding_rule=rule, **factor_sizes)
    return wrapped


def _fwd_cp(k: int, interpret: bool, biased_codes: bool, bw: int):
    """custom_partitioning-wrapped forward call, cached per static config
    (k is shape-derived; the Shardy compound-factor sizes depend on it)."""
    key = ("fwd", k, interpret, biased_codes, bw)
    if key not in _CP_CACHE:
        def call(z1t, tops, bots, mw, sw, bvec, b1vec):
            return _fwd_call(z1t, tops, bots, mw, sw, bvec, b1vec, k=k,
                             interpret=interpret, biased_codes=biased_codes,
                             spmd=True)

        rule = ("(p i) w n c, p w n c, p w n c, t3 c c2, t4 c c3, "
                "one bw, one2 c -> (p j) w n f, (p j) w n f2")
        _CP_CACHE[key] = _cp_wrap(call, rule, i=2 * k, j=k)
    return _CP_CACHE[key]


def _bwd_cp(k: int, interpret: bool):
    key = ("bwd", k, interpret)
    if key not in _CP_CACHE:
        def call(gt, gtop, gbot, ot, otop, obot, ct, ctop, cbot,
                 z1t, ztop, zbot, mwt, swt, b1vec):
            return _bwd_call(gt, gtop, gbot, ot, otop, obot, ct, ctop,
                             cbot, z1t, ztop, zbot, mwt, swt, b1vec, k=k,
                             interpret=interpret, spmd=True)

        # NOTE the batch factor ``n`` is absent from the dM/dS/db result
        # mappings: each batch shard computes PARTIAL sums, and Shardy
        # resolves the mismatch by reducing them across the batch mesh
        # axis before handing the (replicated-over-n) partials back —
        # verified by the fake-mesh grad-equality tests
        # (tests/test_train.py::test_spatial_sharded_pallas_*), which
        # shard the batch 2-way and would be off by ~2x otherwise.
        rule = ("(p j) w n f, p w n f, p w n f, "
                "(p j) w n f, p w n f, p w n f, "
                "(p j) w n f, p w n f, p w n f, "
                "(p i) w n c, p w n c, p w n c, "
                "t3 c c2, t4 c c3, one2 c "
                "-> (p i) w n c, p t5 c c4, p t6 c c5, p one f, p one3 c")
        _CP_CACHE[key] = _cp_wrap(call, rule, i=2 * k, j=k)
    return _CP_CACHE[key]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_stage1_tail(z1, k2, b2, b1, interpret=False, spmd=False):
    """(+b1) -> relu -> packed conv1_2 -> 2x2 pool -> +b2 -> relu, fused.

    z1: [N,H,Wp,2F] packed conv1_1 output WITHOUT its bias. b1 [F] is
    folded into the kernel ONLY in SPMD mode, where db1 must fall out as
    per-block partials; single-device the wrapper pre-adds the bias (it
    fuses into conv1_1's XLA epilogue) and computes db1 as an XLA sum
    over dz1 — round 4, VERDICT r3 #4: the round-3 always-fold version
    cost the bwd kernel ~2 ms/step of VPU adds to save a ~1.3 ms XLA
    reduce, a measured net loss on the single-chip headline.
    k2: [3,3,F,F] canonical conv1_2 kernel. b2: [F].
    Returns the canonical pooled stage1 output [N,H/2,Wp,F].
    ``spmd=True`` takes the custom_partitioning halo-array path —
    shardable on batch AND height (see _cp_wrap above) at a few ms/step
    of extra slicing; the default clamped-halo path is the single-device
    fast path.
    """
    out, _ = _fused_fwd(z1, k2, b2, b1, interpret, spmd)
    return out


def _fused_fwd(z1, k2, b2, b1, interpret, spmd, biased_codes=False):
    n, h, w, c = z1.shape
    mw, sw = _build_mats(k2, z1.dtype)
    b2c = b2.astype(z1.dtype)
    bvec = (jnp.tile(b2c, 2) if biased_codes else b2c).reshape(1, -1)
    b1vec = jnp.tile(b1.astype(z1.dtype), 2).reshape(1, -1)
    if not spmd:
        # single-device: bias z1 HERE — the add fuses into conv1_1's XLA
        # output epilogue (free), the kernels run unfolded (fold_b1=False,
        # see _fwd_kernel), and the residual saves the BIASED z1 so the
        # bwd kernel reads it directly. SPMD keeps the in-kernel fold:
        # there db1 must fall out as per-block partials, and the halo
        # arrays' -inf edge fill assumes pre-bias rows.
        z1 = z1 + b1vec.reshape(1, 1, 1, -1)
    # HWNC view: bit-identical buffer to the {3,0,2,1} layout XLA picks for
    # conv outputs, so this transpose (and the one back) is a bitcast
    z1t = jnp.transpose(z1, (1, 2, 0, 3))
    k = _pick_k(h // 2)                     # from the GLOBAL shape
    if spmd:
        tops, bots = _halo_rows(z1t, 2 * k, edge_fill=-jnp.inf)
        out_t, codes_t = _fwd_cp(k, interpret, biased_codes,
                                 bvec.shape[-1])(
            z1t, tops, bots, mw, sw, bvec, b1vec)
    else:
        out_t, codes_t = _fwd_call(z1t, None, None, mw, sw, bvec, b1vec,
                                   k=k, interpret=interpret,
                                   biased_codes=biased_codes, spmd=False)
    out = jnp.transpose(out_t, (2, 0, 1, 3))
    return out, (z1, k2, b2, b1, out_t, codes_t)


def _fused_bwd(interpret, spmd, res, g):
    z1, k2, b2, b1, out_t, codes_t = res
    n, h, w, c = z1.shape
    mw, sw = _build_mats(k2, z1.dtype)
    mwt = jnp.swapaxes(mw, 1, 2)
    swt = jnp.swapaxes(sw, 1, 2)
    gt = jnp.transpose(g.astype(z1.dtype), (1, 2, 0, 3))
    z1t = jnp.transpose(z1, (1, 2, 0, 3))
    k = _pick_k(h // 2, max_k=2)
    b1vec = jnp.tile(b1.astype(z1.dtype), 2).reshape(1, -1)
    if spmd:
        gtop, gbot = _halo_rows(gt, k)
        otop, obot = _halo_rows(out_t, k)
        ctop, cbot = _halo_rows(codes_t, k)
        ztop, zbot = _halo_rows(z1t, 2 * k, edge_fill=-jnp.inf)
        dz1t, dm_p, ds_p, db2_p, db1_p = _bwd_cp(k, interpret)(
            gt, gtop, gbot, out_t, otop, obot, codes_t, ctop, cbot,
            z1t, ztop, zbot, mwt, swt, b1vec)
    else:
        dz1t, dm_p, ds_p, db2_p, db1_p = _bwd_call(
            gt, None, None, out_t, None, None, codes_t, None, None,
            z1t, None, None, mwt, swt, b1vec, k=k, interpret=interpret,
            spmd=False)
    dm = jnp.sum(dm_p, axis=0)
    ds = jnp.sum(ds_p, axis=0)
    db2 = jnp.sum(db2_p, axis=0)
    if spmd:
        db1p = jnp.sum(db1_p, axis=0).reshape(2 * F)
    else:
        # unfolded kernel (fold_b1=False): db1 is the plain XLA sum over
        # the kernel's dz1 output (dz1b == dz1: the bias add is identity
        # in the gradient) — measured ~1.3 ms vs ~2 ms of in-kernel VPU
        # accumulation (VERDICT r3 #4)
        db1p = jnp.sum(dz1t, axis=(0, 1, 2), dtype=jnp.float32)
    db1 = (db1p[:F] + db1p[F:]).astype(b1.dtype)  # tile-transpose
    dz1 = jnp.transpose(dz1t, (2, 0, 1, 3))
    dk2 = _dk_from_mats(dm, ds).astype(k2.dtype)
    return dz1, dk2, db2.reshape(F).astype(b2.dtype), db1


def reference_stage1_tail(z1, k2, b2, b1):
    """jnp reference for fused_stage1_tail (same packed semantics via
    ops/packed_stem): +b1 -> relu -> packed conv1_2 -> pool_pairs -> +b2
    -> relu."""
    from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
        pack_stem_conv2, pool_pairs,
    )
    dt = z1.dtype
    y = jax.nn.relu(z1 + jnp.tile(b1, 2).astype(dt))
    z2 = lax.conv_general_dilated(
        y, pack_stem_conv2(k2).astype(dt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(pool_pairs(z2) + b2.astype(dt))


fused_stage1_tail.defvjp(
    lambda z1, k2, b2, b1, interpret, spmd: _fused_fwd(z1, k2, b2, b1,
                                                       interpret, spmd),
    _fused_bwd)


# ---------------------------------------------------------------------------
# SegNet mode: same fused tail, but pooling relu(z + b) and RETURNING the
# within-window argmax codes (u8, (dy,dx) row-major, first-max-wins — the
# exact max_pool_with_argmax index the decoder unpools by).
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_segnet_stage1_tail(z1, k2, b2, b1, interpret=False, spmd=False):
    """(+b1) -> relu -> packed conv1_2 -> +b2 -> relu -> 2x2 argmax pool.

    z1: [N,H,Wp,2F] packed conv1_1 output WITHOUT its bias (b1 folded —
    see fused_stage1_tail). Returns (pooled [N,H/2,Wp,F], indices u8) —
    the SegNet encoder stage1 (models/segnet.py), replacing ConvBlock +
    max_pool_with_argmax. ``spmd`` as in fused_stage1_tail.
    """
    (out, idx), _ = _fused_seg_fwd(z1, k2, b2, b1, interpret, spmd)
    return out, idx


def _fused_seg_fwd(z1, k2, b2, b1, interpret, spmd):
    out, res = _fused_fwd(z1, k2, b2, b1, interpret, spmd,
                          biased_codes=True)
    codes_t = res[-1]
    idx = jnp.transpose(codes_t, (2, 0, 1, 3))
    return (out, idx), res


def _fused_seg_bwd(interpret, spmd, res, g):
    # the codes output is integer-typed (float0 cotangent) — only the
    # pooled output's cotangent flows. The backward kernel is the SAME as
    # the FCN mode: the `pooled > 0` mask equals the selected element's
    # relu(z + b) mask, the codes route identically, and db2/dM/dS read
    # the same operands.
    g_out, _ = g
    return _fused_bwd(interpret, spmd, res, g_out)


fused_segnet_stage1_tail.defvjp(_fused_seg_fwd, _fused_seg_bwd)


def reference_segnet_stage1_tail(z1, k2, b2, b1):
    """jnp reference for fused_segnet_stage1_tail: unpack to full
    resolution, then the canonical +b1 -> relu -> conv -> +b2 -> relu ->
    max_pool_with_argmax (ops/pool.py)."""
    from semanticsegmentation_tensorflow_tpu.ops.packed_stem import (
        pack_stem_conv2, unpack_pairs,
    )
    from semanticsegmentation_tensorflow_tpu.ops.pool import (
        max_pool_with_argmax,
    )
    dt = z1.dtype
    y = jax.nn.relu(z1 + jnp.tile(b1, 2).astype(dt))
    z2 = lax.conv_general_dilated(
        y, pack_stem_conv2(k2).astype(dt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    full = jax.nn.relu(unpack_pairs(z2) + b2.astype(dt))
    pooled, idx = max_pool_with_argmax(full, 2)
    return pooled, idx.astype(jnp.uint8)

"""Pallas TPU kernel: segment accumulate via digit-decomposed one-hot matmuls.

This is the TPU replacement for the reference's SIMD ``update_vector``
gather-add (reference: epik/include/epik/intrinsic.h) and for the XLA
scatter-add in the exact path -- scatter with heavily duplicated indices
serializes on TPU (measured: ~1.26 s/batch, the whole-pipeline bottleneck).

Idea: postings are laid out per read as dense (R, PP) tiles (see
``padded_expand`` in engine/placer.py).  For a tile of TR reads and CH
postings, the per-branch sums

    S[r, b] = sum_c [b_pad[r,c] == b] * s_pad[r,c]

decompose over the branch digits b = hi*128 + lo into two small one-hots,

    S[r, hi, lo] = sum_c onehot_hi[r,c,hi] * onehot_lo[r,c,lo] * s[r,c]

which is a batched (over r) MXU matmul of an (CH, NH) one-hot against an
(CH, 128) masked-score matrix -- ~(NH+128) VPU compare-ops per posting
instead of NH*128, and all the accumulation FLOPs ride the MXU.  Counts come
from the same contraction with the scores replaced by ones.

Grid: (R/TR, PP/CH), accumulating over the PP axis into a resident
(TR, NH*128) output block (zeroed on the first PP step).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = [
    "segment_accumulate",
    "segment_accumulate_sums",
    "segment_accumulate_packed",
    "segment_accumulate_packed_topk",
    "NH_LANES",
]

NH_LANES = 128  # lo-digit width: one VPU lane group


def _kernel(b_ref, s_ref, out_s_ref, out_c_ref, *, nh: int):
    tr, ch = b_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)
        out_c_ref[:] = jnp.zeros_like(out_c_ref)

    b = b_ref[:]
    s = s_ref[:]
    bhi = b >> 7
    blo = b & 127
    ohi = (
        bhi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, nh), 2)
    ).astype(jnp.float32)
    olo = (
        blo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, NH_LANES), 2)
    ).astype(jnp.float32)
    dn = (((1,), (1,)), ((0,), (0,)))  # contract CH, batch TR
    # HIGHEST: the TPU's DEFAULT matmul precision truncates f32 operands to
    # bf16, costing ~3e-3 on summed log10 scores -- far outside the 1e-4
    # parity gate.  The one-hot operand is 0/1 (exact in any precision);
    # only the score side needs the full-precision passes.
    acc_s = jax.lax.dot_general(
        ohi, olo * s[:, :, None], dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc_c = jax.lax.dot_general(ohi, olo, dn, preferred_element_type=jnp.float32)
    out_s_ref[:] += acc_s.reshape(tr, nh * NH_LANES)
    out_c_ref[:] += acc_c.reshape(tr, nh * NH_LANES)


def _kernel_s_only(b_ref, s_ref, out_s_ref, *, nh: int):
    """Sum-only variant (shifted-score mode: the count contraction cancels
    algebraically, halving the MXU work)."""
    tr, ch = b_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)

    b = b_ref[:]
    s = s_ref[:]
    bhi = b >> 7
    blo = b & 127
    ohi = (
        bhi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, nh), 2)
    ).astype(jnp.float32)
    olo = (
        blo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, NH_LANES), 2)
    ).astype(jnp.float32)
    dn = (((1,), (1,)), ((0,), (0,)))
    # HIGHEST: see _kernel -- bf16-truncated scores break the parity gate
    acc_s = jax.lax.dot_general(
        ohi, olo * s[:, :, None], dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_s_ref[:] += acc_s.reshape(tr, nh * NH_LANES)


def _kernel_packed_sums(p_ref, out_ref, *, nh: int):
    """Packed-payload sum-only variant: each cell holds
    ``(branch << 16) | q`` in int32 with q a 15-bit quantized shifted score
    (q == 0 for trash cells).  The score contraction runs as TWO bf16
    matmuls over the 8-bit digits of q -- EXACT integer arithmetic: the
    one-hots are 0/1, the digits are <= 255 (both exactly representable in
    bf16), every product is an integer <= 255, and the f32 MXU accumulator
    holds integer sums < 2**24 exactly (per-(read, branch) totals are
    <= 141 postings x 32000 < 2**23).  Versus one f32 HIGHEST matmul
    (~6 bf16-rate passes) this is 2 passes of MXU work."""
    tr, ch = p_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bf16 = jnp.bfloat16
    f32 = jnp.float32
    g = p_ref[:]
    b = g >> 16  # branch ids are < 2**15, g is non-negative
    q = g & 0xFFFF
    bhi = b >> 7
    blo = b & 127
    # minor-dim insertion (x[:, :, None]) is only supported for 32-bit
    # types on Mosaic: broadcast/select in f32, cast the 3-D result to bf16
    qh = (q >> 8).astype(f32)
    ql = (q & 255).astype(f32)
    lo_hit = (
        blo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, NH_LANES), 2)
    )
    ohi = (
        bhi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (tr, ch, nh), 2)
    ).astype(bf16)
    olo_qh = jnp.where(lo_hit, qh[:, :, None], f32(0)).astype(bf16)
    olo_ql = jnp.where(lo_hit, ql[:, :, None], f32(0)).astype(bf16)
    dn = (((1,), (1,)), ((0,), (0,)))
    acc_h = jax.lax.dot_general(
        ohi, olo_qh, dn, preferred_element_type=jnp.float32
    )
    acc_l = jax.lax.dot_general(
        ohi, olo_ql, dn, preferred_element_type=jnp.float32
    )
    out_ref[:] += (acc_h * 256.0 + acc_l).reshape(tr, nh * NH_LANES)


#: exponent below which IEEE-double 10**x rounds to exactly 0.0 (quirk Q3;
#: keep in sync with engine/placer.py::_POW10_ZERO)
_POW10_ZERO = -323.6


def _kernel_packed_topk(p_ref, m_ref, out_ref, acc_ref, *, nh: int, B: int,
                        K: int, k: int, log_eps: float, scale: float):
    """Packed accumulate with the finish (correction + LWR + top-K) FUSED
    into the last grid step, while the (tr, bw) score block is still
    resident in VMEM.

    The standalone pipeline materializes the (R, B) score matrix to HBM and
    the XLA finish re-reads it several times (corrected / max / exp-sum /
    top_k) -- ~45 ms of the 61 ms big-tree step at B=20k (measured,
    tools/profile_tiles_fused.py + bench_tile_kernels.py: the accumulate
    itself is ~0.1 ms).  Here only the slim (R, 2K+3) result ever leaves
    the kernel: [scores K | idx K | log_sum | n | zero_sum], the exact
    layout of engine/placer.py::_pack_outputs_slim.

    Math mirrors finish_scores_shifted + _lwr_topk exactly (f32, quirks
    Q3/Q4); top-K ties resolve to the lowest branch index like lax.top_k.
    """
    tr, ch = p_ref.shape
    f32 = jnp.float32
    i32 = jnp.int32
    bw = nh * NH_LANES

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bf16 = jnp.bfloat16
    g = p_ref[:]
    b = g >> 16
    q = g & 0xFFFF
    bhi = b >> 7
    blo = b & 127
    qh = (q >> 8).astype(f32)
    ql = (q & 255).astype(f32)
    lo_hit = (
        blo[:, :, None]
        == jax.lax.broadcasted_iota(i32, (tr, ch, NH_LANES), 2)
    )
    ohi = (
        bhi[:, :, None] == jax.lax.broadcasted_iota(i32, (tr, ch, nh), 2)
    ).astype(bf16)
    olo_qh = jnp.where(lo_hit, qh[:, :, None], f32(0)).astype(bf16)
    olo_ql = jnp.where(lo_hit, ql[:, :, None], f32(0)).astype(bf16)
    dn = (((1,), (1,)), ((0,), (0,)))
    acc_h = jax.lax.dot_general(
        ohi, olo_qh, dn, preferred_element_type=jnp.float32
    )
    acc_l = jax.lax.dot_general(
        ohi, olo_ql, dn, preferred_element_type=jnp.float32
    )
    acc_ref[:] += (acc_h * 256.0 + acc_l).reshape(tr, bw)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        neg_inf = f32(-jnp.inf)
        ln10 = f32(math.log(10.0))
        lane = jax.lax.broadcasted_iota(i32, (tr, bw), 1)
        valid = lane < B
        Sq = acc_ref[:]
        Sp = Sq / f32(scale)
        touched = (Sq > 0) & valid
        m = m_ref[:, 0:1]  # (tr, 1) f32 window counts
        corrected = jnp.where(
            touched, (Sp + m * f32(log_eps)) / f32(k), neg_inf
        )
        # ---- LWR over ALL branches (quirk Q4; mirrors _lwr_topk) -------------
        n = jnp.sum(touched.astype(f32), axis=1, keepdims=True)
        npl_exp = m * f32(log_eps) / f32(k)
        n_not = f32(B) - n
        max_c = jnp.max(corrected, axis=1, keepdims=True)
        max_t = jnp.maximum(max_c, jnp.where(n_not > 0, npl_exp, neg_inf))
        terms = jnp.where(touched, jnp.exp((corrected - max_t) * ln10), 0.0)
        sum10 = jnp.sum(terms, axis=1, keepdims=True) + n_not * jnp.exp(
            jnp.where(n_not > 0, (npl_exp - max_t) * ln10, neg_inf)
        )
        log_sum = max_t + jnp.log(sum10) / ln10
        # quirk Q3: the reference's double pow underflows to exact 0
        zero_sum = (max_c < f32(_POW10_ZERO)) & (
            (npl_exp < f32(_POW10_ZERO)) | (n_not <= 0)
        )
        # ---- top-K ------------------------------------------------------------
        # ties pick the lowest branch index (lax.top_k semantics); rows with
        # fewer than K touched branches repeat -inf rows, which the host
        # drops via n_eff = min(n, K) (assemble_arrays)
        #
        # FAST PATH (round 5): the K x ~4-VPU-pass loop over the full
        # (tr, bw) block was ~half the kernel (finish ~20 of 39 ms at
        # B=20k).  Candidates = per-LANE top-2 (7 passes over bw), then K
        # cheap rounds over the (tr, 2*128) candidate matrix.  Exactness
        # is DETECTED, not assumed: the fast result is valid iff exactly K
        # elements are >= the K-th candidate value and the row touches
        # >= K branches -- any lane holding 3+ of the top-K, any hidden
        # boundary tie, and any short row flips to the full loop
        # (measured on the 10k-taxa fixture: 98.4% of 8-read blocks
        # clean; per-read fallback 0.2%).
        out_col = jax.lax.broadcasted_iota(i32, (tr, 128), 1)
        x3 = corrected.reshape(tr, nh, NH_LANES)
        hi_iota = jax.lax.broadcasted_iota(i32, (tr, nh, NH_LANES), 1)
        lane_iota = jax.lax.broadcasted_iota(i32, (tr, nh, NH_LANES), 2)
        g3 = hi_iota * i32(NH_LANES) + lane_iota  # global branch index
        # per-lane top-1 (value + lowest-hi argmax), then mask and repeat
        m1 = jnp.max(x3, axis=1)  # (tr, 128)
        a1 = jnp.min(jnp.where(x3 == m1[:, None, :], g3, i32(bw)), axis=1)
        x3m = jnp.where(g3 == a1[:, None, :], neg_inf, x3)
        m2 = jnp.max(x3m, axis=1)
        a2 = jnp.min(jnp.where(x3m == m2[:, None, :], g3, i32(bw)), axis=1)
        cv = jnp.concatenate([m1, m2], axis=1)  # (tr, 256) candidate values
        cg = jnp.concatenate([jnp.minimum(a1, i32(bw - 1)),
                              jnp.minimum(a2, i32(bw - 1))], axis=1)
        res = jnp.zeros((tr, 128), f32)
        kth = jnp.full((tr, 1), neg_inf, f32)
        for kk in range(K):
            mx = jnp.max(cv, axis=1, keepdims=True)
            am = jnp.min(jnp.where(cv == mx, cg, i32(bw)), axis=1,
                         keepdims=True)
            am = jnp.minimum(am, i32(bw - 1))
            res = jnp.where(out_col == kk, mx, res)
            res = jnp.where(out_col == K + kk, am.astype(f32), res)
            cv = jnp.where(cg == am, neg_inf, cv)
            if kk == K - 1:
                kth = mx
        res = jnp.where(out_col == 2 * K, log_sum, res)
        res = jnp.where(out_col == 2 * K + 1, n, res)
        res = jnp.where(out_col == 2 * K + 2, zero_sum.astype(f32), res)
        # validity: exactly K elements >= kth (no lane hid a 3rd member or
        # a boundary tie) and the row touches >= K branches
        cnt = jnp.sum((corrected >= kth).astype(f32), axis=1, keepdims=True)
        row_ok = (cnt == f32(K)) & (n >= f32(K))
        fast_ok = jnp.all(row_ok)

        @pl.when(fast_ok)
        def _():
            out_ref[:] = res

        @pl.when(jnp.logical_not(fast_ok))
        def _():
            x = corrected
            r2 = jnp.zeros((tr, 128), f32)
            for kk in range(K):
                mx = jnp.max(x, axis=1, keepdims=True)
                am = jnp.min(
                    jnp.where(x == mx, lane, i32(bw)), axis=1, keepdims=True
                )
                am = jnp.minimum(am, i32(bw - 1))
                r2 = jnp.where(out_col == kk, mx, r2)
                r2 = jnp.where(out_col == K + kk, am.astype(f32), r2)
                x = jnp.where(lane == am, neg_inf, x)
            r2 = jnp.where(out_col == 2 * K, log_sum, r2)
            r2 = jnp.where(out_col == 2 * K + 1, n, r2)
            r2 = jnp.where(out_col == 2 * K + 2, zero_sum.astype(f32), r2)
            out_ref[:] = r2


@functools.partial(
    jax.jit,
    static_argnames=("num_branches", "K", "k", "log_eps", "scale", "tr",
                     "ch", "interpret"),
)
def segment_accumulate_packed_topk(
    p_pad: jnp.ndarray,
    m_f32: jnp.ndarray,
    num_branches: int,
    K: int,
    k: int,
    log_eps: float,
    scale: float,
    tr: int = 8,
    ch: int = 512,
    interpret: bool = False,
):
    """Fused packed accumulate + finish.  Returns the slim result pack
    float32[R_pad, 2K+3]: [scores K | idx K | log_sum | n | zero_sum]
    (engine/placer.py::_pack_outputs_slim layout).

    ``m_f32``: float32[R_pad] per-read window counts (size_t-wrapped,
    quirk Q1).  K <= 62 (the pack plus statistics must fit 128 lanes)."""
    r_pad, pp = p_pad.shape
    assert r_pad % tr == 0, (r_pad, tr)
    assert pp % ch == 0, (pp, ch)
    assert 2 * K + 3 <= 128, K
    nh = (num_branches + 1 + NH_LANES - 1) // NH_LANES
    bw = nh * NH_LANES
    assert bw - 1 < (1 << 15), ("packed payload needs branch ids < 2**15", bw)

    m2 = jnp.broadcast_to(m_f32[:, None], (r_pad, 128))
    grid = (r_pad // tr, pp // ch)
    out = pl.pallas_call(
        functools.partial(
            _kernel_packed_topk, nh=nh, B=num_branches, K=K, k=k,
            log_eps=float(log_eps), scale=float(scale),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, ch), lambda i, j: (i, j)),
            pl.BlockSpec((tr, 128), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tr, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tr, bw), jnp.float32)],
        interpret=interpret,
    )(p_pad, m2)
    return out[:, : 2 * K + 3]


@functools.partial(
    jax.jit, static_argnames=("num_branches", "tr", "ch", "interpret")
)
def segment_accumulate_packed(
    p_pad: jnp.ndarray,
    num_branches: int,
    tr: int = 8,
    ch: int = 512,
    interpret: bool = False,
):
    """Sum-only accumulate over packed ``(branch << 16) | q15`` int32 cells.

    Returns float32[R_pad, B] EXACT integer sums of q per (read, branch);
    the caller divides by the quantization scale once.  Trash cells must
    hold ``trash_branch(B) << 16`` (q == 0)."""
    r_pad, pp = p_pad.shape
    assert r_pad % tr == 0, (r_pad, tr)
    assert pp % ch == 0, (pp, ch)
    nh = (num_branches + 1 + NH_LANES - 1) // NH_LANES
    bw = nh * NH_LANES
    assert bw - 1 < (1 << 15), ("packed payload needs branch ids < 2**15", bw)

    grid = (r_pad // tr, pp // ch)
    out_s = pl.pallas_call(
        functools.partial(_kernel_packed_sums, nh=nh),
        grid=grid,
        in_specs=[pl.BlockSpec((tr, ch), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tr, bw), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
        interpret=interpret,
    )(p_pad)
    return out_s[:, :num_branches]


@functools.partial(
    jax.jit, static_argnames=("num_branches", "tr", "ch", "interpret")
)
def segment_accumulate_sums(
    b_pad: jnp.ndarray,
    s_pad: jnp.ndarray,
    num_branches: int,
    tr: int = 8,
    ch: int = 512,
    interpret: bool = False,
):
    """Sum-only segment accumulate (no counts): float32[R_pad, B]."""
    r_pad, pp = b_pad.shape
    assert r_pad % tr == 0, (r_pad, tr)
    assert pp % ch == 0, (pp, ch)
    nh = (num_branches + 1 + NH_LANES - 1) // NH_LANES
    bw = nh * NH_LANES

    grid = (r_pad // tr, pp // ch)
    out_s = pl.pallas_call(
        functools.partial(_kernel_s_only, nh=nh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, ch), lambda i, j: (i, j)),
            pl.BlockSpec((tr, ch), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((tr, bw), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
        interpret=interpret,
    )(b_pad, s_pad)
    return out_s[:, :num_branches]


@functools.partial(
    jax.jit, static_argnames=("num_branches", "tr", "ch", "interpret")
)
def segment_accumulate(
    b_pad: jnp.ndarray,
    s_pad: jnp.ndarray,
    num_branches: int,
    tr: int = 8,
    ch: int = 512,
    interpret: bool = False,
):
    """Per-read branch sums from padded posting tiles.

    Args:
      b_pad: int32[R_pad, PP] branch ids; invalid cells MUST hold the trash
        id ``trash_branch(num_branches)`` (their scores must be 0 for S; they
        still count into the trash column, which is sliced away).
      s_pad: float32[R_pad, PP] scores (0 at invalid cells).
      num_branches: B; outputs are sliced to [:, :B].

    Returns:
      (S, C): float32[R_pad, B], int32[R_pad, B].
    """
    r_pad, pp = b_pad.shape
    assert r_pad % tr == 0, (r_pad, tr)
    assert pp % ch == 0, (pp, ch)
    nh = (num_branches + 1 + NH_LANES - 1) // NH_LANES
    bw = nh * NH_LANES

    grid = (r_pad // tr, pp // ch)
    out_s, out_c = pl.pallas_call(
        functools.partial(_kernel, nh=nh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, ch), lambda i, j: (i, j)),
            pl.BlockSpec((tr, ch), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((tr, bw), lambda i, j: (i, 0)),
            pl.BlockSpec((tr, bw), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
        ],
        interpret=interpret,
    )(b_pad, s_pad)
    return out_s[:, :num_branches], out_c[:, :num_branches].astype(jnp.int32)


def trash_branch(num_branches: int) -> int:
    """The in-bounds column used for invalid cells (always >= num_branches)."""
    nh = (num_branches + 1 + NH_LANES - 1) // NH_LANES
    return nh * NH_LANES - 1

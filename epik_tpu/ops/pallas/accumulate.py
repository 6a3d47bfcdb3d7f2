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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


__all__ = ["segment_accumulate", "segment_accumulate_sums", "NH_LANES"]

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

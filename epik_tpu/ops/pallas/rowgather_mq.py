"""Multi-queue DMA row-gather + sum kernel (the round-4 attempt at the
dense path's gather wall).

docs/ROOFLINE.md: the fused XLA row gather sustains ~115-154 GB/s (~15-19%
of v5e HBM peak) and is the dominant term of the dense placement step; a
Pallas kernel owning the DMA pipeline was named the only plausible path
past XLA's gather lowering.  The round-1/2 single-queue attempt sustained
~80 GiB/s and was retired.  This is the multi-queue version: NQ row DMAs
in flight on independent semaphores, accumulating each row into the
per-read sum as its copy lands.

Mosaic constraints shape the layout (discovered while building this):
a dynamic single-row slice of a (8,128)-tiled 2-D memref cannot be DMA'd
(sublane-tile alignment), and 1-D vector loads at dynamic offsets do not
lower.  So the plane is staged as (n_rows * SUB, 128) with SUB=16
sublane-rows per logical row (11 hold the 1408 payload lanes, 5 are pad):
every DMA and every VMEM access is then a (16, 128) block at a
``pl.multiple_of``-aligned sublane offset.  The 45% byte overhead is
accepted for the experiment -- the issue rate, not bytes, is the
hypothesis under test.

Issue-rate model (to be confirmed/falsified by measurement): per-row DMA
issue from the scalar core costs ~60 ns regardless of queue depth, so
multi-queueing hides completion LATENCY but cannot raise the ISSUE rate;
at 5.6 KB rows that predicts ~94 GB/s -- BELOW the fused XLA gather.  The
kernel exists to measure exactly that, per the round-4 verdict ("build it
once, measure honestly, and either ship the win or append the
falsification").  Measured result: tools/bench_rowgather_mq.py and the
ROOFLINE.md round-4 section.

Reference analog: the SIMD posting-list gather, epik/include/epik/
intrinsic.h:81,146.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rowgather_sum_mq", "stage_plane"]

#: sublane rows per logical plane row (8-aligned so every slice offset is
#: a tile multiple); 16 covers plane widths up to 2048 lanes
SUB = 16


def _kernel(rows_ref, plane_ref, out_ref, *, W: int, NQ: int, TR: int):
    """One grid step: sum W plane rows for each of TR reads.

    rows_ref: (TR, W) int32 in SMEM (logical plane row per window).
    plane_ref: (n_rows * SUB, 128) f32 in HBM/ANY.
    out_ref: (TR * SUB, 128) f32 in VMEM (per-read padded row sums).
    """

    def body(buf, sems):
        total = TR * W

        def issue(d, slot):
            r = d // W
            w = d % W
            row = rows_ref[r, w]
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(pl.multiple_of(row * SUB, SUB), SUB), :],
                buf.at[pl.ds(pl.multiple_of(slot * SUB, SUB), SUB), :],
                sems.at[slot],
            ).start()

        for q in range(NQ):
            issue(q, q)

        def step(d, _):
            slot = jax.lax.rem(d, NQ)
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(0, SUB), :],
                buf.at[pl.ds(pl.multiple_of(slot * SUB, SUB), SUB), :],
                sems.at[slot],
            ).wait()
            r = d // W
            dst = pl.ds(pl.multiple_of(r * SUB, SUB), SUB)
            src = pl.ds(pl.multiple_of(slot * SUB, SUB), SUB)
            out_ref[dst, :] += buf[src, :]

            @pl.when(d + NQ < total)
            def _():
                issue(d + NQ, slot)

            return 0

        out_ref[:] = jnp.zeros_like(out_ref)
        jax.lax.fori_loop(0, total, step, 0)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((NQ * SUB, 128), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((NQ,)),
    )


@jax.jit
def stage_plane(plane):
    """(n_rows, bw) -> (n_rows * SUB, 128) tile-aligned staging copy."""
    n_rows, bw = plane.shape
    lanes = bw // 128
    return jnp.pad(
        plane.reshape(n_rows, lanes, 128),
        ((0, 0), (0, SUB - lanes), (0, 0)),
    ).reshape(n_rows * SUB, 128)


@functools.partial(
    jax.jit, static_argnames=("bw", "NQ", "TR", "interpret")
)
def rowgather_sum_mq(staged, rows, bw: int, NQ: int = 8, TR: int = 8,
                     interpret: bool = False):
    """Sp[r] = sum_w plane[rows[r, w]] via an NQ-deep DMA pipeline.

    staged: :func:`stage_plane` output (built once; the pad is a 1.45x
    HBM copy); bw: the logical plane width (multiple of 128, <= SUB*128);
    rows: (R, W) int32 (misses must point at an all-zero row).  Returns
    float32 (R, bw)."""
    R, W = rows.shape
    assert R % TR == 0, (R, TR)
    assert bw % 128 == 0 and bw <= SUB * 128, bw
    grid = (R // TR,)
    out = pl.pallas_call(
        functools.partial(_kernel, W=W, NQ=NQ, TR=TR),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, W), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TR * SUB, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R * SUB, 128), jnp.float32),
        interpret=interpret,
    )(rows, staged)
    return out.reshape(R, SUB * 128)[:, :bw]

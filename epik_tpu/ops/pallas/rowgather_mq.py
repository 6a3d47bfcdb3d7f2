"""Multi-queue DMA row-gather + sum kernel (the round-4 attempt at the
dense path's gather wall).

docs/ROOFLINE.md: the fused XLA row gather sustains ~115-134 GB/s (~15% of
v5e HBM peak) and is the dominant term of the dense placement step; a
Pallas kernel owning the DMA pipeline was named the only plausible path
past XLA's gather lowering.  The round-1/2 single-queue attempt sustained
~80 GiB/s and was retired.  This is the multi-queue version: NQ row DMAs
in flight on independent semaphores, accumulating each row into the
per-read sum as its copy lands.

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

__all__ = ["rowgather_sum_mq"]


def _kernel(rows_ref, plane_ref, out_ref, *, W: int, NQ: int, TR: int,
            bw: int):
    """One grid step: sum W plane rows for each of TR reads.

    rows_ref: (TR, W) int32 in SMEM (plane row per window).
    plane_ref: (n_rows, bw) f32 in HBM/ANY; DMA'd row-by-row.
    out_ref: (TR, bw) f32 in VMEM.
    """

    def body(buf, sems):
        total = TR * W

        def issue(d, slot):
            r = d // W
            w = d % W
            row = rows_ref[r, w]
            pltpu.make_async_copy(
                plane_ref.at[row], buf.at[slot], sems.at[slot]
            ).start()

        # prime the pipeline
        for q in range(NQ):
            issue(q, q)

        def step(d, _):
            slot = jax.lax.rem(d, NQ)
            pltpu.make_async_copy(
                plane_ref.at[0], buf.at[slot], sems.at[slot]
            ).wait()
            r = d // W
            out_ref[pl.ds(r, 1), :] += buf[slot][None, :]

            @pl.when(d + NQ < total)
            def _():
                issue(d + NQ, slot)

            return 0

        out_ref[:] = jnp.zeros_like(out_ref)
        jax.lax.fori_loop(0, total, step, 0)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((NQ, bw), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((NQ,)),
    )


@functools.partial(
    jax.jit, static_argnames=("NQ", "TR", "interpret")
)
def rowgather_sum_mq(plane, rows, NQ: int = 8, TR: int = 8,
                     interpret: bool = False):
    """Sp[r] = sum_w plane[rows[r, w]] via an NQ-deep DMA pipeline.

    plane: (n_rows, bw) float32; rows: (R, W) int32 (misses must point at
    an all-zero row).  Returns float32 (R, bw)."""
    R, W = rows.shape
    bw = plane.shape[1]
    assert R % TR == 0, (R, TR)
    grid = (R // TR,)
    return pl.pallas_call(
        functools.partial(_kernel, W=W, NQ=NQ, TR=TR, bw=bw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, W), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TR, bw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, bw), jnp.float32),
        interpret=interpret,
    )(rows, plane)

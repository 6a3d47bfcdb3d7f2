"""Pallas TPU kernel: pipelined HBM row-gather + per-read accumulate.

The dense-database hot loop gathers, for every window of every read, one
(plane_width,) score row from the dense (num_keys+1, bw) plane and reduces
rows to per-read sums (engine/placer.py::dense_exact_sums).

This kernel issues the row fetches as explicit async DMAs (HBM -> VMEM),
``G`` rows per group with ``NSLOT`` groups in flight, so row latency is
hidden behind bandwidth; the VPU reduces each landed group into a per-read
accumulator carried in vector registers.  This is the TPU-native analog of
the reference's AVX ``_mm256_i32gather_ps`` posting gather
(reference: epik/include/epik/intrinsic.h:81,146) -- but against a dense
bandwidth-optimal layout rather than a hash map.

Measured honestly on a v5e (tools/bench_rowgather.py, synchronized via a
device->host fetch -- plain ``block_until_ready`` does not synchronize on
the remote-tunnel backend and inflates numbers ~300x): ~80 GiB/s sustained.
The per-row DMA issue runs on the scalar core at ~66 ns each, which is the
ceiling for 5.6 KB rows.  XLA's chunked dynamic-gather measures *faster*
(~125-150 GiB/s at a 32-window chunk), so this kernel is kept as an opt-in
(``PlacerConfig.dense_gather="pallas"``) and as the template for future
fused lookup+gather work, not the default.

Mosaic constraint: a (1, bw) slice of an (8,128)-tiled 2D HBM buffer is not
DMA-able (dim-0 slices must be 8-aligned), and 1D buffers get (1024)
tiling with the same alignment problem.  The plane is therefore passed as
a 3D (num_keys+1, 1, bw) array -- dim -2 of size 1 forces (1, 128) tiling,
making every single-row slice tile-aligned.

Layout contract (same as the XLA path):
  * ``plane``: (num_keys + 1, bw) float32 score plane; row ``num_keys`` is
    all zeros (the miss/padding row); absent cells are exactly 0 and
    presence is ``cell != 0``; bw a multiple of 128.
  * ``rows``: (R_pad, W) int32 per-read plane-row indices in window order;
    misses/padding point at the zero row.  R_pad a multiple of ``tr``,
    W a multiple of ``g``.

Returns per-read sums S = sum of gathered rows (float32) and counts
C = number of nonzero cells per column (float32; exact small integers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_sums", "GATHER_TR", "GATHER_G"]

GATHER_TR = 8  # reads per grid step (f32 min sublane tile)
GATHER_G = 8  # rows per DMA group
_NSLOT = 4  # DMA groups in flight (NSLOT * G outstanding copies)


def _kernel(rows_ref, plane_ref, out_s_ref, out_c_ref, buf, sems, *,
            tr: int, w: int, g: int, nslot: int, bw: int):
    f32 = jnp.float32
    gr = w // g  # groups per read
    total = tr * gr

    def dma(slot, t, j):
        r = t // gr
        col = (t % gr) * g + j
        row = rows_ref[r, col]
        return pltpu.make_async_copy(
            plane_ref.at[row], buf.at[slot * g + j], sems.at[slot, j])

    # warm up the pipeline: NSLOT groups in flight
    for s in range(min(nslot, total)):
        for j in range(g):
            dma(s, s, j).start()

    zero = jnp.zeros((1, bw), f32)
    for r in range(tr):  # static: per-read accumulate, one row write each

        def body(i, carry):
            acc_s, acc_c = carry
            t = r * gr + i
            slot = jax.lax.rem(t, nslot)
            for j in range(g):
                dma(slot, t, j).wait()
                blk = buf[slot * g + j].astype(f32)
                acc_s = acc_s + blk
                acc_c = acc_c + (blk != 0).astype(f32)

            @pl.when(t + nslot < total)
            def _():
                for j in range(g):
                    dma(slot, t + nslot, j).start()

            return acc_s, acc_c

        acc_s, acc_c = jax.lax.fori_loop(0, gr, body, (zero, zero))
        out_s_ref[pl.ds(r, 1), :] = acc_s
        out_c_ref[pl.ds(r, 1), :] = acc_c


@functools.partial(jax.jit, static_argnames=("tr", "g", "nslot", "interpret"))
def gather_sums(
    plane: jnp.ndarray,
    rows: jnp.ndarray,
    tr: int = GATHER_TR,
    g: int = GATHER_G,
    nslot: int = _NSLOT,
    interpret: bool = False,
):
    """Per-read (S, C) sums of dense-plane rows via pipelined DMA gathers.

    Args:
      plane: (num_keys + 1, bw) float32 dense score plane; the last row must
        be all zeros (misses), bw a multiple of 128.
      rows: (R_pad, W) int32 plane-row per (read, window); R_pad a multiple
        of ``tr``, W a multiple of ``g``.

    Returns:
      (S, C): float32 (R_pad, bw) row sums and nonzero counts.
    """
    r_pad, w = rows.shape
    nk, bw = plane.shape
    assert r_pad % tr == 0, (r_pad, tr)
    assert w % g == 0, (w, g)
    assert bw % 128 == 0, bw

    grid = (r_pad // tr,)
    out_s, out_c = pl.pallas_call(
        functools.partial(_kernel, tr=tr, w=w, g=g, nslot=nslot, bw=bw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tr, bw), lambda i: (i, 0)),
            pl.BlockSpec((tr, bw), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, bw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslot * g, 1, bw), plane.dtype),
            pltpu.SemaphoreType.DMA((nslot, g)),
        ],
        interpret=interpret,
    )(rows, plane.reshape(nk, 1, bw))
    return out_s, out_c

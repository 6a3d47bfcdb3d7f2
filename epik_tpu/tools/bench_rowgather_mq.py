"""A/B: multi-queue DMA row-gather kernel vs the fused XLA chunked gather.

Methodology: N distinct device-resident inputs dispatched back-to-back,
one scalar fetch as the sync barrier (block_until_ready does not block on
the axon tunnel), scalar-fetch RTT subtracted.  D652 production geometry:
R=8192 reads x 144 padded window rows, 930k-row combined plane, 1408 f32
lanes (5.6 KB rows).

Run: python -m epik_tpu.tools.bench_rowgather_mq
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..engine.placer import dense_sums_shifted
    from ..ops.pallas.rowgather_mq import rowgather_sum_mq, stage_plane

    log(f"backend: {jax.default_backend()}")
    N_ROWS = 600_000  # plane + staged copy coexist at staging; 930k OOMs
    BW = 1408
    R, W = 8192, 144
    # generate ON DEVICE: uploading a 5.2 GB plane over the ~40 MB/s
    # tunnel would take hours
    key = jax.random.PRNGKey(0)
    plane = jax.random.uniform(key, (N_ROWS, BW), jnp.float32)
    rows_list = [
        jax.random.randint(jax.random.PRNGKey(i + 1), (R, W), 0, N_ROWS,
                           jnp.int32)
        for i in range(6)
    ]
    gb = R * W * BW * 4 / 1e9

    np.asarray(jnp.sum(plane[:1, :1]))
    t = time.time()
    for _ in range(5):
        np.asarray(jnp.sum(plane[:1, :1]))
    RTT = (time.time() - t) / 5
    log(f"scalar-fetch round trip: {RTT*1000:.1f} ms; "
        f"{gb:.1f} GB gathered per call")

    def timeit(name, f):
        # plane passed as an ARGUMENT: closure capture embeds it as a
        # 5.2 GB lowering constant (re-uploaded per executable)
        try:
            np.asarray(jnp.sum(f(plane, rows_list[0])[0]))
        except Exception as e:
            log(f"{name:40s}   FAILED ({str(e)[:100]})")
            return
        t = time.time()
        outs = [f(plane, r) for r in rows_list]
        np.asarray(jnp.sum(outs[-1][0]))
        dt = (time.time() - t - RTT) / len(rows_list)
        log(f"{name:40s} {dt*1000:8.1f} ms  = {gb/dt:6.1f} GB/s")

    @jax.jit
    def xla_gather(plane, rows):
        return dense_sums_shifted(plane, rows, R=R, B=BW, Wmax=W)

    timeit("fused XLA chunked gather (shipped)", xla_gather)

    staged = stage_plane(plane)
    np.asarray(jnp.sum(staged[:1, :1]))  # build the staging copy once
    plane.delete()  # 5.2 GB freed; plane + staged together graze the HBM cap
    plane = None
    for nq, tr in [(4, 8), (8, 8), (16, 8), (8, 16), (16, 16), (32, 8)]:
        def f(_plane, rows, nq=nq, tr=tr):
            return rowgather_sum_mq(staged, rows, bw=BW, NQ=nq, TR=tr)
        timeit(f"pallas multi-queue DMA NQ={nq} TR={tr}", f)


if __name__ == "__main__":
    main()

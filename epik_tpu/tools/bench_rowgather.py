"""Microbenchmark: sweep the pipelined-DMA row-gather kernel parameters.

The dense-plane hot loop (engine/placer.py::dense_exact_sums) spends nearly
all of its time in ops/pallas/rowgather.py::gather_sums.  This tool sweeps
the kernel's tuning knobs -- rows per DMA group ``g``, groups in flight
``nslot``, reads per grid step ``tr`` -- on a realistic D652-scale shape and
reports sustained gather bandwidth, so the defaults in rowgather.py can be
set from measurement rather than guesswork (the reference's analog is the
compile-time SSE/AVX2/AVX512 choice, epik/CMakeLists.txt:3-45; here the
choice is a measured runtime default).

Usage:  python -m epik_tpu.tools.bench_rowgather [--reads 2000] [--w 144]
"""

from __future__ import annotations

import argparse
import itertools
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-keys", type=int, default=500_000)
    ap.add_argument("--bw", type=int, default=1408, help="plane width (128x)")
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--w", type=int, default=144, help="windows per read")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--g", type=int, nargs="*", default=[4, 8, 16])
    ap.add_argument("--nslot", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--tr", type=int, nargs="*", default=[8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.pallas.rowgather import gather_sums

    rng = np.random.default_rng(0)
    plane = jnp.asarray(
        rng.standard_normal((args.num_keys + 1, args.bw)), jnp.float32
    ).at[-1].set(0.0)
    rows = jnp.asarray(
        rng.integers(0, args.num_keys, (args.reads, args.w)), jnp.int32
    )
    bytes_moved = args.reads * args.w * args.bw * 4

    print(f"plane {plane.shape} f32 ({plane.nbytes / 2**30:.2f} GiB), "
          f"rows {rows.shape}, {bytes_moved / 2**30:.2f} GiB gathered/iter")

    # On the remote-tunnel backend block_until_ready does not reliably
    # synchronize; a scalar device->host fetch does.  The chained sum makes
    # every iteration a data dependency of the fetched value.
    def timed(fn):
        tot = jnp.float32(0.0)
        tot = tot + jnp.sum(fn())  # compile + warm
        float(tot)
        t0 = time.perf_counter()
        tot = jnp.float32(0.0)
        for _ in range(args.iters):
            tot = tot + jnp.sum(fn())
        float(tot)
        return (time.perf_counter() - t0) / args.iters

    @jax.jit
    def xla_gather(plane, rows):
        def body(i, acc):
            chunk = jax.lax.dynamic_slice(rows, (0, i * 8), (args.reads, 8))
            return acc + jnp.sum(plane[chunk], axis=1)
        return jax.lax.fori_loop(
            0, args.w // 8, body,
            jnp.zeros((args.reads, args.bw), jnp.float32))

    dt = timed(lambda: xla_gather(plane, rows))
    print(f"XLA chunked gather (anchor): {dt * 1e3:8.2f} ms  "
          f"{bytes_moved / dt / 2**30:7.1f} GiB/s")

    best = None
    for g, nslot, tr in itertools.product(args.g, args.nslot, args.tr):
        if args.w % g or args.reads % tr:
            continue
        try:
            dt = timed(
                lambda: gather_sums(plane, rows, tr=tr, g=g, nslot=nslot)[0])
        except Exception as e:  # noqa: BLE001 -- report and keep sweeping
            print(f"g={g:3d} nslot={nslot:2d} tr={tr:2d}  FAILED: {e}")
            continue
        gbs = bytes_moved / dt / 2**30
        tag = ""
        if best is None or gbs > best[0]:
            best = (gbs, g, nslot, tr)
            tag = "  <-- best"
        print(f"g={g:3d} nslot={nslot:2d} tr={tr:2d}  {dt * 1e3:8.2f} ms  "
              f"{gbs:7.1f} GiB/s{tag}")

    if best:
        print(f"\nbest: g={best[1]} nslot={best[2]} tr={best[3]} "
              f"at {best[0]:.1f} GiB/s")


if __name__ == "__main__":
    main()

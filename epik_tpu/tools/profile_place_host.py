"""Host-side share of place(): where the 115k end-to-end vs 168k
fused-step-ceiling gap comes from (round-4 ask #1).

Times each host stage of the production paired path for one R=8192 batch:
dedup map build, byte staging (matrix fill + pack), dispatch, device wait,
result fetch, assemble -- then a full in-flight loop like bench.py's to see
what overlaps away.

Run: python -m epik_tpu.tools.profile_place_host
"""

from __future__ import annotations

import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, PlacerConfig, unpack_outputs_slim
    from ..io.build import reads_from_reference, reference_like_db

    import os

    log(f"backend: {jax.default_backend()}")
    db, ref = reference_like_db(
        num_leaves=652, kmer_size=10, ref_length=520_000,
        mean_posting_len=12.0, seed=652,
    )
    tree = parse_newick(db.tree())
    BATCH = 8192
    NREADS = 10 * BATCH
    reads = reads_from_reference(ref, NREADS, length=150,
                                 mutation_rate=0.02, seed=7)
    cfg = PlacerConfig(host_threads=max(2, os.cpu_count() or 2))
    p = JaxPlacer(db, tree, config=cfg)
    assert p._paired
    p.place(reads[:BATCH])  # compile + page

    batch = reads[:BATCH]

    def t(f, n=5):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            out = f()
            best = min(best, time.perf_counter() - t0)
        return best * 1000, out

    # --- stage timings (single-threaded, uncontended) -------------------------
    ms, _ = t(lambda: {s: None for _, s in batch})
    log(f"dict-dedup map build        {ms:7.1f} ms")

    sequence_map = {}
    for header, seq in batch:
        sequence_map.setdefault(seq, []).append(header)
    seqs = list(sequence_map.keys())

    ms, staged = t(lambda: p._stage_bytes(seqs))
    log(f"_stage_bytes (host staging) {ms:7.1f} ms")
    fn, arrays, m_signed, R_true, K = staged

    ms, out = t(lambda: fn(*arrays))
    log(f"dispatch (async)            {ms:7.1f} ms")

    t0 = time.perf_counter()
    out.block_until_ready()
    log(f"device wait                 {(time.perf_counter()-t0)*1000:7.1f} ms")

    ms, arr = t(lambda: np.asarray(fn(*arrays)), n=3)
    log(f"dispatch+wait+fetch         {ms:7.1f} ms")

    ms, unp = t(lambda: unpack_outputs_slim(arr, K))
    log(f"unpack_outputs_slim         {ms:7.1f} ms")

    scores_k, idx_k, counts_k, wr_k, n_t, zs, _, _ = unp
    ms, _ = t(lambda: p._assemble(
        seqs, sequence_map, m_signed, scores_k[:R_true], idx_k[:R_true],
        counts_k[:R_true], wr_k[:R_true], n_t[:R_true], zs[:R_true], K))
    log(f"assemble_arrays             {ms:7.1f} ms")

    ms, _ = t(lambda: p.place(batch), n=3)
    log(f"FULL place() sync           {ms:7.1f} ms")

    # --- in-flight loop (the bench's shape) -----------------------------------
    from concurrent.futures import ThreadPoolExecutor

    for inflight in (2, 3, 4, 6):
        pool = ThreadPoolExecutor(max_workers=inflight)
        for _ in range(2):  # second pass is the measured one
            t0 = time.perf_counter()
            futs = [pool.submit(p.place, reads[s : s + BATCH])
                    for s in range(0, NREADS, BATCH)]
            for f in futs:
                f.result()
            dt = time.perf_counter() - t0
        log(f"inflight={inflight}: {NREADS/dt:8.0f} reads/s "
            f"({dt*1000/ (NREADS//BATCH):.1f} ms/batch)")
        pool.shutdown()


if __name__ == "__main__":
    main()

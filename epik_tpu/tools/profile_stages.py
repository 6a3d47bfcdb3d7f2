"""Stage-level profiler for the single-chip bench workload.

Times each stage of the hot path separately on the real device so bench
regressions can be attributed: tokenize, host key->row lookup, input
transfer, device step, result fetch, host assembly.  Run:

    python -m epik_tpu.tools.profile_stages
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from epik_tpu.core.tree import parse_newick
    from epik_tpu.engine.placer import JaxPlacer, PlacerConfig
    from epik_tpu.io.build import reads_from_reference, reference_like_db

    log(f"backend: {jax.default_backend()} ({time.time()-t0:.1f}s)")

    db, ref = reference_like_db(
        num_leaves=652, kmer_size=10, ref_length=520_000,
        mean_posting_len=12.0, seed=652,
    )
    tree = parse_newick(db.tree())
    reads = reads_from_reference(ref, 4000, length=150, mutation_rate=0.02, seed=7)
    log(f"fixture ready ({time.time()-t0:.1f}s)")

    cfg = PlacerConfig(host_threads=2)
    t_c = time.time()
    placer = JaxPlacer(db, tree, config=cfg)
    log(f"placer init (incl. table/plane build): {time.time()-t_c:.1f}s")

    BATCH = 2000
    batch = reads[:BATCH]

    # warmup / compile
    t_w = time.time()
    placer.place(batch)
    log(f"warmup place: {time.time()-t_w:.1f}s")

    # --- stage timings (averaged over N reps) ---------------------------------
    N = 5
    seqs = [s for _, s in batch]

    t = time.time()
    for _ in range(N):
        tokens = placer._tokenize(seqs)
    t_tok = (time.time() - t) / N
    log(f"tokenize: {t_tok*1000:.1f} ms/batch "
        f"({tokens.exact_keys.size} exact, {tokens.amb_keys.size} amb keys)")

    R = len(seqs)
    wpr = int(np.bincount(tokens.exact_read, minlength=R).max())
    Wmax = max(32, -(-wpr // 32) * 32)
    log(f"R={R} wpr={wpr} Wmax={Wmax} B={placer.B} plane_w={placer._plane_w}")

    t = time.time()
    for _ in range(N):
        rows = placer._rows_matrix(tokens.exact_keys, tokens.exact_read, R, Wmax)
    t_rows = (time.time() - t) / N
    log(f"host rows matrix (searchsorted + fill): {t_rows*1000:.1f} ms/batch")

    # transfer: rows matrix to device
    t = time.time()
    for _ in range(N):
        d = jnp.asarray(rows)
        d.block_until_ready()
    t_xfer = (time.time() - t) / N
    log(f"input transfer ({rows.nbytes/1e6:.2f} MB): {t_xfer*1000:.1f} ms/batch")

    # device step alone (rows precomputed, inputs resident)
    from epik_tpu.engine.placer import _place_batch_dense_rows

    m_f32 = (np.full(R, 150 - placer.k + 1)).astype(np.float32)
    d_rows = jnp.asarray(rows)
    d_arows = jnp.asarray(np.full((R, 0), 0, np.int32)) if tokens.amb_keys.size == 0 else None
    d_m = jnp.asarray(m_f32)
    arows_mat = placer._rows_matrix(tokens.amb_keys, tokens.amb_read, R,
                                    8 if tokens.amb_keys.size else 0)
    d_arows = jnp.asarray(arows_mat)
    Amax = arows_mat.shape[1]

    def step():
        return _place_batch_dense_rows(
            placer._plane_s, d_rows, d_arows, d_m,
            R=R, B=placer.B, K=7, Wmax=Wmax, Amax=Amax, k=placer.k,
            log_eps=float(placer.log_eps), eps=float(placer.eps),
            interpret=placer._interpret,
        )

    out = step()
    out.block_until_ready()  # compile
    t = time.time()
    for _ in range(N):
        out = step()
        out.block_until_ready()
    t_dev = (time.time() - t) / N
    gb = R * Wmax * placer._plane_w * 4 / 1e9
    log(f"device step: {t_dev*1000:.1f} ms/batch "
        f"(~{gb:.2f} GB gather -> {gb/t_dev:.0f} GB/s effective)")

    # fetch
    t = time.time()
    for _ in range(N):
        host = np.asarray(out)
    t_fetch = (time.time() - t) / N
    log(f"result fetch ({host.nbytes/1e6:.2f} MB): {t_fetch*1000:.1f} ms/batch")

    # assemble
    from epik_tpu.engine.placer import unpack_outputs

    t = time.time()
    for _ in range(N):
        scores_k, idx_k, counts_k, wr_k, n_t, zs, _, _ = unpack_outputs(host, 7)
        m_signed = np.full(R, 150 - placer.k + 1, dtype=np.int64)
        coll = placer._assemble({}, list(range(R)), m_signed,
                                scores_k, idx_k, counts_k, wr_k, n_t, zs, 7)
    t_asm = (time.time() - t) / N
    log(f"assemble: {t_asm*1000:.1f} ms/batch")

    # end-to-end async pipelined
    t = time.time()
    NP = 4
    pend = None
    for i in range(NP):
        h = placer.place_async(batch)
        if pend is not None:
            placer.place_wait(pend)
        pend = h
    placer.place_wait(pend)
    t_e2e = (time.time() - t) / NP
    log(f"pipelined e2e: {t_e2e*1000:.1f} ms/batch -> {BATCH/t_e2e:.0f} reads/s")

    tot = t_tok + t_rows
    log(f"host total (tok+rows): {tot*1000:.1f} ms vs device {t_dev*1000:.1f} ms")


if __name__ == "__main__":
    main()

"""Attribute the production step's XLA compile time (the driver-bench warmup).

BENCH_r03.json recorded a 212 s cold-compile warmup before the first batch
(the reference starts placing instantly, epik/src/epik/main.cpp:332).  This
tool compiles each stage of the fused paired step separately -- tokenize,
row-gather loop, finish (correction+LWR+top-k), and the full program -- with
``.lower().compile()`` so compile time is measured without execution, against
a FRESH cache dir, to find where the minutes go.

Run: python -m epik_tpu.tools.profile_compile [--cache /tmp/fresh_cache]
"""

from __future__ import annotations

import argparse
import functools
import sys
import tempfile
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=None,
                    help="compile cache dir (default: fresh temp dir)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache = args.cache or tempfile.mkdtemp(prefix="epik_compile_prof_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"backend: {jax.default_backend()}  cache: {cache}")

    from ..core.tree import parse_newick
    from ..engine.placer import (
        JaxPlacer,
        _place_batch_dense_paired,
        dense_sums_shifted,
        device_tokenize_paired,
        finish_scores_shifted,
    )
    from ..io.build import reads_from_reference, reference_like_db

    t0 = time.time()
    db, ref = reference_like_db(
        num_leaves=652, kmer_size=10, ref_length=520_000,
        mean_posting_len=12.0, seed=652,
    )
    tree = parse_newick(db.tree())
    R = 8192
    reads = reads_from_reference(ref, R, length=150, mutation_rate=0.02, seed=7)
    seqs = [s for _, s in reads]
    p = JaxPlacer(db, tree)
    assert p._paired
    staged = p._stage_bytes(seqs)
    fn, arrays, _, _, _ = staged
    plane, direct, direct11, buf, arows = arrays
    N, B, k = db.num_kmers, p.B, p.k
    Lmax = 152
    log(f"fixture ready ({time.time()-t0:.0f}s)")

    def time_compile(name, f, *xs):
        t = time.time()
        lowered = jax.jit(f).lower(*xs)
        t_low = time.time() - t
        t = time.time()
        lowered.compile()
        t_comp = time.time() - t
        log(f"{name:40s} lower {t_low:6.1f}s  compile {t_comp:6.1f}s")

    tokp = functools.partial(device_tokenize_paired, k=k, Lmax=Lmax,
                             num_kmers=N)
    time_compile("tokenize paired", tokp, buf, direct, direct11)

    W = (Lmax - k + 1 + 1) // 2
    Wp = -(-W // 16) * 16
    rows = jnp.zeros((R, Wp), jnp.int32)
    gat = functools.partial(dense_sums_shifted, R=R, B=B, Wmax=Wp)
    time_compile("gather paired", gat, plane, rows)

    Sp = jnp.zeros((R, B), jnp.float32)
    m = jnp.zeros((R,), jnp.float32)
    fin = functools.partial(finish_scores_shifted, B=B, K=7, k=k,
                            log_eps=float(p.log_eps))
    time_compile("finish (corr+LWR+topk)", fin, Sp, m)

    @jax.jit
    def topk_only(x):
        return jax.lax.top_k(x, 7)

    time_compile("lax.top_k alone", lambda x: jax.lax.top_k(x, 7), Sp)

    full = functools.partial(
        _place_batch_dense_paired,
        R=R, B=B, K=7, Amax=0, k=k, Lmax=Lmax, num_kmers=N,
        log_eps=float(p.log_eps), eps=float(p.eps), interpret=False,
    )
    time_compile("FULL paired step (cold)", full, *arrays)
    # warm-cache re-load in a fresh jit wrapper: measures persistent-cache hit
    time_compile("FULL paired step (cache hit)", full, *arrays)


if __name__ == "__main__":
    main()

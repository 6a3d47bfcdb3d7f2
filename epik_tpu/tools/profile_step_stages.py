"""Device-resident stage timings for the production step (R=8192).

METHODOLOGY WARNING (round 4): the standalone sub-stage rows are polluted
by fetching each stage's materialized output over the ~40 MB/s tunnel
(and `block_until_ready` does not block under axon) -- only the FULL
fused-step row is a valid number.  The round-3 "fused-step ceiling"
derived from these rows understated the chip: the round-4 end-to-end
bench sustains 190k reads/s, above that "ceiling".  See docs/ROOFLINE.md
"round 4 measurement-methodology corrections" for the corrected method
(chained distinct dispatches + scalar-fetch sync).

Run: python -m epik_tpu.tools.profile_step_stages
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

    from ..core.tree import parse_newick
    from ..engine.placer import (
        JaxPlacer,
        dense_sums_shifted,
        device_tokenize_packed,
        device_tokenize_paired,
        finish_scores_shifted,
        pack_reads,
    )
    from ..io.build import reads_from_reference, reference_like_db

    log(f"backend: {jax.default_backend()}")
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
    fn, arrays, _, _, _ = p._stage_bytes(seqs)
    plane, direct, direct11, buf, arows = arrays
    N = db.num_kmers
    B, k = p.B, p.k
    Lmax = 152

    reps = 8

    def timeit(name, f, *args):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t = time.time()
        for _ in range(reps):
            out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t) / reps
        log(f"{name:34s} {dt*1000:7.1f} ms")
        return out, dt

    tok = jax.jit(functools.partial(device_tokenize_packed, k=k, Lmax=Lmax,
                                    num_kmers=N))
    tokp = jax.jit(functools.partial(device_tokenize_paired, k=k, Lmax=Lmax,
                                     num_kmers=N))
    (rows_full, _), _ = timeit("tokenize full", tok, buf, direct)
    (rows_pair, _), _ = timeit("tokenize paired", tokp, buf, direct, direct11)

    Wf = -(-rows_full.shape[1] // 16) * 16
    Wp = -(-rows_pair.shape[1] // 16) * 16
    rows_full = jnp.pad(rows_full, ((0, 0), (0, Wf - rows_full.shape[1])),
                        constant_values=N)
    rows_pair = jnp.pad(rows_pair, ((0, 0), (0, Wp - rows_pair.shape[1])),
                        constant_values=N)
    gat_f = jax.jit(functools.partial(dense_sums_shifted, R=R, B=B, Wmax=Wf))
    gat_p = jax.jit(functools.partial(dense_sums_shifted, R=R, B=B, Wmax=Wp))
    Sp, _ = timeit(f"gather full (W={Wf})", gat_f, plane, rows_full)
    _ = timeit(f"gather paired (W={Wp})", gat_p, plane, rows_pair)

    m = jnp.full((R,), 141.0, jnp.float32)
    fin = jax.jit(functools.partial(finish_scores_shifted, B=B, K=7, k=k,
                                    log_eps=float(p.log_eps)))
    timeit("finish (corr+LWR+topk)", fin, Sp, m)

    # finish with iterative-argmax top-k replacement candidate
    def topk_iter(corrected, K):
        scores, idxs = [], []
        x = corrected
        i32 = jnp.int32
        for _ in range(K):
            mx = jnp.max(x, axis=1)
            am = jnp.argmax(x, axis=1).astype(i32)
            scores.append(mx)
            idxs.append(am)
            x = x.at[jnp.arange(x.shape[0]), am].set(-jnp.inf)
        return jnp.stack(scores, 1), jnp.stack(idxs, 1)

    @jax.jit
    def fin_iter(Sp, m_f32):
        f32 = jnp.float32
        log_eps = f32(float(p.log_eps))
        touched = Sp > 0
        corrected = (Sp + m_f32[:, None] * log_eps) / f32(k)
        corrected = jnp.where(touched, corrected, f32(-jnp.inf))
        return topk_iter(corrected, 7)

    timeit("topk via 7x argmax (candidate)", fin_iter, Sp, m)

    @jax.jit
    def lax_topk_only(Sp):
        return jax.lax.top_k(Sp, 7)

    timeit("lax.top_k alone", lax_topk_only, Sp)

    timeit("FULL paired step", fn, *arrays)


if __name__ == "__main__":
    main()

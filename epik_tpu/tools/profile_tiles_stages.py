"""Stage timings for the big-tree posting-tile step (BASELINE.md config 4).

METHODOLOGY WARNING (round 4): the standalone per-stage numbers printed
here are dominated by fetching each stage's materialized output over the
~40 MB/s tunnel and are NOT a valid attribution -- only the FULL fused
step row is meaningful.  Use tools/profile_tiles_fused.py (fused variants
reducing to tiny outputs) and tools/bench_tile_kernels.py (chained
distinct dispatches + scalar-fetch sync) for real attribution; see
docs/ROOFLINE.md "round 4 measurement-methodology corrections".  Kept for
the full-step timing and as the record of the corrected mistake.

Run: python -m epik_tpu.tools.profile_tiles_stages [--leaves 10000] [--batch 4096]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=10000)
    ap.add_argument("--ref-len", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..core.tree import parse_newick
    from ..engine.placer import (
        JaxPlacer,
        device_tokenize_packed,
        finish_scores_shifted,
    )
    from ..io.build import reads_from_reference, reference_like_db
    from ..ops.pallas.accumulate import segment_accumulate_sums, trash_branch

    log(f"backend: {jax.default_backend()}")
    t0 = time.time()
    db, ref = reference_like_db(
        num_leaves=args.leaves, kmer_size=10, ref_length=args.ref_len,
        mean_posting_len=12.0, seed=10,
    )
    tree = parse_newick(db.tree())
    R = args.batch
    reads = reads_from_reference(ref, R, length=150, mutation_rate=0.02,
                                 seed=11)
    seqs = [s for _, s in reads]
    p = JaxPlacer(db, tree)
    assert p._tiles_mode, "expected posting-tile mode at this shape"
    staged = p._stage_bytes(seqs)
    fn, arrays, _, _, _ = staged
    tiles, direct, buf = arrays
    N, B, k = db.num_kmers, p.B, p.k
    PT = p._tile_pt
    Lmax = 152
    log(f"fixture ready ({time.time()-t0:.0f}s): {N} kmers, B={B}, PT={PT}, "
        f"tiles {tiles.nbytes/2**20:.0f} MiB")

    reps = 8

    def timeit(name, f, *xs):
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t = time.time()
        for _ in range(reps):
            out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t) / reps
        log(f"{name:36s} {dt*1000:8.1f} ms")
        return out, dt

    tok = jax.jit(functools.partial(device_tokenize_packed, k=k, Lmax=Lmax,
                                    num_kmers=N))
    (rows, lens), _ = timeit("tokenize", tok, buf, direct)
    W = rows.shape[1]

    @jax.jit
    def gather_only(tiles, rows):
        return tiles[rows]

    g, _ = timeit(f"tile row gather (W={W}, {2*PT*4}B/row)", gather_only,
                  tiles, rows)

    i32, f32 = jnp.int32, jnp.float32
    pp = W * PT
    ch = 512
    pp_pad = -(-pp // ch) * ch
    trash = trash_branch(B)

    @jax.jit
    def unpack_pad(g):
        gg = g.reshape(R, pp, 2)
        b = gg[..., 0].astype(i32)
        s = jax.lax.bitcast_convert_type(gg[..., 1], f32)
        b = jnp.pad(b, ((0, 0), (0, pp_pad - pp)), constant_values=trash)
        s = jnp.pad(s, ((0, 0), (0, pp_pad - pp)))
        return b, s

    (b_pad, s_pad), _ = timeit("unpack + pad", unpack_pad, g)

    acc = jax.jit(functools.partial(segment_accumulate_sums, num_branches=B,
                                    tr=8, ch=ch))
    Sp, _ = timeit(f"MXU accumulate (PP={pp_pad}, B={B})", acc, b_pad, s_pad)

    m = jnp.full((R,), 141.0, f32)
    fin = jax.jit(functools.partial(finish_scores_shifted, B=B, K=7, k=k,
                                    log_eps=float(p.log_eps)))
    timeit("finish (corr+LWR+topk)", fin, Sp, m)

    timeit("FULL tiles step", fn, *arrays)


if __name__ == "__main__":
    main()

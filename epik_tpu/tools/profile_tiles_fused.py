"""Fused-variant attribution for the big-tree tile step (round-4 ask #2).

The naive stage-by-stage timings in profile_tiles_stages.py are dominated
by fetching each stage's materialized output over the ~40 MB/s tunnel, so
this tool times FUSED programs that all reduce to tiny outputs:

  a. full step            tokenize + gather + MXU accumulate + finish
  b. no-accumulate        tokenize + gather + cheap reduce + finish
  c. kernel+finish only   device-resident g -> MXU accumulate -> finish
  d. kernel grid sweep    (tr, ch) variants of c

Run: python -m epik_tpu.tools.profile_tiles_fused [--leaves 10000]
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
        _pack_outputs_slim,
        device_tokenize_packed,
        finish_scores_shifted,
    )
    from ..io.build import reads_from_reference, reference_like_db
    from ..ops.pallas.accumulate import segment_accumulate_packed, trash_branch

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
    assert p._tiles_mode and p._tile_packed
    staged = p._stage_bytes(seqs)
    fn, arrays = staged[0], staged[1]
    tiles, direct, buf = arrays[:3]  # two-level may append tiles_ov
    N, B, k = db.num_kmers, p.B, p.k
    PT = p._tile_pt
    Lmax = 152
    W = Lmax - k + 1
    pp = W * PT
    log(f"fixture ready ({time.time()-t0:.0f}s): {N} kmers, B={B}, PT={PT}, "
        f"pp={pp}")

    reps = 8

    def timeit(name, f, *xs):
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t = time.time()
        for _ in range(reps):
            out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t) / reps
        log(f"{name:44s} {dt*1000:8.1f} ms")
        return out, dt

    _, dt_full = timeit("a. FULL packed tiles step", fn, *arrays)

    trash = trash_branch(B)
    log_eps = float(p.log_eps)
    scale = float(p._tile_scale)

    @jax.jit
    def no_acc(tiles, direct, buf):
        rows, lens = device_tokenize_packed(buf, direct, k=k, Lmax=Lmax,
                                            num_kmers=N)
        f32 = jnp.float32
        m_f32 = jnp.maximum(lens - (k - 1), 0).astype(f32)
        g = tiles[rows].reshape(R, pp)
        # cheap stand-in for the kernel: row sum broadcast over branches
        s = jnp.sum((g & 0xFFFF).astype(f32), axis=1)
        Sp = jnp.broadcast_to(s[:, None] / f32(scale), (R, B))
        outs = finish_scores_shifted(Sp, m_f32, B=B, K=7, k=k,
                                     log_eps=log_eps)
        return _pack_outputs_slim(outs)

    timeit("b. tokenize+gather+finish (no MXU kernel)", no_acc, tiles,
           direct, buf)

    ch0 = 512
    pp_pad = -(-pp // ch0) * ch0
    g_dev = jnp.zeros((R, pp_pad), jnp.int32) + jnp.int32(trash << 16)

    def kern_fin(tr, ch):
        ppp = -(-pp // ch) * ch

        @jax.jit
        def f(g):
            Sq = segment_accumulate_packed(g[:, :ppp], B, tr=tr, ch=ch)
            Sp = Sq / jnp.float32(scale)
            m = jnp.full((R,), float(W), jnp.float32)
            outs = finish_scores_shifted(Sp, m, B=B, K=7, k=k,
                                         log_eps=log_eps)
            return _pack_outputs_slim(outs)

        return f

    big = jnp.zeros((R, -(-pp // 2048) * 2048), jnp.int32) + jnp.int32(trash << 16)
    timeit("c. MXU kernel+finish (tr=8, ch=512)", kern_fin(8, 512), big)
    for tr, ch in [(16, 512), (32, 512), (8, 1024), (16, 1024), (32, 1024),
                   (8, 2048), (16, 2048)]:
        timeit(f"d. kernel+finish tr={tr} ch={ch}", kern_fin(tr, ch), big)

    @jax.jit
    def fin_only(Sp):
        m = jnp.full((R,), float(W), jnp.float32)
        outs = finish_scores_shifted(Sp, m, B=B, K=7, k=k, log_eps=log_eps)
        return _pack_outputs_slim(outs)

    Sp0 = jnp.zeros((R, B), jnp.float32)
    timeit("e. finish only (B=20k)", fin_only, Sp0)


if __name__ == "__main__":
    main()

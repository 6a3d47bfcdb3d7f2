"""Stage timings for the big-tree posting-tile step (BASELINE.md config 4).

Valid methodology (round-4 rework; see docs/ROOFLINE.md "measurement-
methodology corrections"): `block_until_ready` does not block under the
axon tunnel and per-stage output fetches ride a ~40 MB/s link, so each
stage is timed as a FUSED program reducing to a scalar, with N DISTINCT
inputs dispatched back-to-back and one tiny fetch as the barrier
(in-order device execution), subtracting the measured scalar-fetch RTT.

Stages: tokenize / +tile row gather / kernel-only (device-resident
input) / FULL fused step.  Deeper kernel-variant sweeps live in
tools/bench_tile_kernels.py.

Run: python -m epik_tpu.tools.profile_tiles_stages [--leaves 10000] [--batch 8192]
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
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, device_tokenize_packed
    from ..io.build import reads_from_reference, reference_like_db
    from ..ops.pallas.accumulate import segment_accumulate_packed_topk

    log(f"backend: {jax.default_backend()}")
    t0 = time.time()
    db, ref = reference_like_db(
        num_leaves=args.leaves, kmer_size=10, ref_length=args.ref_len,
        mean_posting_len=12.0, seed=10,
    )
    tree = parse_newick(db.tree())
    R = args.batch
    p = JaxPlacer(db, tree)
    assert p._tiles_mode and p._tile_packed
    bufs = []
    for s in range(11, 17):
        reads = reads_from_reference(ref, R, length=150, mutation_rate=0.02,
                                     seed=s)
        st = p._stage_bytes([q for _, q in reads])
        bufs.append(st[1])  # (tiles, direct, buf[, tiles_ov]) -- two-level
    tiles, direct, buf0 = bufs[0][:3]
    fn = bufs and p._stage_bytes(
        [q for _, q in reads_from_reference(ref, R, length=150,
                                            mutation_rate=0.02, seed=11)]
    )[0]
    N, B, k = db.num_kmers, p.B, p.k
    PT = p._tile_pt
    Lmax = 152
    W = Lmax - k + 1
    pp = W * PT
    log(f"fixture ready ({time.time()-t0:.0f}s): {N} kmers, B={B}, PT={PT}")

    np.asarray(jnp.sum(buf0[:1, :1]))
    t = time.time()
    for _ in range(5):
        np.asarray(jnp.sum(buf0[:1, :1]))
    RTT = (time.time() - t) / 5
    log(f"scalar-fetch RTT: {RTT*1000:.1f} ms")

    def timeit(name, f, args_list):
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(f(*args_list[0]))[0]))
        t = time.time()
        outs = [f(*a) for a in args_list]
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
        dt = (time.time() - t - RTT) / len(args_list)
        log(f"{name:42s} {dt*1000:8.1f} ms")
        return dt

    @jax.jit
    def tok_only(buf, direct):
        rows, lens = device_tokenize_packed(buf, direct, k=k, Lmax=Lmax,
                                            num_kmers=N)
        return rows.sum() + lens.sum()

    timeit("tokenize", tok_only, [(b[2], direct) for b in bufs])

    @jax.jit
    def tok_gather(buf, direct, tiles):
        rows, lens = device_tokenize_packed(buf, direct, k=k, Lmax=Lmax,
                                            num_kmers=N)
        g = tiles[rows]
        return g.sum() + lens.sum()

    timeit("tokenize + tile row gather", tok_gather,
           [(b[2], direct, tiles) for b in bufs])

    rng = np.random.default_rng(0)
    pp_pad = -(-pp // 512) * 512
    gs = [jnp.asarray((rng.integers(0, B, (R, pp_pad)).astype(np.int32) << 16)
                      | rng.integers(1, 64000, (R, pp_pad)).astype(np.int32))
          for _ in range(6)]
    m = jnp.full((R,), float(W), jnp.float32)
    kern = jax.jit(functools.partial(
        segment_accumulate_packed_topk, num_branches=B, K=7, k=k,
        log_eps=float(p.log_eps), scale=float(p._tile_scale)))
    timeit("fused accumulate+finish kernel (resident)", kern,
           [(g, m) for g in gs])

    timeit("FULL tiles step", fn, [tuple(b) for b in bufs])


if __name__ == "__main__":
    main()

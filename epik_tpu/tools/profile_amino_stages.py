"""Amino (config 2) fused-step attribution on the real chip.

Methodology note (round 4): `block_until_ready` does not actually block on
the axon tunnel and per-stage output fetches ride a ~40 MB/s link, so naive
stage timers are garbage.  This tool times fused programs that reduce to a
scalar, with N DISTINCT inputs dispatched back-to-back and ONE tiny fetch
(in-order device execution makes the last fetch a barrier), subtracting the
measured scalar-fetch round trip.

Stages: tokenize(codes limbs) / +radix lookup (n_probe passes) /
+row gather / full step.  Run:
    python -m epik_tpu.tools.profile_amino_stages
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
        PlacerConfig,
        _pack_outputs_slim,
        dense_sums_shifted,
        device_tokenize_codes,
        finish_scores_shifted,
    )
    from ..io.build import reads_from_reference, reference_like_db
    from ..ops.radix_lookup import radix_lookup_dispatch

    log(f"backend: {jax.default_backend()}")
    db, ref = reference_like_db(num_leaves=652, kmer_size=8,
                                ref_length=400_000, mean_posting_len=12.0,
                                sequence_type="amino", seed=20)
    tree = parse_newick(db.tree())
    R = 4096
    k, sigma = db.kmer_size, 20
    import os

    cfg = PlacerConfig(host_threads=max(2, os.cpu_count() or 2))
    p = JaxPlacer(db, tree, config=cfg)
    assert p._fast_codes
    # statics matching whatever representation device_arrays() returned
    # (round 5: the low-pair form for amino k=8; dispatch_args keeps this
    # tool in sync with the production lookup)
    shift, n_probe, off_bits = p._radix.dispatch_args()
    N = db.num_kmers
    log(f"radix: shift={shift} n_probe={n_probe} keys={N} B={p.B}")

    # 8 distinct staged batches
    seeds = range(30, 38)
    bufs = []
    for s in seeds:
        reads = reads_from_reference(ref, R, length=144, mutation_rate=0.02,
                                     sequence_type="amino", seed=s)
        st = p._stage_codes([q for _, q in reads])
        fn, arrays, _, _, _ = st
        bufs.append(arrays)
    plane, off, low, buf0, arows0 = bufs[0]
    Lmax = 144
    W = Lmax - k + 1
    Wp = -(-W // 16) * 16

    np.asarray(jnp.sum(buf0[:1, :1]))
    t = time.time()
    for _ in range(5):
        np.asarray(jnp.sum(buf0[:1, :1]))
    RTT = (time.time() - t) / 5
    log(f"scalar-fetch round trip: {RTT*1000:.1f} ms")

    def timeit(name, f, args_list):
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(f(*args_list[0]))[0]))
        t = time.time()
        outs = [f(*a) for a in args_list]
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
        dt = (time.time() - t - RTT) / len(args_list)
        log(f"{name:46s} {dt*1000:8.1f} ms")
        return dt

    @jax.jit
    def tok_only(buf):
        a, b, ok, lens = device_tokenize_codes(buf, k=k, sigma=sigma,
                                               Lmax=Lmax)
        return a.sum() + b.sum() + lens.sum()

    timeit("tokenize (limb keys)", tok_only, [(b[3],) for b in bufs])

    @jax.jit
    def tok_lookup(buf, off, low):
        a, b, ok, lens = device_tokenize_codes(buf, k=k, sigma=sigma,
                                               Lmax=Lmax)
        rows = radix_lookup_dispatch(off, low, a, b, shift=shift,
                                     n_probe=n_probe, off_bits=off_bits,
                                     n_keys=N)
        return rows.sum() + lens.sum()

    timeit(f"tokenize + radix lookup ({n_probe} probes)", tok_lookup,
           [(b[3], b[1], b[2]) for b in bufs])

    @jax.jit
    def tok_lookup_gather(buf, off, low, plane):
        a, b, ok, lens = device_tokenize_codes(buf, k=k, sigma=sigma,
                                               Lmax=Lmax)
        rows = radix_lookup_dispatch(off, low, a, b, shift=shift,
                                     n_probe=n_probe, off_bits=off_bits,
                                     n_keys=N)
        rows = jnp.where(ok, rows, jnp.int32(N))
        rows = jnp.pad(rows, ((0, 0), (0, Wp - W)), constant_values=N)
        Sp = dense_sums_shifted(plane, rows, R=R, B=p.B, Wmax=Wp)
        return Sp.sum()

    timeit("tokenize + lookup + row gather", tok_lookup_gather,
           [(b[3], b[1], b[2], b[0]) for b in bufs])

    st = p._stage_codes([q for _, q in reads_from_reference(
        ref, R, length=144, mutation_rate=0.02, sequence_type="amino",
        seed=30)])
    fn = st[0]
    timeit("FULL amino step", fn, [b for b in bufs])


if __name__ == "__main__":
    main()

"""Large-tree benchmark: the 10k-taxa metagenome shape (BASELINE.md config 4).

At 10k taxa (~20k branches) the dense planes stop fitting HBM budgets
(1M keys x 20k branches x 4B = 80 GB), so this exercises the CSR path:
cuckoo lookup -> padded posting tiles -> Pallas one-hot MXU accumulate.

Usage: python -m epik_tpu.tools.bench_bigtree [--reads 8000] [--leaves 10000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--leaves", type=int, default=10000)
    ap.add_argument("--ref-len", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=10)
    # 4096 measures ~25% faster than 8192 with the round-5 two-level
    # engine (101.3k vs ~80k; benchmarks/bench_bigtree_r05*.json)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--inflight", type=int, default=6)
    ap.add_argument("--loops", type=int, default=4,
                    help="repeats of the read set per timed pass")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, PlacerConfig
    from ..io.build import reads_from_reference, reference_like_db

    t0 = time.time()
    db, ref = reference_like_db(
        num_leaves=args.leaves, kmer_size=args.k, ref_length=args.ref_len,
        mean_posting_len=12.0, seed=10,
    )
    tree = parse_newick(db.tree())
    log(f"db: {db.num_kmers} k-mers, {db.num_entries} postings, "
        f"{tree.get_node_count()} branches ({time.time()-t0:.0f}s)")
    reads = reads_from_reference(ref, args.reads, length=150,
                                 mutation_rate=0.02, seed=11)

    import os
    from concurrent.futures import ThreadPoolExecutor

    from ..engine.placer import PlacerConfig

    cfg = PlacerConfig(host_threads=max(2, os.cpu_count() or 2))
    placer = JaxPlacer(db, tree, config=cfg)  # auto: planes exceed budget -> CSR
    mode = ("posting_tiles" if placer._tiles_mode
            else "dense" if placer._dense_db else "csr")
    log(f"mode: {mode} "
        f"(plane would be {(db.num_kmers + 1) * tree.get_node_count() * 4 / 2**30:.1f} GiB)")
    t_w = time.time()
    placer.place(reads[: args.batch])
    log(f"warmup {time.time()-t_w:.0f}s")

    pool = ThreadPoolExecutor(max_workers=args.inflight)
    batches = [reads[s : s + args.batch]
               for s in range(0, args.reads, args.batch)]

    # interleaved native C++ scalar baseline (-j 1), same noise regime as
    # the TPU passes -- a constant from another day mis-states the ratio
    # on this shared 2-core host (the d652 bench learned this in round 2)
    base_fn = None
    try:
        from ..native import NativeScalarPlacer

        nat = NativeScalarPlacer(db)
        base_seqs = [s for _, s in reads[:3000]]
        nat.place_scores(base_seqs[:100])

        def base_fn():
            t_b = time.time()
            nat.place_scores(base_seqs)
            return len(base_seqs) / (time.time() - t_b)
    except Exception as e:  # pragma: no cover
        log(f"native baseline unavailable ({e})")

    best, base_best = 0.0, 0.0
    for p in range(3):
        t_run = time.time()
        futs = [pool.submit(placer.place, b)
                for _ in range(args.loops) for b in batches]
        for f in futs:
            f.result()
        rps = args.loops * args.reads / (time.time() - t_run)
        best = max(best, rps)
        b_rps = base_fn() if base_fn else 0.0
        base_best = max(base_best, b_rps)
        log(f"pass {p + 1}: tpu {rps:.0f} reads/s | baseline {b_rps:.0f}")

    base = base_best if base_best else 19437.2  # r03 fallback constant
    print(json.dumps({
        "metric": "bigtree_reads_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "reads/s",
        "vs_baseline": round(best / base, 2),
        "baseline_native_scalar": round(base, 1),
        "mode": "posting_tiles" if placer._tiles_mode else (
            "dense" if placer._dense_db else "csr"),
        "branches": tree.get_node_count(),
        "kmers": db.num_kmers,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

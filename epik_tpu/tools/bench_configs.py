"""BASELINE.md config rows 2-4: amino perf, mu/max-ram load, big-tree baseline.

Measures, on the live backend (prints one JSON line per row to stdout):

* ``amino``    -- reads/s/chip for protein placement (BASELINE config 2).
  Amino has no device-tokenize path (sigma=20), so this exercises the dense
  host-lookup rows path; baseline = the native C++ scalar placer.
* ``load``     -- DB load wall time for full / --mu 0.5 / --max-ram-style
  max_entries loads (BASELINE config 3; reference: i2l::load partial
  loading, epik/src/epik/main.cpp:252-277).
* ``bigtree_base`` -- the native C++ scalar baseline on the 10k-taxa config
  (contextualizes tools/bench_bigtree.py's TPU number).

Usage: python -m epik_tpu.tools.bench_configs [--rows amino,load,bigtree_base]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _amino_row():
    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, PlacerConfig
    from ..io.build import reads_from_reference, reference_like_db

    # reference-derived keys + mutated substring reads: realistic ~85%
    # window hit rate for BOTH engines (concatenated-k-mer reads gave the
    # native baseline an artificially easy 12.5% hit rate)
    db, ref = reference_like_db(num_leaves=652, kmer_size=8,
                                ref_length=400_000, mean_posting_len=12.0,
                                sequence_type="amino", seed=20)
    tree = parse_newick(db.tree())
    n_reads = 20_000
    reads = reads_from_reference(ref, n_reads, length=144,
                                 mutation_rate=0.02, sequence_type="amino",
                                 seed=21)
    cfg = PlacerConfig(host_threads=max(2, os.cpu_count() or 2))
    placer = JaxPlacer(db, tree, config=cfg)
    log(f"amino placer: dense={placer._dense_db} fast_codes={placer._fast_codes} "
        f"probes={placer._radix.max_bucket if placer._radix else None}")
    BATCH = 4096
    LOOPS = 10  # repeats per timed pass: sub-second passes are noise-bound
    placer.place(reads[:BATCH])  # warmup compile

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=6)
    batches = [reads[s : s + BATCH] for s in range(0, n_reads, BATCH)]
    # one untimed steady-state pass: the first timed pass otherwise pays
    # XLA autotuning + first-touch HBM paging (observed as a consistently
    # ~5x-depressed pass 1; same rationale as bench.py)
    for f in [pool.submit(placer.place, b) for b in batches]:
        f.result()
    best = 0.0
    for p in range(3):
        t = time.time()
        futs = [pool.submit(placer.place, b)
                for _ in range(LOOPS) for b in batches]
        for f in futs:
            f.result()
        rps = LOOPS * n_reads / (time.time() - t)
        best = max(best, rps)
        log(f"amino pass {p + 1}: {rps:.0f} reads/s")

    base = None
    try:
        from ..native import NativeScalarPlacer

        nat = NativeScalarPlacer(db)
        seqs = [s for _, s in reads[:2000]]
        nat.place_scores(seqs[:100])
        t = time.time()
        nat.place_scores(seqs)
        base = len(seqs) / (time.time() - t)
        log(f"amino native baseline: {base:.0f} reads/s")
    except Exception as e:
        log(f"amino native baseline unavailable: {e}")

    return {
        "metric": "amino_reads_per_sec_per_chip", "value": round(best, 1),
        "unit": "reads/s",
        "vs_baseline": round(best / base, 2) if base else None,
    }


def _load_row():
    import tempfile

    from ..io.build import reference_like_db
    from ..io.db import load, save

    db, _ = reference_like_db(num_leaves=652, kmer_size=10,
                              ref_length=520_000, mean_posting_len=12.0, seed=652)
    path = os.path.join(tempfile.mkdtemp(), "bench.eptk")
    save(db, path)
    size_mb = os.path.getsize(path) / 2**20

    def t_load(**kw):
        t = time.time()
        d = load(path, **kw)
        return time.time() - t, d.num_entries_loaded

    t_load()  # warm page cache
    full_s, full_n = t_load()
    mu_s, mu_n = t_load(mu=0.5)
    cap = full_n // 4
    ram_s, ram_n = t_load(max_entries=cap)
    log(f"load: full {full_s:.2f}s/{full_n} | mu=0.5 {mu_s:.2f}s/{mu_n} | "
        f"max_entries={cap} {ram_s:.2f}s/{ram_n} | file {size_mb:.0f} MiB")
    return {
        "metric": "db_load_seconds", "unit": "s", "file_mib": round(size_mb, 1),
        "full": {"seconds": round(full_s, 2), "entries": full_n},
        "mu_0.5": {"seconds": round(mu_s, 2), "entries": mu_n},
        "max_entries_quarter": {"seconds": round(ram_s, 2), "entries": ram_n},
    }


def _bigtree_base_row():
    from ..io.build import reads_from_reference, reference_like_db
    from ..native import NativeScalarPlacer

    db, ref = reference_like_db(num_leaves=10_000, kmer_size=10,
                                ref_length=1_000_000, mean_posting_len=12.0, seed=10)
    reads = reads_from_reference(ref, 1000, length=150, mutation_rate=0.02, seed=11)
    nat = NativeScalarPlacer(db)
    seqs = [s for _, s in reads]
    nat.place_scores(seqs[:50])
    best = 0.0
    for p in range(3):
        t = time.time()
        nat.place_scores(seqs)
        best = max(best, len(seqs) / (time.time() - t))
    log(f"bigtree native baseline best: {best:.0f} reads/s")
    return {
        "metric": "bigtree_native_scalar_reads_per_sec", "value": round(best, 1),
        "unit": "reads/s",
    }


def _longread_row():
    """Nanopore-shaped long reads (2-10 kb) through the production D652
    engine (BASELINE.md config 6, round 5).

    The window-flattening design claims long reads parallelize for free
    (SURVEY.md section 5.7: a read is just more windows); this measures it.
    Reported both as reads/s and as kwindows/s -- the latter is the
    apples-to-apples number against config 1 (a 6 kb read carries ~42x the
    windows of a 150 bp read).  Exercises the Lmax <= 0xFFFF gate, the
    coarse long-read Lmax bucketing, and per-read length mixes within one
    batch.  Reference analog: the per-window loop place.cpp:294 (serial in
    the read length)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, PlacerConfig
    from ..io.build import reads_from_reference, reference_like_db

    db, ref = reference_like_db(num_leaves=652, kmer_size=10,
                                ref_length=520_000, mean_posting_len=12.0,
                                seed=652)
    tree = parse_newick(db.tree())
    n_reads = 2048
    reads = reads_from_reference(ref, n_reads, mutation_rate=0.02, seed=61,
                                 length_range=(2000, 10000))
    total_bases = sum(len(s) for _, s in reads)
    k = db.kmer_size
    total_windows = sum(len(s) - k + 1 for _, s in reads)
    cfg = PlacerConfig(host_threads=max(2, os.cpu_count() or 2))
    placer = JaxPlacer(db, tree, config=cfg)
    BATCH = 512  # ~3.1M windows/batch at mean 6 kb (config 1: 2.3M at 16k)
    batches = [reads[s : s + BATCH] for s in range(0, n_reads, BATCH)]
    placer.place(reads[:BATCH])  # warmup compile
    pool = ThreadPoolExecutor(max_workers=6)
    for f in [pool.submit(placer.place, b) for b in batches]:
        f.result()  # steady-state pass (autotune + HBM first touch)
    LOOPS = 3
    best = 0.0
    for p in range(3):
        t = time.time()
        futs = [pool.submit(placer.place, b)
                for _ in range(LOOPS) for b in batches]
        for f in futs:
            f.result()
        rps = LOOPS * n_reads / (time.time() - t)
        best = max(best, rps)
        log(f"longread pass {p + 1}: {rps:.0f} reads/s "
            f"({rps * total_windows / n_reads / 1e3:.0f} kwindows/s)")

    base = None
    try:
        from ..native import NativeScalarPlacer

        nat = NativeScalarPlacer(db)
        seqs = [s for _, s in reads[:256]]
        nat.place_scores(seqs[:16])
        t = time.time()
        nat.place_scores(seqs)
        base = len(seqs) / (time.time() - t)
        log(f"longread native baseline: {base:.1f} reads/s")
    except Exception as e:
        log(f"longread native baseline unavailable: {e}")

    return {
        "metric": "longread_reads_per_sec_per_chip", "value": round(best, 1),
        "unit": "reads/s",
        "vs_baseline": round(best / base, 2) if base else None,
        "kwindows_per_sec": round(best * total_windows / n_reads / 1e3, 1),
        "mean_read_len": round(total_bases / n_reads),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="amino,load,bigtree_base")
    args = ap.parse_args(argv)
    rows = {
        "amino": _amino_row,
        "load": _load_row,
        "bigtree_base": _bigtree_base_row,
        "longread": _longread_row,
    }
    for name in args.rows.split(","):
        print(json.dumps(rows[name]()), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

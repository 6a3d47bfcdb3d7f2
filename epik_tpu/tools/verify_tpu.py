"""One-shot on-chip parity verification (driver-reproducible).

Runs the built-in ppdiff differential cases (tools/ppdiff.py) plus a
300-read mixed-workload jplace_diff against the scalar oracle on the live
backend (the real TPU chip when attached, CPU otherwise) and prints exactly
ONE JSON line:

    {"verify": "tpu", "backend": ..., "cases_passed": N, "cases_total": N,
     "reads_matched": M, "reads_total": T, "ok": bool}

This makes the TPU parity claim reproducible by the driver: the MXU's f32
accumulation rounds differently from strict sequential addition, so this is
the regression gate for the documented near-tie divergence (docs/QUIRKS.md;
acceptance criterion = the reference's own semantic diff, ε=1e-4 in
probability space, reference: scripts/jplace_diff.py:21,222).

Usage: python -m epik_tpu.tools.verify_tpu [--workdir DIR]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys


def _mixed_case_reads(db, n=300):
    """Mixed workload: db-derived reads, mutations, ambiguity, quirk cases."""
    import numpy as np

    from ..core.alphabet import get_alphabet
    from ..io.build import random_reads

    alphabet = get_alphabet(db.sequence_type)
    rng = np.random.default_rng(99)
    reads = []
    for i in range(n - 20):
        parts = [
            alphabet.decode_key(int(db.keys[rng.integers(db.num_kmers)]), db.kmer_size)
            for _ in range(int(rng.integers(2, 16)))
        ]
        reads.append((f"q{i}", "".join(parts).encode()))
    reads += random_reads(10, length=80, seed=101, ambig_rate=0.1)
    # quirk cases: short reads (Q1), duplicates (Q8), no-hit (Q2/Q3)
    reads += [("short_a", b"AC"), ("short_b", b"A"),
              ("dup_1", b"ACGTACGTACGTACGT"), ("dup_2", b"ACGTACGTACGTACGT"),
              ("nohit", b"T" * 40)]
    return reads


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="on-chip parity verification")
    ap.add_argument("--workdir", default="/tmp/epik_tpu_verify")
    args = ap.parse_args(argv)

    import jax

    from ..core.tree import parse_newick, to_newick
    from ..engine.placer import JaxPlacer
    from ..engine.reference import ReferencePlacer
    from ..io.build import random_db
    from ..io.jplace import jplace_writer
    from .jplace_diff import jplace_diff
    from .ppdiff import DEFAULT_CONFIG, run_case

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    os.makedirs(args.workdir, exist_ok=True)

    # --- built-in ppdiff cases (mesh shrunk to the available devices) --------
    cases_passed = 0
    cases = copy.deepcopy(DEFAULT_CONFIG["cases"])
    for case in cases:
        mesh = case.get("mesh")
        if mesh and mesh.get("n_data", 1) * mesh.get("n_model", 1) > n_dev:
            case["mesh"] = {"n_data": 1, "n_model": 1}
        clean, msg = run_case(case, args.workdir)
        print(("PASS " if clean else "FAIL ") + msg, file=sys.stderr)
        cases_passed += int(clean)

    # --- 300-read mixed case vs the scalar oracle ----------------------------
    # every on-chip engine variant places the same mixed workload: the
    # single-chip placer in both plane modes, and ShardedJaxPlacer on a 1x1
    # mesh (its shard_map kernels on real hardware -- the only mesh shape
    # one physical chip can pin)
    from ..engine.placer import PlacerConfig
    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import ShardedJaxPlacer

    db = random_db(num_leaves=128, kmer_size=8, num_kmers=30000, seed=77)
    tree = parse_newick(db.tree())
    reads = _mixed_case_reads(db)
    nwk = to_newick(tree, jplace_edges=True)
    mesh11 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    engines = [
        ("oracle", ReferencePlacer(db, tree)),
        ("jax", JaxPlacer(db, tree)),
        ("jax_shifted", JaxPlacer(db, tree,
                                  config=PlacerConfig(plane_mode="shifted"))),
        ("jax_int16", JaxPlacer(db, tree,
                                config=PlacerConfig(precision="int16"))),
        ("jax_tiles", JaxPlacer(db, tree,
                                config=PlacerConfig(dense_db="off",
                                                    accumulate="matmul"))),
        ("sharded_1x1", ShardedJaxPlacer(db, tree, mesh11)),
        ("sharded_tiles_1x1", ShardedJaxPlacer(
            db, tree, mesh11,
            config=PlacerConfig(dense_db="off", accumulate="matmul"))),
    ]
    paths = {}
    for name, engine in engines:
        out = engine.place(reads)
        path = os.path.join(args.workdir, f"mixed_{name}.jplace")
        w = jplace_writer(path, f"verify_tpu mixed {name} ", nwk)
        w.start()
        w << out
        w.end()
        paths[name] = path
    mixed = {}
    total_matched = 0
    total_reads = 0
    all_clean = True
    for name in list(paths)[1:]:
        res = jplace_diff(paths["oracle"], paths[name])
        print(f"mixed {name}: {res.num_matches}/{res.num_seqs} match",
              file=sys.stderr)
        mixed[name] = {"matched": res.num_matches, "total": res.num_seqs}
        total_matched += res.num_matches
        total_reads += res.num_seqs
        all_clean &= res.clean

    # --- amino mixed case: device codes path (radix lookup) vs oracle --------
    amb_db = random_db(num_leaves=64, kmer_size=6, num_kmers=12000, seed=88,
                       sequence_type="amino")
    amb_tree = parse_newick(amb_db.tree())
    # >= 300 reads: match the nucl mixed slice's weight (round-5 verdict
    # ask #3 -- the amino slice was 95 reads vs 295 for nucl in r04)
    amb_reads = _mixed_case_reads(amb_db, n=300)
    amb_nwk = to_newick(amb_tree, jplace_edges=True)
    amb_engines = [
        ("oracle", ReferencePlacer(amb_db, amb_tree)),
        ("jax_amino", JaxPlacer(amb_db, amb_tree)),
        ("jax_amino_pair", JaxPlacer(amb_db, amb_tree,
                                     config=PlacerConfig(pair_plane="on"))),
    ]
    amb_paths = {}
    for name, engine in amb_engines:
        out = engine.place(amb_reads)
        path = os.path.join(args.workdir, f"amino_{name}.jplace")
        w = jplace_writer(path, f"verify_tpu amino {name} ", amb_nwk)
        w.start()
        w << out
        w.end()
        amb_paths[name] = path
    for name in list(amb_paths)[1:]:
        res = jplace_diff(amb_paths["oracle"], amb_paths[name])
        print(f"amino {name}: {res.num_matches}/{res.num_seqs} match",
              file=sys.stderr)
        mixed[name] = {"matched": res.num_matches, "total": res.num_seqs}
        total_matched += res.num_matches
        total_reads += res.num_seqs
        all_clean &= res.clean

    ok = cases_passed == len(cases) and all_clean
    print(json.dumps({
        "verify": "tpu",
        "backend": backend,
        "cases_passed": cases_passed,
        "cases_total": len(cases),
        "reads_matched": total_matched,
        "reads_total": total_reads,
        "mixed": mixed,
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Multi-host placement worker: one rank of a 2+-process CPU/TPU job.

Usage (one invocation per rank; also the multi-host usage example):

    python -m epik_tpu.tools.multihost_worker RANK NPROC PORT [dense|csr]

Each rank calls :func:`epik_tpu.parallel.mesh.init_distributed`, builds a
global ('data', 'model') mesh over every device of every process, places
one deterministic batch with :class:`ShardedJaxPlacer`, and checks oracle
parity (the data-axis shards are exchanged at fetch time with
``process_allgather``, so every rank sees and verifies the full batch --
sharding.py::ShardedJaxPlacer._fetch).  Prints ``PARITY OK <n>`` on
success.  The reference has no multi-process analog (single OpenMP
process, SURVEY.md section 5.8) -- this path is green-field.

On CPU the test harness (tests/test_multihost.py) spawns 2 ranks with 4
virtual devices each (XLA_FLAGS=--xla_force_host_platform_device_count=4);
on real multi-host TPU pods the same code runs with the pod's own
coordinator env and no flags.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dense"

    # must precede any jax device use; the env vars are set by the spawner
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from epik_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=rank)

    import numpy as np

    from epik_tpu.core.alphabet import DNA
    from epik_tpu.core.tree import parse_newick
    from epik_tpu.engine.placer import PlacerConfig
    from epik_tpu.engine.reference import ReferencePlacer
    from epik_tpu.io.build import random_db
    from epik_tpu.parallel.sharding import ShardedJaxPlacer

    n_dev = len(jax.devices())
    n_model = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)

    # deterministic fixture: every rank builds the identical DB and batch
    db = random_db(num_leaves=16, kmer_size=6, num_kmers=1024, seed=11)
    tree = parse_newick(db.tree())
    rng = np.random.default_rng(2)
    reads = []
    for i in range(24):
        parts = [
            DNA.decode_key(int(db.keys[rng.integers(db.num_kmers)]), 6)
            for _ in range(6)
        ]
        reads.append((f"q{i}", "".join(parts).encode()))

    cfg = PlacerConfig(dense_db="off") if mode == "csr" else PlacerConfig()
    placer = ShardedJaxPlacer(db, tree, mesh, config=cfg)
    out = placer.place(reads)

    oracle = ReferencePlacer(db, tree).place(reads)
    best = {
        p.sequence: p.placements[0].branch_id
        for p in oracle.placed_seqs
        if p.placements
    }
    n = 0
    for p in out.placed_seqs:
        if p.placements and p.sequence in best:
            assert p.placements[0].branch_id == best[p.sequence], (
                f"rank {rank}: multi-host {mode} diverges from oracle on "
                f"{p.sequence!r}"
            )
            n += 1
    assert n >= len(reads) - 1, f"rank {rank}: only {n} reads verified"
    print(f"PARITY OK {n}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

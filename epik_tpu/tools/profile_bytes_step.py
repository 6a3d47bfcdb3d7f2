"""Production-geometry device-step A/B: f32 vs int16 shifted plane.

Times the FULL fused bytes-path program (_place_batch_dense_bytes: on-device
tokenize -> direct-table lookup -> shifted row-gather sums -> correction/
LWR/top-k -> slim pack) at the bench geometry (R=8192, 150bp reads, D652
plane) by dispatching R reps back-to-back and syncing once -- the remote
tunnel's ~20 ms per-dispatch RPC amortizes away, so the slope is true
device time.  Variants are interleaved A/B/A/B so both sample the same
noise regime of the shared chip.

Run: python -m epik_tpu.tools.profile_bytes_step [--reps 6] [--rounds 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..core.tree import parse_newick
    from ..engine.placer import JaxPlacer, PlacerConfig
    from ..io.build import reads_from_reference, reference_like_db

    log(f"backend: {jax.default_backend()}")
    db, ref = reference_like_db(
        num_leaves=652, kmer_size=10, ref_length=520_000,
        mean_posting_len=12.0, seed=652,
    )
    tree = parse_newick(db.tree())
    reads = reads_from_reference(ref, args.batch, length=150,
                                 mutation_rate=0.02, seed=7)
    seqs = [s for _, s in reads]

    placers = {
        "paired": JaxPlacer(db, tree),
        "f32": JaxPlacer(db, tree, config=PlacerConfig(pair_plane="off")),
        "int16": JaxPlacer(db, tree, config=PlacerConfig(precision="int16")),
    }
    staged = {}
    for name, p in placers.items():
        assert p._fast_bytes and p._shifted
        fn, arrays, _, _, _ = p._stage_bytes(seqs)
        out = fn(*arrays)
        np.asarray(out)  # compile + settle
        staged[name] = (fn, arrays)
        log(f"{name}: staged (plane dtype {p._plane_s.dtype}, "
            f"rows {p._plane_s.shape[0]}, paired={p._paired})")

    gb = args.batch * 144 * placers["f32"]._plane_w * 4 / 1e9
    for r in range(args.rounds):
        for name, (fn, arrays) in staged.items():
            out = fn(*arrays)
            np.asarray(out)  # settle queue
            t = time.time()
            for _ in range(args.reps):
                out = fn(*arrays)
            np.asarray(out)
            dt = (time.time() - t) / args.reps
            scale = 1.0 if name == "f32" else 0.5
            log(f"round {r+1} {name:6s}: {dt*1000:7.1f} ms/batch "
                f"-> {args.batch/dt:7.0f} reads/s "
                f"({gb*scale/dt:5.0f} GB/s gather)")


if __name__ == "__main__":
    main()

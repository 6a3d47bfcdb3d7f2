"""Database construction helpers (tests, benchmarks, golden fixtures).

Database *construction* is out of scope for the reference tool -- EPIK
consumes databases built by the sibling tool IPK (reference: README.md:113).
These builders exist so the new framework is self-sufficient for testing and
benchmarking without a network-fetched IPK artifact (SURVEY.md section 4:
"golden: tiny hand-built DB (few k-mers, toy tree) with hand-computed
placements"; "seeded fake DB-shard fixtures").
"""

from __future__ import annotations

import numpy as np

from ..core.alphabet import get_alphabet
from ..core.scoring import log10_score_threshold
from .db import EARLIEST_INDEX, PhyloKmerDB

__all__ = ["build_db", "random_db", "random_reads", "random_tree_newick"]


def build_db(
    entries: dict[str | int, list[tuple[int, float]]],
    tree_newick: str,
    kmer_size: int,
    omega: float = 1.5,
    sequence_type: str = "nucl",
) -> PhyloKmerDB:
    """Build an in-memory DB from an explicit {kmer: [(branch, log10_score)]} map.

    ``kmer`` may be a string (encoded with the alphabet codec) or an integer
    key.  Posting-list order is preserved as given (it is the accumulation
    order of the scalar reference path, reference: place.cpp:358-367).
    """
    alphabet = get_alphabet(sequence_type)
    items: list[tuple[int, list[tuple[int, float]]]] = []
    for kmer, postings in entries.items():
        key = alphabet.kmer_key(kmer) if isinstance(kmer, str) else int(kmer)
        items.append((key, postings))
    items.sort(key=lambda kv: kv[0])
    keys = np.array([k for k, _ in items], dtype=np.uint64)
    if np.unique(keys).shape[0] != keys.shape[0]:
        raise ValueError("duplicate k-mer keys")
    lens = np.array([len(p) for _, p in items], dtype=np.int64)
    row_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    branches = np.array([b for _, p in items for b, _ in p], dtype=np.uint32)
    scores = np.array([s for _, p in items for _, s in p], dtype=np.float32)
    n_entries = int(branches.shape[0])
    db = PhyloKmerDB(
        sequence_type=sequence_type,
        kmer_size=kmer_size,
        omega=omega,
        tree_newick=tree_newick,
        keys=keys,
        row_off=row_off,
        branches=branches,
        scores=scores,
        version=EARLIEST_INDEX,
        num_entries_total=n_entries,
        num_entries_loaded=n_entries,
    )
    db.validate()
    return db


def random_tree_newick(num_leaves: int, rng: np.random.Generator) -> str:
    """A random binary tree with branch lengths, leaf names L0..L{n-1}."""
    # Build by repeatedly joining two subtrees.
    subtrees = [f"L{i}:{rng.uniform(0.01, 0.5):.6f}" for i in range(num_leaves)]
    while len(subtrees) > 1:
        i = int(rng.integers(len(subtrees)))
        a = subtrees.pop(i)
        j = int(rng.integers(len(subtrees)))
        b = subtrees.pop(j)
        bl = f":{rng.uniform(0.01, 0.5):.6f}" if len(subtrees) else ""
        subtrees.append(f"({a},{b}){bl}")
    return subtrees[0] + ";"


def random_db(
    num_leaves: int = 64,
    kmer_size: int = 8,
    num_kmers: int = 4096,
    mean_posting_len: float = 8.0,
    omega: float = 1.5,
    sequence_type: str = "nucl",
    seed: int = 0,
    unique_branches: bool = True,
) -> PhyloKmerDB:
    """A seeded synthetic database with realistic shape statistics.

    Scores are log10 probabilities uniform in [log10(eps), 0) -- every stored
    posting is above the omega threshold, as IPK guarantees.
    """
    from ..core.tree import parse_newick

    rng = np.random.default_rng(seed)
    newick = random_tree_newick(num_leaves, rng)
    tree = parse_newick(newick)
    num_branches = tree.get_node_count()
    alphabet = get_alphabet(sequence_type)
    keyspace = alphabet.sigma ** kmer_size
    num_kmers = min(num_kmers, keyspace)
    keys = rng.choice(keyspace, size=num_kmers, replace=False).astype(np.uint64)
    keys.sort()
    lens = 1 + rng.poisson(mean_posting_len - 1, size=num_kmers)
    lens = np.minimum(lens, num_branches).astype(np.int64)
    row_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(row_off[-1])
    if unique_branches:
        branches = np.empty(total, dtype=np.uint32)
        for i in range(num_kmers):
            lo, hi = row_off[i], row_off[i + 1]
            branches[lo:hi] = rng.choice(num_branches, size=hi - lo, replace=False)
    else:
        # fast path for large benchmark DBs; rows may repeat a branch, which
        # is fine for unambiguous reads (both engines accumulate identically)
        branches = rng.integers(0, num_branches, size=total).astype(np.uint32)
    log_eps = log10_score_threshold(omega, kmer_size, alphabet.sigma)
    scores = rng.uniform(log_eps, -0.05, size=total).astype(np.float32)
    db = PhyloKmerDB(
        sequence_type=sequence_type,
        kmer_size=kmer_size,
        omega=omega,
        tree_newick=newick,
        keys=keys,
        row_off=row_off,
        branches=branches,
        scores=scores,
        version=EARLIEST_INDEX,
        num_entries_total=total,
        num_entries_loaded=total,
    )
    db.validate()
    return db


def random_reads(
    num_reads: int,
    length: int = 150,
    sequence_type: str = "nucl",
    seed: int = 0,
    ambig_rate: float = 0.0,
    length_jitter: int = 0,
) -> list[tuple[str, bytes]]:
    """Seeded random reads as (header, sequence) pairs."""
    rng = np.random.default_rng(seed)
    alphabet = get_alphabet(sequence_type)
    letters = np.frombuffer(alphabet.letters.encode(), dtype=np.uint8)
    ambigs = b"N" if sequence_type == "nucl" else b"X"
    reads = []
    for i in range(num_reads):
        L = length + (int(rng.integers(-length_jitter, length_jitter + 1)) if length_jitter else 0)
        seq = letters[rng.integers(0, len(letters), size=L)].astype(np.uint8)
        if ambig_rate > 0:
            mask = rng.random(L) < ambig_rate
            seq[mask] = ambigs[0]
        reads.append((f"read_{i}", seq.tobytes()))
    return reads


def reference_like_db(
    num_leaves: int = 652,
    kmer_size: int = 10,
    ref_length: int = 600_000,
    mean_posting_len: float = 12.0,
    omega: float = 1.5,
    sequence_type: str = "nucl",
    seed: int = 0,
):
    """A synthetic database whose keys are the k-mers of a simulated
    reference sequence -- reads sampled from that sequence then hit most of
    their windows, like real placement workloads (a DB of uniformly random
    keys makes nearly every overlapping window miss, which understates the
    gather work).  Returns (db, ref_seq_bytes)."""
    from ..core.kmers import tokenize_read
    from ..core.tree import parse_newick

    alphabet = get_alphabet(sequence_type)
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(alphabet.letters.encode(), dtype=np.uint8)
    ref = letters[rng.integers(0, alphabet.sigma, ref_length)].tobytes()
    toks = tokenize_read(ref, kmer_size, alphabet)
    keys = np.unique(toks.exact_keys)

    newick = random_tree_newick(num_leaves, rng)
    num_branches = parse_newick(newick).get_node_count()
    n = keys.shape[0]
    lens = np.minimum(1 + rng.poisson(mean_posting_len - 1, size=n), num_branches)
    row_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(row_off[-1])
    branches = rng.integers(0, num_branches, size=total).astype(np.uint32)
    # real DBs hold ONE score per (kmer, branch); duplicate branches within a
    # posting list would make set-semantics engines (dense planes) diverge
    # from the accumulate-semantics oracle.  Vectorized per-row dedup: redraw
    # only the colliding entries until none remain.
    row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    for _ in range(200):
        order = np.lexsort((branches, row_id))
        dup = (np.diff(branches[order]) == 0) & (np.diff(row_id[order]) == 0)
        if not dup.any():
            break
        idx = order[1:][dup]
        branches[idx] = rng.integers(0, num_branches, idx.size)
    else:  # pragma: no cover
        raise RuntimeError("per-row branch dedup did not converge")
    log_eps = log10_score_threshold(omega, kmer_size, alphabet.sigma)
    scores = rng.uniform(log_eps, -0.05, size=total).astype(np.float32)
    db = PhyloKmerDB(
        sequence_type=sequence_type, kmer_size=kmer_size, omega=omega,
        tree_newick=newick, keys=keys.astype(np.uint64), row_off=row_off,
        branches=branches, scores=scores, version=EARLIEST_INDEX,
        num_entries_total=total, num_entries_loaded=total,
    )
    db.validate()
    return db, ref


def reads_from_reference(
    ref: bytes, num_reads: int, length: int = 150, mutation_rate: float = 0.02,
    sequence_type: str = "nucl",
    seed: int = 0,
    length_range: tuple[int, int] | None = None,
):
    """Reads sampled as substrings of the reference with point mutations.

    ``length_range=(lo, hi)``: per-read lengths drawn uniformly from
    [lo, hi] (nanopore-shaped long-read mixes) instead of the fixed
    ``length``."""
    alphabet = get_alphabet(sequence_type)
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(alphabet.letters.encode(), dtype=np.uint8)
    ref_arr = np.frombuffer(ref, dtype=np.uint8)
    out = []
    for i in range(num_reads):
        n = (int(rng.integers(length_range[0], length_range[1] + 1))
             if length_range else length)
        start = int(rng.integers(0, len(ref_arr) - n))
        seq = ref_arr[start : start + n].copy()
        mut = rng.random(n) < mutation_rate
        seq[mut] = letters[rng.integers(0, alphabet.sigma, int(mut.sum()))]
        out.append((f"read_{i}", seq.tobytes()))
    return out

"""Native library tests: C++ tokenizer/FASTA/scalar placer vs Python paths.

Three-way differential coverage: C++ tokenizer vs the vectorized numpy
tokenizer vs the per-read specification; C++ scalar placer scores vs the
Python oracle (the ppdiff pattern with a third implementation,
reference: scripts/ppdiff.py:235-255).
"""

import numpy as np
import pytest

from epik_tpu.core.alphabet import AMINO, DNA
from epik_tpu.core.kmers import tokenize_batch
from epik_tpu.core.tree import parse_newick
from epik_tpu.engine.reference import ReferencePlacer
from epik_tpu.io.build import random_db, random_reads
from epik_tpu.native import (
    NativeFastaReader,
    NativeScalarPlacer,
    load_native,
    native_tokenize_batch,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native library could not be built"
)


class TestNativeTokenizer:
    def _check(self, seqs, k, alphabet):
        fast = tokenize_batch(seqs, k, alphabet)
        nat = native_tokenize_batch(seqs, k, alphabet)
        np.testing.assert_array_equal(nat.num_windows, fast.num_windows)
        np.testing.assert_array_equal(nat.exact_keys, fast.exact_keys)
        np.testing.assert_array_equal(nat.exact_read, fast.exact_read)
        np.testing.assert_array_equal(nat.amb_keys, fast.amb_keys)
        np.testing.assert_array_equal(nat.amb_read, fast.amb_read)
        np.testing.assert_array_equal(nat.amb_order, fast.amb_order)

    def test_mixed(self):
        self._check(
            [b"ACGTACGT", b"AC", b"", b"ANGT", b"NNNN", b"ACG-TACG", b"acgt"],
            3, DNA,
        )

    def test_random(self):
        rng = np.random.default_rng(3)
        letters = np.frombuffer(b"ACGTNRYWSKM-U", dtype=np.uint8)
        for _ in range(8):
            k = int(rng.integers(2, 11))
            seqs = [
                letters[rng.integers(0, len(letters), rng.integers(0, 60))].tobytes()
                for _ in range(rng.integers(1, 40))
            ]
            self._check(seqs, k, DNA)

    def test_amino(self):
        self._check([b"ACDEFGHIKL", b"ABZJX", b"ACDEF"], 3, AMINO)


class TestNativeFasta:
    def test_matches_python_reader(self, tmp_path):
        from epik_tpu.io.fasta import batch_fasta

        path = tmp_path / "t.fasta"
        path.write_bytes(
            b">r1 desc\nACGT\nACGT\n\n>r2\r\nTTTT\r\n>r3\nA\n"
        )
        py = batch_fasta(str(path), 2)
        nat = NativeFastaReader(str(path), 2)
        while True:
            b1 = py.next_batch()
            b2 = nat.next_batch()
            assert b1 == b2
            if not b1:
                break
        assert py.bytes_read() == nat.bytes_read()

    def test_large_roundtrip(self, tmp_path):
        from epik_tpu.io.fasta import batch_fasta

        rng = np.random.default_rng(0)
        letters = np.frombuffer(b"ACGT", dtype=np.uint8)
        path = tmp_path / "big.fasta"
        with open(path, "w") as f:
            for i in range(500):
                s = letters[rng.integers(0, 4, 80)].tobytes().decode()
                f.write(f">read_{i} x={i}\n{s[:40]}\n{s[40:]}\n")
        py_all = []
        for b in batch_fasta(str(path), 64):
            py_all.extend(b)
        nat = NativeFastaReader(str(path), 64)
        nat_all = []
        while True:
            b = nat.next_batch()
            if not b:
                break
            nat_all.extend(b)
        assert py_all == nat_all


class TestNativeScalarPlacer:
    def test_scores_match_oracle(self):
        db = random_db(num_leaves=24, kmer_size=6, num_kmers=2048, seed=17)
        tree = parse_newick(db.tree())
        oracle = ReferencePlacer(db, tree)
        nat = NativeScalarPlacer(db, keep_at_most=7)

        rng = np.random.default_rng(18)
        seqs = []
        for _ in range(30):
            parts = [
                DNA.decode_key(int(db.keys[rng.integers(db.num_kmers)]), 6)
                for _ in range(rng.integers(1, 6))
            ]
            seqs.append("".join(parts).encode())
        seqs += [b"T" * 25, b"ANGTCA" * 3, b"AC"]
        seqs += [s for _, s in random_reads(10, length=30, seed=19, ambig_rate=0.1)]

        edges, scores, counts, n_touched, sum_placed = nat.place_scores(seqs)
        for i, seq in enumerate(seqs):
            ps = oracle.place_seq(seq)
            expect = sorted(ps.placements, key=lambda p: -p.score)[:7]
            assert n_touched[i] == len(ps.placements)
            got_edges = [e for e in edges[i] if e >= 0]
            assert len(got_edges) == len(expect)
            # compare score multisets (partial_sort tie order may differ)
            np.testing.assert_allclose(
                sorted(scores[i][: len(expect)]),
                sorted(np.float32(p.score) for p in expect),
                rtol=2e-6, atol=1e-7,
            )

    def test_multithreaded_matches_single(self):
        # eh_place_scalar_mt (the reference's -j/--threads loop,
        # place.cpp:218-229) must be bit-identical to the single-thread
        # placer: same chunk-local accumulation order per read.
        db = random_db(num_leaves=24, kmer_size=6, num_kmers=2048, seed=21)
        seqs = [s for _, s in random_reads(120, length=40, seed=22,
                                           ambig_rate=0.05)]
        seqs += [b"AC", b""]  # short-read edge cases at chunk boundaries
        ref = NativeScalarPlacer(db, keep_at_most=7, threads=1).place_scores(seqs)
        for threads in (2, 3, 8, 200):
            got = NativeScalarPlacer(db, keep_at_most=7,
                                     threads=threads).place_scores(seqs)
            for a, b in zip(ref, got):
                assert np.array_equal(a, b)


class TestNativePlacerEngine:
    """NativePlacer (round 5): the C++ placer as a full drop-in engine
    with the place(records) -> PlacedCollection surface, vs the oracle --
    incl. LWR, keep-factor filter, Q2 fallback, dedup."""

    @pytest.mark.parametrize("threads", [1, 2])
    def test_matches_oracle(self, threads):
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_jax_engine import assert_equivalent

        from epik_tpu.native import NativePlacer

        db = random_db(num_leaves=24, kmer_size=6, num_kmers=2048, seed=31)
        tree = parse_newick(db.tree())
        rng = np.random.default_rng(32)
        recs = []
        for i in range(30):
            parts = [
                DNA.decode_key(int(db.keys[rng.integers(db.num_kmers)]), 6)
                for _ in range(rng.integers(1, 6))
            ]
            recs.append((f"q{i}", "".join(parts).encode()))
        recs += [("nohit", b"T" * 25), ("amb", b"ANGTCA" * 3),
                 ("short", b"AC"), ("dup", recs[0][1])]
        recs += random_reads(10, length=30, seed=33, ambig_rate=0.1)
        oracle = ReferencePlacer(db, tree)
        native = NativePlacer(db, tree, threads=threads)
        assert_equivalent(oracle.place(recs), native.place(recs))

    def test_keep_factor_and_at_most(self):
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_jax_engine import assert_equivalent

        from epik_tpu.native import NativePlacer

        db = random_db(num_leaves=24, kmer_size=6, num_kmers=2048, seed=34)
        tree = parse_newick(db.tree())
        recs = random_reads(20, length=40, seed=35)
        oracle = ReferencePlacer(db, tree, keep_at_most=3, keep_factor=0.5)
        native = NativePlacer(db, tree, keep_at_most=3, keep_factor=0.5)
        assert_equivalent(oracle.place(recs), native.place(recs))


class TestNativePackReads:
    """native_pack_reads must byte-match the numpy pack_reads staging path
    (engine/placer.py::pack_reads + char_code gather + ambiguity scan)."""

    def _check(self, seqs, Lmax, R_pad):
        from epik_tpu.engine.placer import pack_reads
        from epik_tpu.native import native_pack_reads

        lens = np.array([len(s) for s in seqs], np.int64)
        buf, amb = native_pack_reads(seqs, lens, DNA, Lmax, R_pad)

        flat = np.frombuffer(b"".join(seqs), np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens)])
        mat = np.zeros((R_pad, Lmax), np.uint8)
        mat[np.repeat(np.arange(len(seqs)), lens),
            np.arange(flat.size) - np.repeat(starts[:-1], lens)] = flat
        codes = DNA.char_code[mat]
        want_amb = ((codes >= 0x80) & (codes != 0xFF)).any(axis=1)[: len(seqs)]
        lens_pad = np.zeros(R_pad, np.int64)
        lens_pad[: len(seqs)] = lens
        want_buf = pack_reads(codes, lens_pad)

        np.testing.assert_array_equal(buf, want_buf)
        np.testing.assert_array_equal(amb, want_amb)

    def test_mixed(self):
        self._check(
            [b"ACGTACGTACGTACGT", b"ACNGTT", b"acgtRYacg", b"A", b"ACG-TAC"],
            Lmax=16, R_pad=8,
        )

    def test_random(self):
        rng = np.random.default_rng(3)
        letters = np.frombuffer(b"ACGTN", np.uint8)
        seqs = [
            letters[rng.integers(0, 5, rng.integers(1, 60))].tobytes()
            for _ in range(37)
        ]
        self._check(seqs, Lmax=64, R_pad=64)

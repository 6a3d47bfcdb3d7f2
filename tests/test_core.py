"""Unit tests: k-mer codec, tokenizer, newick round-trip, scoring constants.

Mirrors the unit layer of the test pyramid in SURVEY.md section 4.
"""

import numpy as np
import pytest

from epik_tpu.core import (
    AMINO,
    DNA,
    get_alphabet,
    log10_score_threshold,
    parse_newick,
    score_threshold,
    to_newick,
    tokenize_batch,
    tokenize_read,
)


class TestAlphabet:
    def test_dna_codes(self):
        assert DNA.sigma == 4
        assert DNA.kmer_key("ACGT") == 0 * 64 + 1 * 16 + 2 * 4 + 3
        assert DNA.kmer_key("acgt") == DNA.kmer_key("ACGT")
        assert DNA.kmer_key("U") == DNA.kmer_key("T")

    def test_dna_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            k = int(rng.integers(1, 17))
            kmer = "".join(rng.choice(list("ACGT"), size=k))
            assert DNA.decode_key(DNA.kmer_key(kmer), k) == kmer

    def test_amino_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(50):
            k = int(rng.integers(1, 13))
            kmer = "".join(rng.choice(list(AMINO.letters), size=k))
            assert AMINO.decode_key(AMINO.kmer_key(kmer), k) == kmer

    def test_amino_k14_fits_u64(self):
        key = AMINO.kmer_key("Y" * 14)
        assert key == 20**14 - 1 and key < 2**64

    def test_get_alphabet_aliases(self):
        assert get_alphabet("nucl") is DNA
        assert get_alphabet("amino") is AMINO
        with pytest.raises(ValueError):
            get_alphabet("rna")


class TestTokenizer:
    def test_exact_windows(self):
        t = tokenize_read(b"ACGTAC", 4, DNA)
        assert t.num_windows == 3
        expect = [DNA.kmer_key(s) for s in ("ACGT", "CGTA", "GTAC")]
        assert t.exact_keys.tolist() == expect
        assert t.amb_keys.size == 0

    def test_short_read_q1(self):
        # len < k: zero windows (quirk Q1 handled downstream)
        t = tokenize_read(b"ACG", 4, DNA)
        assert t.num_windows == 0
        assert t.exact_keys.size == 0

    def test_one_ambiguity_expansion(self):
        # R = A|G at position 1 of the first window
        t = tokenize_read(b"ARCG", 3, DNA)
        assert t.num_windows == 2
        # windows: ARC (amb), RCG (amb)
        assert t.exact_keys.size == 0
        e1 = [DNA.kmer_key("AAC"), DNA.kmer_key("AGC")]
        e2 = [DNA.kmer_key("ACG"), DNA.kmer_key("GCG")]
        assert t.amb_keys.tolist() == e1 + e2
        assert t.amb_order.tolist() == [0, 1, 2, 3]

    def test_two_ambiguities_skipped(self):
        t = tokenize_read(b"NNAC", 3, DNA)
        # windows: NNA (2 amb -> skip), NAC (1 amb -> 4 keys)
        assert t.num_windows == 2
        assert t.exact_keys.size == 0
        assert t.amb_keys.shape[0] == 4
        expect = sorted(DNA.kmer_key(c + "AC") for c in "ACGT")
        assert sorted(t.amb_keys.tolist()) == expect

    def test_invalid_char_invalidates_window(self):
        t = tokenize_read(b"AC-GTA", 3, DNA)
        # windows AC-, C-G, -GT invalid; GTA exact
        assert t.num_windows == 4
        assert t.exact_keys.tolist() == [DNA.kmer_key("GTA")]
        assert t.amb_keys.size == 0

    def test_n_expands_to_four(self):
        t = tokenize_read(b"ANT", 3, DNA)
        assert t.amb_keys.shape[0] == 4
        assert sorted(t.amb_keys.tolist()) == sorted(DNA.kmer_key(f"A{c}T") for c in "ACGT")

    def test_batch_streams(self):
        b = tokenize_batch([b"ACGTA", b"AC", b"ANGT"], 3, DNA)
        assert b.num_reads == 3
        assert b.num_windows.tolist() == [3, 0, 2]
        assert b.seq_lengths.tolist() == [5, 2, 4]
        assert (b.exact_read == 0).sum() == 3
        assert (b.exact_read == 2).sum() == 0  # ANGT: both windows ambiguous
        assert (b.amb_read == 2).sum() == 8  # ANG -> 4 keys, NGT -> 4 keys

    def test_batch_streams_amb(self):
        b = tokenize_batch([b"ANGT"], 3, DNA)
        assert b.exact_keys.size == 0
        assert b.amb_keys.shape[0] == 8
        assert b.amb_order.tolist() == list(range(8))

    def test_amino_tokenize(self):
        t = tokenize_read(b"ACDEFG", 3, AMINO)
        assert t.num_windows == 4
        assert t.exact_keys.shape[0] == 4
        t2 = tokenize_read(b"ABD", 3, AMINO)  # B = D|N
        assert sorted(t2.amb_keys.tolist()) == sorted(
            [AMINO.kmer_key("ADD"), AMINO.kmer_key("AND")]
        )


class TestNewick:
    NWK = "((A:0.1,B:0.2)ab:0.3,(C:0.4,D:0.5):0.6)root;"

    def test_postorder_ids(self):
        tree = parse_newick(self.NWK)
        names = [n.name for n in tree.nodes]
        assert names == ["A", "B", "ab", "C", "D", "", "root"]
        assert tree.get_node_count() == 7
        assert tree.root == 6
        assert tree.nodes[2].children == [0, 1]
        assert tree.nodes[0].parent == 2

    def test_branch_lengths(self):
        tree = parse_newick(self.NWK)
        np.testing.assert_allclose(
            tree.branch_lengths, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.0]
        )

    def test_roundtrip(self):
        tree = parse_newick(self.NWK)
        out = to_newick(tree)
        tree2 = parse_newick(out)
        assert [n.name for n in tree2.nodes] == [n.name for n in tree.nodes]
        np.testing.assert_allclose(tree2.branch_lengths, tree.branch_lengths)

    def test_jplace_edges(self):
        tree = parse_newick("(A:0.1,B:0.2):0.5;")
        s = to_newick(tree, jplace_edges=True)
        assert s == "(A:0.1{0},B:0.2{1}):0.5{2};"
        # and {N} annotations parse back
        tree2 = parse_newick(s)
        assert tree2.get_node_count() == 3

    def test_quoted_labels(self):
        tree = parse_newick("('a b':1,'it''s':2)r;")
        assert tree.nodes[0].name == "a b"
        assert tree.nodes[1].name == "it's"

    def test_deep_tree_no_recursion(self):
        n = 30000
        nwk = "(" * n + "A:1" + ",B:1)" * n + ";"
        tree = parse_newick(nwk)
        assert tree.get_node_count() == 2 * n + 1
        out = to_newick(tree, jplace_edges=True)
        assert out.count("{") == 2 * n + 1

    def test_tree_index(self):
        tree = parse_newick(self.NWK)
        num, tot = tree.tree_index()
        # leaves: 1 node, 0 length
        assert num[0] == 1 and tot[0] == 0.0
        # node 'ab' (id 2): subtree {A,B,ab}; total excludes own branch
        assert num[2] == 3
        np.testing.assert_allclose(tot[2], 0.1 + 0.2)
        # root: all 7 nodes, sum of all branch lengths except root's own
        assert num[6] == 7
        np.testing.assert_allclose(tot[6], 0.1 + 0.2 + 0.3 + 0.4 + 0.5 + 0.6)


class TestScoring:
    def test_threshold_default(self):
        # omega=1.5, sigma=4, k=10 -> (0.375)^10
        eps = score_threshold(1.5, 10, 4)
        np.testing.assert_allclose(eps, 0.375**10)
        assert log10_score_threshold(1.5, 10, 4) == pytest.approx(10 * np.log10(0.375), rel=1e-6)

    def test_threshold_amino(self):
        eps = score_threshold(1.5, 8, 20)
        np.testing.assert_allclose(eps, (1.5 / 20) ** 8)


class TestBatchTokenizerDifferential:
    """Single-pass vectorized tokenizer vs the per-read specification."""

    def _check(self, seqs, k, alphabet):
        from epik_tpu.core.kmers import tokenize_batch, tokenize_batch_slow

        fast = tokenize_batch(seqs, k, alphabet)
        slow = tokenize_batch_slow(seqs, k, alphabet)
        np.testing.assert_array_equal(fast.num_windows, slow.num_windows)
        np.testing.assert_array_equal(fast.seq_lengths, slow.seq_lengths)
        np.testing.assert_array_equal(fast.exact_keys, slow.exact_keys)
        np.testing.assert_array_equal(fast.exact_read, slow.exact_read)
        np.testing.assert_array_equal(fast.amb_keys, slow.amb_keys)
        np.testing.assert_array_equal(fast.amb_read, slow.amb_read)
        np.testing.assert_array_equal(fast.amb_order, slow.amb_order)

    def test_mixed_batch(self):
        self._check(
            [b"ACGTACGT", b"AC", b"", b"ANGT", b"NNNN", b"ACG-TACG", b"TTTT"],
            3, DNA,
        )

    def test_random_batches(self):
        rng = np.random.default_rng(99)
        letters = np.frombuffer(b"ACGTNRYWSKM-XU", dtype=np.uint8)
        for trial in range(10):
            k = int(rng.integers(2, 9))
            seqs = []
            for _ in range(rng.integers(1, 30)):
                L = int(rng.integers(0, 40))
                seqs.append(letters[rng.integers(0, len(letters), L)].tobytes())
            self._check(seqs, k, DNA)

    def test_amino_batch(self):
        self._check([b"ACDEFGHIKL", b"ABZJX", b"XX", b"ACDEF"], 3, AMINO)

    def test_k1(self):
        self._check([b"ACGT", b"NN"], 1, DNA)

    def test_single_read(self):
        self._check([b"ACGTNACGT"], 4, DNA)

    def test_empty_reads_and_boundaries(self):
        self._check([b"", b"ACGT", b""], 3, DNA)
        self._check([b"", b"", b""], 3, DNA)
        self._check([b"ACGT", b""], 1, DNA)
        self._check([b"", b"A", b"", b"CG", b""], 1, DNA)

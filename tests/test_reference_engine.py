"""Golden tests for the scalar oracle: hand-computed placements.

SURVEY.md section 4 test pyramid, "golden" layer: tiny hand-built DB with
hand-computed expected scores, covering the exact path, the ambiguous path
(quirk Q6), the no-match fallback (Q2), LWR normalization over all branches
(Q4), dedup (Q8), and short reads (Q1).
"""

import math

import numpy as np
import pytest

from epik_tpu.core.tree import parse_newick
from epik_tpu.engine.reference import ReferencePlacer
from epik_tpu.io.build import build_db

TREE = "((A:0.1,B:0.2):0.3,C:0.4):0.0;"
# postorder ids: A=0, B=1, (A,B)=2, C=3, root=4
K = 3
EPS = 0.375**3  # omega=1.5, sigma=4
LOG_EPS = math.log10(EPS)  # ~ -1.277906


@pytest.fixture
def placer():
    db = build_db(
        {
            "ACG": [(0, -1.0), (2, -2.0)],
            "CGT": [(1, -0.5)],
        },
        TREE,
        kmer_size=K,
    )
    tree = parse_newick(TREE)
    return ReferencePlacer(db, tree, keep_at_most=7, keep_factor=0.01)


def by_branch(placements):
    return {p.branch_id: p for p in placements}


class TestExactPath:
    def test_scores(self, placer):
        ps = placer.place_seq(b"ACGT")  # windows ACG, CGT; m=2
        got = by_branch(ps.placements)
        assert set(got) == {0, 1, 2}
        # S[b] = (sum_scores + (m - C) * log_eps) / k
        assert got[0].score == pytest.approx((-1.0 + LOG_EPS) / 3, rel=1e-5)
        assert got[1].score == pytest.approx((-0.5 + LOG_EPS) / 3, rel=1e-5)
        assert got[2].score == pytest.approx((-2.0 + LOG_EPS) / 3, rel=1e-5)
        assert got[0].count == 1 and got[1].count == 1

    def test_distal_pendant(self, placer):
        ps = placer.place_seq(b"ACGT")
        got = by_branch(ps.placements)
        assert got[1].distal_length == pytest.approx(0.1)
        assert got[1].pendant_length == pytest.approx(0.1)  # leaf: mean 0
        assert got[2].distal_length == pytest.approx(0.15)
        # node 2 subtree: 3 nodes, total length 0.3 -> mean 0.1
        assert got[2].pendant_length == pytest.approx(0.1 + 0.15)

    def test_lwr_q4(self, placer):
        out = placer.place([("r1", b"ACGT")])
        got = by_branch(out.placed_seqs[0].placements)
        # normalization over ALL branches: 2 unplaced contribute eps^(2/3) each
        s0, s1, s2 = [(x + LOG_EPS) / 3 for x in (-1.0, -0.5, -2.0)]
        total = 2 * 0.375**2 + sum(10.0**s for s in (s0, s1, s2))
        assert got[1].weight_ratio == pytest.approx(10.0**s1 / total, rel=1e-4)
        assert got[0].weight_ratio == pytest.approx(10.0**s0 / total, rel=1e-4)
        # sorted descending by score
        assert [p.branch_id for p in out.placed_seqs[0].placements] == [1, 0, 2]


class TestAmbiguousPath:
    def test_q6_probability_average(self, placer):
        # ACRT: windows ACR -> {ACA miss, ACG hit}, CRT -> {CAT miss, CGT hit}
        ps = placer.place_seq(b"ACRT")
        got = by_branch(ps.placements)
        avg0 = (10.0**-1.0 + 2 * EPS) / 3
        avg2 = (10.0**-2.0 + 2 * EPS) / 3
        avg1 = (10.0**-0.5 + 2 * EPS) / 3
        assert got[0].score == pytest.approx((avg0 + LOG_EPS) / 3, rel=1e-5)
        assert got[1].score == pytest.approx((avg1 + LOG_EPS) / 3, rel=1e-5)
        assert got[2].score == pytest.approx((avg2 + LOG_EPS) / 3, rel=1e-5)

    def test_q7_first_hit_only(self, placer):
        # ACGT + ACRT concatenated pattern: craft read where the same branch is
        # hit by two expanded keys: CRT expands to CAT and CGT; add a second
        # window RGT expanding to AGT(miss) GGT(miss)... simpler: NCGT gives
        # windows NCG (expands ACG hit + CCG,GCG,TCG miss) and CGT exact hit.
        ps = placer.place_seq(b"NCGT")
        got = by_branch(ps.placements)
        # exact: CGT -> S[1] += -0.5, C[1] = 1
        # amb: ACG posting (0,-1),(2,-2) -> first-hit averages on 0 and 2
        avg0 = (10.0**-1.0 + 2 * EPS) / 3
        assert got[0].score == pytest.approx((avg0 + LOG_EPS) / 3, rel=1e-5)
        assert got[1].score == pytest.approx((-0.5 + LOG_EPS) / 3, rel=1e-5)
        assert got[1].count == 1


class TestFallbackAndEdgeCases:
    def test_q2_no_match_fallback(self, placer):
        out = placer.place([("r", b"TTTT")])  # m=2, no hits
        ps = out.placed_seqs[0].placements
        assert len(ps) == 7  # fabricated on branches 0..6 even though N=5
        assert [p.branch_id for p in ps] == list(range(7))
        expect = np.float32(np.float32(LOG_EPS) * np.float32(2.0) / np.float32(3.0))
        for p in ps:
            assert p.score == pytest.approx(float(expect), rel=1e-6)
            assert p.distal_length == 0.0 and p.pendant_length == 0.0
        # score_sum = 5 * 10^(2*log_eps/3) = 5 * 0.375^2
        wr = 0.375**2 / (5 * 0.375**2)
        for p in ps:
            assert p.weight_ratio == pytest.approx(wr, rel=1e-4)

    def test_q1_len_k_minus_1(self, placer):
        # len = k-1: m = 0, fallback score = 0, score_sum = N * 10^0 = 5
        out = placer.place([("r", b"AC")])
        ps = out.placed_seqs[0].placements
        assert len(ps) == 7
        assert all(p.score == 0.0 for p in ps)
        assert all(p.weight_ratio == pytest.approx(0.2) for p in ps)

    def test_q1_size_t_wrap(self, placer):
        # len = 1 < k-1: num_kmers wraps to 2^64-1; scores go hugely negative,
        # score_sum underflows to 0 -> quirk Q3: wr=0, nothing filtered
        out = placer.place([("r", b"A")])
        ps = out.placed_seqs[0].placements
        assert len(ps) == 7
        expect = float(
            np.float32(np.float32(LOG_EPS) * np.float32(float((1 << 64) - 1)) / np.float32(3.0))
        )
        for p in ps:
            assert p.score == pytest.approx(expect, rel=1e-6)
            assert p.weight_ratio == 0.0

    def test_q8_dedup(self, placer):
        out = placer.place([("r1", b"ACGT"), ("r2", b"ACGT"), ("r3", b"TTTT")])
        assert len(out.placed_seqs) == 2  # unique contents only
        assert out.sequence_map[b"ACGT"] == ["r1", "r2"]
        assert out.sequence_map[b"TTTT"] == ["r3"]

    def test_keep_factor_filter(self, placer):
        p = ReferencePlacer(placer.db, placer.tree, keep_at_most=7, keep_factor=0.5)
        out = p.place([("r", b"ACGT")])
        ps = out.placed_seqs[0].placements
        # ratios ~ [0.323, 0.220, 0.102]; threshold = 0.323*0.5 = 0.161
        assert [x.branch_id for x in ps] == [1, 0]

    def test_keep_at_most(self, placer):
        p = ReferencePlacer(placer.db, placer.tree, keep_at_most=2, keep_factor=0.01)
        out = p.place([("r", b"ACGT")])
        assert [x.branch_id for x in out.placed_seqs[0].placements] == [1, 0]

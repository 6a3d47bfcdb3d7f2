"""jplace writer formatting + jplace_diff oracle tests."""

import json

import pytest

from epik_tpu.core.tree import parse_newick, to_newick
from epik_tpu.engine.reference import ReferencePlacer
from epik_tpu.io.build import build_db
from epik_tpu.io.jplace import format_double, jplace_writer
from epik_tpu.tools.jplace_diff import jplace_diff, parse_jplace

TREE = "((A:0.1,B:0.2):0.3,C:0.4):0.0;"


class TestFormatDouble:
    """rapidjson Writer::Double compatibility (Grisu2 + Prettify cutover)."""

    @pytest.mark.parametrize(
        "x,expect",
        [
            (0.0, "0.0"),
            (-0.0, "-0.0"),
            (1.0, "1.0"),
            (-4.0, "-4.0"),
            (0.1, "0.1"),
            (-0.5926349, "-0.5926349"),
            (1234.5, "1234.5"),
            (1e-5, "0.00001"),
            (1e-6, "0.000001"),
            (1e-7, "1e-7"),
            (1.2345e-8, "1.2345e-8"),
            (1e20, "100000000000000000000.0"),
            (1e21, "1e21"),  # kk = 22 > 21 -> exponential (rapidjson Prettify)
            (1e22, "1e22"),
            (3.0427092021445348e-15, "3.0427092021445348e-15"),
            (0.20000000000000001, "0.2"),
            (5e-324, "5e-324"),
            (1.7976931348623157e308, "1.7976931348623157e308"),
        ],
    )
    def test_values(self, x, expect):
        assert format_double(x) == expect

    def test_roundtrip_random(self):
        import random

        random.seed(0)
        for _ in range(2000):
            x = random.uniform(-1, 0) * 10 ** random.randint(-20, 2)
            s = format_double(x)
            assert float(s) == x, (x, s)


def _place_and_write(tmp_path, records, **kw):
    db = build_db({"ACG": [(0, -1.0), (2, -2.0)], "CGT": [(1, -0.5)]}, TREE, kmer_size=3)
    tree = parse_newick(TREE)
    placer = ReferencePlacer(db, tree, **kw)
    out = placer.place(records)
    path = tmp_path / "out.jplace"
    w = jplace_writer(str(path), "epik-tpu place test ", to_newick(tree, jplace_edges=True))
    w.start()
    w << out
    w.end()
    return path


class TestWriter:
    def test_valid_json_and_schema(self, tmp_path):
        path = _place_and_write(tmp_path, [("r1", b"ACGT"), ("r2", b"ACGT")])
        content = json.loads(path.read_text())
        assert content["version"] == 3
        assert content["fields"] == [
            "edge_num",
            "likelihood",
            "like_weight_ratio",
            "distal_length",
            "pendant_length",
        ]
        assert content["metadata"]["invocation"].startswith("epik-tpu")
        assert "{0}" in content["tree"]
        assert len(content["placements"]) == 1  # dedup
        nm = content["placements"][0]["nm"]
        assert nm == [["r1", 1], ["r2", 1]]
        p = content["placements"][0]["p"]
        assert [row[0] for row in p] == [1, 0, 2]

    def test_formatting_matches_rapidjson_layout(self, tmp_path):
        path = _place_and_write(tmp_path, [("r1", b"ACGT")])
        text = path.read_text()
        # 4-space indent, single-line inner arrays, multi-line outer
        assert '\n    "tree": ' in text
        assert '"fields": ["edge_num", "likelihood", "like_weight_ratio", ' in text
        assert '\n                [1, ' in text
        assert text.endswith("\n    ]\n}")

    def test_multi_batch_append(self, tmp_path):
        db = build_db({"ACG": [(0, -1.0)]}, TREE, kmer_size=3)
        tree = parse_newick(TREE)
        placer = ReferencePlacer(db, tree)
        path = tmp_path / "out.jplace"
        w = jplace_writer(str(path), "inv ", to_newick(tree, jplace_edges=True))
        w.start()
        w << placer.place([("a", b"ACGT")])
        w << placer.place([("b", b"TACG")])
        w.end()
        content = json.loads(path.read_text())
        assert len(content["placements"]) == 2


class TestDiffOracle:
    def test_identical_files_match(self, tmp_path):
        p1 = _place_and_write(tmp_path, [("r1", b"ACGT"), ("r2", b"TTTT")])
        res = jplace_diff(str(p1), str(p1))
        assert res.clean and res.num_seqs == 2

    def test_parse_names(self, tmp_path):
        p1 = _place_and_write(tmp_path, [("r1", b"ACGT"), ("r2", b"ACGT")])
        parsed = parse_jplace(str(p1))
        assert set(parsed) == {"r1", "r2"}
        assert parsed["r1"] == parsed["r2"]

    def test_detects_mismatch(self, tmp_path):
        p1 = _place_and_write(tmp_path, [("r1", b"ACGT")])
        p2 = _place_and_write(tmp_path.joinpath("d2") or tmp_path, [("r1", b"ACGT")]) if False else None
        # craft a perturbed copy
        content = json.loads(p1.read_text())
        content["placements"][0]["p"][0][1] += 0.1  # shift likelihood
        p2 = tmp_path / "other.jplace"
        p2.write_text(json.dumps(content))
        res = jplace_diff(str(p1), str(p2))
        assert not res.clean
        assert any("!=" in m for m in res.mismatches)

    def test_score_set_equality_ignores_edges(self, tmp_path):
        p1 = _place_and_write(tmp_path, [("r1", b"ACGT")])
        content = json.loads(p1.read_text())
        # permute edge numbers but keep scores: still a match
        for row in content["placements"][0]["p"]:
            row[0] += 100
        p2 = tmp_path / "other.jplace"
        p2.write_text(json.dumps(content))
        assert jplace_diff(str(p1), str(p2)).clean

    def test_only_best(self, tmp_path):
        p1 = _place_and_write(tmp_path, [("r1", b"ACGT")])
        content = json.loads(p1.read_text())
        content["placements"][0]["p"][0][1] -= 5.0  # change best score only
        p2 = tmp_path / "other.jplace"
        p2.write_text(json.dumps(content))
        assert jplace_diff(str(p1), str(p2), only_best=True).clean
        assert not jplace_diff(str(p1), str(p2)).clean


class TestNativeFastPath:
    """Byte-parity of the C++ batch formatter (native/epik_host.cpp::
    eh_format_jplace) against the Python writer loop."""

    @staticmethod
    def _write_both(tmp_path, coll, tree_str):
        import copy

        from epik_tpu.engine.types import PlacedCollection

        paths = []
        for tag in ("fast", "slow"):
            c = coll
            if tag == "slow":
                # strip the array backing: force the Python loop on the
                # materialized objects
                c = PlacedCollection(
                    sequence_map=coll.sequence_map,
                    placed_seqs=copy.deepcopy(coll.placed_seqs),
                )
            p = tmp_path / f"{tag}.jplace"
            w = jplace_writer(str(p), "inv ", tree_str)
            w.start()
            w << c
            w.end()
            paths.append(p)
        return paths[0].read_bytes(), paths[1].read_bytes()

    def _random_collection(self, seed, R=40, K=7):
        import numpy as np

        from epik_tpu.engine.types import ArrayPlacedCollection

        rng = np.random.default_rng(seed)
        seqs = [f"s{i}".encode() for i in range(R)]
        # headers exercise escaping: quotes, backslashes, unicode, controls
        smap = {}
        for i, s in enumerate(seqs):
            hs = [f"read_{i}"]
            if i % 7 == 0:
                hs.append('we "ird\\hdr\tx')
            if i % 11 == 0:
                hs.append("ünïcode·ヘッダ")
            smap[s] = hs
        scores = (rng.standard_normal((R, K)) * 10.0 ** rng.integers(
            -3, 4, (R, K))).astype(np.float32)
        wr = np.abs(rng.standard_normal((R, K))) * 10.0 ** rng.integers(
            -300, 3, (R, K))
        wr[0, 0] = 0.0
        dist = np.abs(rng.standard_normal((R, K)))
        pend = np.abs(rng.standard_normal((R, K))) * 1e21  # exponential fmt
        keep = rng.random((R, K)) < 0.8
        keep[:, 0] = True
        keep[1] = False  # an empty "p" array
        ids = rng.integers(0, 2000, (R, K)).astype(np.int32)
        counts = rng.integers(0, 9, (R, K)).astype(np.int32)
        return ArrayPlacedCollection(smap, seqs, ids, scores, wr,
                                     counts.astype(np.int32), dist, pend, keep)

    def test_byte_parity_random(self, tmp_path):
        from epik_tpu.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        for seed in range(5):
            coll = self._random_collection(seed)
            fast, slow = self._write_both(tmp_path, coll, TREE)
            assert fast == slow

    def test_byte_parity_engine_output(self, tmp_path):
        """End-to-end: JaxPlacer array batch vs its materialized objects."""
        from epik_tpu.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        import numpy as np

        from epik_tpu.core.tree import parse_newick
        from epik_tpu.engine.placer import JaxPlacer
        from epik_tpu.io.build import random_db, random_reads

        db = random_db(num_leaves=24, kmer_size=6, num_kmers=2000,
                       mean_posting_len=5.0, seed=9)
        tree = parse_newick(db.tree())
        reads = random_reads(60, length=40, seed=4, ambig_rate=0.05)
        reads += [("tiny", b"AC"), ("dupA", b"ACGTAC"), ("dupB", b"ACGTAC")]
        coll = JaxPlacer(db, tree).place(reads)
        assert getattr(coll, "keep", None) is not None
        fast, slow = self._write_both(
            tmp_path, coll, to_newick(tree, jplace_edges=True))
        assert fast == slow
        json.loads(fast)  # well-formed

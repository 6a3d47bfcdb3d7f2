"""Database container + serialization + load-time filtering tests.

Covers the reconstructed i2l::load contract (SURVEY.md section 2.9):
mu / max-ram prefix filtering, omega re-thresholding (quirk Q10), stats.
"""

import numpy as np
import pytest

from epik_tpu.core.scoring import log10_score_threshold
from epik_tpu.io.build import build_db, random_db
from epik_tpu.io.db import PKDB_VALUE_SIZE, load, save

TREE = "((A:0.1,B:0.2):0.3,C:0.4):0.0;"


def toy_db(omega=1.5):
    return build_db(
        {
            "ACG": [(0, -1.0), (2, -2.0)],
            "CGT": [(1, -0.5)],
            "GTA": [(0, -3.0), (1, -3.5), (3, -1.5)],
        },
        TREE,
        kmer_size=3,
        omega=omega,
    )


class TestContainer:
    def test_search_hit(self):
        db = toy_db()
        b, s = db.search(db_key("ACG"))
        assert b.tolist() == [0, 2]
        np.testing.assert_allclose(s, [-1.0, -2.0])

    def test_search_miss(self):
        db = toy_db()
        assert db.search(db_key("TTT")) is None

    def test_stats(self):
        db = toy_db()
        assert db.num_kmers == 3
        assert db.num_entries == 6
        assert db.max_posting_len() == 3


def db_key(kmer):
    from epik_tpu.core.alphabet import DNA

    return DNA.kmer_key(kmer)


class TestSerialization:
    def test_roundtrip(self, tmp_path):
        db = toy_db()
        path = tmp_path / "toy.eptk"
        save(db, path)
        db2 = load(path)
        assert db2.sequence_type == db.sequence_type
        assert db2.kmer_size == db.kmer_size
        assert db2.omega == db.omega
        assert db2.tree() == TREE
        np.testing.assert_array_equal(db2.keys, db.keys)
        np.testing.assert_array_equal(db2.row_off, db.row_off)
        np.testing.assert_array_equal(db2.branches, db.branches)
        np.testing.assert_array_equal(db2.scores, db.scores)
        assert db2.get_num_entries_total() == 6
        assert db2.get_num_entries_loaded() == 6

    def test_roundtrip_random(self, tmp_path):
        db = random_db(num_leaves=16, kmer_size=6, num_kmers=300, seed=7)
        path = tmp_path / "rand.eptk"
        save(db, path)
        db2 = load(path)
        np.testing.assert_array_equal(db2.keys, db.keys)
        for key in db.keys[:20]:
            b1, s1 = db.search(int(key))
            b2, s2 = db2.search(int(key))
            np.testing.assert_array_equal(b1, b2)
            np.testing.assert_array_equal(s1, s2)

    def test_mu_prefix(self, tmp_path):
        db = toy_db()
        path = tmp_path / "toy.eptk"
        # explicit filter order: GTA (3 entries), ACG (2), CGT (1)
        order = [np.where(db.keys == db_key(k))[0][0] for k in ("GTA", "ACG", "CGT")]
        save(db, path, filter_order=np.array(order))
        # mu=0.9 -> budget floor(ceil(0.9*6))=6 -> wait ceil(5.4)=6 -> all
        assert load(path, mu=0.9).num_entries == 6
        # mu=0.5 -> budget 3 -> only GTA fits
        db2 = load(path, mu=0.5)
        assert db2.num_entries == 3
        assert db2.search(db_key("GTA")) is not None
        assert db2.search(db_key("ACG")) is None
        assert db2.get_num_entries_total() == 6
        assert db2.get_num_entries_loaded() == 3

    def test_max_entries(self, tmp_path):
        db = toy_db()
        path = tmp_path / "toy.eptk"
        order = [np.where(db.keys == db_key(k))[0][0] for k in ("GTA", "ACG", "CGT")]
        save(db, path, filter_order=np.array(order))
        # 5 entries of budget: GTA(3) + ACG(2) fit, CGT would exceed? 3+2+1=6>5
        db2 = load(path, max_entries=5)
        assert db2.num_entries == 5
        assert db2.search(db_key("CGT")) is None
        # --max-ram conversion is bytes // PKDB_VALUE_SIZE (main.cpp:257)
        assert PKDB_VALUE_SIZE == 8

    def test_omega_rethreshold(self, tmp_path):
        db = toy_db(omega=1.5)
        path = tmp_path / "toy.eptk"
        save(db, path)
        # omega=3.0, sigma=4, k=3 -> log10 eps = 3*log10(0.75) ~ -0.3748
        db2 = load(path, user_omega=3.0)
        log_eps = log10_score_threshold(3.0, 3, 4)
        assert db2.omega == 3.0
        assert np.all(db2.scores >= np.float32(log_eps))
        # all toy scores are below -0.375 except... all <= -0.5 -> everything dropped
        assert db2.num_entries == 0

    def test_omega_loosen_is_noop(self, tmp_path):
        db = toy_db(omega=1.5)
        path = tmp_path / "toy.eptk"
        save(db, path)
        db2 = load(path, user_omega=1.0)  # looser than stored: quirk Q10
        assert db2.omega == 1.5
        assert db2.num_entries == 6

    def test_mu_validation(self, tmp_path):
        db = toy_db()
        path = tmp_path / "toy.eptk"
        save(db, path)
        with pytest.raises(ValueError):
            load(path, mu=1.5)

    def test_bad_magic(self, tmp_path):
        path = tmp_path / "bad.eptk"
        path.write_bytes(b"NOTADB00" + b"\0" * 64)
        with pytest.raises(ValueError, match="magic"):
            load(path)

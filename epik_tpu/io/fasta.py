"""Batched FASTA reader.

Re-provides ``i2l::io::batch_fasta(path, batch_size)`` with ``next_batch()``
and ``bytes_read()`` (reference: epik/src/epik/main.cpp:332-358; the progress
bar is keyed to bytes of FASTA consumed, main.cpp:319,358).  Queries must be
uncompressed FASTA (reference: README.md:113).

A C++ fast path (native/epik_host.cpp) is used when the native library is
built; this pure-Python implementation is the always-available fallback and
the behavioral specification.
"""

from __future__ import annotations

import os

__all__ = ["batch_fasta", "read_fasta"]


class batch_fasta:
    """Iterator over batches of ``(header, sequence_bytes)`` records."""

    def __init__(self, path: str | os.PathLike, batch_size: int = 2000):
        self._path = os.fspath(path)
        self._batch_size = batch_size
        raw = open(self._path, "rb")
        magic = raw.read(2)
        raw.seek(0)
        if magic == b"\x1f\x8b":
            # improvement over the reference, which requires uncompressed
            # FASTA (reference: README.md:113)
            import gzip

            self._file = gzip.open(raw, "rb")
        else:
            self._file = raw
        self._bytes_read = 0
        self._pending_header: bytes | None = None
        self._eof = False

    def bytes_read(self) -> int:
        return self._bytes_read

    def next_batch(self) -> list[tuple[str, bytes]]:
        """Next ``batch_size`` records; empty list at EOF
        (reference: main.cpp:336-340 breaks the loop on an empty batch)."""
        batch: list[tuple[str, bytes]] = []
        if self._eof:
            return batch
        header = self._pending_header
        seq_parts: list[bytes] = []

        def emit() -> None:
            if header is not None:
                batch.append((header.decode("utf-8", "replace"), b"".join(seq_parts)))

        for line in self._file:
            self._bytes_read += len(line)
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if header is not None:
                    emit()
                    if len(batch) >= self._batch_size:
                        self._pending_header = line[1:]
                        return batch
                header = line[1:]
                seq_parts = []
            else:
                seq_parts.append(line)
        emit()
        self._eof = True
        self._file.close()
        return batch

    def __iter__(self):
        while True:
            b = self.next_batch()
            if not b:
                return
            yield b


def read_fasta(path: str | os.PathLike) -> list[tuple[str, bytes]]:
    """Read an entire FASTA file (convenience for tests/tools)."""
    out: list[tuple[str, bytes]] = []
    for batch in batch_fasta(path, batch_size=1 << 30):
        out.extend(batch)
    return out

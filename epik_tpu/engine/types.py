"""Shared result types for the placement engines.

Mirrors the reference's ``epik::impl::placement`` / ``placed_sequence`` /
``placed_collection`` (reference: epik/include/epik/place.h:45-75), with the
sequence->headers dedup map of quirk Q8 (place.cpp:73-81).
"""

from __future__ import annotations

import dataclasses

__all__ = [
    "Placement",
    "PlacedSequence",
    "PlacedCollection",
    "ArrayPlacedCollection",
]


@dataclasses.dataclass
class Placement:
    branch_id: int  # post-order node id == jplace edge_num
    score: float  # float32 semantics, log10 likelihood
    weight_ratio: float  # double semantics (place.h:48)
    count: int  # matched k-mers (not serialized; jplace.cpp:136 ignores it)
    distal_length: float
    pendant_length: float


@dataclasses.dataclass
class PlacedSequence:
    sequence: bytes
    placements: list[Placement]


@dataclasses.dataclass
class PlacedCollection:
    #: sequence content -> list of headers (insertion order; the reference's
    #: unordered_map order is nondeterministic, which jplace parity tolerates
    #: because records are keyed by name, scripts/jplace_diff.py:129-133)
    sequence_map: dict[bytes, list[str]]
    placed_seqs: list[PlacedSequence]


class ArrayPlacedCollection:
    """Array-backed placement batch; ``placed_seqs`` materializes lazily.

    The device step returns one packed array per batch; building ~14k
    ``Placement`` objects from it cost ~37 ms of the ~110 ms batch loop
    (ARCHITECTURE.md performance model).  Holding the numpy arrays instead
    lets the jplace writer serialize rows directly (native fast path) and
    keeps object construction off the critical path entirely -- consumers
    that do want objects (tests, differential harnesses) get the identical
    list via the lazy property.

    All arrays are (R, K); ``keep`` is the final per-row decision with the
    keep-factor filter (quirk Q3) and no-match fallback rows (quirk Q2)
    already applied.
    """

    def __init__(self, sequence_map, seqs, ids, scores, wr, counts, dist,
                 pend, keep):
        self.sequence_map = sequence_map
        self.seqs = seqs  # unique sequences, row order of the arrays
        self.ids = ids  # int32: jplace edge_num
        self.scores = scores  # float32: log10 likelihood
        self.wr = wr  # float64: like_weight_ratio
        self.counts = counts  # int32: matched k-mers (not serialized)
        self.dist = dist  # float64: distal_length
        self.pend = pend  # float64: pendant_length
        self.keep = keep  # bool
        self._placed = None

    @property
    def placed_seqs(self) -> list[PlacedSequence]:
        if self._placed is None:
            # batch tolist conversion: per-element float()/int() calls on
            # numpy scalars dominate otherwise
            ids = self.ids.tolist()
            sc = self.scores.tolist()
            wr = self.wr.tolist()
            cnt = self.counts.tolist()
            dist = self.dist.tolist()
            pend = self.pend.tolist()
            keep = self.keep.tolist()
            K = self.ids.shape[1]
            self._placed = [
                PlacedSequence(
                    sequence=seq,
                    placements=[
                        Placement(ids[i][j], sc[i][j], wr[i][j], cnt[i][j],
                                  dist[i][j], pend[i][j])
                        for j in range(K)
                        if keep[i][j]
                    ],
                )
                for i, seq in enumerate(self.seqs)
            ]
        return self._placed

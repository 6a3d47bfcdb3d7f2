"""Shared result types for the placement engines.

Mirrors the reference's ``epik::impl::placement`` / ``placed_sequence`` /
``placed_collection`` (reference: epik/include/epik/place.h:45-75), with the
sequence->headers dedup map of quirk Q8 (place.cpp:73-81).
"""

from __future__ import annotations

import dataclasses

__all__ = ["Placement", "PlacedSequence", "PlacedCollection"]


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

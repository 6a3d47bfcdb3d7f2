"""Vectorized k-mer window tokenizer with the one-ambiguity policy.

Replaces the reference's per-read, per-window serial iterator
``i2l::to_kmers<i2l::one_ambiguity_policy>(seq, k)``
(reference: epik/src/epik/place.cpp:294-314).  The reference walks windows one
at a time inside each OpenMP worker; here a whole read (and, one level up, a
whole batch) is tokenized in flat numpy ops so the result can be shipped to
the TPU as dense key streams (SURVEY.md section 5.7: flatten all windows of a
batch; the accumulate becomes a segment reduction independent of read length).

Semantics reproduced exactly (see SURVEY.md quirk ledger):

* A window with zero ambiguous characters yields exactly one key
  (reference: place.cpp:297-305 handles ``keys.size() == 1``).
* A window with exactly one ambiguous IUPAC character yields one key per
  compatible state (reference: place.cpp:306-313 iterates expanded keys; the
  policy name ``one_ambiguity_policy`` -- windows with more than one ambiguous
  position yield no keys).
* Characters outside alphabet+IUPAC invalidate the window. [inference: i2l
  source unavailable; an unrecognized character cannot be encoded, so its
  windows cannot produce keys]
* ``num_windows`` counts ALL length-k windows (len-k+1) regardless of how many
  produced keys -- the score correction divides by it
  (reference: place.cpp:322,418-422).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .alphabet import _AMBIG_BASE, _INVALID, Alphabet

__all__ = ["ReadKmers", "tokenize_read", "tokenize_batch", "BatchTokens"]


@dataclasses.dataclass
class ReadKmers:
    """Key streams for a single read."""

    num_windows: int  # len - k + 1 (0 when len < k; see quirk Q1)
    exact_keys: np.ndarray  # uint64[n_exact], in window order
    amb_keys: np.ndarray  # uint64[n_amb], window order then expansion order
    amb_order: np.ndarray  # int32[n_amb], 0..n_amb-1 (processing order,
    # drives the first-hit-per-branch semantics of quirk Q6/Q7)


def _window_sums(flags: np.ndarray, k: int) -> np.ndarray:
    """Sum of a 0/1 per-char flag over each length-k window (length L-k+1)."""
    c = np.concatenate([[0], np.cumsum(flags, dtype=np.int32)])
    return c[k:] - c[:-k]


def tokenize_read(seq: bytes | str | np.ndarray, k: int, alphabet: Alphabet) -> ReadKmers:
    """Tokenize one read into exact / ambiguous key streams."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    codes = alphabet.encode_codes(seq)
    L = codes.shape[0]
    empty64 = np.empty(0, dtype=np.uint64)
    empty32 = np.empty(0, dtype=np.int32)
    if L < k:
        return ReadKmers(0, empty64, empty64, empty32)
    m = L - k + 1

    is_inv = codes == _INVALID
    is_amb = (codes >= _AMBIG_BASE) & ~is_inv
    inv_per_win = _window_sums(is_inv, k)
    amb_per_win = _window_sums(is_amb, k)

    exact_win = (inv_per_win == 0) & (amb_per_win == 0)
    one_amb_win = (inv_per_win == 0) & (amb_per_win == 1)

    sigma = np.uint64(alphabet.sigma)
    mult = sigma ** np.arange(k - 1, -1, -1, dtype=np.uint64)  # first char most significant

    # Partial keys treating ambiguous codes as 0 (their digit is patched below).
    digits = np.where(codes < sigma, codes, 0).astype(np.uint64)
    # windowed dot product digits[i:i+k] . mult via cumsum of digit*mult shifted:
    # key(w) = sum_j digits[w+j] * sigma^(k-1-j). Use a strided view for clarity;
    # reads are short (hundreds of chars) so this is cheap and cache-friendly.
    win = np.lib.stride_tricks.sliding_window_view(digits, k)
    base_keys = (win * mult).sum(axis=1, dtype=np.uint64)

    exact_keys = base_keys[exact_win]

    amb_keys_list: list[np.ndarray] = []
    amb_counts: list[int] = []
    if one_amb_win.any():
        amb_pos_per_char = np.flatnonzero(is_amb)
        # For each one-amb window find the (single) ambiguous position inside it.
        wins = np.flatnonzero(one_amb_win)
        # For each window start w, the ambiguous char index p satisfies w <= p < w+k.
        p = amb_pos_per_char[np.searchsorted(amb_pos_per_char, wins)]
        amb_sym = codes[p] - _AMBIG_BASE
        for w, pos, sym in zip(wins, p, amb_sym):
            exp = alphabet.ambig_expansions[int(sym)]
            keys = base_keys[w] + np.asarray(exp, dtype=np.uint64) * mult[pos - w]
            amb_keys_list.append(keys)
            amb_counts.append(len(keys))
    if amb_keys_list:
        amb_keys = np.concatenate(amb_keys_list)
        amb_order = np.arange(amb_keys.shape[0], dtype=np.int32)
    else:
        amb_keys, amb_order = empty64, empty32
    return ReadKmers(int(m), exact_keys, amb_keys, amb_order)


@dataclasses.dataclass
class BatchTokens:
    """Flat key streams for a batch of (unique) reads.

    The device pipeline consumes these as padded dense arrays; `read_id`
    vectors are the segment ids of SURVEY.md section 5.7.
    """

    num_reads: int
    num_windows: np.ndarray  # int64[num_reads]  (m per read; 0 when len < k)
    seq_lengths: np.ndarray  # int64[num_reads]  (raw lengths, for quirk Q1)
    exact_keys: np.ndarray  # uint64[E]
    exact_read: np.ndarray  # int32[E]
    amb_keys: np.ndarray  # uint64[A]
    amb_read: np.ndarray  # int32[A]
    amb_order: np.ndarray  # int32[A] per-read processing order


def tokenize_batch(seqs: list[bytes], k: int, alphabet: Alphabet) -> BatchTokens:
    """Tokenize a batch of unique read contents into flat streams."""
    n = len(seqs)
    num_windows = np.zeros(n, dtype=np.int64)
    seq_lengths = np.zeros(n, dtype=np.int64)
    e_keys, e_read = [], []
    a_keys, a_read, a_order = [], [], []
    for i, s in enumerate(seqs):
        t = tokenize_read(s, k, alphabet)
        num_windows[i] = t.num_windows
        seq_lengths[i] = len(s)
        if t.exact_keys.size:
            e_keys.append(t.exact_keys)
            e_read.append(np.full(t.exact_keys.shape[0], i, dtype=np.int32))
        if t.amb_keys.size:
            a_keys.append(t.amb_keys)
            a_read.append(np.full(t.amb_keys.shape[0], i, dtype=np.int32))
            a_order.append(t.amb_order)
    cat64 = lambda xs: np.concatenate(xs) if xs else np.empty(0, dtype=np.uint64)
    cat32 = lambda xs: np.concatenate(xs) if xs else np.empty(0, dtype=np.int32)
    return BatchTokens(
        num_reads=n,
        num_windows=num_windows,
        seq_lengths=seq_lengths,
        exact_keys=cat64(e_keys),
        exact_read=cat32(e_read),
        amb_keys=cat64(a_keys),
        amb_read=cat32(a_read),
        amb_order=cat32(a_order),
    )

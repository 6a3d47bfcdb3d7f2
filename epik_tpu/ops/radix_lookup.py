"""Top-bits radix index: exact key->row lookup via element gathers.

The amino alphabet (sigma=20) has no direct-address table (20**k blows
HBM), and per-key bucket ROW gathers from a cuckoo table are DMA-issue
bound (~66 ns each).  ELEMENT gathers from small int32 tables, however,
run at vector speed on TPU (the nucl fast path's 4**k direct table costs
~1 ms per million lookups).  This index keeps every device access an
element gather:

* keys are stored sorted (the DB contract, io/db.py), so the row index IS
  the position in the sorted array;
* the top ``key_bits - shift`` bits form an exact radix bucket: ``off``
  (one int32 per bucket + 1) delimits each bucket's slice of the sorted
  key array;
* within a bucket all keys share their top bits, so a single int32
  compare of the low ``shift`` bits identifies the key -- no hashing, no
  fingerprint collisions, exact by construction.

Lookup cost: 2 + max_bucket element-gather passes (off[b], off[b+1], and
one low-bits compare per probe).  ``max_bucket`` is data-dependent
(uniformly-coded DBs: ~6-8 at load 0.5); callers gate on it and fall back
to the host path when a skewed key distribution makes it large.

Reference analog: i2l's phylo_kmer_db hash map queried per key
(epik/src/epik/place.cpp:301,311); this is its TPU-native, batch-oriented
replacement for alphabets without a direct table.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["RadixIndex", "build_radix", "radix_lookup"]


@dataclasses.dataclass
class RadixIndex:
    off: np.ndarray  # int32 (2**table_bits + 1,) bucket offsets into keys
    low: np.ndarray  # int32 (n,) low `shift` bits of each sorted key
    shift: int  # low-bits width (<= 31)
    max_bucket: int  # probe count the device loop must unroll
    #: PACKED lookup tables (round 4; present when the packable gate holds:
    #: shift <= 15, max_bucket <= 3, n fits the offset field).  offc[b] =
    #: start | (count << off_bits) -- ONE gather replaces the off[b]/off[b+1]
    #: pair; low2[w] = low[2w] | (low[2w+1] << shift) -- any <= 3 consecutive
    #: probe positions live in 2 words.  Lookup passes: 5 -> 3 (measured
    #: 19.8 -> ~12 ms per 4096x137-window amino batch).
    offc: np.ndarray | None = None
    low2: np.ndarray | None = None
    off_bits: int = 0

    @property
    def packed(self) -> bool:
        return self.offc is not None

    def device_arrays(self):
        if self.packed:
            return jnp.asarray(self.offc), jnp.asarray(self.low2)
        return jnp.asarray(self.off), jnp.asarray(self.low)


def build_radix(keys: np.ndarray, key_bits: int, max_table_bits: int = 24) -> RadixIndex:
    """Build the index from SORTED unique uint64 keys (< 2**key_bits).

    ``table_bits`` targets ~32 buckets per key (load 1/32) capped at
    ``max_table_bits`` (64 MB of offsets): every probe is a full
    element-gather pass over all window keys (~7 ns/element on a v5e, the
    dominant amino stage at 7 probes -- measured round 4,
    tools/profile_amino_stages.py), so a sparser table buying max_bucket
    3-4 instead of 7 is worth 64 MB of HBM.  ``shift`` = key_bits -
    table_bits must stay <= 31 so the low bits fit an int32 compare.
    """
    n = int(keys.shape[0])
    table_bits = min(max_table_bits, max(1, (32 * max(n, 1) - 1).bit_length()))
    shift = max(0, key_bits - table_bits)
    if shift > 31:
        raise ValueError(f"key_bits={key_bits} too wide: low bits {shift} > 31")
    table_bits = key_bits - shift
    buckets = (keys >> np.uint64(shift)).astype(np.int64)
    counts = np.bincount(buckets, minlength=(1 << table_bits))
    off = np.zeros((1 << table_bits) + 1, np.int32)
    np.cumsum(counts, out=off[1:])
    low = (keys & np.uint64((1 << shift) - 1)).astype(np.int32)
    max_bucket = int(counts.max()) if n else 0
    idx = RadixIndex(off=off, low=low, shift=shift, max_bucket=max_bucket)
    # packed variant (see RadixIndex.offc): 3 gather passes instead of 5
    cb = max(max_bucket, 1).bit_length()
    off_bits = 31 - cb
    if n and max_bucket <= 3 and 0 < shift <= 15 and n < (1 << off_bits):
        idx.off_bits = off_bits
        idx.offc = (off[:-1] | (counts.astype(np.int64) << off_bits)).astype(
            np.int32
        )
        nw = (n + 2) // 2  # +1 pad word so w0+1 is always in bounds
        lp = np.zeros(2 * nw, np.int64)
        lp[:n] = low
        idx.low2 = (lp[0::2] | (lp[1::2] << shift)).astype(np.int32)
    return idx


def _split_bucket_lo(a, b, shift: int):
    i32 = jnp.int32
    u32 = jnp.uint32
    a = a.astype(u32)
    b = b.astype(u32)
    if shift >= 16:
        s16 = shift - 16
        bucket = (a >> u32(s16)).astype(i32)
        lo = (((a & u32((1 << s16) - 1)) << u32(16)) | b).astype(i32)
    else:
        bucket = ((a << u32(16 - shift)) | (b >> u32(shift))).astype(i32)
        lo = (b & u32((1 << shift) - 1)).astype(i32)
    return bucket, lo


def radix_lookup_packed(offc, low2, a, b, *, shift: int, off_bits: int,
                        n_keys: int):
    """Packed device lookup: THREE element-gather passes total.

    ``offc[bucket]`` yields start+count in one gather; two ``low2`` words
    cover every candidate position (max_bucket <= 3, the build gate).
    Misses return ``n_keys``.  All int32 (no x64)."""
    i32 = jnp.int32
    bucket, lo = _split_bucket_lo(a, b, shift)
    oc = jnp.take(offc, bucket, axis=0)
    st = oc & i32((1 << off_bits) - 1)
    cnt = oc >> i32(off_bits)  # oc is non-negative (off_bits <= 29)
    en = st + cnt
    w0 = st >> 1
    nw = low2.shape[0]
    l01 = jnp.take(low2, w0, axis=0)
    l23 = jnp.take(low2, jnp.minimum(w0 + 1, nw - 1), axis=0)
    mask = i32((1 << shift) - 1)
    row = jnp.full(a.shape, n_keys, i32)
    base = w0 * 2
    for j, cand in enumerate((l01 & mask, l01 >> shift,
                              l23 & mask, l23 >> shift)):
        pos = base + j
        hit = (pos >= st) & (pos < en) & (cand == lo)
        row = jnp.where(hit, pos, row)
    return row


def radix_lookup(off, low, a, b, *, shift: int, n_probe: int, n_keys: int):
    """Device lookup: key row indices for keys given as uint32 halves
    ``key = a * 2**16 + b``.  Misses return ``n_keys`` (the all-zero plane
    row).  All arithmetic is uint32/int32 (no x64)."""
    i32 = jnp.int32
    bucket, lo = _split_bucket_lo(a, b, shift)
    st = jnp.take(off, bucket, axis=0)
    en = jnp.take(off, bucket + 1, axis=0)
    row = jnp.full(a.shape, n_keys, i32)
    found = jnp.zeros(a.shape, bool)
    nmax = max(low.shape[0] - 1, 0)
    for p in range(n_probe):
        j = st + p
        jc = jnp.minimum(j, nmax)
        m = (j < en) & (jnp.take(low, jc, axis=0) == lo) & ~found
        row = jnp.where(m, jc, row)
        found = found | m
    return row

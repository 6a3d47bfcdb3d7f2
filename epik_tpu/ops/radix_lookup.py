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

__all__ = ["RadixIndex", "SPLIT", "build_radix", "radix_lookup",
           "radix_lookup_packed", "radix_lookup_split",
           "radix_lookup_dispatch"]


#: ``off_bits`` sentinel selecting :func:`radix_lookup_split` in the shared
#: dispatch (the two device arrays are then v1/v2, not offc/low2).
SPLIT = -1


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
    #: SPLIT-WORD tables (round 5; gate: split_shift <= 10, max bucket at
    #: the split table width <= 3, n < 2**29).  Both are indexed by the SAME
    #: bucket id, so the two element gathers are INDEPENDENT -- one
    #: dependency level instead of the packed variant's two (offc must
    #: resolve before low2 can be addressed).  v1[b] = start | (count << 29);
    #: v2[b] = low0 | (low1 << s) | (low2 << 2s) with s = split_shift.
    v1: np.ndarray | None = None
    v2: np.ndarray | None = None
    split_shift: int = 0

    @property
    def packed(self) -> bool:
        return self.offc is not None

    @property
    def split(self) -> bool:
        return self.v1 is not None

    def device_arrays(self):
        if self.split:
            return jnp.asarray(self.v1), jnp.asarray(self.v2)
        if self.packed:
            return jnp.asarray(self.offc), jnp.asarray(self.low2)
        return jnp.asarray(self.off), jnp.asarray(self.low)

    def dispatch_args(self):
        """(shift, n_probe, off_bits) statics for :func:`radix_lookup_dispatch`,
        matching whatever representation :meth:`device_arrays` returned."""
        if self.split:
            return self.split_shift, self.max_bucket, SPLIT
        if self.packed:
            return self.shift, self.max_bucket, self.off_bits
        return self.shift, self.max_bucket, 0


def build_radix(keys: np.ndarray, key_bits: int, max_table_bits: int = 24,
                allow_split: bool = True) -> RadixIndex:
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
    # split-word variant (see RadixIndex.v1): 2 INDEPENDENT gather passes.
    # Widen the table until the low bits fit 3-per-word (split_shift <= 10,
    # so 3 lows + nothing else occupy 30 bits of v2); cap at 2**25 buckets
    # (2 x 128 MB of HBM) -- wider key spaces keep the packed/generic form.
    s_shift = max(0, key_bits - 25)
    if allow_split and n and s_shift <= 10 and n < (1 << 29):
        s_tb = key_bits - s_shift
        s_buckets = (keys >> np.uint64(s_shift)).astype(np.int64)
        s_counts = np.bincount(s_buckets, minlength=(1 << s_tb))
        if int(s_counts.max()) <= 3:
            s_off = np.zeros(1 << s_tb, np.int64)
            np.cumsum(s_counts[:-1], out=s_off[1:])
            s_low = (keys & np.uint64((1 << s_shift) - 1)).astype(np.int64)
            v2 = np.zeros(1 << s_tb, np.int64)
            pos_in_bucket = np.arange(n, dtype=np.int64) - s_off[s_buckets]
            np.add.at(v2, s_buckets, s_low << (s_shift * pos_in_bucket))
            idx.split_shift = s_shift
            idx.v1 = (s_off | (s_counts.astype(np.int64) << 29)).astype(np.int32)
            idx.v2 = v2.astype(np.int32)
            return idx
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


def radix_lookup_split(v1, v2, a, b, *, shift: int, n_keys: int):
    """Split-word device lookup: TWO element-gather passes, both indexed by
    the bucket id -- independent, so the chip can issue them concurrently
    (the packed form's low2 gather must wait for offc).  ``v1[bucket]``
    holds start|count<<29, ``v2[bucket]`` up to three ``shift``-bit lows.
    Misses return ``n_keys``.  Exact: same-bucket keys differ in their low
    bits by construction, and the count field gates unused low slots."""
    i32 = jnp.int32
    bucket, lo = _split_bucket_lo(a, b, shift)
    o1 = jnp.take(v1, bucket, axis=0)
    o2 = jnp.take(v2, bucket, axis=0)
    st = o1 & i32((1 << 29) - 1)
    cnt = o1 >> i32(29)  # o1 is non-negative (count <= 3, start < 2**29)
    mask = i32((1 << shift) - 1) if shift else i32(0)
    row = jnp.full(a.shape, n_keys, i32)
    for j in range(3):
        cand = (o2 >> i32(j * shift)) & mask if shift else jnp.zeros_like(o2)
        hit = (i32(j) < cnt) & (cand == lo)
        row = jnp.where(hit, st + i32(j), row)
    return row


def radix_lookup_dispatch(arr1, arr2, a, b, *, shift: int, n_probe: int,
                          off_bits: int, n_keys: int):
    """Representation-dispatching lookup: ``off_bits`` == SPLIT selects the
    split-word form (arr1/arr2 = v1/v2), > 0 the packed form (offc/low2),
    0 the generic probe loop (off/low).  Statics come from
    :meth:`RadixIndex.dispatch_args`."""
    if off_bits == SPLIT:
        return radix_lookup_split(arr1, arr2, a, b, shift=shift,
                                  n_keys=n_keys)
    if off_bits > 0:
        return radix_lookup_packed(arr1, arr2, a, b, shift=shift,
                                   off_bits=off_bits, n_keys=n_keys)
    return radix_lookup(arr1, arr2, a, b, shift=shift, n_probe=n_probe,
                        n_keys=n_keys)


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

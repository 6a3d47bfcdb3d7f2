"""Unit tests: cuckoo hash table and ragged expansion (device ops)."""

import jax.numpy as jnp
import numpy as np

from epik_tpu.ops.expand import ragged_expand
from epik_tpu.ops.hashtable import BUCKET, build_table, lookup


class TestCuckoo:
    def _roundtrip(self, n, seed):
        rng = np.random.default_rng(seed)
        keys = rng.choice(1 << 40, size=n, replace=False).astype(np.uint64)
        keys.sort()
        offs = np.arange(n, dtype=np.uint32) * 3
        lens = (1 + np.arange(n) % 7).astype(np.uint32)
        t = build_table(keys, offs, lens)
        hi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
        lo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        found, off, length = lookup(t.device_arrays(), t.seed1, t.seed2, hi, lo)
        assert bool(jnp.all(found)), "all inserted keys must be found"
        np.testing.assert_array_equal(np.asarray(off), offs)
        np.testing.assert_array_equal(np.asarray(length), lens)
        return t, keys

    def test_small(self):
        self._roundtrip(10, 0)

    def test_forces_eviction(self):
        # high load factor: nb*BUCKET slots, n close to capacity
        t, keys = self._roundtrip(10000, 1)
        capacity = t.num_buckets * BUCKET
        assert 10000 / capacity > 0.5  # actually exercises eviction paths

    def test_misses(self):
        rng = np.random.default_rng(2)
        keys = rng.choice(1 << 40, size=1000, replace=False).astype(np.uint64)
        t = build_table(keys, np.zeros(1000, np.uint32), np.ones(1000, np.uint32))
        probe = rng.choice(1 << 40, size=500, replace=False).astype(np.uint64)
        in_set = np.isin(probe, keys)
        hi = jnp.asarray((probe >> np.uint64(32)).astype(np.uint32))
        lo = jnp.asarray((probe & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        found, _, length = lookup(t.device_arrays(), t.seed1, t.seed2, hi, lo)
        np.testing.assert_array_equal(np.asarray(found), in_set)
        # misses must report zero-length posting lists
        assert bool(jnp.all(jnp.where(jnp.asarray(~in_set), length == 0, True)))

    def test_empty_table(self):
        t = build_table(np.empty(0, np.uint64), np.empty(0, np.uint32), np.empty(0, np.uint32))
        found, _, length = lookup(
            t.device_arrays(), t.seed1, t.seed2, jnp.zeros(4, jnp.uint32), jnp.zeros(4, jnp.uint32)
        )
        assert not bool(jnp.any(found))

    def test_sentinel_never_matches(self):
        t, _ = self._roundtrip(100, 3)
        s = jnp.full(8, 0xFFFFFFFF, jnp.uint32)
        found, _, length = lookup(t.device_arrays(), t.seed1, t.seed2, s, s)
        assert not bool(jnp.any(found))


class TestRaggedExpand:
    def test_basic(self):
        lens = jnp.array([2, 0, 3, 1], jnp.int32)
        win, elem, total = ragged_expand(lens, 8)
        assert int(total) == 6
        assert win.tolist() == [0, 0, 2, 2, 2, 3, -1, -1]
        assert elem.tolist() == [0, 1, 0, 1, 2, 0, 0, 0]

    def test_exact_budget(self):
        win, elem, total = ragged_expand(jnp.array([3, 3], jnp.int32), 6)
        assert int(total) == 6
        assert win.tolist() == [0, 0, 0, 1, 1, 1]

    def test_overflow_reports_total(self):
        win, elem, total = ragged_expand(jnp.array([5, 5], jnp.int32), 4)
        assert int(total) == 10  # caller must grow the budget
        assert win.tolist() == [0, 0, 0, 0]

    def test_all_zero(self):
        win, elem, total = ragged_expand(jnp.zeros(5, jnp.int32), 4)
        assert int(total) == 0
        assert win.tolist() == [-1, -1, -1, -1]

    def test_leading_zeros(self):
        win, _, _ = ragged_expand(jnp.array([0, 0, 2], jnp.int32), 4)
        assert win.tolist() == [2, 2, -1, -1]

    def test_random_against_numpy(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            lens = np.zeros(40, dtype=np.int64)  # fixed W: one compile total
            w = rng.integers(1, 40)
            lens[:w] = rng.integers(0, 6, size=w)
            expect = [(i, j) for i, l in enumerate(lens) for j in range(l)]
            budget = 256  # fixed: avoids one XLA compile per distinct shape
            win, elem, total = ragged_expand(jnp.asarray(lens, jnp.int32), budget)
            assert int(total) == len(expect)
            got = [(int(w), int(e)) for w, e in zip(win, elem) if w >= 0]
            assert got == expect

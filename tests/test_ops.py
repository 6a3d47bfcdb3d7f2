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


class TestPackedAccumulate:
    """ops/pallas/accumulate.py packed-payload kernels (interpret mode on
    CPU) against a numpy scatter oracle."""

    def _mk(self, R, PP, B, seed=0, frac_trash=0.3):
        import numpy as np

        from epik_tpu.ops.pallas.accumulate import trash_branch

        rng = np.random.default_rng(seed)
        b = rng.integers(0, B, (R, PP)).astype(np.int32)
        q = rng.integers(1, 64001, (R, PP)).astype(np.int32)
        trash = trash_branch(B)
        mask = rng.random((R, PP)) < frac_trash
        b[mask] = trash
        q[mask] = 0
        return (b << 16) | q, b, q, trash

    def test_sums_match_numpy(self):
        import numpy as np

        from epik_tpu.ops.pallas.accumulate import (
            NH_LANES,
            segment_accumulate_packed,
        )

        R, PP, B = 16, 1024, 300
        g, b, q, trash = self._mk(R, PP, B)
        got = np.asarray(
            segment_accumulate_packed(g, B, tr=8, ch=512, interpret=True)
        )
        nh = (B + 1 + NH_LANES - 1) // NH_LANES
        want = np.zeros((R, nh * NH_LANES))
        for r in range(R):
            np.add.at(want[r], b[r], q[r])
        # EXACT integer sums (bf16 digit decomposition, f32 accumulators)
        np.testing.assert_array_equal(got, want[:, :B])

    def test_fused_topk_matches_xla_finish(self):
        import numpy as np

        from epik_tpu.engine.placer import (
            _pack_outputs_slim,
            finish_scores_shifted,
        )
        from epik_tpu.ops.pallas.accumulate import (
            segment_accumulate_packed,
            segment_accumulate_packed_topk,
        )

        R, PP, B, K, k = 16, 1024, 300, 7, 10
        log_eps, scale = -4.26, 15023.0
        g, b, q, trash = self._mk(R, PP, B, seed=3)
        # a read with NO touched branches (all trash) and one with few
        g[0] = np.int32(trash << 16)
        g[1, 8:] = np.int32(trash << 16)
        import numpy as _np

        m = _np.full(R, 141.0, _np.float32)
        got = np.asarray(segment_accumulate_packed_topk(
            g, m, B, K, k=k, log_eps=log_eps, scale=scale,
            tr=8, ch=512, interpret=True,
        ))
        Sq = np.asarray(
            segment_accumulate_packed(g, B, tr=8, ch=512, interpret=True)
        )
        import jax.numpy as jnp

        outs = finish_scores_shifted(
            jnp.asarray(Sq / np.float32(scale)), jnp.asarray(m),
            B=B, K=K, k=k, log_eps=log_eps,
        )
        want = np.asarray(_pack_outputs_slim(outs))
        # scores / log_sum / n / zero_sum agree to f32 rounding; indices
        # agree exactly on LIVE entries (for -inf slots the kernel repeats
        # index 0 while lax.top_k counts up -- both are dropped by the
        # host's n_eff cut, assemble_arrays)
        np.testing.assert_allclose(got[:, :K], want[:, :K], rtol=1e-5,
                                   atol=1e-5)
        live = np.isfinite(want[:, :K])
        np.testing.assert_array_equal(got[:, K:2 * K][live],
                                      want[:, K:2 * K][live])
        np.testing.assert_allclose(got[:, 2 * K], want[:, 2 * K], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 2 * K + 1], want[:, 2 * K + 1])
        np.testing.assert_array_equal(got[:, 2 * K + 2], want[:, 2 * K + 2])

    def test_fused_topk_fast_path_fallback_cases(self):
        """The round-5 fast finish (per-lane top-2 candidates) must DETECT
        and fall back on exactly the cases it cannot represent: a lane
        holding 3+ of the top-K, and a hidden tie at the K-th boundary.
        Engineered blocks for each case (plus a clean one) vs the XLA
        finish."""
        import numpy as np

        from epik_tpu.engine.placer import (
            _pack_outputs_slim,
            finish_scores_shifted,
        )
        from epik_tpu.ops.pallas.accumulate import (
            segment_accumulate_packed,
            segment_accumulate_packed_topk,
            trash_branch,
        )

        R, PP, B, K, k = 24, 512, 300, 7, 10
        log_eps, scale = -4.26, 15023.0
        trash = trash_branch(B)
        g = np.full((R, PP), np.int32(trash << 16), np.int32)
        rng = np.random.default_rng(9)

        def put(r, pairs):
            for j, (br, q) in enumerate(pairs):
                g[r, j] = (br << 16) | q

        # block 0 (rows 0-7): lane collision -- branches 5, 133, 261 all
        # sit in lane 5; give them the three largest sums
        put(0, [(5, 60000), (133, 59000), (261, 58000)]
               + [(i * 3 + 7, 1000 + i) for i in range(8)])
        # block 1 (rows 8-15): exact tie at the K-th boundary between a
        # candidate and a same-lane hidden second (branches 10 and 138)
        put(8, [(10, 5000), (138, 5000)]
               + [(20 + i, 50000 - 100 * i) for i in range(6)])
        # block 2 (rows 16-23): clean spread (distinct lanes)
        put(16, [(i * 5 + 2, 40000 - 500 * i) for i in range(12)])
        for r in list(range(1, 8)) + list(range(9, 16)) + list(range(17, 24)):
            put(r, [(int(x), int(y)) for x, y in zip(
                rng.integers(0, B, 10), rng.integers(1, 64001, 10))])

        m = np.full(R, 141.0, np.float32)
        got = np.asarray(segment_accumulate_packed_topk(
            g, m, B, K, k=k, log_eps=log_eps, scale=scale,
            tr=8, ch=512, interpret=True,
        ))
        Sq = np.asarray(
            segment_accumulate_packed(g, B, tr=8, ch=512, interpret=True)
        )
        import jax.numpy as jnp

        outs = finish_scores_shifted(
            jnp.asarray(Sq / np.float32(scale)), jnp.asarray(m),
            B=B, K=K, k=k, log_eps=log_eps,
        )
        want = np.asarray(_pack_outputs_slim(outs))
        np.testing.assert_allclose(got[:, :K], want[:, :K], rtol=1e-5,
                                   atol=1e-5)
        live = np.isfinite(want[:, :K])
        np.testing.assert_array_equal(got[:, K:2 * K][live],
                                      want[:, K:2 * K][live])

"""Multi-device placement: data-parallel reads x hash-sharded database.

TPU-native distribution (green-field vs the reference, which is a single
OpenMP process -- SURVEY.md sections 2 and 5.8):

* **data axis**: unique reads of a batch are split into contiguous groups,
  one per data shard; no communication -- the analog of the reference's
  OpenMP parallel-for over reads (reference: epik/src/epik/place.cpp:218-229).
* **model axis**: the k-mer table is partitioned by key hash; every model
  shard looks up the *full* replicated key stream against its own cuckoo
  table.  A key misses on every shard but its owner, so no routing or
  all-to-all is needed; the dense per-(read, branch) partial score/count
  matrices merge with ``psum`` over ICI, and the ambiguous first-hit
  combines as ``pmin`` over processing order followed by a masked ``psum``
  of the owning shard's contribution (each key lives on exactly one shard,
  so the argmin is unique).

Everything below runs inside one ``shard_map`` over a ('data', 'model')
mesh and is jit-compiled once per budget bucket.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core.alphabet import get_alphabet
from ..core.kmers import tokenize_batch
from ..core.scoring import score_threshold
from ..core.tree import PhyloTree
from ..engine.placer import (
    _ORDER_INF,
    _U64,
    PlacerConfig,
    _bucket,
    _pack_outputs,
    accumulate_amb_firsthit,
    accumulate_exact,
    finish_scores,
    unpack_outputs,
)
from ..engine.types import PlacedCollection, PlacedSequence, Placement
from ..io.db import PhyloKmerDB
from ..ops.hashtable import build_table
from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["ShardedJaxPlacer", "shard_db_by_hash"]

_SENTINEL_KEY = np.uint64(0xFFFFFFFFFFFFFFFF)


def _shard_of_key(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Stable hash-based shard assignment (balanced, key-range-free)."""
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    with np.errstate(over="ignore"):
        x = lo ^ (hi * np.uint32(0x9E3779B9))
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x7FEB352D)
        x ^= x >> np.uint32(15)
    return (x % np.uint32(n_shards)).astype(np.int64)


@dataclasses.dataclass
class _ShardedDB:
    """Stacked per-shard tables + posting arrays (leading model axis)."""

    packed: np.ndarray  # [n_model, nb, 4*BUCKET] uint32 (packed cuckoo rows)
    postings: np.ndarray  # [n_model, Pmax, 2] uint32 rows [branch | score bits]
    row_off: np.ndarray  # [n_model, rows_pad] int32 local CSR offsets
    seeds: list[tuple[int, int]]
    avg_plen: float
    plane_s: np.ndarray | None = None  # [n_model, rows_max+1, B] f32 (dense;
    # absent cells exactly 0.0, presence == nonzero)


def shard_db_by_hash(db: PhyloKmerDB, n_model: int, dense: bool = False,
                     num_branches: int | None = None) -> _ShardedDB:
    """Partition the DB by key hash.  With ``dense``, also build per-shard
    dense planes (see engine/placer.py dense-DB mode) and tables whose
    payload is the local plane row index."""
    lens_all = np.diff(db.row_off)
    shard_ids = _shard_of_key(db.keys, n_model)
    per_shard = []
    max_n = max(1, int(np.max(np.bincount(shard_ids, minlength=n_model))) if db.num_kmers else 1)
    nb_target = None
    for s in range(n_model):
        sel = shard_ids == s
        keys = db.keys[sel]
        lens = lens_all[sel].astype(np.int64)
        # local CSR
        local_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        idx_rows = np.flatnonzero(sel)
        branches = np.concatenate(
            [db.branches[db.row_off[i] : db.row_off[i + 1]] for i in idx_rows]
        ) if idx_rows.size else np.empty(0, np.uint32)
        scores = np.concatenate(
            [db.scores[db.row_off[i] : db.row_off[i + 1]] for i in idx_rows]
        ) if idx_rows.size else np.empty(0, np.float32)
        per_shard.append((keys, local_off, branches, scores))

    # identical table geometry across shards (required for stacking)
    from ..ops.hashtable import BUCKET, _next_pow2

    nb_target = _next_pow2(max(1, int(np.ceil(max_n / (BUCKET * 0.85)))))
    tables = []
    planes_s, planes_c = [], []
    rows_max = max_n
    B = num_branches or 0
    for keys, local_off, branches, scores in per_shard:
        lens = np.diff(local_off)
        if dense:
            t = build_table(keys, np.arange(keys.shape[0], dtype=np.uint32),
                            lens, min_buckets=nb_target)
            bw = -(-B // 128) * 128  # aligned rows gather faster
            ps = np.zeros((rows_max + 1, bw), np.float32)
            rpp = np.repeat(np.arange(keys.shape[0]), lens)
            # tiny NORMAL f32 (subnormals flush to zero on TPU)
            sc = np.where(scores == 0.0, np.float32(-1e-37), scores)
            ps[rpp, branches.astype(np.int64)] = sc
            planes_s.append(ps)
        else:
            # payload = local k-mer row index (byte offsets via row_off gather)
            t = build_table(keys, np.arange(keys.shape[0], dtype=np.uint32),
                            lens, min_buckets=nb_target)
        tables.append(t)
    p_max = max(1, max(x[2].shape[0] for x in per_shard))
    rows_pad = max(len(x[1]) for x in per_shard)
    stack = lambda f: np.stack([f(i) for i in range(n_model)])

    def pack_postings(i):
        br, sc = per_shard[i][2], per_shard[i][3]
        pp = np.stack([br.astype(np.uint32), sc.astype(np.float32).view(np.uint32)], axis=1)
        return np.pad(pp, ((0, p_max - pp.shape[0]), (0, 0)))

    return _ShardedDB(
        packed=stack(lambda i: tables[i].packed()),
        postings=stack(pack_postings),
        row_off=stack(
            lambda i: np.pad(
                per_shard[i][1].astype(np.int32),
                (0, rows_pad - len(per_shard[i][1])),
                mode="edge",
            )
        ),
        seeds=[(t.seed1, t.seed2) for t in tables],
        avg_plen=float(lens_all.mean()) if lens_all.size else 1.0,
        plane_s=np.stack(planes_s) if dense else None,
    )


class ShardedJaxPlacer:
    """Multi-device placer: same ``place(records)`` surface as JaxPlacer."""

    def __init__(
        self,
        db: PhyloKmerDB,
        tree: PhyloTree,
        mesh,
        keep_at_most: int | None = None,
        keep_factor: float | None = None,
        config: PlacerConfig | None = None,
    ):
        self.db = db
        self.tree = tree
        self.mesh = mesh
        self.n_data = mesh.shape[DATA_AXIS]
        self.n_model = mesh.shape[MODEL_AXIS]
        # copy: never mutate a caller-supplied config; explicit kwargs win
        self.config = dataclasses.replace(config) if config else PlacerConfig()
        if keep_at_most is not None:
            self.config.keep_at_most = keep_at_most
        if keep_factor is not None:
            self.config.keep_factor = keep_factor
        self.alphabet = get_alphabet(db.sequence_type)
        self.k = db.kmer_size
        self.B = tree.get_node_count()
        self.eps = np.float32(score_threshold(db.omega, self.k, self.alphabet.sigma))
        self.log_eps = np.float32(np.log10(self.eps))
        num, tot = tree.tree_index()
        self.distal = tree.branch_lengths / 2.0
        mean = np.where(num > 1, tot / np.maximum(num, 1), 0.0)
        self.pendant = mean + self.distal

        plane_bytes = (db.num_kmers + self.n_model) * self.B * 4
        cfgd = self.config.dense_db
        self._dense_db = cfgd == "on" or (
            cfgd == "auto"
            and self.config.accumulate == "auto"
            and plane_bytes <= self.config.dense_db_budget
        )
        backend = jax.default_backend()
        # "auto" resolves to the chunked XLA gather -- measured faster than
        # the Pallas DMA kernel on v5e (see PlacerConfig.dense_gather)
        self._pallas_rows = self._dense_db and self.config.dense_gather == "pallas"
        self._interpret = backend != "tpu"
        sdb = shard_db_by_hash(db, self.n_model, dense=self._dense_db,
                               num_branches=self.B)
        self._sdb = sdb
        # device-resident once: re-converting per place() would re-upload the
        # whole database every batch
        self._dev_packed = jnp.asarray(sdb.packed)
        self._dev_postings = jnp.asarray(sdb.postings)
        self._dev_row_off = jnp.asarray(sdb.row_off)
        self._dev_plane_s = jnp.asarray(sdb.plane_s) if sdb.plane_s is not None else None
        # per-shard seeds must be identical for a traced kernel; rebuild with a
        # common seed pair would be ideal, but seeds are static args instead:
        # we pass stacked seed arrays through the mesh.
        self._seed1 = np.array([s[0] for s in sdb.seeds], dtype=np.uint32)
        self._seed2 = np.array([s[1] for s in sdb.seeds], dtype=np.uint32)

    # -- device kernel ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "R", "K", "Pb", "PAb"))
    def _sharded_kernel(self, seed1, seed2, t_packed, db_post, row_off,
                        e_hi, e_lo, e_read, a_hi, a_lo, a_read, a_order, m_f32,
                        R: int, K: int, Pb: int, PAb: int):
        B, k = self.B, self.k
        mesh = self.mesh

        def block(seed1, seed2, t_packed, db_post, row_off,
                  e_hi, e_lo, e_read, a_hi, a_lo, a_read, a_order, m):
            table = t_packed[0]
            s1 = seed1[0, 0]
            s2 = seed2[0, 0]
            S, C, e_total = accumulate_exact(
                table, db_post[0], row_off[0], e_hi[0], e_lo[0], e_read[0],
                R=R, B=B, P=Pb, seed1=s1, seed2=s2,
            )
            first, V, a_total = accumulate_amb_firsthit(
                table, db_post[0], row_off[0], a_hi[0], a_lo[0], a_read[0], a_order[0],
                R=R, B=B, PA=PAb, k=k, seed1=s1, seed2=s2, eps=self.eps,
            )
            # merge partial matrices over the model axis (ICI collectives)
            S = jax.lax.psum(S, MODEL_AXIS)
            C = jax.lax.psum(C, MODEL_AXIS)
            first_g = jax.lax.pmin(first, MODEL_AXIS)
            hit = first_g < _ORDER_INF
            owner = (first == first_g) & hit
            V_g = jax.lax.psum(jnp.where(owner, V, 0.0), MODEL_AXIS)
            S = S + jnp.where(hit, V_g, 0.0)
            C = C + hit.astype(jnp.int32)
            outs = finish_scores(S, C, m[0], B=B, K=K, k=k, log_eps=self.log_eps)
            e_tot = jax.lax.pmax(e_total, MODEL_AXIS)
            a_tot = jax.lax.pmax(a_total, MODEL_AXIS)
            return _pack_outputs(outs, e_tot, a_tot)[None]

        spec_model = P(MODEL_AXIS)
        spec_data = P(DATA_AXIS)
        out = jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(spec_model,) * 5 + (spec_data,) * 8,
            out_specs=spec_data,
            check_vma=False,
        )(
            seed1[:, None], seed2[:, None], t_packed, db_post, row_off,
            e_hi, e_lo, e_read, a_hi, a_lo, a_read, a_order, m_f32,
        )
        return out

    @functools.partial(
        jax.jit, static_argnames=("self", "R", "K", "Wmax", "Amax")
    )
    def _sharded_kernel_dense(self, seed1, seed2, t_packed, plane_s,
                              e_hi, e_lo, a_hi, a_lo, m_f32,
                              R: int, K: int, Wmax: int, Amax: int):
        """Dense-plane sharded step: per-shard row-gather sums merged with
        psum; ambiguous first-hit merged with pmin + owner-masked psum."""
        from ..engine.placer import dense_amb_firsthit, dense_exact_sums

        B, k = self.B, self.k
        mesh = self.mesh
        eps = self.eps
        log_eps = self.log_eps

        def block(seed1, seed2, t_packed, plane_s,
                  e_hi, e_lo, a_hi, a_lo, m):
            table = t_packed[0]
            s1 = seed1[0, 0]
            s2 = seed2[0, 0]
            S, C = dense_exact_sums(
                table, plane_s[0], e_hi[0], e_lo[0],
                R=R, B=B, Wmax=Wmax, seed1=s1, seed2=s2,
                pallas_rows=self._pallas_rows, interpret=self._interpret,
            )
            first, sel = dense_amb_firsthit(
                table, plane_s[0], a_hi[0], a_lo[0],
                R=R, B=B, Amax=Amax, seed1=s1, seed2=s2,
            )
            S = jax.lax.psum(S, MODEL_AXIS)
            C = jax.lax.psum(C, MODEL_AXIS)
            first_g = jax.lax.pmin(first, MODEL_AXIS)
            hit = first_g < _ORDER_INF
            owner = (first == first_g) & hit
            f32 = jnp.float32
            pow10 = jnp.exp(sel * f32(math.log(10.0)))
            V = (pow10 + f32(k - 1) * f32(eps)) / f32(k)
            V_g = jax.lax.psum(jnp.where(owner, V, 0.0), MODEL_AXIS)
            S = S + jnp.where(hit, V_g, 0.0)
            C = C + hit.astype(jnp.int32)
            outs = finish_scores(S, C, m[0], B=B, K=K, k=k, log_eps=log_eps)
            zero = jnp.int32(0)
            return _pack_outputs(outs, zero, zero)[None]

        spec_model = P(MODEL_AXIS)
        spec_data = P(DATA_AXIS)
        return jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(spec_model,) * 4 + (spec_data,) * 5,
            out_specs=spec_data,
            check_vma=False,
        )(
            seed1[:, None], seed2[:, None], t_packed, plane_s,
            e_hi, e_lo, a_hi, a_lo, m_f32,
        )

    # -- host orchestration ----------------------------------------------------

    def place(self, records: list[tuple[str, bytes]]) -> PlacedCollection:
        cfg = self.config
        sequence_map: dict[bytes, list[str]] = {}
        for header, seq in records:
            sequence_map.setdefault(seq, []).append(header)
        seqs = list(sequence_map.keys())
        if not seqs:
            return PlacedCollection(sequence_map={}, placed_seqs=[])

        nd = self.n_data
        R = max(1, -(-len(seqs) // nd))  # reads per data shard
        groups = [seqs[i * R : (i + 1) * R] for i in range(nd)]
        toks = [tokenize_batch(g, self.k, self.alphabet) for g in groups]

        if self._dense_db:
            from ..engine.placer import JaxPlacer as _JP

            wpr = max(
                (int(np.bincount(t.exact_read, minlength=R).max()) if t.exact_read.size else 1)
                for t in toks
            )
            apr = max(
                (int(np.bincount(t.amb_read, minlength=R).max()) if t.amb_read.size else 1)
                for t in toks
            )
            Wmax = _bucket(wpr, 8)
            Amax = _bucket(apr, 8)
            K = min(cfg.keep_at_most, self.B)
            mats = [
                _JP._key_matrix(t.exact_keys, t.exact_read, R, Wmax)
                + _JP._key_matrix(t.amb_keys, t.amb_read, R, Amax)
                for t in toks
            ]
            stackm = lambda i: np.stack([m[i] for m in mats])
            m_stack = []
            for t in toks:
                m_signed_g = t.seq_lengths - self.k + 1
                m_f32 = np.where(
                    m_signed_g >= 0,
                    m_signed_g.astype(np.float32),
                    np.float32(float(_U64)) + m_signed_g.astype(np.float32),
                ).astype(np.float32)
                m_pad = np.zeros(R, np.float32)
                m_pad[: m_f32.shape[0]] = m_f32
                m_stack.append(m_pad)
            out = self._sharded_kernel_dense(
                jnp.asarray(self._seed1), jnp.asarray(self._seed2),
                self._dev_packed, self._dev_plane_s,
                stackm(0), stackm(1), stackm(2), stackm(3),
                np.stack(m_stack),
                R=R, K=K, Wmax=Wmax, Amax=Amax,
            )
            stacked = np.asarray(out)  # (n_data, R+1, 4K+2) -- one transfer
            per_g = [unpack_outputs(stacked[g], K) for g in range(self.n_data)]
            scores_k = np.stack([u[0] for u in per_g])
            idx_k = np.stack([u[1] for u in per_g])
            counts_k = np.stack([u[2] for u in per_g])
            wr_k = np.stack([u[3] for u in per_g])
            n_touched = np.stack([u[4] for u in per_g])
            zero_sum = np.stack([u[5] for u in per_g])
            return self._assemble_groups(
                groups, toks, scores_k, idx_k, counts_k, wr_k, n_touched,
                zero_sum, K, sequence_map,
            )

        E = _bucket(max(t.exact_keys.shape[0] for t in toks), cfg.min_bucket)
        A = _bucket(max(t.amb_keys.shape[0] for t in toks), cfg.min_bucket)
        est = max(1, int(self._sdb.avg_plen * cfg.budget_headroom))
        # each model shard owns ~1/n_model of the postings
        P_budget = _bucket(max(1, E * est // max(1, self.n_model)), cfg.min_bucket)
        PA_budget = _bucket(max(1, A * est // max(1, self.n_model)), cfg.min_bucket)
        K = min(cfg.keep_at_most, self.B)

        def pad_group(t):
            e_hi, e_lo = _pad_split(t.exact_keys, E)
            a_hi, a_lo = _pad_split(t.amb_keys, A)
            m_signed = t.seq_lengths - self.k + 1
            m_f32 = np.where(
                m_signed >= 0,
                m_signed.astype(np.float32),
                np.float32(float(_U64)) + m_signed.astype(np.float32),
            ).astype(np.float32)
            m_pad = np.zeros(R, np.float32)
            m_pad[: m_f32.shape[0]] = m_f32
            return (
                e_hi, e_lo, _pad_i32(t.exact_read, E, R),
                a_hi, a_lo, _pad_i32(t.amb_read, A, R),
                _pad_i32(t.amb_order, A, _ORDER_INF), m_pad,
            )

        padded = [pad_group(t) for t in toks]
        stack = lambda i: np.stack([p[i] for p in padded])
        sdb = self._sdb

        while True:
            out = self._sharded_kernel(
                jnp.asarray(self._seed1), jnp.asarray(self._seed2),
                self._dev_packed,
                self._dev_postings, self._dev_row_off,
                stack(0), stack(1), stack(2), stack(3), stack(4), stack(5),
                stack(6), stack(7),
                R=R, K=K, Pb=P_budget, PAb=PA_budget,
            )
            stacked = np.asarray(out)  # (n_data, R+1, 4K+2) -- one transfer
            per_g = [unpack_outputs(stacked[g], K) for g in range(self.n_data)]
            scores_k = np.stack([u[0] for u in per_g])
            idx_k = np.stack([u[1] for u in per_g])
            counts_k = np.stack([u[2] for u in per_g])
            wr_k = np.stack([u[3] for u in per_g])
            n_touched = np.stack([u[4] for u in per_g])
            zero_sum = np.stack([u[5] for u in per_g])
            e_tot = max(u[6] for u in per_g)
            a_tot = max(u[7] for u in per_g)
            if e_tot <= P_budget and a_tot <= PA_budget:
                break
            if e_tot > P_budget:
                P_budget = _bucket(int(e_tot), cfg.min_bucket)
            if a_tot > PA_budget:
                PA_budget = _bucket(int(a_tot), cfg.min_bucket)

        return self._assemble_groups(
            groups, toks, scores_k, idx_k, counts_k, wr_k, n_touched, zero_sum,
            K, sequence_map,
        )

    def _assemble_groups(self, groups, toks, scores_k, idx_k, counts_k, wr_k,
                         n_touched, zero_sum, K, sequence_map) -> PlacedCollection:
        """Flatten per-data-shard outputs back to read order + jplace rows."""
        cfg = self.config
        placed_seqs: list[PlacedSequence] = []
        for g, group in enumerate(groups):
            t = toks[g]
            m_signed = t.seq_lengths - self.k + 1
            for i, seq in enumerate(group):
                n = int(n_touched[g, i])
                keep_factor = cfg.keep_factor
                if n == 0:
                    placements, sum_is_zero = self._fallback(int(m_signed[i]) % _U64)
                    if sum_is_zero:
                        keep_factor = 0.0
                else:
                    placements = []
                    for j in range(min(n, K)):
                        e = int(idx_k[g, i, j])
                        placements.append(
                            Placement(
                                branch_id=e,
                                score=float(scores_k[g, i, j]),
                                weight_ratio=float(wr_k[g, i, j]),
                                count=int(counts_k[g, i, j]),
                                distal_length=float(self.distal[e]),
                                pendant_length=float(self.pendant[e]),
                            )
                        )
                    if zero_sum[g, i]:
                        keep_factor = 0.0
                best = placements[0].weight_ratio if placements else 0.0
                threshold = best * keep_factor
                placements = [p for p in placements if p.weight_ratio >= threshold]
                placed_seqs.append(PlacedSequence(sequence=seq, placements=placements))
        return PlacedCollection(sequence_map=sequence_map, placed_seqs=placed_seqs)

    def _fallback(self, m_wrapped: int):
        k = self.k
        ts = float(np.float32(self.log_eps * np.float32(float(m_wrapped)) / np.float32(k)))
        exponent = float(np.float32(np.float32(float(m_wrapped)) * self.log_eps / np.float32(k)))
        score_sum = float(self.B) * 10.0**exponent
        out = []
        for i in range(self.config.keep_at_most):
            power = 10.0**ts
            wr = 0.0 if (score_sum == 0.0 or power == 0.0) else power / score_sum
            out.append(Placement(i, ts, wr, 0, 0.0, 0.0))
        return out, score_sum == 0.0


def _pad_split(keys: np.ndarray, size: int):
    padded = np.full(size, _SENTINEL_KEY, dtype=np.uint64)
    padded[: keys.shape[0]] = keys
    return (
        (padded >> np.uint64(32)).astype(np.uint32),
        (padded & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def _pad_i32(arr: np.ndarray, size: int, fill: int):
    padded = np.full(size, fill, dtype=np.int32)
    padded[: arr.shape[0]] = arr
    return padded

"""One-off: stage-by-stage timing of the dense-DB device step on the real chip."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from epik_tpu.core.tree import parse_newick
from epik_tpu.engine.placer import (
    JaxPlacer, dense_exact_sums, dense_amb_firsthit, finish_scores,
    _pack_outputs, _place_batch_device_densedb,
)
from epik_tpu.io.build import reference_like_db, reads_from_reference
from epik_tpu.ops.hashtable import lookup
import functools, math

db, ref = reference_like_db(num_leaves=652, kmer_size=10, ref_length=520_000,
                            mean_posting_len=12.0, seed=652)
tree = parse_newick(db.tree())
reads = reads_from_reference(ref, 2000, length=150, mutation_rate=0.02, seed=7)
placer = JaxPlacer(db, tree)
assert placer._dense_db
print("dense mode on; plane", placer._plane_s.shape, file=sys.stderr)

# reproduce the input prep from place_async
seqs = [s for _, s in reads]
toks = placer._tokenize(list(dict.fromkeys(seqs)))
R = toks.num_reads
wpr = int(np.bincount(toks.exact_read, minlength=R).max())
apr = int(np.bincount(toks.amb_read, minlength=R).max()) if toks.amb_read.size else 1
Wmax = max(32, -(-wpr // 32) * 32)
Amax = max(8, 1 << (apr - 1).bit_length())
e_hi, e_lo = placer._key_matrix(toks.exact_keys, toks.exact_read, R, Wmax)
a_hi, a_lo = placer._key_matrix(toks.amb_keys, toks.amb_read, R, Amax)
m_f32 = np.maximum(toks.seq_lengths - placer.k + 1, 0).astype(np.float32)
print(f"R={R} Wmax={Wmax} Amax={Amax} exact={toks.exact_keys.size} amb={toks.amb_keys.size}",
      file=sys.stderr)

table = placer._dev_table
plane = placer._plane_s
s1, s2 = placer.table.seed1, placer.table.seed2
B = placer.B
K = min(7, B)
k = placer.k
e_hi_d, e_lo_d = jnp.asarray(e_hi), jnp.asarray(e_lo)
a_hi_d, a_lo_d = jnp.asarray(a_hi), jnp.asarray(a_lo)
m_d = jnp.asarray(m_f32)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    # force sync via tiny fetch (block_until_ready doesn't sync on tunnel)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:30s} {dt:8.2f} ms", file=sys.stderr)
    return dt

lk = jax.jit(lambda hi, lo: lookup(table, s1, s2, hi.reshape(-1), lo.reshape(-1)))
timeit("lookup exact (RxWmax keys)", lk, e_hi_d, e_lo_d)

des = jax.jit(functools.partial(dense_exact_sums, R=R, B=B, Wmax=Wmax, seed1=s1, seed2=s2))
timeit("dense_exact_sums (lookup+gather)", des, table, plane, e_hi_d, e_lo_d)

daf = jax.jit(functools.partial(dense_amb_firsthit, R=R, B=B, Amax=Amax, seed1=s1, seed2=s2))
timeit("dense_amb_firsthit", daf, table, plane, a_hi_d, a_lo_d)

S, C = des(table, plane, e_hi_d, e_lo_d)
S = jax.block_until_ready(S)
fin = jax.jit(functools.partial(finish_scores, B=B, K=K, k=k, log_eps=float(placer.log_eps)))
timeit("finish_scores (corr+LWR+topk)", fin, S, C, m_d)

full = functools.partial(
    _place_batch_device_densedb, R=R, B=B, K=K, Wmax=Wmax, Amax=Amax, k=k,
    seed1=s1, seed2=s2, log_eps=float(placer.log_eps), eps=float(placer.eps),
)
timeit("FULL dense device step", full, table, plane, e_hi_d, e_lo_d, a_hi_d, a_lo_d, m_d)

# host-side prep costs
t0 = time.time()
for _ in range(10):
    toks2 = placer._tokenize(seqs[:len(set(seqs))])
print(f"{'host tokenize':30s} {(time.time()-t0)/10*1e3:8.2f} ms", file=sys.stderr)
t0 = time.time()
for _ in range(10):
    placer._key_matrix(toks.exact_keys, toks.exact_read, R, Wmax)
print(f"{'host key_matrix':30s} {(time.time()-t0)/10*1e3:8.2f} ms", file=sys.stderr)

out = full(table, plane, e_hi_d, e_lo_d, a_hi_d, a_lo_d, m_d)
t0 = time.time()
for _ in range(10):
    arr = np.asarray(out)
print(f"{'fetch packed output':30s} {(time.time()-t0)/10*1e3:8.2f} ms", file=sys.stderr)

from epik_tpu.engine.placer import unpack_outputs
u = unpack_outputs(np.asarray(out), K)
m_signed = (toks.seq_lengths - placer.k + 1)
t0 = time.time()
for _ in range(10):
    placer._assemble(list(dict.fromkeys(seqs)), {}, m_signed, u[0], u[1], u[2], u[3], u[4], u[5], K)
print(f"{'host assemble':30s} {(time.time()-t0)/10*1e3:8.2f} ms", file=sys.stderr)

# --- new host-lookup dense path -------------------------------------------
from epik_tpu.engine.placer import _place_batch_dense_rows
t0 = time.time()
for _ in range(10):
    rows_m = placer._rows_matrix(toks.exact_keys, toks.exact_read, R, Wmax)
print(f"{'host rows_matrix (searchsorted)':30s} {(time.time()-t0)/10*1e3:8.2f} ms", file=sys.stderr)
arows_m = placer._rows_matrix(toks.amb_keys, toks.amb_read, R, 0)
full_rows = functools.partial(
    _place_batch_dense_rows, R=R, B=B, K=K, Wmax=Wmax, Amax=0, k=k,
    log_eps=float(placer.log_eps), eps=float(placer.eps),
)
rows_d = jnp.asarray(rows_m); arows_d = jnp.asarray(arows_m)
timeit("FULL dense-rows step (Amax=0)", full_rows, plane, rows_d, arows_d, m_d)

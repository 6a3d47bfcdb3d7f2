"""Sub-stage timings of the on-device tokenizer (R=8192, 150bp).

Separates: 2-bit unpack + key build (VPU), the direct-table element
gather, and the element-gather size sweep that the amino radix path's
cost model depends on.

Run: python -m epik_tpu.tools.profile_tokenize
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ..engine.placer import _tokenize_core, pack_reads

    log(f"backend: {jax.default_backend()}")
    R, Lmax, k = 8192, 152, 10
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (R, Lmax)).astype(np.uint8)
    lens = np.full(R, 150, np.int64)
    buf = jnp.asarray(pack_reads(codes, lens))
    N = 409_954
    direct = jnp.asarray(rng.integers(0, N, 4**k, dtype=np.int32))

    reps = 10

    def timeit(name, f, *args):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t = time.time()
        for _ in range(reps):
            out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t) / reps
        log(f"{name:40s} {dt*1000:7.2f} ms")
        return dt

    core = jax.jit(functools.partial(_tokenize_core, k=k, Lmax=Lmax))

    @jax.jit
    def core_only(buf):
        key, ok, c, lens = _tokenize_core(buf, k=k, Lmax=Lmax)
        return key.sum() + ok.sum() + lens.sum()

    @jax.jit
    def core_plus_direct(buf, direct):
        key, ok, c, lens = _tokenize_core(buf, k=k, Lmax=Lmax)
        rows = jnp.take(direct, key.astype(jnp.int32), axis=0)
        return rows.sum() + ok.sum()

    timeit("tokenize core (unpack+keys+ok)", core_only, buf)
    timeit("core + direct gather", core_plus_direct, buf, direct)

    # element-gather size sweep (8 gathers per dispatch, summed)
    N_IDX = 1_250_000

    @functools.partial(jax.jit, static_argnames=("reps",))
    def gather_sum(table, idx, reps=8):
        def body(i, acc):
            g = jnp.take(table, (idx + i) & (table.shape[0] - 1), axis=0)
            return acc + jnp.sum(g, dtype=jnp.int32)

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    for mb in (1, 4, 16, 64, 256):
        n = (mb << 20) // 4
        table = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n, N_IDX, dtype=np.int32))
        out = gather_sum(table, idx)
        np.asarray(out)
        t = time.time()
        out = gather_sum(table, idx)
        np.asarray(out)
        dt = (time.time() - t) / 8
        log(f"elem gather, table {mb:4d} MB: {dt*1e3:7.2f} ms/1.25M "
            f"({dt/N_IDX*1e9:5.2f} ns/elem)")


if __name__ == "__main__":
    main()

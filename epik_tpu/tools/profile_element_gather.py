"""Element-gather speed vs table size (the amino device-lookup premise).

The nucl fast path's direct-address lookup (4 MB int32 table, ~1M element
gathers per batch) costs ~1 ms -- vector-gather speed, NOT one DMA per
element.  The amino device path needs the same primitive against an
open-addressing hash table (8 MB) + key-check arrays (3 MB): this sweep
measures where the fast element-gather regime ends.

Run: python -m epik_tpu.tools.profile_element_gather
"""

from __future__ import annotations

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
    log(f"backend: {jax.default_backend()}")

    N_IDX = 1_250_000  # ~8192 reads x 153 windows
    rng = np.random.default_rng(0)

    import functools

    @functools.partial(jax.jit, static_argnames=("reps",))
    def gather_sum(table, idx, reps=8):
        # fori_loop with a perturbed index defeats CSE; one scalar out
        def body(i, acc):
            g = table[(idx + i) & (table.shape[0] - 1)]
            return acc + jnp.sum(g, dtype=jnp.int32)

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    for mb in (1, 4, 8, 16, 32, 64, 128, 512):
        n = (mb << 20) // 4
        table = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n, N_IDX, dtype=np.int32))
        out = gather_sum(table, idx)
        np.asarray(out)
        t = time.time()
        out = gather_sum(table, idx)
        np.asarray(out)
        dt = (time.time() - t) / 8
        log(f"table {mb:4d} MB: {dt*1e3:7.2f} ms / {N_IDX/1e6:.2f}M gathers "
            f"= {dt/N_IDX*1e9:6.2f} ns/elem")


if __name__ == "__main__":
    main()

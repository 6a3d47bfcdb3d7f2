"""Microbenchmarks for the axon-tunnel TPU: transfer latency/bandwidth,
H2D/compute overlap, and dense-plane gather variants.

    python -m epik_tpu.tools.profile_tunnel
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

    log(f"backend: {jax.default_backend()}")

    # --- H2D transfer: size sweep ---------------------------------------------
    for sz in (8 << 10, 64 << 10, 256 << 10, 1 << 20, 4 << 20):
        a = np.random.randint(0, 255, size=sz, dtype=np.uint8)
        d = jnp.asarray(a); d.block_until_ready()  # warm path
        t = time.time()
        N = 5
        for _ in range(N):
            d = jnp.asarray(a)
            d.block_until_ready()
        dt = (time.time() - t) / N
        log(f"H2D {sz/1024:8.0f} KB: {dt*1000:7.2f} ms  ({sz/dt/1e6:7.1f} MB/s)")

    # --- 1 array vs 3 arrays of same total ------------------------------------
    a1 = np.zeros(1 << 20, np.uint8)
    parts = [np.zeros(1 << 20 - 2, np.uint8) for _ in range(3)]
    jnp.asarray(a1).block_until_ready()
    t = time.time()
    for _ in range(5):
        jnp.asarray(a1).block_until_ready()
    log(f"1x1MB: {(time.time()-t)/5*1000:.2f} ms")
    t = time.time()
    for _ in range(5):
        ds = [jnp.asarray(p) for p in parts]
        for d in ds:
            d.block_until_ready()
    log(f"3x256KB: {(time.time()-t)/5*1000:.2f} ms")

    # --- D2H --------------------------------------------------------------------
    for sz in (64 << 10, 1 << 20):
        d = jnp.zeros(sz, jnp.uint8); d.block_until_ready()
        np.asarray(d)
        t = time.time()
        for _ in range(5):
            np.asarray(d)
        dt = (time.time() - t) / 5
        log(f"D2H {sz/1024:8.0f} KB: {dt*1000:7.2f} ms ({sz/dt/1e6:7.1f} MB/s)")

    # --- does H2D overlap device compute? --------------------------------------
    big = jnp.zeros((4096, 4096), jnp.float32)

    @jax.jit
    def burn(x):
        for _ in range(60):
            x = x @ x * 1e-3
        return x

    burn(big).block_until_ready()
    t = time.time()
    r = burn(big)
    r.block_until_ready()
    t_burn = time.time() - t
    log(f"burn alone: {t_burn*1000:.1f} ms")
    payload = np.zeros(1 << 20, np.uint8)
    t = time.time()
    r = burn(big)  # async dispatch
    d = jnp.asarray(payload)  # H2D while computing?
    d.block_until_ready()
    t_x = time.time() - t
    r.block_until_ready()
    t_both = time.time() - t
    log(f"burn + 1MB H2D: xfer_done={t_x*1000:.1f} ms total={t_both*1000:.1f} ms "
        f"(overlap={'yes' if t_both < t_burn * 1.3 + 0.01 else 'NO'})")

    # --- dense gather variants at bench shape ----------------------------------
    n_rows, bw = 410_000 + 1, 1408
    R, W = 2000, 160
    plane = jnp.asarray(
        np.random.uniform(-10, 0, size=(n_rows, bw)).astype(np.float32)
    )
    rows = jnp.asarray(np.random.randint(0, n_rows, size=(R, W), dtype=np.int32))
    gb = R * W * bw * 4 / 1e9

    from functools import partial

    @partial(jax.jit, static_argnames=("w_ch",))
    def xla_gather(plane, rows, w_ch: int):
        f32, i32 = jnp.float32, jnp.int32

        def body(i, acc):
            S, C = acc
            chunk = jax.lax.dynamic_slice(rows, (0, i * w_ch), (R, w_ch))
            g = plane[chunk]
            return S + jnp.sum(g, axis=1), C + jnp.sum((g != 0).astype(i32), axis=1)

        S, C = jax.lax.fori_loop(
            0, W // w_ch, body,
            (jnp.zeros((R, bw), f32), jnp.zeros((R, bw), i32)),
        )
        return S, C

    for w_ch in (8, 16, 32, 80, 160):
        if W % w_ch:
            continue
        S, C = xla_gather(plane, rows, w_ch)
        S.block_until_ready()
        t = time.time()
        for _ in range(5):
            S, C = xla_gather(plane, rows, w_ch)
            S.block_until_ready()
        dt = (time.time() - t) / 5
        log(f"xla gather w_ch={w_ch:4d}: {dt*1000:6.1f} ms ({gb/dt:5.0f} GB/s)")

    # single flat take variant
    @jax.jit
    def xla_flat(plane, rows):
        g = jnp.take(plane, rows.reshape(-1), axis=0).reshape(R, W, bw)
        return jnp.sum(g, axis=1), jnp.sum((g != 0).astype(jnp.int32), axis=1)

    S, C = xla_flat(plane, rows); S.block_until_ready()
    t = time.time()
    for _ in range(3):
        S, C = xla_flat(plane, rows)
        S.block_until_ready()
    dt = (time.time() - t) / 3
    log(f"xla flat take:        {dt*1000:6.1f} ms ({gb/dt:5.0f} GB/s)")


if __name__ == "__main__":
    main()

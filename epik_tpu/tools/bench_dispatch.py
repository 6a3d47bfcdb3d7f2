"""Separate per-dispatch tunnel overhead from true device compute.

The axon remote tunnel costs tens of ms per jitted dispatch (RPC +
argument upload), which masks kernel time in naive timings.  This tool
times a program that repeats the dense-plane gather X times internally
(fori_loop carrying the accumulator): wall(X) = dispatch + X * t_gather,
so the slope between two X values is the true device time.

Run: python -m epik_tpu.tools.bench_dispatch
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
    log(f"backend: {jax.default_backend()}")

    N_ROWS = 409_955
    BW = 1408
    R, W = 2048, 160

    rng = np.random.default_rng(0)
    plane = np.zeros((N_ROWS, BW), np.float32)
    nz_cols = rng.integers(0, 1303, size=(N_ROWS, 12))
    plane[np.arange(N_ROWS)[:, None], nz_cols] = rng.uniform(
        0.5, 6.0, size=(N_ROWS, 12)
    ).astype(np.float32)
    plane[-1] = 0.0
    rows = rng.integers(0, N_ROWS - 1, size=(R, W)).astype(np.int32)
    rows[:, 141:] = N_ROWS - 1

    d_plane = jnp.asarray(plane)
    d_plane_bf = jnp.asarray(plane.astype(jnp.bfloat16))
    d_rows = jnp.asarray(rows)
    np.asarray(jnp.sum(d_plane[:1]))  # force upload completion

    @functools.partial(jax.jit, static_argnames=("reps", "w_ch", "counts"))
    def repeat_gather(plane_s, rows, reps: int, w_ch: int, counts: bool):
        f32, i32 = jnp.float32, jnp.int32
        bw = plane_s.shape[1]

        def one(x, S0, C0):
            def body(i, acc):
                S, C = acc
                chunk = jax.lax.dynamic_slice(rows, (0, i * w_ch), (R, w_ch))
                # + x breaks CSE across outer reps
                g = plane_s[(chunk + x) % N_ROWS]
                S = S + jnp.sum(g.astype(f32), axis=1)
                if counts:
                    C = C + jnp.sum((g != 0).astype(i32), axis=1)
                return S, C

            return jax.lax.fori_loop(0, W // w_ch, body, (S0, C0))

        def outer(x, acc):
            return one(x, *acc)

        S, C = jax.lax.fori_loop(
            0, reps, outer,
            (jnp.zeros((R, bw), f32), jnp.zeros((R, bw), i32)),
        )
        return S[:8, :128]  # tiny output: fetch is cheap and forces the work

    def wall(fn, *args, n=3):
        out = fn(*args)
        np.asarray(out)
        t = time.time()
        for _ in range(n):
            out = fn(*args)
            np.asarray(out)
        return (time.time() - t) / n

    cases = [
        ("f32", d_plane, True, 32),   # current production formulation
        ("f32", d_plane, False, 32),  # adjusted plane (no counts)
        ("f32", d_plane, False, 8),
        ("bf16", d_plane_bf, False, 32),
    ]
    for name, pl, counts, w_ch in cases:
        t1 = wall(functools.partial(repeat_gather, reps=1, w_ch=w_ch,
                                    counts=counts), pl, d_rows)
        t8 = wall(functools.partial(repeat_gather, reps=8, w_ch=w_ch,
                                    counts=counts), pl, d_rows)
        per = (t8 - t1) / 7
        gbps = R * W * (BW * (4 if name == "f32" else 2)) / per / 1e9
        log(f"{name} counts={counts} w_ch={w_ch:3d}: "
            f"X1 {t1*1000:6.1f} ms, X8 {t8*1000:6.1f} ms "
            f"-> gather {per*1000:6.2f} ms ({gbps:5.0f} GB/s)")

    # dispatch-only floor: trivial program, device-resident arg
    @jax.jit
    def triv(x):
        return x + 1.0

    small = jnp.zeros((8, 128), jnp.float32)
    t = wall(triv, small, n=10)
    log(f"trivial dispatch+fetch round trip: {t*1000:.1f} ms")

    # dispatch cost with a fresh 1.3 MB host arg per call (upload path)
    t1 = wall(functools.partial(repeat_gather, reps=1, w_ch=32, counts=False),
              d_plane, d_rows)

    def fresh():
        return repeat_gather(d_plane, jnp.asarray(rows), reps=1, w_ch=32,
                             counts=False)

    t_f = wall(lambda: fresh())
    log(f"X1 device-resident rows: {t1*1000:.1f} ms | fresh numpy rows: "
        f"{t_f*1000:.1f} ms (upload adds {(t_f-t1)*1000:.1f} ms)")


if __name__ == "__main__":
    main()

"""On-chip experiments for the dense-plane hot loop.

Measures device-step variants for the D652 bench shape (R=2048 reads,
W=160 window rows, plane (410k, 1408) f32) to pick the fastest formulation:

  a. current: one gather per chunk, two reduces (S sum + count of nonzero)
  b. adjusted-plane: plane holds s - log10(eps); ONE reduce serves
     correction + touched test (C never materialized on device)
  c. chunk-width sweep for (b)
  d. one whole-batch gather, no fori_loop
  e. bf16 plane (traffic reference point only)

Run: python -m epik_tpu.tools.bench_gather_variants
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

    N_ROWS = 409_955  # bench DB kmers + 1 zero row
    BW = 1408  # 1303 branches padded to 128 multiple
    R, W = 2048, 160

    rng = np.random.default_rng(0)
    # ~12 nonzero postings per row like the bench DB.  The plane is BUILT ON
    # DEVICE from the postings (exactly like JaxPlacer) -- uploading a
    # materialized 2.3 GB plane through the remote tunnel takes tens of
    # minutes and can wedge entirely.
    nz_rows = np.repeat(np.arange(N_ROWS - 1, dtype=np.int32), 12)
    nz_cols = rng.integers(0, 1303, size=(N_ROWS - 1) * 12).astype(np.int32)
    vals = rng.uniform(0.5, 6.0, size=(N_ROWS - 1) * 12).astype(np.float32)
    rows = rng.integers(0, N_ROWS - 1, size=(R, W)).astype(np.int32)
    # ~12% padding rows hit the zero row, like Wmax bucketing
    rows[:, 141:] = N_ROWS - 1

    @jax.jit
    def build_plane(r, c, v):
        return jnp.zeros((N_ROWS, BW), jnp.float32).at[r, c].set(v)

    d_plane = build_plane(jnp.asarray(nz_rows), jnp.asarray(nz_cols), jnp.asarray(vals))
    d_plane.block_until_ready()
    log("plane built on device")
    d_rows = jnp.asarray(rows)
    d_plane_bf16 = d_plane.astype(jnp.bfloat16)

    useful_gb = R * W * BW * 4 / 1e9

    def sync(out):
        # block_until_ready does NOT synchronize on the remote-tunnel
        # backend; a device->host fetch of the raw output does (and adds
        # no new device program, so no fresh remote compile)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    def timeit(name, fn, *args, reps=10):
        out = fn(*args)
        sync(out)
        t = time.time()
        sync(out)  # pure re-fetch: measures the sync cost itself
        fetch_lat = time.time() - t
        t = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t - fetch_lat) / reps
        log(f"{name:44s} {dt*1000:7.2f} ms  ({useful_gb/dt:6.0f} GB/s useful, "
            f"fetch {fetch_lat*1000:.1f} ms)")
        return dt

    # --- a. current two-reduce formulation -------------------------------------
    @functools.partial(jax.jit, static_argnames=("w_ch",))
    def two_reduce(plane_s, rows, w_ch=32):
        f32, i32 = jnp.float32, jnp.int32

        def body(i, acc):
            S, C = acc
            chunk = jax.lax.dynamic_slice(rows, (0, i * w_ch), (R, w_ch))
            g = plane_s[chunk]
            return S + jnp.sum(g, axis=1), C + jnp.sum((g != 0).astype(i32), axis=1)

        S, C = jax.lax.fori_loop(
            0, W // w_ch, body,
            (jnp.zeros((R, BW), f32), jnp.zeros((R, BW), i32)),
        )
        return S, C

    # --- b. adjusted plane: single reduce ---------------------------------------
    @functools.partial(jax.jit, static_argnames=("w_ch",))
    def one_reduce(plane_s, rows, w_ch=32):
        f32 = jnp.float32

        def body(i, S):
            chunk = jax.lax.dynamic_slice(rows, (0, i * w_ch), (R, w_ch))
            g = plane_s[chunk]
            return S + jnp.sum(g.astype(f32), axis=1)

        return jax.lax.fori_loop(0, W // w_ch, body, jnp.zeros((R, BW), f32))

    # --- d. whole-batch gather ---------------------------------------------------
    @jax.jit
    def whole(plane_s, rows):
        g = plane_s[rows]  # (R, W, BW)
        return jnp.sum(g, axis=1)

    # --- f. int16 quantized plane: int32 accumulate (precision="int16") --------
    @functools.partial(jax.jit, static_argnames=("w_ch",))
    def one_reduce_i16(plane_q, rows, w_ch=32):
        i32 = jnp.int32

        def body(i, S):
            chunk = jax.lax.dynamic_slice(rows, (0, i * w_ch), (R, w_ch))
            return S + jnp.sum(plane_q[chunk], axis=1, dtype=i32)

        S = jax.lax.fori_loop(0, W // w_ch, body, jnp.zeros((R, BW), i32))
        return S.astype(jnp.float32) / jnp.float32(7500.0)

    d_plane_i16 = jnp.clip(jnp.round(d_plane * 5000.0), 0, 32000).astype(jnp.int16)
    d_plane_i16.block_until_ready()

    timeit("a. two-reduce w_ch=32 (current)", two_reduce, d_plane, d_rows)
    for w_ch in (8, 16, 32, 64, 160):
        timeit(f"b. one-reduce w_ch={w_ch}", functools.partial(one_reduce, w_ch=w_ch),
               d_plane, d_rows)
    timeit("d. whole-batch gather+sum", whole, d_plane, d_rows)
    timeit("e. one-reduce bf16 w_ch=32", one_reduce, d_plane_bf16, d_rows)
    for w_ch in (8, 16, 32, 64, 160):
        timeit(f"f. one-reduce int16 w_ch={w_ch}",
               functools.partial(one_reduce_i16, w_ch=w_ch), d_plane_i16, d_rows)


if __name__ == "__main__":
    main()

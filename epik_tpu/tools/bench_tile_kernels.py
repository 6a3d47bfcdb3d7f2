"""Packed-tile MXU kernel variant sweep (round-4 ask #2).

The packed big-tree step spends ~43 of 61 ms in the accumulate kernel
(profile_tiles_fused.py).  This sweeps kernel formulations on the real
chip at the config-4 shape:

  base2   two bf16 digit matmuls (the shipped kernel)
  base1   ONE digit matmul only -- NOT correct, discriminates MXU-pass
          share from one-hot-construction share
  comb    one (nh x ch) @ (ch x 256) matmul with both digit planes packed
          into the lane axis (N=256: better MXU utilization, same MACs)
  grids   (tr, ch) sweep of the winner under a VMEM estimate guard

Run: python -m epik_tpu.tools.bench_tile_kernels
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
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log(f"backend: {jax.default_backend()}")

    B = 19999
    R = 4096
    PP = 4608  # W=143 x PT=32, padded
    NH_LANES = 128
    nh = (B + 1 + NH_LANES - 1) // NH_LANES
    bw = nh * NH_LANES
    trash = bw - 1

    rng = np.random.default_rng(0)
    g_np = ((rng.integers(0, B, (R, PP)).astype(np.int32) << 16)
            | rng.integers(1, 64000, (R, PP)).astype(np.int32))
    g = jnp.asarray(g_np)

    reps = 8

    def timeit(name, f, *xs):
        try:
            out = f(*xs)
            out.block_until_ready()
        except Exception as e:
            log(f"{name:40s}   FAILED ({str(e)[:80]})")
            return None
        t = time.time()
        for _ in range(reps):
            out = f(*xs)
        out.block_until_ready()
        dt = (time.time() - t) / reps
        log(f"{name:40s} {dt*1000:8.1f} ms")
        return dt

    def make(kernel, tr, ch, out_mul=1):
        grid = (R // tr, PP // ch)

        @jax.jit
        def f(g):
            return pl.pallas_call(
                functools.partial(kernel, nh=nh),
                grid=grid,
                in_specs=[pl.BlockSpec((tr, ch), lambda i, j: (i, j))],
                out_specs=pl.BlockSpec((tr, bw * out_mul), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R, bw * out_mul), jnp.float32),
            )(g)

        return f

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    i32 = jnp.int32

    def k_base2(p_ref, out_ref, *, nh):
        tr, ch = p_ref.shape

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = p_ref[:]
        b = g >> 16
        q = g & 0xFFFF
        bhi = b >> 7
        blo = b & 127
        qh = (q >> 8).astype(f32)
        ql = (q & 255).astype(f32)
        lo_hit = (blo[:, :, None]
                  == jax.lax.broadcasted_iota(i32, (tr, ch, 128), 2))
        ohi = (bhi[:, :, None]
               == jax.lax.broadcasted_iota(i32, (tr, ch, nh), 2)).astype(bf16)
        olo_qh = jnp.where(lo_hit, qh[:, :, None], f32(0)).astype(bf16)
        olo_ql = jnp.where(lo_hit, ql[:, :, None], f32(0)).astype(bf16)
        dn = (((1,), (1,)), ((0,), (0,)))
        acc_h = jax.lax.dot_general(ohi, olo_qh, dn,
                                    preferred_element_type=f32)
        acc_l = jax.lax.dot_general(ohi, olo_ql, dn,
                                    preferred_element_type=f32)
        out_ref[:] += (acc_h * 256.0 + acc_l).reshape(tr, nh * 128)

    def k_base1(p_ref, out_ref, *, nh):
        # WRONG result (single digit) -- timing discriminator only
        tr, ch = p_ref.shape

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = p_ref[:]
        b = g >> 16
        q = g & 0xFFFF
        bhi = b >> 7
        blo = b & 127
        ql = (q & 255).astype(f32)
        lo_hit = (blo[:, :, None]
                  == jax.lax.broadcasted_iota(i32, (tr, ch, 128), 2))
        ohi = (bhi[:, :, None]
               == jax.lax.broadcasted_iota(i32, (tr, ch, nh), 2)).astype(bf16)
        olo_ql = jnp.where(lo_hit, ql[:, :, None], f32(0)).astype(bf16)
        dn = (((1,), (1,)), ((0,), (0,)))
        acc_l = jax.lax.dot_general(ohi, olo_ql, dn,
                                    preferred_element_type=f32)
        out_ref[:] += acc_l.reshape(tr, nh * 128)

    def k_comb(p_ref, out_ref, *, nh):
        # both digit planes packed along the lane axis: one N=256 matmul;
        # out block is (tr, 2*bw): [hi-digit sums | lo-digit sums]
        tr, ch = p_ref.shape

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        g = p_ref[:]
        b = g >> 16
        q = g & 0xFFFF
        bhi = b >> 7
        blo = b & 127
        qh = (q >> 8).astype(f32)
        ql = (q & 255).astype(f32)
        col = jax.lax.broadcasted_iota(i32, (tr, ch, 256), 2)
        hit = blo[:, :, None] == (col & 127)
        dig = jnp.where(col < 128, qh[:, :, None], ql[:, :, None])
        rhs = jnp.where(hit, dig, f32(0)).astype(bf16)
        ohi = (bhi[:, :, None]
               == jax.lax.broadcasted_iota(i32, (tr, ch, nh), 2)).astype(bf16)
        dn = (((1,), (1,)), ((0,), (0,)))
        acc = jax.lax.dot_general(ohi, rhs, dn, preferred_element_type=f32)
        # acc: (tr, nh, 256) -> split lanes
        acc_h = acc[:, :, :128].reshape(tr, nh * 128)
        acc_l = acc[:, :, 128:].reshape(tr, nh * 128)
        out_ref[:, : nh * 128] += acc_h
        out_ref[:, nh * 128 :] += acc_l

    def run_comb(tr, ch):
        f = make(k_comb, tr, ch, out_mul=2)

        @jax.jit
        def g2(g):
            o = f(g)
            return o[:, :bw] * 256.0 + o[:, bw:]

        return g2

    t2 = timeit("base2 tr=8 ch=512 (shipped)", make(k_base2, 8, 512), g)
    timeit("base1 tr=8 ch=512 (single digit)", make(k_base1, 8, 512), g)
    timeit("comb  tr=8 ch=512", run_comb(8, 512), g)
    for tr, ch in [(8, 1024), (16, 1024), (4, 2048), (8, 2048), (2, 4608),
                   (4, 4608), (8, 4608), (16, 512), (16, 2048)]:
        # VMEM estimate: one-hot nh*2B + rhs 256*2B + f32 temps ~128*8B per
        # posting cell, x tr x ch, plus double-buffered out 2*tr*2bw*4
        est = tr * ch * (nh * 2 + 256 * 2 + 128 * 8) + 2 * tr * 2 * bw * 4
        if est > 13 << 20:
            log(f"comb  tr={tr} ch={ch}  skipped (vmem est {est >> 20} MiB)")
            continue
        timeit(f"comb  tr={tr} ch={ch}", run_comb(tr, ch), g)

    # correctness spot-check of comb against a numpy scatter on 64 rows
    def ref_sums(gn):
        b = gn >> 16
        q = gn & 0xFFFF
        S = np.zeros((gn.shape[0], bw), np.float64)
        for r in range(gn.shape[0]):
            np.add.at(S[r], b[r], q[r])
        return S

    want = ref_sums(g_np[:64])
    got = np.asarray(run_comb(8, 512)(g))[:64]
    np.testing.assert_allclose(got, want, rtol=0, atol=0.5)
    log("comb correctness: OK (exact integer sums)")


if __name__ == "__main__":
    main()

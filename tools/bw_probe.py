#!/usr/bin/env python
"""HBM bandwidth microbenchmarks (VERDICT r03 #2).

Measures what DMA patterns this v5e chip actually sustains, to compare
against the SGM sweeps' ~300 GB/s effective streaming rate (PERF.md)
vs the chip's ~819 GB/s spec. Patterns:

- ``copy``: HBM -> VMEM -> HBM streaming copy, contiguous blocks,
  nbuf-deep ring buffering (the sweeps' structure minus compute).
- ``read``: HBM -> VMEM only (one VPU add per block keeps it live).
- ``write``: VMEM -> HBM only.
- ``strided``: the sweeps' exact in-DMA shape — (St, K, Dp) blocks
  from a (Sp, Tp, Dp) volume, rows strided by Tp*Dp*4 bytes.
- ``copy2``: two independent copy streams in flight per iteration
  (tests whether concurrent DMA queues add bandwidth).

Timing uses the forced-completion amortized protocol (bench.py):
N dispatches + one device->host readback of a reduction.

Usage: python tools/bw_probe.py [pattern ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 96 * 1024 * 1024


def _stream_kernel(mode, nbuf, nblk, blk_rows, blk_cols):
    """Build a streaming kernel body: x is (nblk*blk_rows, blk_cols)."""

    def kernel(x_hbm, y_hbm, chk, bufs, in_sems, out_sems):
        def in_dma(slot, t):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                bufs.at[slot], in_sems.at[slot])

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                bufs.at[slot],
                y_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                out_sems.at[slot])

        chk[0, 0] = 0.0
        if mode == "write":
            bufs[:] = jnp.ones_like(bufs)
        else:
            for i in range(nbuf - 1):
                in_dma(i, i).start()

        def body(t, _):
            slot = jax.lax.rem(t, nbuf)
            if mode == "write":
                @pl.when(t >= nbuf)
                def _():
                    out_dma(slot, t - nbuf).wait()
                out_dma(slot, t).start()
                return 0
            # keep nbuf-1 input DMAs in flight
            @pl.when(t + nbuf - 1 < nblk)
            def _():
                in_dma(jax.lax.rem(t + nbuf - 1, nbuf), t + nbuf - 1).start()
            in_dma(slot, t).wait()
            if mode == "read":
                chk[0, 0] = chk[0, 0] + bufs[slot][0, 0]
                return 0
            # copy: write the block back out
            @pl.when(t >= nbuf)
            def _():
                out_dma(slot, t - nbuf).wait()
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, nblk, body, 0)
        if mode != "read":
            for i in range(min(nbuf, nblk)):
                t = nblk - 1 - i
                out_dma(jax.lax.rem(t, nbuf), t).wait()
            chk[0, 0] = bufs[0][0, 0]

    return kernel


def bench_stream(mode="copy", blk_mb=2.0, nbuf=2, total_mb=512,
                 verbose=True):
    blk_cols = 1280
    blk_rows = max(8, int(blk_mb * 1024 * 1024 / 4 / blk_cols) // 8 * 8)
    blk_bytes = blk_rows * blk_cols * 4
    nblk = max(1, int(total_mb * 1024 * 1024 / blk_bytes))
    x = jnp.ones((nblk * blk_rows, blk_cols), jnp.float32)

    kernel = _stream_kernel(mode, nbuf, nblk, blk_rows, blk_cols)
    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((nbuf, blk_rows, blk_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )
    run = jax.jit(lambda x: call(x))
    _, chk = run(x)
    float(chk[0, 0])  # compile + warm
    N = 5
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            _, chk = run(x)
        float(chk[0, 0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    mult = 1 if mode in ("read", "write") else 2
    gbs = mult * nblk * blk_bytes / best / 1e9
    if verbose:
        print(f"{mode:7s} blk={blk_bytes/1e6:6.2f}MB nbuf={nbuf} "
              f"total={nblk * blk_bytes / 1e6:6.0f}MB "
              f"-> {best * 1e3:7.2f} ms  {gbs:6.1f} GB/s")
    return gbs


def bench_strided(St=256, K=8, Dp=256, Sp=512, Tp=1280, nbuf=2,
                  verbose=True):
    """The hnat sweep's exact input pattern: (St, K, Dp) blocks from a
    (Sp, Tp, Dp) volume; each block is St rows of K*Dp*4 bytes at
    stride Tp*Dp*4."""
    x = jnp.ones((Sp, Tp, Dp), jnp.float32)
    G = Tp // K
    n_st = Sp // St

    def kernel(x_hbm, chk, bufs, in_sems):
        s = pl.program_id(0)

        def in_dma(slot, t):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s * St, St), pl.ds(t * K, K), :],
                bufs.at[slot], in_sems.at[slot])

        for i in range(nbuf - 1):
            in_dma(i, i).start()

        def body(t, _):
            slot = jax.lax.rem(t, nbuf)

            @pl.when(t + nbuf - 1 < G)
            def _():
                in_dma(jax.lax.rem(t + nbuf - 1, nbuf), t + nbuf - 1).start()
            in_dma(slot, t).wait()
            return 0

        jax.lax.fori_loop(0, G, body, 0)
        chk[0, 0] = bufs[0][0, 0, 0]

    call = pl.pallas_call(
        kernel,
        grid=(n_st,),
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((nbuf, St, K, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )
    run = jax.jit(lambda x: call(x))
    chk, = run(x)
    float(chk[0, 0])
    N = 5
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            chk, = run(x)
        float(chk[0, 0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    bytes_total = Sp * Tp * Dp * 4
    gbs = bytes_total / best / 1e9
    if verbose:
        print(f"strided St={St} K={K} Dp={Dp} nbuf={nbuf} "
              f"({St * K * Dp * 4 / 1e6:5.2f}MB blocks, "
              f"{K * Dp * 4 / 1024:5.1f}KB rows) "
              f"-> {best * 1e3:7.2f} ms  {gbs:6.1f} GB/s read")
    return gbs


def bench_copy2(blk_mb=2.0, total_mb=256, verbose=True):
    """Two independent read streams + two write streams in flight."""
    blk_cols = 1280
    blk_rows = max(8, int(blk_mb * 1024 * 1024 / 4 / blk_cols) // 8 * 8)
    blk_bytes = blk_rows * blk_cols * 4
    nblk = max(1, int(total_mb * 1024 * 1024 / blk_bytes))
    x0 = jnp.ones((nblk * blk_rows, blk_cols), jnp.float32)
    x1 = jnp.ones((nblk * blk_rows, blk_cols), jnp.float32) * 2

    def kernel(a_hbm, b_hbm, ya_hbm, yb_hbm, chk, bufa, bufb,
               ia_sems, ib_sems, oa_sems, ob_sems):
        def dmas(slot, t):
            return [
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                    bufa.at[slot], ia_sems.at[slot]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                    bufb.at[slot], ib_sems.at[slot]),
            ]

        def out_dmas(slot, t):
            return [
                pltpu.make_async_copy(
                    bufa.at[slot],
                    ya_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                    oa_sems.at[slot]),
                pltpu.make_async_copy(
                    bufb.at[slot],
                    yb_hbm.at[pl.ds(t * blk_rows, blk_rows), :],
                    ob_sems.at[slot]),
            ]

        for d in dmas(0, 0):
            d.start()

        def body(t, _):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nblk)
            def _():
                for d in dmas(jax.lax.rem(t + 1, 2), t + 1):
                    d.start()
            for d in dmas(slot, t):
                d.wait()

            @pl.when(t >= 2)
            def _():
                for d in out_dmas(slot, t - 2):
                    d.wait()
            for d in out_dmas(slot, t):
                d.start()
            return 0

        jax.lax.fori_loop(0, nblk, body, 0)
        for i in range(min(2, nblk)):
            t = nblk - 1 - i
            for d in out_dmas(jax.lax.rem(t, 2), t):
                d.wait()
        chk[0, 0] = bufa[0][0, 0] + bufb[0][0, 0]

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(x0.shape, x0.dtype),
                   jax.ShapeDtypeStruct(x1.shape, x1.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, blk_rows, blk_cols), jnp.float32),
            pltpu.VMEM((2, blk_rows, blk_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )
    run = jax.jit(lambda a, b: call(a, b))
    _, _, chk = run(x0, x1)
    float(chk[0, 0])
    N = 5
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            _, _, chk = run(x0, x1)
        float(chk[0, 0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    gbs = 4 * nblk * blk_bytes / best / 1e9
    if verbose:
        print(f"copy2   blk={blk_bytes/1e6:6.2f}MB x2 streams "
              f"-> {best * 1e3:7.2f} ms  {gbs:6.1f} GB/s (2r+2w)")
    return gbs


def marginal(label, fn, small, large, unit_bytes):
    """Two-size marginal rate: slope of time vs bytes removes the
    host-side dispatch interval (0.9-3.6 ms/call on the axon tunnel),
    which poisons any absolute measurement under a few GB/call —
    r02's '232-237 GB/s microbench ceiling' was exactly this artifact."""
    t1 = fn(small)
    t2 = fn(large)
    gbs = (large - small) * unit_bytes / (t2 - t1) / 1e9
    print(f"{label}: marginal {gbs:6.1f} GB/s "
          f"({small}->{large} units, {t1*1e3:.2f}->{t2*1e3:.2f} ms)")
    return gbs


def main():
    pats = sys.argv[1:] or ["read", "write", "copy", "strided", "copy2",
                            "marginal"]
    print(f"device: {jax.devices()[0]}")
    if "read" in pats:
        for nbuf in (2, 3, 4):
            bench_stream("read", blk_mb=2.0, nbuf=nbuf, total_mb=2048)
        for blk in (0.5, 4.0, 8.0):
            bench_stream("read", blk_mb=blk, nbuf=3, total_mb=2048)
    if "write" in pats:
        bench_stream("write", blk_mb=2.0, nbuf=2, total_mb=2048)
        bench_stream("write", blk_mb=2.0, nbuf=3, total_mb=2048)
    if "copy" in pats:
        for nbuf in (2, 3, 4):
            bench_stream("copy", blk_mb=2.0, nbuf=nbuf, total_mb=2048)
    if "strided" in pats:
        # the sweeps' shape: St rows of K*Dp*4 bytes at the row stride
        bench_strided(St=256, K=8, Dp=256, Sp=1024, Tp=2560, nbuf=2)
        bench_strided(St=256, K=8, Dp=256, Sp=1024, Tp=2560, nbuf=3)
        bench_strided(St=64, K=8, Dp=256, Sp=1024, Tp=2560, nbuf=2)
    if "copy2" in pats:
        bench_copy2(blk_mb=2.0, total_mb=1024)
    if "marginal" in pats:
        import functools

        def t_read(total_mb):
            g = bench_stream("read", blk_mb=2.0, nbuf=3, total_mb=total_mb,
                             verbose=False)
            return total_mb * 1024 * 1024 / (g * 1e9)

        def t_copy(total_mb):
            g = bench_stream("copy", blk_mb=2.0, nbuf=3, total_mb=total_mb,
                             verbose=False)
            return 2 * total_mb * 1024 * 1024 / (g * 1e9)

        def t_strided(sp):
            g = bench_strided(St=256, K=8, Dp=256, Sp=sp, Tp=2560,
                              nbuf=2, verbose=False)
            return sp * 2560 * 256 * 4 / (g * 1e9)

        marginal("read   ", t_read, 1024, 4096, 1024 * 1024)
        marginal("copy   ", t_copy, 1024, 4096, 2 * 1024 * 1024)
        marginal("strided", t_strided, 512, 2048, 2560 * 256 * 4)


if __name__ == "__main__":
    main()

"""Thresholded-Gaussian blur kernel (Pallas).

Behavior contract: ``mean2d`` (adcensus.cu:1241-1261) — weighted mean
over a k×k Gaussian window, excluding neighbors whose value differs
from the center pixel by >= alpha2 (= ``-blur_t``), boundary-clipped.
At the KITTI configs k = 49, making this the costliest refinement
stage (11.2 ms of the ~73 ms pipeline in the XLA stencil form).

TPU-native design, shaped by three Mosaic limits bisected on hardware
(PERF.md "negative result" section documents the bisections):
aligned-only DMA offsets, no dynamic lane shifts (dynamic
``pltpu.roll`` miscompiled past two lane tiles when this kernel was
designed — obsolete as of round 5, tools/roll_probe.py, but the
pre-shift design stays: an in-kernel dynamic roll would trade the
~equal prep cost for per-grid-step VPU work in a body already at the
op ceiling), and a ~24-40-tap ceiling on statically-unrolled bodies
at full-row vreg widths.

- grid = (row-tile, kernel-row group of KG=8, kernel-col group of
  KXG=3): both kernel axes are inner grid dimensions, so the output
  block and the weighted-sum/weight-count accumulators keep constant
  indices and stay VMEM-resident for a tile's whole 49×49
  accumulation (the XLA scan materializes that carry to HBM every
  kernel row). 8×3 = 24 taps per body sits exactly at the compiler's
  ceiling.
- the dynamic column-group shift lives in the DMA SOURCE: the padded
  image is materialized as ngx PRE-SHIFTED copies (pads[g] = pad
  shifted g*KXG columns, ~2 MB each), so every DMA offset is aligned
  and the in-group shifts are static lane slices. The row-group
  offset rides the (8-aligned) slab row index.
- the frame pad is a LARGE FINITE value (1e30): out-of-frame taps
  fail the |diff| < alpha2 compare exactly like the reference's
  bounds check (as a NaN pad would), but the masked weight w=0 then
  kills the tap via w*win with no second select (0 * 1e30 == 0,
  whereas 0 * NaN would poison the sum) — one select per tap instead
  of two. Inputs are finite by contract (disparity maps; the XLA
  form in ops/post.py keeps NaN-pad semantics for generic use).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ST = 64   # image rows per tile (128 OOMs the 16M scoped VMEM)
KG = 8    # kernel rows per grid step (sublane-aligned DMA offsets)
KXG = 3   # kernel columns per grid step (8*3 = 24-tap body; KXG=4
          # retimed slower again with the r04 one-select body:
          # 9.74 vs 8.91 ms)


def _blur_kernel(kern_ref, a2_ref, img_ref, pads_hbm, out_ref, acc, cnt,
                 slab, sem, *, ksz, ngr, ngx):
    gt = pl.program_id(0)
    kg = pl.program_id(1)
    kxg = pl.program_id(2)
    Wp = img_ref.shape[1]

    # slab rows y + (kg*KG + j - r), columns from the kxg-th pre-shifted
    # pad copy (covers x + kxg*KXG + i - r at static lane offset i)
    cp = pltpu.make_async_copy(
        pads_hbm.at[kxg, pl.ds(gt * ST + kg * KG, ST + KG), :], slab, sem)
    cp.start()
    img = img_ref[:]
    cp.wait()

    @pl.when((kg == 0) & (kxg == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)
        cnt[:] = jnp.zeros_like(cnt)

    rows_all = slab[:]

    # tail-group waste elimination: ksz is static, so the last row
    # group has exactly lr (not KG) real kernel rows and the last
    # column group lc (not KXG) real columns — emit EXACT-size bodies
    # behind pl.when branches instead of running full 24-tap bodies
    # with zero weights (12.5% wasted rows + 4% wasted columns at the
    # KITTI 49x49 kernel)
    lr = ksz - (ngr - 1) * KG
    lc = ksz - (ngx - 1) * KXG

    def taps(nj, ni):
        a, c = acc[:], cnt[:]
        for j in range(nj):
            dy = kg * KG + j
            rows = jax.lax.slice(rows_all, (j, 0), (j + ST, Wp + KXG - 1))
            for i in range(ni):
                kx = kxg * KXG + i
                kidx = dy * ksz + kx
                win = jax.lax.slice(rows, (0, i), (ST, i + Wp))
                wk = kern_ref[kidx]
                ok = jnp.abs(win - img) < a2_ref[0]  # False for pad taps
                w = jnp.where(ok, wk, 0.0)
                a = a + w * win  # pad taps are finite: w=0 kills them
                c = c + w
        acc[:] = a
        cnt[:] = c

    last_r, last_c = kg == ngr - 1, kxg == ngx - 1
    if lr == KG and lc == KXG:
        taps(KG, KXG)
    elif lr == KG:
        @pl.when(~last_c)
        def _():
            taps(KG, KXG)

        @pl.when(last_c)
        def _():
            taps(KG, lc)
    elif lc == KXG:
        @pl.when(~last_r)
        def _():
            taps(KG, KXG)

        @pl.when(last_r)
        def _():
            taps(lr, KXG)
    else:
        @pl.when(~last_r & ~last_c)
        def _():
            taps(KG, KXG)

        @pl.when(~last_r & last_c)
        def _():
            taps(KG, lc)

        @pl.when(last_r & ~last_c)
        def _():
            taps(lr, KXG)

        @pl.when(last_r & last_c)
        def _():
            taps(lr, lc)

    @pl.when((kg == ngr - 1) & (kxg == ngx - 1))
    def _():
        out_ref[:] = acc[:] / cnt[:]


@functools.partial(jax.jit, static_argnames=("ksz", "interpret"))
def _mean2d_call(img, pads, kern_flat, alpha2, *, ksz, interpret):
    Hp, Wp = img.shape
    ngr = -(-ksz // KG)
    ngx = -(-ksz // KXG)
    return pl.pallas_call(
        functools.partial(_blur_kernel, ksz=ksz, ngr=ngr, ngx=ngx),
        grid=(Hp // ST, ngr, ngx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ST, Wp), lambda t, kr, kx: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ST, Wp), lambda t, kr, kx: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ST, Wp), jnp.float32),
                        pltpu.VMEM((ST, Wp), jnp.float32),
                        pltpu.VMEM((ST + KG, pads.shape[2]), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(kern_flat, jnp.asarray(alpha2, jnp.float32).reshape(1), img, pads)


def mean2d_pallas(img: jnp.ndarray, kernel: jnp.ndarray, alpha2: float,
                  interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`mccnn_tpu.ops.post.mean2d` on TPU."""
    ksz = kernel.shape[0]
    assert ksz % 2 == 1
    r = ksz // 2
    H, W = img.shape
    Hp = -(-H // ST) * ST
    Wp = -(-W // 128) * 128
    ngr = -(-ksz // KG)
    ngx = -(-ksz // KXG)
    img_p = jnp.pad(img.astype(jnp.float32), ((0, Hp - H), (0, Wp - W)),
                    constant_values=1e30)
    # frame pad: far-value taps fail the threshold compare = bounds
    # clipping (see module docstring: finite pad, one select per tap).
    # Sample row/col for (y, dy/kx) is y + d - r; with an r top/left
    # pad the slab row is y + dy and pads[g] column x + i maps to
    # x + g*KXG + i - r. Width aligned to a lane tile.
    WS = -(-(Wp + KXG - 1) // 128) * 128
    reach = ngx * KXG  # pre-shift coverage
    base = jnp.pad(img_p, ((r, ngr * KG + KG - r), (r, reach + WS - Wp - r)),
                   constant_values=1e30)
    pads = jnp.stack([jax.lax.slice_in_dim(base, g * KXG, g * KXG + WS,
                                           axis=1)
                      for g in range(ngx)])
    kern_flat = jnp.asarray(kernel, jnp.float32).reshape(-1)
    out = _mean2d_call(img_p, pads, kern_flat, alpha2, ksz=int(ksz),
                       interpret=interpret)
    return out[:H, :W]

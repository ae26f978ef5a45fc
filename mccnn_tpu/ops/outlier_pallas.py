"""LR-consistency outlier labeling kernel (Pallas).

Behavior contract: ``outlier_detection`` (adcensus.cu:878-918) — per
left-map pixel: MATCH (0) if |d0(x) - d1(x - d0(x))| < 1.1, else
MISMATCH (2) if ANY d has |d - d1(x - d)| < 1.1, else OCCLUSION (1);
pixels whose match column leaves the frame are OCCLUSION.

TPU-native design (the same shape as ops/blur_pallas.py, inside the
same bisected Mosaic limits): grid = (row-tile, disparity group of
DG); the exists/match accumulators stay VMEM-resident across a tile's
whole d-range, the dynamic per-group shift lives in the DMA source
via DG-shifted copies of the left-inf-padded right map (inf fails
every comparison where x - d leaves the frame, exactly like the XLA
form), and each body statically unrolls DG taps of lane-shifted
compares against the center tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ST = 64  # image rows per tile
DG = 24  # disparities per grid step (sweep: 12 -> 2.02 ms, 20 -> 2.00,
         # 24 -> 1.94 at KITTI scale; larger bodies near the compiler ceiling)


def _outlier_kernel(d0_ref, pads_hbm, out_ref, ex, ma, slab, sem, *,
                    D, W, ngd):
    gt = pl.program_id(0)
    dg = pl.program_id(1)
    Wp = d0_ref.shape[1]

    # pads[g][y, x + (DG-1-i)] == pd1[y, x - (g*DG + i) + Dpad]
    cp = pltpu.make_async_copy(
        pads_hbm.at[dg, pl.ds(gt * ST, ST), :], slab, sem)
    cp.start()
    d0 = d0_ref[:]
    cp.wait()

    @pl.when(dg == 0)
    def _():
        ex[:] = jnp.zeros_like(ex)
        ma[:] = jnp.zeros_like(ma)

    rows = slab[:]
    e, m = ex[:], ma[:]
    d0i = d0.astype(jnp.int32)
    for i in range(DG):
        d = dg * DG + i
        live = d < D  # tail group's pad taps are no-ops
        t = jax.lax.slice(rows, (0, DG - 1 - i), (ST, DG - 1 - i + Wp))
        near = jnp.abs(d.astype(jnp.float32) - t) < 1.1
        e = jnp.where(live & near, 1.0, e)
        m = jnp.where(live & (d0i == d) & (jnp.abs(d0 - t) < 1.1), 1.0, m)
    ex[:] = e
    ma[:] = m

    @pl.when(dg == ngd - 1)
    def _():
        x = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
        off_frame = x - d0.astype(jnp.int32) < 0
        out = jnp.where(ex[:] > 0, 2.0, 1.0)  # MISMATCH else OCCLUSION
        out = jnp.where((ma[:] > 0) & ~off_frame, 0.0, out)  # MATCH
        out_ref[:] = jnp.where(off_frame, 1.0, out)


@functools.partial(jax.jit, static_argnames=("disp_max", "interpret"))
def outlier_detection_pallas(d0: jnp.ndarray, d1: jnp.ndarray,
                             disp_max: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`mccnn_tpu.ops.post.outlier_detection` on TPU."""
    H, W = d0.shape
    D = disp_max
    Hp = -(-H // ST) * ST
    Wp = -(-W // 128) * 128
    ngd = -(-D // DG)
    Dpad = ngd * DG
    d0p = jnp.pad(d0.astype(jnp.float32), ((0, Hp - H), (0, Wp - W)))
    WS = -(-(Wp + DG - 1) // 128) * 128  # lane-tile-aligned slab width
    # left-inf pad: taps whose x - d leaves the frame fail every
    # comparison (the XLA form's trick); right inf pad keeps the
    # column-pad region inert and covers the g=0 slab's overhang
    base = jnp.pad(d1.astype(jnp.float32),
                   ((0, Hp - H), (Dpad, WS - W - DG + 1)),
                   constant_values=jnp.inf)
    pads = jnp.stack([
        jax.lax.slice_in_dim(base, Dpad - g * DG - (DG - 1),
                             Dpad - g * DG - (DG - 1) + WS, axis=1)
        for g in range(ngd)])
    out = pl.pallas_call(
        functools.partial(_outlier_kernel, D=D, W=W, ngd=ngd),
        grid=(Hp // ST, ngd),
        in_specs=[
            pl.BlockSpec((ST, Wp), lambda t, g: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ST, Wp), lambda t, g: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ST, Wp), jnp.float32),
                        pltpu.VMEM((ST, Wp), jnp.float32),
                        pltpu.VMEM((ST, WS), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(d0p, pads)
    return out[:H, :W]

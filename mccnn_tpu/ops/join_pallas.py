"""MXU cost-volume construction for the fast arch (Pallas).

Behavior contract: the ``StereoJoin`` kernel (adcensus.cu:1455-1498):
``vol_L[d, y, x] = -<fl[y, x, :], fr[y, x-d, :]>`` and
``vol_R[d, y, x] = -<fr[y, x, :], fl[y, x+d, :]>``.

TPU-native design: the naive per-disparity contraction re-reads both
feature maps from HBM once per disparity (~D x 2 x H x W x C floats —
around 100 GB for KITTI), which makes the CNN stage the slowest part
of the whole pipeline. Here each (row, 128-column tile) grid step:

1. DMAs the row's feature tile (XB, C) and a (XB + D - 1 -> SLAB, C)
   match-side slab into VMEM,
2. computes the banded Gram block B = tile @ slab^T as ONE MXU matmul
   (the only place the FLOPs live),
3. extracts the D needed diagonals with a shear — row i circularly
   rolled by i, done as log2(SLAB) masked power-of-two rolls — after
   which diagonals are columns,
4. writes the (D, XB) volume block.

Feature maps are read once, the volume written once: ~1 GB of traffic
instead of ~100 GB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XB = 128  # output columns per grid step


def _join_one_sided(feat_a: jnp.ndarray, feat_b_pad: jnp.ndarray,
                    disp_max: int, flip: bool, slab_base: int,
                    interpret: bool) -> jnp.ndarray:
    """Raw (unmasked, unnegated) dot volume for one reference side.

    feat_a: (H, Wp, Cp) tile side; feat_b_pad: (H, Wf, Cp) slab side,
    already left-padded so slab reads never go negative.
    Returns (Dp, H, Wp) with vol[d, y, x] = <a[y, x], b[y, x -/+ d]>.
    """
    H, Wp, Cp = feat_a.shape
    D = disp_max
    Dp = -(-D // 128) * 128
    SLAB = XB + Dp  # covers all D shifts of an XB tile, 128-aligned
    YB = 8          # rows per grid step (amortizes per-step overhead)
    Hp = -(-H // YB) * YB
    if Hp != H:
        feat_a = jnp.pad(feat_a, ((0, Hp - H), (0, 0), (0, 0)))
        feat_b_pad = jnp.pad(feat_b_pad, ((0, Hp - H), (0, 0), (0, 0)))

    def kernel(a_ref, b_hbm, out_ref, slab, sem):
        y = pl.program_id(0)
        xb = pl.program_id(1)
        cp = pltpu.make_async_copy(
            b_hbm.at[pl.ds(y * YB, YB), pl.ds(xb * XB + slab_base, SLAB), :],
            slab, sem)
        cp.start()
        a_blk = a_ref[:]  # (YB, XB, Cp)
        cp.wait()
        B = jax.lax.dot_general(
            a_blk, slab[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            # full f32 like the reference CUDA dot (adcensus.cu:1480);
            # default MXU bf16 rounding shifts WTA decisions
            precision=jax.lax.Precision.HIGHEST)  # (YB, XB, SLAB)
        # shear: Bs[y, i, e] = B[y, i, (e + i) mod SLAB]
        # left-ref: out[d, i] = B[i, i + (Dp-1) - d] = Bs[i, Dp-1-d]
        # right-ref: out[d, i] = B[i, i + d]         = Bs[i, d]
        row = jax.lax.broadcasted_iota(jnp.int32, B.shape, 1)
        bit = 1
        while bit < XB:
            rolled = pltpu.roll(B, SLAB - bit, axis=2)
            B = jnp.where((row & bit) != 0, rolled, B)
            bit *= 2
        out_ref[:] = jnp.transpose(B[:, :, :Dp], (0, 2, 1))  # (YB, Dp, XB)

    out = pl.pallas_call(
        kernel,
        grid=(Hp // YB, Wp // XB),
        in_specs=[
            pl.BlockSpec((YB, XB, Cp), lambda y, x: (y, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((YB, Dp, XB), lambda y, x: (y, 0, x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Dp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((YB, SLAB, Cp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(feat_a, feat_b_pad)
    out = jnp.transpose(out[:H], (1, 0, 2))  # (Dp, H, Wp), diag index e
    if flip:
        out = out[::-1]  # e = Dp-1-d  ->  d order
    return out


@functools.partial(jax.jit, static_argnames=("disp_max", "interpret"))
def stereo_join_mxu(feat_l: jnp.ndarray, feat_r: jnp.ndarray,
                    disp_max: int, interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in MXU replacement for :func:`mccnn_tpu.ops.costs.stereo_join`.

    feat_l/feat_r: (H, W, C) L2-normalized maps. Returns (vol_L, vol_R)
    as (D, H, W) float32 cost volumes (negated dots, NaN out of frame).
    """
    H, W, C = feat_l.shape
    D = disp_max
    Dp = -(-D // 128) * 128
    Wp = -(-W // XB) * XB
    Cp = -(-C // 128) * 128

    fl = jnp.pad(feat_l, ((0, 0), (0, Wp - W), (0, Cp - C)))  # (H, Wp, Cp)
    fr = jnp.pad(feat_r, ((0, 0), (0, Wp - W), (0, Cp - C)))
    # slab sides: left-referenced gathers fr[x-d] -> pad Dp-1 on the
    # left; right-referenced gathers fl[x+d] -> no left pad, Dp right
    fr_slab = jnp.pad(fr, ((0, 0), (Dp - 1, Dp), (0, 0)))
    fl_slab = jnp.pad(fl, ((0, 0), (0, Dp + Dp), (0, 0)))

    raw_l = _join_one_sided(fl, fr_slab, D, flip=True, slab_base=0,
                            interpret=interpret)
    raw_r = _join_one_sided(fr, fl_slab, D, flip=False, slab_base=0,
                            interpret=interpret)

    xs = jnp.arange(W)
    ds = jnp.arange(D)[:, None, None]
    vol_l = jnp.where(xs[None, None, :] - ds >= 0, -raw_l[:D, :, :W], jnp.nan)
    vol_r = jnp.where(xs[None, None, :] + ds < W, -raw_r[:D, :, :W], jnp.nan)
    return vol_l, vol_r

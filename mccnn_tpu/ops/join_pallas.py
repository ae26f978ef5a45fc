"""MXU cost-volume construction for the fast arch (Pallas).

Behavior contract: the ``StereoJoin`` kernel (adcensus.cu:1455-1498):
``vol_L[d, y, x] = -<fl[y, x, :], fr[y, x-d, :]>`` and
``vol_R[d, y, x] = -<fr[y, x, :], fl[y, x+d, :]>``, NaN where the
match pixel leaves the frame, plus the ``fix_border`` column
replication of main.lua:922-927.

TPU-native design: the naive per-disparity contraction re-reads both
feature maps from HBM once per disparity (~D x 2 x H x W x C floats —
around 100 GB for KITTI), which makes the CNN stage the slowest part
of the whole pipeline. Here each (row-block, 128-column tile) grid
step:

1. DMAs the row's feature tile (XB, C) and a (XB + Dp -> SLAB, C)
   match-side slab into VMEM,
2. computes the banded Gram block B = tile @ slab^T as ONE MXU matmul
   (the only place the FLOPs live),
3. extracts the D needed diagonals with a shear — row i circularly
   rolled by i, done as log2(XB) masked power-of-two rolls — after
   which diagonal d IS lane d: the (XB, Dp) result is the (x, d)
   output block directly,
4. masks out-of-frame cells to NaN, negates, applies fix_border, and
   writes the (XB, Dp) block in place.

Feature maps are read once, the volume written once (~1 GB of traffic
instead of ~100 GB), and the output layout is disparity-minor
(H, W, D) — lane-aligned for the SGM sweeps and WTA, so no XLA
minor-axis transpose ever touches the volume.

Both reference sides run the SAME kernel through the mirror identity
<fl[x], fr[x-d]> = <fl'[x'], fr'[x'+d]> at x' = W-1-x (primes =
x-flipped maps): the left volume comes out x-reversed, which is
exactly the layout the vertical SGM sweeps want for the -1 direction
(ops/sgm.py `_sgm_slab`) — the flip is only undone (fused into other
passes) where a natural-x view is needed.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Diagonal-extraction strategy default, read ONCE at import: the env
# var participates in jit cache keys only through the traced Python
# value, so a mid-process env change would otherwise silently not take
# effect (the first call's trace is cached under shear=None). A/B runs
# must set MCCNN_JOIN_SHEAR before importing, or pass shear= explicitly
# (as the tests do).
_JOIN_SHEAR_DEFAULT = os.environ.get("MCCNN_JOIN_SHEAR", "stride")

XB = 128  # output columns per grid step (measured optimum on v5e:
          # 192/256 either exceed the kernel's VMEM budget or run
          # slower — the shear's rolled copies scale with XB*SLAB;
          # 64 is not lowerable, the a-block lane dim must be 128)
YB = 16   # rows per grid step (r03 sweep: 15.3 -> 14.7 ms for both
          # volumes vs YB=8; YB>=32 crashes the Mosaic compiler)


def _join_plus(feat_a: jnp.ndarray, feat_b_pad: jnp.ndarray, d_true,
               disp_max: int, W: int, H: int, n_fix: int,
               interpret: bool, out_dtype=jnp.float32,
               shear: str | None = None) -> jnp.ndarray:
    """out[y, x, d] = -<a[y, x], b[y, x + d]>, NaN where x + d >= W or
    d >= d_true or y >= H (pad rows, masked at write time — a
    post-hoc where would re-stream the whole volume), with rows
    x < n_fix replaced by row n_fix (fix_border).

    d_true: TRACED int32 scalar (1,) <= disp_max — the real disparity
    count when disp_max was padded to a compile bucket. Lanes
    d >= d_true come out NaN, which makes D-bucketing EXACT through
    the whole HWD lane (NaN lanes never win WTA, never couple into
    the SGM recurrence — fmin ignores them — and poison the subpixel
    parabola at the d_true-1 boundary into keeping d, the same
    decision the exact-shape bounds guard makes). A traced scalar so
    every d_true shares one compile per bucket.

    Feature layout is channel-MAJOR (Hp, C, Wp): x on lanes, so C=64
    maps carry no lane padding (the (H, W, C) layout wasted half of
    every feature DMA on the 64->128 lane pad) and the MXU contraction
    runs over sublanes — the native matmul orientation.
    feat_b_pad: (Hp, C, Wp + XB + Dp) — b padded on x by the slab
    overhang at prep time so no second pad pass runs per call.
    Returns (Hp, Wp, Dp) in ``out_dtype`` (f32 default; 16-bit types
    halve the volume's write+downstream-streaming traffic, rounding
    only the stored values — the dots are still computed in f32).
    """
    Hp, C, Wp = feat_a.shape
    D = disp_max
    Dp = -(-D // 128) * 128
    SLAB = XB + Dp
    assert Hp % YB == 0 and Wp % XB == 0 and C % 8 == 0
    assert feat_b_pad.shape[2] == Wp + SLAB
    nbx = Wp // XB
    # Diagonal extraction strategy (see kernel body). "stride" uses one
    # hardware strided rotate per block instead of log2(XB) masked
    # roll+select passes; bit-identical output (the Gram values are
    # unchanged, only their movement differs). MCCNN_JOIN_SHEAR=log
    # (read once at import — see _JOIN_SHEAR_DEFAULT) restores the old
    # form for A/B; tests pass ``shear`` explicitly.
    if shear is None:
        shear = _JOIN_SHEAR_DEFAULT
    stride_shear = shear != "log"
    if stride_shear:
        # Wp-domain x-flip of the reference-side map: combined with the
        # REVERSED a-block index map below, grid step xb's a-tile rows
        # come out within-tile x-reversed — a_tile[i] = A[x0 + XB-1-i]
        # at x0 = xb*XB — which is what makes every Gram diagonal a
        # stride-1 lane offset (XLA fuses the flip into the prep pad
        # copy; the b slab and output indexing are untouched).
        feat_a = feat_a[:, :, ::-1]

    nby = Hp // YB

    def kernel(dt_ref, a_ref, b_hbm, out_ref, slab, sem):
        xb = pl.program_id(1)
        y = pl.program_id(0)
        # Double-buffered match-side slab: the TPU grid runs steps
        # sequentially (xb minor), so prefetching step+1's slab while
        # this step computes hides the per-step DMA issue+wait latency
        # that otherwise serializes every grid step (measured 4.5 ->
        # 3.9 ms/volume on the mm-only floor).
        step = y * nbx + xb
        slot = jax.lax.rem(step, 2)

        def slab_dma(slot_, step_):
            y_ = step_ // nbx
            x_ = jax.lax.rem(step_, nbx)
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(y_ * YB, YB), :, pl.ds(x_ * XB, SLAB)],
                slab.at[slot_], sem.at[slot_])

        @pl.when(step == 0)
        def _():
            slab_dma(0, 0).start()

        @pl.when(step + 1 < nby * nbx)
        def _():
            slab_dma(1 - slot, step + 1).start()

        a_blk = a_ref[:]  # (YB, C, XB)
        slab_dma(slot, step).wait()
        # bf16x3 matmul (hand-split: Mosaic lowers only DEFAULT and
        # HIGHEST): ~1e-7 relative of the reference's f32 CUDA dot
        # (adcensus.cu:1480) at half the MXU cost of 6-pass HIGHEST.
        # Single-pass bf16 DOES shift WTA decisions; 3-pass does not
        # at any tested tolerance. a*b = (ah+al)(bh+bl) ~ ah@bh +
        # ah@bl + al@bh (the al@bl term is below f32 resolution).
        b_blk = slab[slot]
        a_hi = a_blk.astype(jnp.bfloat16)
        a_lo = (a_blk - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b_blk.astype(jnp.bfloat16)
        b_lo = (b_blk - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(a, b):  # contract over C (sublanes): (YB, XB, SLAB)
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        B = mm(a_hi, b_hi) + (mm(a_hi, b_lo) + mm(a_lo, b_hi))
        if stride_shear:
            # a-tile rows are within-tile x-REVERSED (see prep above):
            # Gram row i is natural column x0+XB-1-i, so lane d of the
            # needed output sits at j = d + (XB-1-i) — a shift LINEAR
            # in the row index, which the hardware's strided rotate
            # applies in ONE op (out[y,i,e] = B[y,i,(e-s-i) mod SLAB]
            # at s = SLAB-XB+1 puts <a[x0+k], b[x0+k+d]> at lane d of
            # row i = XB-1-k); the sublane reverse restores natural
            # row order.
            B = pltpu.roll(B, SLAB - XB + 1, axis=2, stride=1,
                           stride_axis=1)
            rblk = B[:, :, :Dp]  # (YB, XB, Dp), rows x-reversed
            # Sublane reverse to restore natural row order: Mosaic has
            # no vector `rev`, so ride the otherwise-idle MXU with the
            # exchange-permutation matmul. BIT-exact via a truncating
            # 3-way bf16 split: piece k is the next 8 mantissa bits
            # (mask, not round — each piece is exactly bf16, the
            # pieces' bit ranges are disjoint, so v1+v2+v3 == v and
            # every 1.0*x / 0.0*x product and one-term f32 sum in the
            # permutation matmul is exact). Precondition: |v| must stay
            # >= ~2^-117 — below that the v2/v3 pieces fall under
            # bf16's subnormal floor and the cast rounds, breaking
            # exactness. L2-normalized feature dots (|dot| <= 1, f32
            # underflow far above that floor) satisfy it; a reuse of
            # this split on tiny-magnitude data must re-check.
            P = jnp.broadcast_to(
                (jax.lax.broadcasted_iota(jnp.int32, (XB, XB), 0)
                 + jax.lax.broadcasted_iota(jnp.int32, (XB, XB), 1)
                 == XB - 1).astype(jnp.bfloat16), (YB, XB, XB))

            def trunc16(v):  # f32 -> exact-bf16 top slice of v
                bits = jax.lax.bitcast_convert_type(v, jnp.int32)
                return jax.lax.bitcast_convert_type(
                    bits & jnp.int32(-65536), jnp.float32)

            v1 = trunc16(rblk)
            r1 = rblk - v1
            v2 = trunc16(r1)
            v3 = r1 - v2  # <= 8 significant bits: exactly bf16

            def pmm(m):  # (YB, XB, XB) @ (YB, XB, Dp) batched on YB
                return jax.lax.dot_general(
                    P, m.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            blk = pmm(v1) + pmm(v2) + pmm(v3)
        else:
            # shear: Bs[y, i, e] = B[y, i, (e + i) mod SLAB] -> lane d
            # of row i is B[i, i + d] = <a[x0+i], b[x0+i+d]>
            row = jax.lax.broadcasted_iota(jnp.int32, B.shape, 1)
            bit = 1
            while bit < XB:
                rolled = pltpu.roll(B, SLAB - bit, axis=2)
                B = jnp.where((row & bit) != 0, rolled, B)
                bit *= 2
            blk = B[:, :, :Dp]  # (YB, XB, Dp)
        x = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1) + xb * XB
        d = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 2)
        keep = (x + d < W) & (d < dt_ref[0])
        if Hp > H:  # feature pad rows produce -0 dots; emit NaN rows
            yy = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) + y * YB
            keep = keep & (yy < H)
        blk = jnp.where(keep, -blk, jnp.nan)
        if n_fix > 0:
            @pl.when(xb == 0)
            def _():
                b2 = blk
                xi = jax.lax.broadcasted_iota(jnp.int32, b2.shape, 1)
                # masked-sum broadcast of row n_fix (NaNs in the source
                # row propagate through the sum, like the reference's
                # column copy propagates them)
                src = jnp.sum(jnp.where(xi == n_fix, b2, 0.0), axis=1,
                              keepdims=True)
                out_ref[:] = jnp.where(xi < n_fix, src, b2).astype(out_dtype)

            @pl.when(xb > 0)
            def _():
                out_ref[:] = blk.astype(out_dtype)
        else:
            out_ref[:] = blk.astype(out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(Hp // YB, Wp // XB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((YB, C, XB),
                         (lambda y, x: (y, 0, nbx - 1 - x)) if stride_shear
                         else (lambda y, x: (y, 0, x)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((YB, XB, Dp), lambda y, x: (y, x, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((2, YB, C, SLAB), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(jnp.asarray(d_true, jnp.int32).reshape(1), feat_a, feat_b_pad)


@functools.partial(jax.jit, static_argnames=("disp_max", "n_fix",
                                             "interpret", "sides",
                                             "out_dtype", "shear"))
def stereo_join_mxu_hwd(feat_l: jnp.ndarray, feat_r: jnp.ndarray,
                        disp_max: int, n_fix: int = 0,
                        interpret: bool = False, sides: str = "both",
                        d_true=None, out_dtype: str = "float32",
                        shear: str | None = None):
    """Both cost volumes in padded disparity-minor layout.

    feat_l/feat_r: (H, W, C) L2-normalized maps. Returns
    (vol_l_xrev, vol_r), each (Hp, Wp, Dp) float32 where
    ``vol_r[y, x, d] = -<fr[y,x], fl[y,x+d]>`` (natural x) and
    ``vol_l_xrev[y, x', d] = vol_L[y, W-1-x', d]`` (x-REVERSED left
    volume — the mirror identity makes both sides the same kernel, and
    the reversed form is what the vertical SGM sweeps consume for the
    -1 direction). Rows y >= H and lanes d >= disp_max are NaN;
    columns x' beyond W are NaN. ``n_fix`` applies the reference's
    fix_border column replication in-kernel (per side, n_fix natural
    border columns on the side's own frame — identical row indices in
    both frames by the mirror symmetry).

    sides="left" computes and returns only ``vol_l_xrev`` (the
    Middlebury evaluation path runs the -1 reference direction alone,
    main.lua:954-955). ``d_true``: optional TRACED real disparity
    count < disp_max for shape-bucketed evaluation (see _join_plus) —
    lanes d >= d_true are NaN and the bucket is exact.
    """
    H, W, C = feat_l.shape
    D = disp_max
    Wp = -(-W // XB) * XB
    C8 = -(-C // 8) * 8
    # rows padded to a multiple of 64 (not just YB): the natural-layout
    # horizontal SGM sweeps (_sweep_stream_hnat) tile scanlines in
    # 64-multiples that must divide Hp exactly
    Hp = -(-H // 64) * 64
    Dp = -(-D // 128) * 128
    SLAB = XB + Dp

    def prep(f, flip, slab):
        f = jnp.moveaxis(f, -1, 1)  # (H, C, W): see _join_plus layout
        if flip:
            f = f[:, :, ::-1]
        return jnp.pad(f, ((0, Hp - H), (0, C8 - C),
                           (0, Wp - W + (SLAB if slab else 0))))

    dt = D if d_true is None else d_true
    odt = jnp.dtype(out_dtype)
    vol_l_xrev = _join_plus(prep(feat_l, True, False),
                            prep(feat_r, True, True), dt, D, W, H, n_fix,
                            interpret, odt, shear)
    if sides == "left":
        return vol_l_xrev
    vol_r = _join_plus(prep(feat_r, False, False),
                       prep(feat_l, False, True), dt, D, W, H, n_fix,
                       interpret, odt, shear)
    return vol_l_xrev, vol_r


@functools.partial(jax.jit, static_argnames=("disp_max", "interpret"))
def stereo_join_mxu(feat_l: jnp.ndarray, feat_r: jnp.ndarray,
                    disp_max: int, interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in MXU replacement for :func:`mccnn_tpu.ops.costs.stereo_join`.

    feat_l/feat_r: (H, W, C) L2-normalized maps. Returns (vol_L, vol_R)
    as (D, H, W) float32 cost volumes (negated dots, NaN out of frame).
    Thin relayout wrapper over :func:`stereo_join_mxu_hwd` for the
    disparity-major public contract.
    """
    H, W, _ = feat_l.shape
    D = disp_max
    vol_l_xrev, vol_r = stereo_join_mxu_hwd(feat_l, feat_r, D,
                                            interpret=interpret)
    vol_l = jnp.transpose(vol_l_xrev[:H, :W, :D][:, ::-1], (2, 0, 1))
    return vol_l, jnp.transpose(vol_r[:H, :W, :D], (2, 0, 1))

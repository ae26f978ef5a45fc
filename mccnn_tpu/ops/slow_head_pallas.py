"""Fused MXU kernel for the accurate-arch cost volume (Pallas).

Behavior contract: the reference's slow-arch inference loop
(main.lua:962-979) — for every disparity d, apply the FC head (as 1×1
convolutions, SpatialConvolution1_fw.lua) to the concatenation of the
left feature map and the right feature map shifted by d, producing
``vol[d, y, x] = sigmoid(head(concat(fl[y, x], fr[y, x - d])))``.
That loop is the reference's ~67 s/pair hot path.

TPU-native design (three levers on top of the plain per-d matmul
chain, which is HBM-bound: every one of the 5 matmuls per disparity
materializes a ~670 MB activation to HBM and reads it back):

1. **First-layer factoring.** Head layer 0 is linear in the
   concatenation: ``concat(fl, fr_d) @ W0 = fl @ W0[:C] + fr_d @
   W0[C:]``. Both halves (``A`` and ``B``) are computed once per
   image in XLA; the per-disparity work starts from a shifted ADD.
2. **Fusion.** The remaining matmul chain runs inside ONE Pallas
   kernel with the mid-layer weights resident in VMEM for the whole
   grid; activations live and die in VMEM — per (row-tile, col-tile,
   d-chunk) grid step, only the A tile, a B slab, and the output
   block cross HBM.
3. **Disparity-chunk reuse.** A B slab of width XT + KD - 1 serves
   all KD = 128 disparities of a chunk (the shift is an in-VMEM
   sublane slice), so the B traffic amortizes 128 ways; a dynamic
   trip count skips the disparities beyond disp_max in the last
   chunk.

Layout discipline: the feature axis C stays on LANES through the
whole chain (the matmul orientation); each disparity's sigmoid
column lands on its own output lane via a lane-iota mask, so the
output block is disparity-MINOR (R, XT, KD) and every reshape in the
kernel is layout-free. (A disparity-major (K, R, XT) block would
need a sublane->lane transpose of the (R·XT, 1) sigmoid column that
the VPU has no cheap form for — it crashed the Mosaic pipeline.)

Matmul precision: inputs round to bf16 with f32 accumulation — the
same precision class XLA's DEFAULT TPU matmul applies to the f32
reference formulation this kernel replaces; the add/ReLU/sigmoid
math is f32.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8      # image rows per grid step
XT = 128   # image columns per grid step (one lane tile)
KD = 128   # disparities per chunk (one lane tile of output)
# independent chains interleaved per loop iteration (A/B'd on chip,
# full volumes incl transpose: 2 -> 558.2 ms, 3 -> 560.0, 4 -> 550.2,
# 6 -> 560.6, 8 -> 553.4; checksums bit-identical; read once at import)
UNROLL = int(os.environ.get("MCCNN_SLOW_UNROLL", "4"))


def _head_chain_kernel(a_ref, wm_ref, bm_ref, wl_ref, bl_ref, b_hbm,
                       out_ref, slab, sem, *, n_mid, D, Dpad):
    """One (row-tile, col-tile, d-chunk) step: s[x, y, d] =
    sigmoid(mlp(relu(A[y, x] + B[y, x - d]))) for the chunk's
    disparities, entirely in VMEM.

    Everything is x-MAJOR (column index leading): the per-disparity
    shift then slices the B slab along the LEADING axis, the one place
    Mosaic handles a dynamic slice of a 3-D VMEM buffer (a dynamic
    SUBLANE slice of the same buffer crashes its pipeline)."""
    gy = pl.program_id(0)
    gx = pl.program_id(1)
    gd = pl.program_id(2)
    C = a_ref.shape[-1]

    # B slab covering x - d for x in the column tile, d in the chunk:
    # global columns [gx*XT - gd*KD - (KD-1), gx*XT + XT), stored at
    # offset Dpad in the padded B
    start = Dpad + gx * XT - gd * KD - (KD - 1)
    cp = pltpu.make_async_copy(
        b_hbm.at[pl.ds(start, XT + KD - 1), pl.ds(gy * R, R), :], slab, sem)
    cp.start()
    a2 = a_ref[:].reshape(XT * R, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (XT * R, KD), 1)
    cp.wait()

    def chain(i):
        off = KD - 1 - i  # slab column holding global x - (gd*KD + i)
        b_i = slab[pl.ds(off, XT), :, :].reshape(XT * R, C)
        h = jnp.maximum(a2 + b_i, 0.0)
        for m in range(n_mid):
            mm = jax.lax.dot_general(
                h.astype(jnp.bfloat16), wm_ref[m],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(mm + bm_ref[m], 0.0)
        s = jnp.sum(h * wl_ref[0], axis=-1, keepdims=True) + bl_ref[0]
        return jax.nn.sigmoid(s)

    def one_pair(j, acc):
        # manual unroll: UNROLL INDEPENDENT matmul chains interleave
        # on the MXU while the others' VPU tails (relu/sum/sigmoid)
        # run; a tail lane j*UNROLL+k may exceed nd — it lands on a
        # pad lane the caller crops, never on real output. Lanes past
        # KD-1 (possible when nd == KD and KD % UNROLL != 0) match no
        # output lane at all; their slab offset is clamped to stay
        # in-bounds and the computed column is discarded by the mask.
        i0 = j * UNROLL
        for k in range(UNROLL):
            acc = jnp.where(lane == i0 + k,
                            chain(jnp.minimum(i0 + k, KD - 1)), acc)
        return acc

    nd = jnp.minimum(KD, D - gd * KD)  # skip pad disparities
    acc = jax.lax.fori_loop(0, (nd + UNROLL - 1) // UNROLL, one_pair,
                            jnp.zeros((XT * R, KD), jnp.float32))
    out_ref[:] = acc.reshape(XT, R, KD)


@functools.partial(jax.jit, static_argnames=("disp_max", "interpret"))
def slow_head_volume_mxu(A: jnp.ndarray, B: jnp.ndarray, mids_w, mids_b,
                         w_last, b_last, disp_max: int,
                         interpret: bool = False) -> jnp.ndarray:
    """s[d, y, x] = sigmoid(head_tail(relu(A[y, x] + B[y, x - d]))).

    A/B: (H, W, C) f32 — the factored first head layer's two halves
    (A carries the layer-0 bias). mids_w/mids_b: the middle Linear
    layers stacked, (n_mid, C, C) and (n_mid, C); w_last/b_last: the
    final Linear(C -> 1). Returns (disp_max, H, W) f32; cells whose
    x - d leaves the frame hold garbage (the caller masks them — the
    reference likewise computes the full grid and NaN-masks,
    main.lua:966-977).
    """
    H, W, C = A.shape
    n_mid = mids_w.shape[0]
    assert mids_w.shape == (n_mid, C, C)
    Hp = -(-H // R) * R
    Wp = -(-W // XT) * XT
    GD = -(-disp_max // KD)
    Dpad = GD * KD

    # x-major prep (see the kernel's layout note)
    a_pad = jnp.pad(jnp.transpose(A, (1, 0, 2)),
                    ((0, Wp - W), (0, Hp - H), (0, 0)))
    # left pad Dpad (disparity reach), right pad to the slab overhang
    b_pad = jnp.pad(jnp.transpose(B, (1, 0, 2)),
                    ((Dpad, Wp - W + KD), (0, Hp - H), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_head_chain_kernel, n_mid=n_mid,
                          D=disp_max, Dpad=Dpad),
        grid=(Hp // R, Wp // XT, GD),
        in_specs=[
            pl.BlockSpec((XT, R, C), lambda y, x, d: (x, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mid, C, C), lambda y, x, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mid, 1, C), lambda y, x, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda y, x, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((XT, R, KD), lambda y, x, d: (x, y, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, Dpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((XT + KD - 1, R, C), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(a_pad, mids_w.astype(jnp.bfloat16),
      mids_b.reshape(n_mid, 1, C), w_last.reshape(1, C),
      jnp.asarray(b_last, jnp.float32).reshape(1), b_pad)
    # (x, y, d) kernel output -> the standard lane's (D, H, W)
    return jnp.transpose(out[:W, :H, :disp_max], (2, 1, 0))


def slow_volumes_mxu(params, fl, fr, disp_max: int, dtype=jnp.float32,
                     interpret: bool = False):
    """Both accurate-arch cost volumes from image-mode feature maps.

    Drop-in for the volume section of
    :func:`mccnn_tpu.pipeline.slow_cost_volumes`: factors head layer 0
    in XLA (two (H·W, C)×(C, nh2) matmuls), runs the fused chain
    kernel, then derives the NaN-masked left/right-referenced volumes
    (vol_R[d, y, x] = s[d, y, x + d], main.lua:966-977 both-direction
    semantics).
    """
    H, W, C = fl.shape
    head = params["head"]
    nh2 = head[0]["w"].shape[1]
    w0 = head[0]["w"].astype(dtype)
    A = (jnp.dot(fl.astype(dtype), w0[:C],
                 preferred_element_type=jnp.float32) + head[0]["b"])
    B = jnp.dot(fr.astype(dtype), w0[C:],
                preferred_element_type=jnp.float32)
    mids_w = jnp.stack([l["w"] for l in head[1:-1]])
    mids_b = jnp.stack([l["b"] for l in head[1:-1]])
    # pad the feature width to a lane multiple (zero weight rows/cols:
    # padded channels contribute nothing — exact)
    Cp = -(-nh2 // 128) * 128
    if Cp != nh2:
        pad = Cp - nh2
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, pad)))
        mids_w = jnp.pad(mids_w, ((0, 0), (0, pad), (0, pad)))
        mids_b = jnp.pad(mids_b, ((0, 0), (0, pad)))
        w_last = jnp.pad(head[-1]["w"][:, 0], ((0, pad),))
    else:
        w_last = head[-1]["w"][:, 0]

    s = slow_head_volume_mxu(A.astype(jnp.float32), B.astype(jnp.float32),
                             mids_w, mids_b, w_last, head[-1]["b"][0],
                             disp_max, interpret=interpret)
    xs = jnp.arange(W)
    ds = jnp.arange(disp_max)[:, None, None]
    vol_l = jnp.where(xs - ds >= 0, s, jnp.nan)

    from mccnn_tpu.ops import costs

    def right(args):
        sd, d = args
        return jnp.where(xs + d < W, costs._shift_x(sd, d), jnp.nan)

    vol_r = jax.lax.map(right, (s, jnp.arange(disp_max)))
    return vol_l, vol_r

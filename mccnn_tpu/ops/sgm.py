"""Semiglobal matching, TPU-native.

Behavior contract: the reference's production kernel ``sgm2``
(adcensus.cu:535-697) — four scanline sweeps (→ ← ↓ ↑), each a
wavefront DP over columns/rows with per-step adaptive penalties from
image gradients, results **summed** over directions (the caller divides
by 4, main.lua:1017-1020).

TPU-native design: each sweep is one ``lax.scan`` over the sweep axis,
carrying the whole wavefront — a (scanlines, D) block — as VPU-resident
state. The per-step work is dense vector math:

    cost  = fmin(prev, prev[d-1]+P1a, prev[d+1]+P1b, min_d(prev)+P2)
    val   = vol_step + cost - min_d(prev)

NaN cells (out-of-frame disparities) flow through exactly like the
reference: CUDA ``min()`` is ``fminf`` (NaN-ignoring), replicated here
with ``jnp.fmin``; the running minimum uses inf-substitution like the
``<``-based tree reduction at adcensus.cu:579-584.

Penalty selection (adcensus.cu:586-605):
    D1 = |x0[p] - x0[p - step]|,  D2 = |x1[q] - x1[q - step]| at
    q = p + d*direction (10 when q or q-step leaves the frame);
    both < tau_so -> (pi1, pi2); both > tau_so -> /(q1*q2); else /q1.
    Vertical sweeps divide the d-1 (down) or d+1 (up) neighbor penalty
    by alpha1 (adcensus.cu:608-613).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.inf

# Pallas wavefront kernel for the sweeps (identical numerics, ~1.8x
# faster than the lax.scan formulation on TPU). "auto" = TPU only;
# override with MCCNN_SGM_PALLAS=0/1.
_PALLAS_MODE = os.environ.get("MCCNN_SGM_PALLAS", "auto")

# Scoped-VMEM ceiling for the streaming-DMA sweep kernels. Mosaic's
# default 16 MB limit counts BOTH the declared scratch and the stack
# temporaries of the unrolled recurrence (observed ~2x the scratch
# estimate at Middlebury half-res scale: 17.7 M vs 8.5 M declared,
# which OOM'd the compile). v5e has 128 MB of VMEM per core and these
# kernels manage their own double-buffering, so raise the per-kernel
# ceiling; _pick_st_hnat still sizes tiles to a conservative scratch
# budget for locality.
_VMEM_LIMIT = 64 * 1024 * 1024


def _pallas_default() -> bool:
    if _PALLAS_MODE == "1":
        return True
    if _PALLAS_MODE == "0":
        return False
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


def _penalties(D1, D2, pi1, pi2, tau_so, q1, q2):
    """3-way penalty selection; equality falls in the middle case
    (strict comparisons, adcensus.cu:596-605)."""
    both_lo = (D1 < tau_so) & (D2 < tau_so)
    both_hi = (D1 > tau_so) & (D2 > tau_so)
    P1 = jnp.where(both_lo, pi1, jnp.where(both_hi, pi1 / (q1 * q2), pi1 / q1))
    P2 = jnp.where(both_lo, pi2, jnp.where(both_hi, pi2 / (q1 * q2), pi2 / q1))
    return P1, P2


def _penalties3(both_lo, both_hi, pi1, pi2, q1, q2, p1a_div, p1b_div):
    """(P1/p1a_div, P1/p1b_div, P2) with the sgm_dir alpha1 divisions
    folded into the SELECTED CONSTANTS at trace time. Bit-exact vs the
    per-element form: each table value is a Python float traced as an
    f32 constant, and f32(c)/f32(div) computed here in numpy is the
    same IEEE-f32 division the vector divide performed per element
    (x/1.0 is x). This matters inside Pallas kernels: Mosaic has no
    algebraic simplifier, so ``P1 / 1.0`` otherwise costs a real f32
    vector divide EVERY recurrence step — two of them per step in the
    horizontal sweeps, where both divisors are always 1.0."""
    def tab(base, div):
        f = lambda v: float(np.float32(np.float32(v) / np.float32(div)))
        return jnp.where(both_lo, f(base),
                         jnp.where(both_hi, f(base / (q1 * q2)),
                                   f(base / q1)))

    p1a = tab(pi1, p1a_div)
    p1b = p1a if p1b_div == p1a_div else tab(pi1, p1b_div)
    return p1a, p1b, tab(pi2, 1.0)


def _shift_d(x, shift, fill):
    """Shift along the last (disparity) axis; out-of-range filled."""
    return jnp.full_like(x, fill).at[..., max(0, shift):x.shape[-1] + min(0, shift)].set(
        x[..., max(0, -shift):x.shape[-1] - max(0, shift)])


def _sweep(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir):
    """One directional sweep.

    vol_s: (T, S, D) volume slices along the sweep axis (T steps,
    S scanlines, D disparities), already ordered in sweep direction.
    d1_s: (T, S) per-step D1; d2_s: (T, S, D) per-step D2.
    Step 0 initializes the recurrence (adcensus.cu:567-572).
    Returns (T, S, D) per-step DP values in sweep order.
    """
    p1a_div = alpha1 if sgm_dir == 2 else 1.0  # d-1 neighbor (adcensus.cu:609)
    p1b_div = alpha1 if sgm_dir == 3 else 1.0  # d+1 neighbor (adcensus.cu:612)

    def step(prev, inp):
        cur, D1, D2 = inp
        prev_min = jnp.min(jnp.where(jnp.isnan(prev), _BIG, prev), axis=-1,
                           keepdims=True)
        P1, P2 = _penalties(D1[:, None], D2, pi1, pi2, tau_so, q1, q2)
        cost = jnp.fmin(prev, prev_min + P2)
        cost = jnp.fmin(cost, _shift_d(prev, 1, _BIG) + P1 / p1a_div)
        cost = jnp.fmin(cost, _shift_d(prev, -1, _BIG) + P1 / p1b_div)
        val = cur + cost - prev_min
        return val, val

    init = vol_s[0]
    _, rest = jax.lax.scan(step, init, (vol_s[1:], d1_s[1:], d2_s[1:]))
    return jnp.concatenate([init[None], rest], axis=0)


def _sweep_pallas(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1, q1, q2,
                  sgm_dir):
    """The sweep as a streaming Pallas kernel (the TPU-native default).

    Grid = scanline tiles only; the whole sweep runs INSIDE the kernel
    as a ``fori_loop`` over steps with manually double-buffered DMA:
    while step t computes on one VMEM buffer pair, step t+1's volume
    and penalty blocks stream in and step t-1's result streams out.
    The wavefront state — the previous step's (St, D) cost block —
    stays resident in VMEM. This removes the per-grid-step pipeline
    overhead of the naive formulation (measured 3.2x faster at KITTI
    scale, bit-exact). D1 rides in the first pad lane of the D2 block
    so each step needs two aligned input DMAs.

    The d±1 neighbor terms are lane rolls; out-of-range neighbors and
    the padded lanes are NaN, which ``jnp.fmin`` ignores — exactly the
    CUDA ``fminf`` recurrence of adcensus.cu:607-615.
    """
    if _pallas_default():
        return _sweep_stream(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1,
                             q1, q2, sgm_dir)
    return _sweep_grid(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1,
                       q1, q2, sgm_dir)


def _sweep_stream(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1, q1, q2,
                  sgm_dir):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S, D = vol_s.shape
    Dp = -(-(D + 1) // 128) * 128  # +1: D1 rides in lane D of the D2 block
    St = min(S, 256)
    Sp = -(-S // St) * St
    vol_p = jnp.pad(vol_s, ((0, 0), (0, Sp - S), (0, Dp - D)),
                    constant_values=jnp.nan)
    d2aug = jnp.concatenate([d2_s, d1_s[:, :, None]], axis=2)
    d2_p = jnp.pad(d2aug, ((0, 0), (0, Sp - S), (0, Dp - D - 1)),
                   constant_values=10.0)
    p1a_div = alpha1 if sgm_dir == 2 else 1.0
    p1b_div = alpha1 if sgm_dir == 3 else 1.0

    def kernel(vol_hbm, d2_hbm, out_hbm, vol_b, d2_b, out_b, prev,
               in_sems, out_sems):
        s = pl.program_id(0)

        def in_dma(slot, t):
            return [pltpu.make_async_copy(
                        src.at[t, pl.ds(s * St, St), :], buf.at[slot], sem)
                    for src, buf, sem in
                    ((vol_hbm, vol_b, in_sems.at[slot, 0]),
                     (d2_hbm, d2_b, in_sems.at[slot, 1]))]

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                out_b.at[slot], out_hbm.at[t, pl.ds(s * St, St), :],
                out_sems.at[slot])

        for d in in_dma(0, 0):
            d.start()

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < T)
            def _():
                for d in in_dma(nxt, t + 1):
                    d.start()
            for d in in_dma(slot, t):
                d.wait()
            vol = vol_b[slot]

            @pl.when(t > 1)
            def _():
                out_dma(slot, t - 2).wait()

            @pl.when(t == 0)
            def _():
                out_b[slot] = vol
                prev[:] = vol

            @pl.when(t > 0)
            def _():
                p = prev[:]
                pm = jnp.min(jnp.where(jnp.isnan(p), _BIG, p), axis=-1,
                             keepdims=True)
                d2blk = d2_b[slot]
                D1s, D2s = d2blk[:, D:D + 1], d2blk
                P1a, P1b, P2 = _penalties3(
                    (D1s < tau_so) & (D2s < tau_so),
                    (D1s > tau_so) & (D2s > tau_so),
                    pi1, pi2, q1, q2, p1a_div, p1b_div)
                up = pltpu.roll(p, 1, axis=1)
                dn = pltpu.roll(p, Dp - 1, axis=1)
                if D == Dp:  # no NaN pad lanes: mask the d-edge wraps
                    lane = jax.lax.broadcasted_iota(jnp.int32, (St, Dp), 1)
                    up = jnp.where(lane == 0, _BIG, up)
                    dn = jnp.where(lane == D - 1, _BIG, dn)
                cost = jnp.fmin(p, pm + P2)
                cost = jnp.fmin(cost, up + P1a)
                cost = jnp.fmin(cost, dn + P1b)
                val = vol + cost - pm
                out_b[slot] = val
                prev[:] = val
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        out_dma(jax.lax.rem(T - 1, 2), T - 1).wait()

        @pl.when(T > 1)
        def _():
            out_dma(jax.lax.rem(T - 2, 2), T - 2).wait()

    out = pl.pallas_call(
        kernel,
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T, Sp, Dp), vol_s.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, St, Dp), vol_s.dtype),
            pltpu.VMEM((2, St, Dp), vol_s.dtype),
            pltpu.VMEM((2, St, Dp), vol_s.dtype),
            pltpu.VMEM((St, Dp), vol_s.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(vol_p, d2_p)
    return out[:, :S, :D]


def _sweep_stream_hslab(vol_s, d1_slab, g_slab, n_rev_tiles, reverse_steps,
                        D, rev_base, pi1, pi2, tau_so, alpha1, q1, q2,
                        sgm_dir, St=256, acc=None, T=None):
    """Horizontal streaming sweep with slab-resident penalties.

    The horizontal sweeps' D2 table is, per step x, a lane-contiguous
    slice of the per-scanline gradient slab (forward tiles at offset
    x + D; reversed-direction tiles read a lane-reversed slab at offset
    W + D - 1 - x), and D1 is a width-1 lane slice — so the penalty
    inputs live in VMEM for the whole sweep and ONLY the volume
    streams, roughly halving the sweep's DMA traffic vs
    :func:`_sweep_stream`.

    vol_s: (T, Sp, Dp) already padded, in NATURAL step order.
    d1_slab: (Sp, WL) per-scanline |x0 gradient| rows, lane x = step x.
    g_slab: (Sp, GL) per-scanline D2 rows (reversed rows for the first
    ``n_rev_tiles`` scanline tiles).
    reverse_steps: the sweep runs x = T-1-t — the DMAs index x
    directly, so the <- sweep needs no reversal copies of the volume
    or the result.
    St: scanline tile (pick to minimize Sp padding; must divide Sp).
    acc: optional (T, Sp, Dp) accumulator — the kernel streams it in
    and writes val + acc (aliased in-place), so summing the sweeps
    needs no separate XLA add/transpose passes.
    T: number of REAL sweep steps (default: the full step axis). When
    the volume carries pad steps (the HWD lane sweeps the join's
    padded buffer in place), steps >= T are never read or written —
    the caller must ignore them in the output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T_full, Sp, Dp = vol_s.shape
    if T is None:
        T = T_full
    assert Sp % St == 0
    WL = d1_slab.shape[1]
    GL = g_slab.shape[1]
    p1a_div = alpha1 if sgm_dir == 2 else 1.0
    p1b_div = alpha1 if sgm_dir == 3 else 1.0
    with_acc = acc is not None

    def kernel(*refs):
        if with_acc:
            (vol_hbm, d1_hbm, g_hbm, acc_hbm, out_hbm, vol_b, acc_b,
             out_b, prev, d1_v, g_v, in_sems, acc_sems, out_sems,
             slab_sems) = refs
        else:
            (vol_hbm, d1_hbm, g_hbm, out_hbm, vol_b, out_b, prev,
             d1_v, g_v, in_sems, out_sems, slab_sems) = refs
        s = pl.program_id(0)
        cp_d1 = pltpu.make_async_copy(
            d1_hbm.at[pl.ds(s * St, St), :], d1_v, slab_sems.at[0])
        cp_g = pltpu.make_async_copy(
            g_hbm.at[pl.ds(s * St, St), :], g_v, slab_sems.at[1])
        cp_d1.start()
        cp_g.start()

        def step_x(t):
            return (T - 1 - t) if reverse_steps else t

        def in_dma(slot, t):
            dmas = [pltpu.make_async_copy(
                vol_hbm.at[step_x(t), pl.ds(s * St, St), :], vol_b.at[slot],
                in_sems.at[slot])]
            if with_acc:
                dmas.append(pltpu.make_async_copy(
                    acc_hbm.at[step_x(t), pl.ds(s * St, St), :],
                    acc_b.at[slot], acc_sems.at[slot]))
            return dmas

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                out_b.at[slot], out_hbm.at[step_x(t), pl.ds(s * St, St), :],
                out_sems.at[slot])

        for d in in_dma(0, 0):
            d.start()
        cp_d1.wait()
        cp_g.wait()
        is_rev = s < n_rev_tiles

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < T)
            def _():
                for d in in_dma(nxt, t + 1):
                    d.start()
            for d in in_dma(slot, t):
                d.wait()
            # 16-bit vol/acc/out storage streams at half the HBM
            # traffic; the recurrence always computes in f32 (the
            # casts are no-ops for the f32 default path)
            vol = vol_b[slot].astype(jnp.float32)

            @pl.when(t > 1)
            def _():
                out_dma(slot, t - 2).wait()

            def emit(val):
                out_b[slot] = ((val + acc_b[slot].astype(jnp.float32))
                               if with_acc else val).astype(out_b.dtype)
                prev[:] = val

            @pl.when(t == 0)
            def _():
                emit(vol)

            @pl.when(t > 0)
            def _():
                x = step_x(t)
                p = prev[:]
                pm = jnp.min(jnp.where(jnp.isnan(p), _BIG, p), axis=-1,
                             keepdims=True)
                # dynamic lane slices must be 128-aligned: load an
                # aligned window one tile wider, rotate the remainder
                off = jnp.where(is_rev, rev_base - x, x + D)
                off_al = pl.multiple_of((off // 128) * 128, 128)
                rem = off - off_al
                gwin = g_v[:, pl.ds(off_al, Dp + 128)]
                D2 = pltpu.roll(gwin, (Dp + 128) - rem, axis=1)[:, :Dp]
                x_al = pl.multiple_of((x // 128) * 128, 128)
                dwin = d1_v[:, pl.ds(x_al, 128)]
                D1 = pltpu.roll(dwin, 128 - (x - x_al), axis=1)[:, :1]
                P1a, P1b, P2 = _penalties3(
                    (D1 < tau_so) & (D2 < tau_so),
                    (D1 > tau_so) & (D2 > tau_so),
                    pi1, pi2, q1, q2, p1a_div, p1b_div)
                up = pltpu.roll(p, 1, axis=1)
                dn = pltpu.roll(p, Dp - 1, axis=1)
                if D == Dp:  # no NaN pad lanes: mask the d-edge wraps
                    lane = jax.lax.broadcasted_iota(jnp.int32, (St, Dp), 1)
                    up = jnp.where(lane == 0, _BIG, up)
                    dn = jnp.where(lane == D - 1, _BIG, dn)
                cost = jnp.fmin(p, pm + P2)
                cost = jnp.fmin(cost, up + P1a)
                cost = jnp.fmin(cost, dn + P1b)
                emit(vol + cost - pm)
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        out_dma(jax.lax.rem(T - 1, 2), T - 1).wait()

        @pl.when(T > 1)
        def _():
            out_dma(jax.lax.rem(T - 2, 2), T - 2).wait()

    scratch = [
        pltpu.VMEM((2, St, Dp), vol_s.dtype),               # vol_b
    ] + ([pltpu.VMEM((2, St, Dp), vol_s.dtype)] if with_acc else []) + [
        pltpu.VMEM((2, St, Dp), vol_s.dtype),               # out_b
        pltpu.VMEM((St, Dp), jnp.float32),                  # prev (compute)
        pltpu.VMEM((St, WL), d1_slab.dtype),                # d1 slab
        pltpu.VMEM((St, GL), g_slab.dtype),                 # g slab
        pltpu.SemaphoreType.DMA((2,)),                      # in_sems
    ] + ([pltpu.SemaphoreType.DMA((2,))] if with_acc else []) + [
        pltpu.SemaphoreType.DMA((2,)),                      # out_sems
        pltpu.SemaphoreType.DMA((2,)),                      # slab_sems
    ]
    operands = [vol_s, d1_slab, g_slab] + ([acc] if with_acc else [])
    out = pl.pallas_call(
        kernel,
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T_full, Sp, Dp), vol_s.dtype),
        scratch_shapes=scratch,
        input_output_aliases={3: 0} if with_acc else {},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    return out


def _pick_st_hnat(Hp, K, Dp, WLp, GL, with_acc, vol_itemsize=4,
                  budget=13_000_000):
    """Scanline tile for :func:`_sweep_stream_hnat`: the largest tile
    dividing Hp whose kernel VMEM footprint (double-buffered
    (St, K, Dp) vol/out(/acc) blocks in the volume's STORAGE dtype +
    f32 wavefront state + f32 penalty slabs) fits the ~16 MB/core
    budget with headroom."""
    nbuf = 3 if with_acc else 2
    for st in (256, 192, 128, 64):
        if Hp % st:
            continue
        vmem = (nbuf * 2 * st * K * Dp * vol_itemsize
                + (st * Dp + st * (WLp + GL)) * 4)
        if vmem <= budget:
            return st
    raise ValueError(f"no scanline tile divides Hp={Hp} within VMEM")


def _sweep_stream_hnat(vol, d1_slab, g_slab, reverse_steps, D, T,
                       pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir,
                       St, K=8, acc=None, wta=False, write_out=True,
                       interpret=False):
    """Horizontal streaming sweep consuming the NATURAL (Sp, Tp, Dp)
    layout — scanlines (image rows) on the major axis, sweep steps (x)
    on the middle axis — so the HWD lane's horizontal family needs no
    (W, H) volume transpose at all.

    Steps are DMA'd in groups of K: a (St, K, Dp) block is St rows of
    K*Dp*4 bytes at stride Tp*Dp*4, which sustains ~sequential HBM
    bandwidth on v5e (measured 232 vs 237 GB/s contiguous at K=8),
    while per-step (St, 1, Dp) reads would be 1 KB chunks. The
    recurrence runs over the K in-VMEM steps (unrolled; the backward
    sweep visits groups and in-group steps in reverse). Pad steps
    x >= T pass the volume through untouched (keeping NaN pad columns
    NaN) and do not advance the wavefront; the init step is x == 0
    (forward) or x == T-1 (backward), so tail groups with pad steps
    need no special casing.

    vol: (Sp, Tp, Dp) with Sp % St == 0 and ceil(T/K)*K <= Tp.
    d1_slab: (Sp, WLp) per-scanline D1 rows, lane x = step x — WLp must
    be >= ceil((T+K-1)/128)*128 + 128 (the aligned-window load at the
    last group's steps reads one tile past x).
    g_slab: (Sp, GL) per-scanline D2 rows at lane offset D (lane-
    reversed by the caller for x-reversed storage); GL likewise needs
    K extra headroom past W + D + Dp + 128.
    acc: optional (Sp, Tp, Dp) accumulator, aliased in place — the
    four sweeps of :func:`_sgm_slab_hwd` chain through it so the sum
    needs no separate add pass, and unwritten pad regions keep the
    accumulator's (NaN) contents.

    wta: also emit the winner-take-all map of the accumulated values
    (fused WTA for the FINAL sweep: the per-pixel lane vector is final
    the moment this sweep writes it, so the argmin rides the stream
    and the (Sp, Tp, Dp) volume never needs a separate WTA read).
    Per real step the (St,) argmin column lands in a (St, 128) VMEM
    block at lane x % 128 (a broadcast-compare select — no dynamic
    lane stores), flushed to HBM whenever a 128-lane block completes.
    Ties and NaN semantics match :func:`mccnn_tpu.ops.costs.wta_hwd`.
    write_out=False skips materializing the accumulated volume
    entirely (the right direction's volume is consumed only by its
    WTA map, so its final sweep saves a full volume write).

    Returns out, (out, wta_map), or wta_map per the flags.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Sp, Tp, Dp = vol.shape
    G = -(-T // K)
    assert Sp % St == 0 and G * K <= Tp
    assert write_out or (wta and acc is not None)
    assert Tp % 128 == 0 and 128 % K == 0
    WLp = d1_slab.shape[1]
    GL = g_slab.shape[1]
    p1a_div = alpha1 if sgm_dir == 2 else 1.0
    p1b_div = alpha1 if sgm_dir == 3 else 1.0
    with_acc = acc is not None
    init_x = (T - 1) if reverse_steps else 0
    GPB = 128 // K  # DMA groups per WTA flush block

    def kernel(*refs):
        it = iter(refs)
        vol_hbm, d1_hbm, g_hbm = next(it), next(it), next(it)
        acc_hbm = next(it) if with_acc else None
        out_hbm = next(it) if write_out else None
        wta_hbm = next(it) if wta else None
        vol_b = next(it)
        acc_b = next(it) if with_acc else None
        out_b = next(it) if write_out else None
        prev, d1_v, g_v = next(it), next(it), next(it)
        wta_v = next(it) if wta else None
        in_sems = next(it)
        acc_sems = next(it) if with_acc else None
        out_sems = next(it) if write_out else None
        wta_sem = next(it) if wta else None
        slab_sems = next(it)
        s = pl.program_id(0)
        cp_d1 = pltpu.make_async_copy(
            d1_hbm.at[pl.ds(s * St, St), :], d1_v, slab_sems.at[0])
        cp_g = pltpu.make_async_copy(
            g_hbm.at[pl.ds(s * St, St), :], g_v, slab_sems.at[1])
        cp_d1.start()
        cp_g.start()

        def group(tg):
            return (G - 1 - tg) if reverse_steps else tg

        def in_dma(slot, tg):
            g = group(tg)
            dmas = [pltpu.make_async_copy(
                vol_hbm.at[pl.ds(s * St, St), pl.ds(g * K, K), :],
                vol_b.at[slot], in_sems.at[slot])]
            if with_acc:
                dmas.append(pltpu.make_async_copy(
                    acc_hbm.at[pl.ds(s * St, St), pl.ds(g * K, K), :],
                    acc_b.at[slot], acc_sems.at[slot]))
            return dmas

        def out_dma(slot, tg):
            g = group(tg)
            return pltpu.make_async_copy(
                out_b.at[slot], out_hbm.at[pl.ds(s * St, St),
                                           pl.ds(g * K, K), :],
                out_sems.at[slot])

        for d in in_dma(0, 0):
            d.start()
        cp_d1.wait()
        cp_g.wait()
        # loop invariants, traced once at kernel scope instead of per
        # step: the lane iota and the d-edge guard masks
        lane = jax.lax.broadcasted_iota(jnp.int32, (St, Dp), 1)
        up_edge = lane == 0
        dn_edge = lane == D - 1
        if wta:
            wl = jax.lax.broadcasted_iota(jnp.int32, (St, 128), 1)

        def body(tg, _):
            slot = jax.lax.rem(tg, 2)
            nxt = jax.lax.rem(tg + 1, 2)

            @pl.when(tg + 1 < G)
            def _():
                for d in in_dma(nxt, tg + 1):
                    d.start()
            for d in in_dma(slot, tg):
                d.wait()

            if write_out:
                @pl.when(tg > 1)
                def _():
                    out_dma(slot, tg - 2).wait()

            g = group(tg)
            # per-group bulk transpose to (K, St, Dp): per-step
            # sublane-strided [:, k, :] slices of the DMA layout cost
            # ~2.3 ms/sweep at Hp=768; contiguous [k] slices of the
            # transposed block are free and the bulk swapaxes itself
            # measures at the pure-streaming floor (PERF.md r04)
            # widen BEFORE the transpose: a bf16 (St, K, Dp) swapaxes
            # is a 16-bit sublane interleave Mosaic lowers poorly; the
            # f32 transpose is the measured-at-streaming-floor form
            # (and a no-op cast for the f32 default path)
            v_nat = jnp.swapaxes(vol_b[slot].astype(jnp.float32), 0, 1)
            a_nat = (jnp.swapaxes(acc_b[slot].astype(jnp.float32), 0, 1)
                     if with_acc else None)
            # Per-step D1/D2 window extraction by dynamic roll. A
            # group-base variant (one dynamic roll per K-step group +
            # static per-step rolls of a Dp+256 window) was built,
            # validated bit-exact, and measured a reproducible ~0.3 ms
            # NET NEGATIVE on the full pipeline (52.23 -> 52.52 ms):
            # uniform dynamic rolls lower cheaply on this toolchain
            # (tools/roll_probe.py) and the wider static rolls cost
            # more than the dynamic-roll savings. Reverted; see PERF.md
            # round 5.
            finals = [None] * K
            ks = range(K - 1, -1, -1) if reverse_steps else range(K)
            for k in ks:
                x = g * K + k
                # 16-bit vol/acc/out storage streams at half the HBM
                # traffic; the recurrence always computes in f32 (the
                # casts are no-ops for the f32 default path)
                vol_k = v_nat[k]
                p = prev[:]
                pm = jnp.min(jnp.fmin(p, _BIG), axis=-1, keepdims=True)
                off = x + D
                off_al = pl.multiple_of((off // 128) * 128, 128)
                rem = off - off_al
                gwin = g_v[:, pl.ds(off_al, Dp + 128)]
                D2 = pltpu.roll(gwin, (Dp + 128) - rem, axis=1)[:, :Dp]
                x_al = pl.multiple_of((x // 128) * 128, 128)
                dwin = d1_v[:, pl.ds(x_al, 128)]
                D1 = pltpu.roll(dwin, 128 - (x - x_al), axis=1)[:, :1]
                P1a, P1b, P2 = _penalties3(
                    (D1 < tau_so) & (D2 < tau_so),
                    (D1 > tau_so) & (D2 > tau_so),
                    pi1, pi2, q1, q2, p1a_div, p1b_div)
                # d-edge guards only when D == Dp: with pad lanes
                # present the wrapped neighbors are NaN pad values and
                # fmin already excludes them (bit-identical, 2 fewer
                # selects per step)
                up = pltpu.roll(p, 1, axis=1)
                dn = pltpu.roll(p, Dp - 1, axis=1)
                if D == Dp:
                    up = jnp.where(up_edge, _BIG, up)
                    dn = jnp.where(dn_edge, _BIG, dn)
                cost = jnp.fmin(p, pm + P2)
                cost = jnp.fmin(cost, up + P1a)
                cost = jnp.fmin(cost, dn + P1b)
                # scalar-predicate selects instead of control flow: the
                # init step takes the raw volume, pad steps pass the
                # volume through and do not advance the wavefront (the
                # wasted recurrence math only ever runs on tail-group
                # pad steps)
                val = jnp.where(x == init_x, vol_k, vol_k + cost - pm)
                is_pad = x >= T
                outv = jnp.where(is_pad, vol_k, val)
                final = (outv + a_nat[k]) if with_acc else outv
                finals[k] = final
                if wta:
                    # winner lane of the final per-pixel vector, into
                    # lane x % 128 of the flush block (broadcast-
                    # compare select; ties and all-NaN -> lowest lane,
                    # matching costs.wta_hwd; fmin absorbs NaN exactly
                    # like the where(isnan) form). m is the min of fin,
                    # so fin == m holds at >= 1 lane and arg < Dp
                    # always — all-NaN makes every lane match, arg = 0,
                    # the wta_hwd convention — no fixup select needed.
                    fin = jnp.fmin(final, _BIG)
                    m = jnp.min(fin, axis=-1, keepdims=True)
                    arg = jnp.min(jnp.where(fin == m, lane, Dp), axis=-1,
                                  keepdims=True).astype(jnp.float32)
                    wta_v[:] = jnp.where(
                        wl == jax.lax.rem(x, 128), arg, wta_v[:])
                prev[:] = jnp.where(is_pad, p, val)
            if write_out:
                out_b[slot] = jnp.swapaxes(jnp.stack(finals), 0,
                                           1).astype(out_b.dtype)
                out_dma(slot, tg).start()
            if wta:
                # flush the (St, 128) block when its last group is done
                # (backward sweeps complete a block at its LOWEST group)
                done = (jax.lax.rem(g, GPB) == (0 if reverse_steps
                                                else GPB - 1))

                @pl.when(done | (tg == G - 1))
                def _():
                    blk = g // GPB
                    cp = pltpu.make_async_copy(
                        wta_v, wta_hbm.at[pl.ds(s * St, St),
                                          pl.ds(blk * 128, 128)],
                        wta_sem)
                    cp.start()
                    cp.wait()
            return 0

        jax.lax.fori_loop(0, G, body, 0)
        if write_out:
            out_dma(jax.lax.rem(G - 1, 2), G - 1).wait()

            @pl.when(G > 1)
            def _():
                out_dma(jax.lax.rem(G - 2, 2), G - 2).wait()

    scratch = [
        pltpu.VMEM((2, St, K, Dp), vol.dtype),              # vol_b
    ] + ([pltpu.VMEM((2, St, K, Dp), vol.dtype)] if with_acc else []) + (
        [pltpu.VMEM((2, St, K, Dp), vol.dtype)] if write_out else []) + [
        pltpu.VMEM((St, Dp), jnp.float32),                  # prev (compute)
        pltpu.VMEM((St, WLp), d1_slab.dtype),               # d1 slab
        pltpu.VMEM((St, GL), g_slab.dtype),                 # g slab
    ] + ([pltpu.VMEM((St, 128), jnp.float32)] if wta else []) + [
        pltpu.SemaphoreType.DMA((2,)),                      # in_sems
    ] + ([pltpu.SemaphoreType.DMA((2,))] if with_acc else []) + (
        [pltpu.SemaphoreType.DMA((2,))] if write_out else []) + (
        [pltpu.SemaphoreType.DMA(())] if wta else []) + [
        pltpu.SemaphoreType.DMA((2,)),                      # slab_sems
    ]
    operands = [vol, d1_slab, g_slab] + ([acc] if with_acc else [])
    out_shapes = ([jax.ShapeDtypeStruct((Sp, Tp, Dp), vol.dtype)]
                  if write_out else []) + (
        [jax.ShapeDtypeStruct((Sp, Tp), jnp.float32)] if wta else [])
    res = pl.pallas_call(
        kernel,
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=({3: 0} if (with_acc and write_out) else {}),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    return res[0] if len(res) == 1 else tuple(res)


def _sweep_stream_vslab(vol_s, d1_slab, g_rev, g_nat, n_rev_tiles,
                        reverse_steps, D, pi1, pi2, tau_so, alpha1, q1, q2,
                        sgm_dir, St=256, acc=None, T=None):
    """Vertical streaming sweep with shear-built penalties.

    The vertical sweeps' D2[y, x, d] = g[y, x + d*direction + D] is,
    per step y, a SHEARED read of one gradient row: scanline x needs
    lanes [x+D, x+D+Dp). Instead of materializing the (H, W, D)
    sheared table with an XLA gather and streaming it (the round-1
    formulation: the gather build alone cost ~as much as the sweep),
    each tile DMAs its (T, Lw) lane-window of the gradient rows ONCE
    and builds the (St, Dp) block per step with a log-step per-sublane
    shear (8 roll+selects on the VPU). Scanlines of reversed-lookup
    tiles (reference direction -1) are stored x-reversed in vol_s,
    which makes both tile classes shear identically — their row is
    lane-reversed instead: g_nat[x-d+D] == rev(g_nat)[D+x'+d] at
    x' = W-1-x, so the per-tile window offset D + s_local*St + xi is
    shared.

    vol_s: (T, Sp, Dp) padded NaN, natural step order (T = H).
    d1_slab: (Sp, HL) per-scanline |dy-gradient| rows, lane y = step y
    (x-reversed rows for the first ``n_rev_tiles`` tiles).
    g_rev/g_nat: (T, GL) per-step gradient rows, lane-reversed /
    natural. GL >= D + Sp_per_dir + Dp + 256.
    reverse_steps/St/acc: as in :func:`_sweep_stream_hslab`.

    Packed-class shear (default; MCCNN_VSLAB_PK=0 opts out): the
    per-step D2 shear is ~30% of the sweep's VPU work — a masked
    sublane reduce over the (Tg, Lw) window plus log2(St) masked
    lane rolls of an (St, Lw) block EVERY step. The penalty only
    consumes the 3-way tau_so CLASS of D2 (0/1/2 — _penalties's
    strict comparisons), and classes fit in 2 bits, so the kernel
    packs the classes of PK=8 consecutive steps into one int32 word
    per (row, lane) and shears once per 8-step group; each step then
    extracts its class with a shift+mask on the (St, Dp) slice.
    Exactly the same penalties (the class IS the comparison result,
    computed pointwise before the shear, which commutes), 8x less
    shear work, and all rolls are 32-bit (Mosaic has no sub-32-bit
    lane rotate — a bf16 class shear does not compile).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pk_mode = os.environ.get("MCCNN_VSLAB_PK", "1") != "0"
    PK = 8  # steps per packed class word (2 bits each, Tg % 8 == 0)
    T_full, Sp, Dp = vol_s.shape
    if T is None:
        T = T_full
    assert Sp % St == 0
    HL = d1_slab.shape[1]
    Tg = g_rev.shape[0]  # T padded to a sublane multiple (8) by caller
    assert Tg % 8 == 0 and Tg >= T
    Lw = -(-(St + Dp + 128) // 128) * 128
    p1a_div = alpha1 if sgm_dir == 2 else 1.0
    p1b_div = alpha1 if sgm_dir == 3 else 1.0
    with_acc = acc is not None

    def kernel(*refs):
        it = iter(refs)
        vol_hbm, d1_hbm, grev_hbm, gnat_hbm = (next(it), next(it),
                                               next(it), next(it))
        acc_hbm = next(it) if with_acc else None
        out_hbm = next(it)
        vol_b = next(it)
        acc_b = next(it) if with_acc else None
        out_b, prev, d1_v, g_v = next(it), next(it), next(it), next(it)
        if pk_mode:
            pk_v, shr_v = next(it), next(it)
        in_sems = next(it)
        acc_sems = next(it) if with_acc else None
        out_sems, slab_sems = next(it), next(it)
        s = pl.program_id(0)
        is_rev = s < n_rev_tiles
        s_local = jnp.where(is_rev, s, s - n_rev_tiles)
        base = D + s_local * St
        base_al = pl.multiple_of((base // 128) * 128, 128)
        rem = base - base_al

        cp_d1 = pltpu.make_async_copy(
            d1_hbm.at[pl.ds(s * St, St), :], d1_v, slab_sems.at[0])
        cp_gr = pltpu.make_async_copy(
            grev_hbm.at[:, pl.ds(base_al, Lw)], g_v.at[0], slab_sems.at[1])
        cp_gn = pltpu.make_async_copy(
            gnat_hbm.at[:, pl.ds(base_al, Lw)], g_v.at[1], slab_sems.at[2])
        cp_d1.start()
        cp_gr.start()
        cp_gn.start()

        def step_y(t):
            return (T - 1 - t) if reverse_steps else t

        def in_dma(slot, t):
            y = step_y(t)
            dmas = [pltpu.make_async_copy(
                vol_hbm.at[y, pl.ds(s * St, St), :], vol_b.at[slot],
                in_sems.at[slot])]
            if with_acc:
                dmas.append(pltpu.make_async_copy(
                    acc_hbm.at[y, pl.ds(s * St, St), :], acc_b.at[slot],
                    acc_sems.at[slot]))
            return dmas

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                out_b.at[slot], out_hbm.at[step_y(t), pl.ds(s * St, St), :],
                out_sems.at[slot])

        for d in in_dma(0, 0):
            d.start()
        cp_d1.wait()
        cp_gr.wait()
        cp_gn.wait()
        if pk_mode:
            # this tile's packed class table, once: 0/1/2 per the
            # strict tau_so comparisons (adcensus.cu:596-605; NaN
            # fails both, landing in the middle class like
            # _penalties), rows t..t+7 packed 2 bits apiece into
            # word t — read only at group bases t = 8m, where the
            # sublane wraparound rows never reach
            gsel = g_v[pl.ds(jnp.where(is_rev, 0, 1), 1)][0]
            cls = jnp.where(gsel < tau_so, 0,
                            jnp.where(gsel > tau_so, 2, 1)
                            ).astype(jnp.int32)
            pk = cls
            for kk in range(1, PK):
                pk = pk | (pltpu.roll(cls, Tg - kk, axis=0) << (2 * kk))
            pk_v[:] = pk

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < T)
            def _():
                for d in in_dma(nxt, t + 1):
                    d.start()
            for d in in_dma(slot, t):
                d.wait()
            # 16-bit vol/acc/out storage streams at half the HBM
            # traffic; the recurrence always computes in f32 (the
            # casts are no-ops for the f32 default path)
            vol = vol_b[slot].astype(jnp.float32)

            @pl.when(t > 1)
            def _():
                out_dma(slot, t - 2).wait()

            def emit(val):
                out_b[slot] = ((val + acc_b[slot].astype(jnp.float32))
                               if with_acc else val).astype(out_b.dtype)
                prev[:] = val

            @pl.when(t == 0)
            def _():
                emit(vol)

            @pl.when(t > 0)
            def _():
                y = step_y(t)
                p = prev[:]
                pm = jnp.min(jnp.where(jnp.isnan(p), _BIG, p), axis=-1,
                             keepdims=True)
                # step row y's D2 (or its packed class group), selected
                # with a masked sublane reduce (dynamic single-sublane
                # reads are not DMA-tileable), then the shear: row xi
                # needs a left-roll by rem + xi — scalar part first,
                # then the log-step per-sublane shear
                if pk_mode:
                    yb = (y // PK) * PK
                    trig = (t == 1) | (jax.lax.rem(y, PK) ==
                                       (PK - 1 if reverse_steps else 0))

                    @pl.when(trig)
                    def _():
                        ys = jax.lax.broadcasted_iota(
                            jnp.int32, (Tg, Lw), 0)
                        win = jnp.sum(jnp.where(ys == yb, pk_v[:], 0),
                                      axis=0, keepdims=True)  # (1, Lw)
                        M = jnp.broadcast_to(win, (St, Lw))
                        M = pltpu.roll(M, Lw - rem, axis=1)
                        sub = jax.lax.broadcasted_iota(
                            jnp.int32, (St, Lw), 0)
                        k = 1
                        while k < St:
                            M = jnp.where((sub & k) != 0,
                                          pltpu.roll(M, Lw - k, axis=1), M)
                            k *= 2
                        shr_v[:] = M
                    c2 = jnp.right_shift(shr_v[:, :Dp],
                                         2 * (y - yb)) & 3
                else:
                    gw = g_v[pl.ds(jnp.where(is_rev, 0, 1), 1)][0]
                    ys = jax.lax.broadcasted_iota(jnp.int32, (Tg, Lw), 0)
                    win = jnp.sum(jnp.where(ys == y, gw, 0.0), axis=0,
                                  keepdims=True)  # (1, Lw)
                    M = jnp.broadcast_to(win, (St, Lw))
                    M = pltpu.roll(M, Lw - rem, axis=1)
                    sub = jax.lax.broadcasted_iota(jnp.int32, (St, Lw), 0)
                    k = 1
                    while k < St:
                        M = jnp.where((sub & k) != 0,
                                      pltpu.roll(M, Lw - k, axis=1), M)
                        k *= 2
                y_al = pl.multiple_of((y // 128) * 128, 128)
                dwin = d1_v[:, pl.ds(y_al, 128)]
                D1 = pltpu.roll(dwin, 128 - (y - y_al), axis=1)[:, :1]
                if pk_mode:
                    lo = (D1 < tau_so) & (c2 == 0)
                    hi = (D1 > tau_so) & (c2 == 2)
                else:
                    D2 = M[:, :Dp]
                    lo = (D1 < tau_so) & (D2 < tau_so)
                    hi = (D1 > tau_so) & (D2 > tau_so)
                P1a, P1b, P2 = _penalties3(lo, hi, pi1, pi2, q1, q2,
                                           p1a_div, p1b_div)
                up = pltpu.roll(p, 1, axis=1)
                dn = pltpu.roll(p, Dp - 1, axis=1)
                if D == Dp:  # no NaN pad lanes: mask the d-edge wraps
                    lane = jax.lax.broadcasted_iota(jnp.int32, (St, Dp), 1)
                    up = jnp.where(lane == 0, _BIG, up)
                    dn = jnp.where(lane == D - 1, _BIG, dn)
                cost = jnp.fmin(p, pm + P2)
                cost = jnp.fmin(cost, up + P1a)
                cost = jnp.fmin(cost, dn + P1b)
                emit(vol + cost - pm)
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        out_dma(jax.lax.rem(T - 1, 2), T - 1).wait()

        @pl.when(T > 1)
        def _():
            out_dma(jax.lax.rem(T - 2, 2), T - 2).wait()

    scratch = [
        pltpu.VMEM((2, St, Dp), vol_s.dtype),               # vol_b
    ] + ([pltpu.VMEM((2, St, Dp), vol_s.dtype)] if with_acc else []) + [
        pltpu.VMEM((2, St, Dp), vol_s.dtype),               # out_b
        pltpu.VMEM((St, Dp), jnp.float32),                  # prev (compute)
        pltpu.VMEM((St, HL), d1_slab.dtype),                # d1 slab
        pltpu.VMEM((2, Tg, Lw), g_rev.dtype),               # g windows
    ] + ([pltpu.VMEM((Tg, Lw), jnp.int32),                  # packed cls
          pltpu.VMEM((St, Lw), jnp.int32)] if pk_mode else []) + [
        pltpu.SemaphoreType.DMA((2,)),                      # in_sems
    ] + ([pltpu.SemaphoreType.DMA((2,))] if with_acc else []) + [
        pltpu.SemaphoreType.DMA((2,)),                      # out_sems
        pltpu.SemaphoreType.DMA((3,)),                      # slab_sems
    ]
    operands = [vol_s, d1_slab, g_rev, g_nat] + ([acc] if with_acc else [])
    out = pl.pallas_call(
        kernel,
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T_full, Sp, Dp), vol_s.dtype),
        scratch_shapes=scratch,
        input_output_aliases={4: 0} if with_acc else {},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    return out


def _sweep_grid(vol_s, d1_s, d2_s, pi1, pi2, tau_so, alpha1, q1, q2,
                sgm_dir):
    """Grid-per-step variant (interpret-friendly; used off-TPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S, D = vol_s.shape
    Dp = -(-D // 128) * 128
    # scanlines are independent: tile them so each block fits VMEM
    # comfortably (grid order: scanline tile outer, sweep steps inner,
    # so the carried state belongs to one tile at a time); K sweep
    # steps per grid iteration amortize the per-step pipeline overhead
    # measured sweet spot on v5e at KITTI scale: single-step blocks of
    # 256 scanlines (batching steps or widening blocks both lose)
    K = 1
    Tp = -(-T // K) * K
    St = min(S, 256)
    Sp = -(-S // St) * St
    pad = ((0, Tp - T), (0, Sp - S), (0, Dp - D))
    vol_p = jnp.pad(vol_s, pad, constant_values=jnp.nan)
    d2_p = jnp.pad(d2_s, pad, constant_values=10.0)
    d1_p = jnp.pad(d1_s[:, :, None], ((0, Tp - T), (0, Sp - S), (0, 0)))

    p1a_div = alpha1 if sgm_dir == 2 else 1.0
    p1b_div = alpha1 if sgm_dir == 3 else 1.0

    def kernel(vol_ref, d1_ref, d2_ref, out_ref, prev_ref):
        tb = pl.program_id(1)

        def one_step(k, _):
            vol = vol_ref[k]  # (St, Dp)

            @pl.when((tb == 0) & (k == 0))
            def _():
                out_ref[0] = vol
                prev_ref[:] = vol

            @pl.when((tb > 0) | (k > 0))
            def _():
                prev = prev_ref[:]
                prev_min = jnp.min(jnp.where(jnp.isnan(prev), _BIG, prev),
                                   axis=-1, keepdims=True)
                D1 = d1_ref[k]  # (St, 1)
                D2 = d2_ref[k]  # (St, Dp)
                P1a, P1b, P2 = _penalties3(
                    (D1 < tau_so) & (D2 < tau_so),
                    (D1 > tau_so) & (D2 > tau_so),
                    pi1, pi2, q1, q2, p1a_div, p1b_div)
                # roll by Dp-1 == circular shift by -1 (pltpu.roll
                # requires a non-negative shift); d-edge wraps are NaN
                # pad lanes unless D == Dp (see the slab kernels)
                up = pltpu.roll(prev, 1, axis=1)
                dn = pltpu.roll(prev, Dp - 1, axis=1)
                if D == Dp:
                    lane = jax.lax.broadcasted_iota(jnp.int32, (St, Dp), 1)
                    up = jnp.where(lane == 0, _BIG, up)
                    dn = jnp.where(lane == D - 1, _BIG, dn)
                cost = jnp.fmin(prev, prev_min + P2)
                cost = jnp.fmin(cost, up + P1a)
                cost = jnp.fmin(cost, dn + P1b)
                val = vol + cost - prev_min
                out_ref[k] = val
                prev_ref[:] = val
            return 0

        jax.lax.fori_loop(0, K, one_step, 0, unroll=True)

    out = pl.pallas_call(
        kernel,
        grid=(Sp // St, Tp // K),
        in_specs=[
            pl.BlockSpec((K, St, Dp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, St, 1), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, St, Dp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, St, Dp), lambda s, t: (t, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sp, Dp), vol_s.dtype),
        scratch_shapes=[pltpu.VMEM((St, Dp), vol_s.dtype)],
        interpret=not _pallas_default(),
    )(vol_p, d1_p, d2_p)
    return out[:T, :S, :D]


def _grad_with_sentinel(img, axis, step, sentinel=None):
    """|img - shift(img by -step along axis)| with out-of-frame handling.

    out[i] = |img[i] - img[i-step]|; positions where i-step is out of
    frame get `sentinel` (or 0 meaning "unused / init step" when None).
    """
    n = img.shape[axis]
    idx = jnp.arange(n) - step
    valid = (idx >= 0) & (idx < n)
    shifted = jnp.take(img, jnp.clip(idx, 0, n - 1), axis=axis)
    g = jnp.abs(img - shifted)
    if sentinel is not None:
        shape = [1, 1]
        shape[axis] = n
        g = jnp.where(valid.reshape(shape), g, sentinel)
    return g


def _d2_columns(x1, dx, dy, direction, D):
    """D2 lookup table: d2col[y, x] = |x1[y,x] - x1[y-dy,x-dx]| with 10
    where x or x-dx leaves the frame (adcensus.cu:588-594). Padded by D
    on the x axis so gathers at x + d*direction stay in range; pad = 10.
    """
    H, W = x1.shape
    g = jnp.abs(x1 - jnp.roll(jnp.roll(x1, dy, axis=0), dx, axis=1))
    xs = jnp.arange(W)
    ok = (xs - dx >= 0) & (xs - dx < W)
    g = jnp.where(ok[None, :], g, 10.0)
    return jnp.pad(g, ((0, 0), (D, D)), constant_values=10.0)


def _pick_st(n: int) -> int:
    """Scanline tile minimizing pad-to-multiple waste (largest tile on
    ties). Sublane tiles must be multiples of 8; 128..256 keeps DMA
    blocks efficient."""
    best = None
    for st in range(128, 257, 8):
        key = (-(-n // st) * st, -st)
        if best is None or key < best[0]:
            best = (key, st)
    return best[1]


def _sgm_slab_horiz(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so, alpha1,
                    q1, q2):
    """Horizontal family (sgm_dir 0: ->, 1: <-) on the slab kernel with
    in-kernel accumulation of the two sweeps. Scanlines are image ROWS,
    so this family is fully local under row sharding — the sharded path
    runs it per row-shard inside ``shard_map`` (parallel/inference.py).
    Returns {direction: (D, H, W) sum of both horizontal sweeps}."""
    n = len(dirs)
    Dp = -(-D // 128) * 128
    St_h = _pick_st(H)
    Hp = -(-H // St_h) * St_h
    GL = -(-(W + D + Dp + 128) // 128) * 128
    WLp = -(-W // 128) * 128
    n_rev_h = (Hp // St_h) if (-1 in dirs) else 0
    vol_x = jnp.concatenate(
        [jnp.pad(jnp.transpose(vols[d], (2, 1, 0)),
                 ((0, 0), (0, Hp - H), (0, Dp - D)),
                 constant_values=jnp.nan) for d in dirs],
        axis=1)  # (W, n*Hp, Dp)
    acc_h = None
    for sgm_dir, dx in ((0, 1), (1, -1)):
        d1 = _grad_with_sentinel(x0, axis=1, step=dx)  # (H, W)
        d1p = jnp.pad(d1, ((0, Hp - H), (0, WLp - W)))
        d1_slab = jnp.concatenate([d1p] * n, axis=0)
        g0 = _d2_columns(x1, dx, 0, 1, D)  # (H, W+2D), dir-agnostic
        slabs = []
        for direction in dirs:
            core = g0[:, ::-1] if direction < 0 else g0
            slabs.append(jnp.pad(
                core, ((0, Hp - H), (0, GL - core.shape[1])),
                constant_values=10.0))
        g_slab = jnp.concatenate(slabs, axis=0)
        acc_h = _sweep_stream_hslab(
            vol_x, d1_slab, g_slab, n_rev_h, dx == -1, D, W + D - 1,
            pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir, St=St_h, acc=acc_h)
    return {d: jnp.transpose(acc_h[:, i * Hp:i * Hp + H, :D], (2, 1, 0))
            for i, d in enumerate(dirs)}


def _sgm_slab_vert(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so, alpha1,
                   q1, q2):
    """Vertical family (sgm_dir 2: v, 3: ^) on the slab kernel.
    Returns {direction: (D, H, W) sum of both vertical sweeps}."""
    n = len(dirs)
    Dp = -(-D // 128) * 128
    St_v = _pick_st(W)
    Wp = -(-W // St_v) * St_v
    GLv = -(-(D + Wp + Dp + 256) // 128) * 128
    HL = -(-H // 128) * 128
    n_rev_v = (Wp // St_v) if (-1 in dirs) else 0
    parts = []
    for d in dirs:
        v = jnp.transpose(vols[d], (1, 2, 0))  # (H, W, D)
        if d == -1:
            v = v[:, ::-1, :]  # rev tiles store x reversed (see vslab)
        parts.append(jnp.pad(v, ((0, 0), (0, Wp - W), (0, Dp - D)),
                             constant_values=jnp.nan))
    vol_y = jnp.concatenate(parts, axis=1)  # (H, n*Wp, Dp)
    acc_v = None
    for sgm_dir, dy in ((2, 1), (3, -1)):
        d1 = _grad_with_sentinel(x0, axis=0, step=dy).T  # (W, H): lane y
        d1_parts = []
        for d in dirs:
            rows = d1[::-1] if d == -1 else d1
            d1_parts.append(jnp.pad(rows, ((0, Wp - W), (0, HL - H))))
        d1_slab = jnp.concatenate(d1_parts, axis=0)  # (n*Wp, HL)
        core = jnp.pad(jnp.abs(x1 - jnp.roll(x1, dy, axis=0)),
                       ((0, 0), (D, D)), constant_values=10.0)  # (H, W+2D)
        Hp8 = -(-H // 8) * 8  # DMA sublane alignment (rows > H unused)
        nat = jnp.pad(core, ((0, Hp8 - H), (0, GLv - core.shape[1])),
                      constant_values=10.0)
        rev = jnp.pad(core[:, ::-1], ((0, Hp8 - H), (0, GLv - core.shape[1])),
                      constant_values=10.0)
        acc_v = _sweep_stream_vslab(
            vol_y, d1_slab, rev, nat, n_rev_v, dy == -1, D,
            pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir, St=St_v, acc=acc_v)
    outs = {}
    for i, d in enumerate(dirs):
        vsl = acc_v[:, i * Wp:i * Wp + W, :D]
        if d == -1:
            vsl = vsl[:, ::-1, :]
        outs[d] = jnp.transpose(vsl, (2, 0, 1))
    return outs


def _sgm_slab(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so, alpha1, q1, q2):
    """All four sweeps on the slab kernels with in-kernel accumulation.

    Per family (horizontal, vertical) the volume is laid out ONCE in
    the family's sweep order; the backward sweep indexes steps in
    reverse inside the kernel (no reversal copies) and streams the
    forward sweep's result back in, writing the sum in place (no XLA
    add/transpose passes). One fused transpose-add per reference
    direction combines the two family accumulators at the end.
    """
    h = _sgm_slab_horiz(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so,
                        alpha1, q1, q2)
    v = _sgm_slab_vert(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so,
                       alpha1, q1, q2)
    return {d: h[d] + v[d] for d in dirs}


def _sgm_slab_hwd(x0, x1, vol, D, H, W, *, xrev, pi1, pi2, tau_so, alpha1,
                  q1, q2, wta=False, materialize=True):
    """Four sweeps summed for ONE reference direction, consuming the
    join's native padded disparity-minor layout (ops/join_pallas.py).

    vol: (Hp, Wp, Dp) float32 — ``xrev=True`` for the left/-1 reference
    direction (x-REVERSED storage, as the join emits it), False for the
    right/+1 (natural x). Returns (H, Wp, Dp) in the same storage
    convention, **NOT divided by 4**: WTA is scale-invariant and the
    subpixel parabola ratio is bit-exact under the power-of-2 rescale
    (threshold scaled to 4e-5); callers that materialize the volume
    divide by 4 themselves.

    No volume relayout for the x-reversed direction: a natural ->
    sweep over x IS a reversed-step sweep over the stored axis, and
    the penalty slabs are lane-reversed instead (the mirror identity
    g_nat[x - d + D] == rev(g_nat)[x' + d + D] at x' = W-1-x). BOTH
    families consume the (Hp, Wp, Dp) buffer directly — the
    horizontal sweeps read/write K-step-grouped strided blocks
    (:func:`_sweep_stream_hnat`), so no transpose ever touches the
    volume — and all four sweeps chain through one in-place
    accumulator, so no add pass does either. Sweeps take an explicit
    step count so pad steps never poison the recurrence (the
    up/backward sweeps must INIT on the last REAL step).

    Returns the FULL (Hp, Wp, Dp) buffer: real rows carry NaN at
    columns x' >= W, pad rows y >= H are NaN-or-garbage — callers
    slice [:H]. Requires Hp divisible by a 64-multiple scanline tile
    (the join pads rows to 64).

    wta: also return the fused winner-take-all map (Hp, Wp) computed
    inside the final sweep as the summed values stream past — the
    volume needs no separate WTA read. materialize=False (requires
    wta) skips writing the final sweep's volume entirely and returns
    only the map (the right direction's volume is consumed ONLY by
    its WTA map in the fast pipeline).
    """
    Hp, Wp, Dp = vol.shape
    assert Dp == -(-D // 128) * 128 and Hp % 64 == 0 and Wp % 128 == 0

    # ---- vertical family (sgm_dir 2: v, 3: ^): steps = y ----------------
    St_v = 256 if Wp % 256 == 0 else 128
    st_env = int(os.environ.get("MCCNN_VSLAB_ST", "0"))
    if st_env and Wp % st_env == 0:
        St_v = st_env  # A/B hook: smaller tiles shrink the shear window
    n_rev_v = (Wp // St_v) if xrev else 0
    GLv = -(-(D + Wp + Dp + 256) // 128) * 128
    HL = -(-H // 128) * 128
    acc_v = None
    for sgm_dir, dy in ((2, 1), (3, -1)):
        d1 = _grad_with_sentinel(x0, axis=0, step=dy).T  # (W, H): lane y
        if xrev:
            d1 = d1[::-1]
        d1_slab = jnp.pad(d1, ((0, Wp - W), (0, HL - H)))
        core = jnp.pad(jnp.abs(x1 - jnp.roll(x1, dy, axis=0)),
                       ((0, 0), (D, D)), constant_values=10.0)  # (H, W+2D)
        nat = jnp.pad(core, ((0, Hp - H), (0, GLv - core.shape[1])),
                      constant_values=10.0)
        rev = jnp.pad(core[:, ::-1], ((0, Hp - H), (0, GLv - core.shape[1])),
                      constant_values=10.0)
        acc_v = _sweep_stream_vslab(
            vol, d1_slab, rev, nat, n_rev_v, dy == -1, D,
            pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir, St=St_v, acc=acc_v,
            T=H)

    # ---- horizontal family (sgm_dir 0: ->, 1: <-): steps = x ------------
    # consumes the natural layout via K-step strided DMA groups and
    # chains the accumulator from the vertical family — no transpose,
    # no add pass.
    K = 8
    GL = -(-(W + K + D + Dp + 128) // 128) * 128
    WLp = -(-W // 128) * 128 + 128  # headroom for the tail group's load
    St_h = _pick_st_hnat(Hp, K, Dp, WLp, GL, with_acc=True,
                         vol_itemsize=vol.dtype.itemsize)
    acc = acc_v
    # For the x-reversed storage the natural -> sweep (sgm_dir 0) runs
    # the stored steps in REVERSE, and both passes read lane-reversed
    # slabs; the natural storage is the familiar pairing.
    for sgm_dir, dx in ((0, 1), (1, -1)):
        last = sgm_dir == 1
        reverse_steps = (dx == -1) != xrev
        d1 = _grad_with_sentinel(x0, axis=1, step=dx)  # (H, W), lane x
        g_core = _d2_columns(x1, dx, 0, 1, D)          # (H, W+2D)
        if xrev:
            d1 = d1[:, ::-1]
            g_core = g_core[:, ::-1]
        d1_slab = jnp.pad(d1, ((0, Hp - H), (0, WLp - W)))
        g_slab = jnp.pad(g_core, ((0, Hp - H), (0, GL - g_core.shape[1])),
                         constant_values=10.0)
        acc = _sweep_stream_hnat(
            vol, d1_slab, g_slab, reverse_steps, D, W,
            pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir, St=St_h, K=K,
            acc=acc, wta=wta and last,
            write_out=materialize or not last)
    return acc


def _sgm_multi(x0, x1, vols: dict, *, pi1, pi2, tau_so, alpha1, sgm_q1,
               sgm_q2, use_pallas):
    """Four sweeps, summed, for one OR both reference directions at once.

    vols: {direction: (D, H, W)}. When both directions are present the
    two volumes are stacked along the scanline axis of every sweep —
    scanlines are independent, the sweep order is shared, and only the
    D2 penalty table differs per direction — so both results cost one
    set of sweeps instead of two (the serialized sweep steps are the
    pipeline's critical path).
    """
    pallas = _pallas_default() if use_pallas is None else use_pallas
    sweep = _sweep_pallas if pallas else _sweep
    dirs = sorted(vols)
    D, H, W = vols[dirs[0]].shape
    q1, q2 = sgm_q1, sgm_q2

    # slab variant (default on TPU): oracle-validated; opt out with
    # MCCNN_SGM_HSLAB=0
    if (pallas and _pallas_default()
            and os.environ.get("MCCNN_SGM_HSLAB", "1") != "0"):
        return _sgm_slab(x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so,
                         alpha1, q1, q2)

    h = _sgm_scan_horiz(sweep, x0, x1, vols, dirs, D, H, W, pi1, pi2,
                        tau_so, alpha1, q1, q2)
    v = _sgm_scan_vert(sweep, x0, x1, vols, dirs, D, H, W, pi1, pi2,
                       tau_so, alpha1, q1, q2)
    return {d: h[d] + v[d] for d in dirs}


def _sgm_scan_horiz(sweep, x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so,
                    alpha1, q1, q2):
    """Horizontal sweeps (sgm_dir 0: ->, 1: <-) on the given sweep
    implementation; returns {direction: (D, H, W) sum of both}."""
    n = len(dirs)
    outs = {d: jnp.zeros_like(vols[d]) for d in dirs}
    vol_x = jnp.concatenate(
        [jnp.transpose(vols[d], (2, 1, 0)) for d in dirs],
        axis=1)  # (W, nH, D)
    for sgm_dir, dx in ((0, 1), (1, -1)):
        d1 = _grad_with_sentinel(x0, axis=1, step=dx).T  # (W, H)
        d1s = jnp.concatenate([d1] * n, axis=1)          # (W, nH)
        d2_parts = []
        for direction in dirs:
            d2col = _d2_columns(x1, dx, 0, direction, D)  # (H, W+2D)
            starts = jnp.arange(W) + D + (0 if direction > 0 else -(D - 1))
            d2_all = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    d2col, (0, s), (H, D)))(starts)
            if direction < 0:
                d2_all = d2_all[..., ::-1]
            d2_parts.append(d2_all)
        d2s = jnp.concatenate(d2_parts, axis=1)          # (W, nH, D)
        order = slice(None) if dx == 1 else slice(None, None, -1)
        res = sweep(vol_x[order], d1s[order], d2s[order],
                    pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir)[order]
        for i, d in enumerate(dirs):
            outs[d] = outs[d] + jnp.transpose(
                res[:, i * H:(i + 1) * H], (2, 1, 0))
    return outs


def _sgm_scan_vert(sweep, x0, x1, vols, dirs, D, H, W, pi1, pi2, tau_so,
                   alpha1, q1, q2):
    """Vertical sweeps (sgm_dir 2: v, 3: ^) on the given sweep
    implementation; returns {direction: (D, H, W) sum of both}."""
    n = len(dirs)
    ds = jnp.arange(D)
    outs = {d: jnp.zeros_like(vols[d]) for d in dirs}
    vol_y = jnp.concatenate(
        [jnp.transpose(vols[d], (1, 2, 0)) for d in dirs], axis=1)  # (H, nW, D)
    for sgm_dir, dy in ((2, 1), (3, -1)):
        d1 = _grad_with_sentinel(x0, axis=0, step=dy)  # (H, W)
        d1s = jnp.concatenate([d1] * n, axis=1)        # (H, nW)
        d2_parts = []
        for direction in dirs:
            d2col = _d2_columns(x1, 0, dy, direction, D)  # (H, W+2D)
            idx = jnp.clip(jnp.arange(W)[:, None] + ds[None, :] * direction + D,
                           0, W + 2 * D - 1)
            d2_parts.append(d2col[:, idx])                # (H, W, D)
        d2s = jnp.concatenate(d2_parts, axis=1)          # (H, nW, D)
        order = slice(None) if dy == 1 else slice(None, None, -1)
        res = sweep(vol_y[order], d1s[order], d2s[order],
                    pi1, pi2, tau_so, alpha1, q1, q2, sgm_dir)[order]
        for i, d in enumerate(dirs):
            outs[d] = outs[d] + jnp.transpose(
                res[:, i * W:(i + 1) * W], (2, 0, 1))
    return outs


def sgm(x0: jnp.ndarray, x1: jnp.ndarray, vol: jnp.ndarray, *, pi1: float,
        pi2: float, tau_so: float, alpha1: float, sgm_q1: float,
        sgm_q2: float, direction: int, use_pallas: bool | None = None
        ) -> jnp.ndarray:
    """All four sweeps, summed (caller divides by 4). vol: (D, H, W)."""
    return _sgm_multi(x0, x1, {direction: vol}, pi1=pi1, pi2=pi2,
                      tau_so=tau_so, alpha1=alpha1, sgm_q1=sgm_q1,
                      sgm_q2=sgm_q2, use_pallas=use_pallas)[direction]


def sgm_pair(x0, x1, vol_m1, vol_p1, *, pi1, pi2, tau_so, alpha1,
             sgm_q1, sgm_q2, use_pallas=None):
    """Both reference directions in one fused sweep set; returns
    (out_minus1, out_plus1)."""
    outs = _sgm_multi(x0, x1, {-1: vol_m1, 1: vol_p1}, pi1=pi1, pi2=pi2,
                      tau_so=tau_so, alpha1=alpha1, sgm_q1=sgm_q1,
                      sgm_q2=sgm_q2, use_pallas=use_pallas)
    return outs[-1], outs[1]

"""Disparity refinement: LR consistency, occlusion/mismatch filling,
subpixel parabola fit, median filter, thresholded-Gaussian blur.

Reference kernels: outlier_detection adcensus.cu:878-918,
interpolate_occlusion adcensus.cu:1079-1125, interpolate_mismatch
adcensus.cu:1001-1077, subpixel_enchancement adcensus.cu:1205-1239,
median2d adcensus.cu:1575-1613, mean2d adcensus.cu:1241-1282.

All functions take/return (H, W) float32 maps (the reference's
(1,1,H,W) with the unit dims dropped).

TPU-native design notes: the reference's per-pixel pointer chases
become prefix scans (occlusion fill), a bounded ``while_loop`` over ray
steps (mismatch fill — all rays advance in lock-step, loop exits when
every ray has landed), vector sorts over a stacked window axis
(median), and a scan over kernel rows with Toeplitz gathers (blur).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

MATCH, OCCLUSION, MISMATCH = 0, 1, 2


def outlier_detection(d0: jnp.ndarray, d1: jnp.ndarray, disp_max: int) -> jnp.ndarray:
    """Label each left-map pixel 0=match / 1=occlusion / 2=mismatch
    (adcensus.cu:878-898). d0: left-referenced disparity, d1: right.

    On TPU the VMEM-resident Pallas form (ops/outlier_pallas.py,
    2.7 -> 1.9 ms at KITTI scale, bit-exact); the unrolled-shift XLA
    form below elsewhere."""
    from mccnn_tpu.ops.sgm import _pallas_default

    if _pallas_default():
        from mccnn_tpu.ops.outlier_pallas import outlier_detection_pallas
        return outlier_detection_pallas(d0, d1, disp_max)
    H, W = d0.shape
    xs = jnp.arange(W)[None, :]
    d0i = d0.astype(jnp.int32)
    off_frame = xs - d0i < 0

    # Both tests read d1[y, x-d]: match at d = d0i[y,x], exists for any
    # d. Each d's lookup is a SHIFT of d1, not a gather: slice a
    # left-inf-padded copy (inf fails every comparison where x-d leaves
    # the frame). Fully unrolled over d: every slice start is static,
    # so XLA fuses all D taps into one elementwise kernel, and the
    # match test rides the same taps as a one-hot select (a
    # take_along_axis gather for it cost ~6 ms/map on TPU).
    D = disp_max
    pd1 = jnp.pad(d1, ((0, 0), (D, 0)), constant_values=jnp.inf)
    exists = jnp.zeros((H, W), bool)
    match = jnp.zeros((H, W), bool)
    for d in range(D):
        t = jax.lax.slice(pd1, (0, D - d), (H, D - d + W))
        exists = exists | (jnp.abs(jnp.asarray(d, t.dtype) - t) < 1.1)
        match = match | ((d0i == d) & (jnp.abs(d0 - t) < 1.1))
    out = jnp.where(exists, MISMATCH, OCCLUSION).astype(jnp.float32)
    out = jnp.where(match & ~off_frame, MATCH, out)
    out = jnp.where(off_frame, OCCLUSION, out)
    return out


def interpolate_occlusion(d0: jnp.ndarray, outlier: jnp.ndarray) -> jnp.ndarray:
    """Fill occluded pixels with the nearest *match* pixel's disparity to
    the left; if none exists, nearest to the right; else keep
    (adcensus.cu:1079-1104).

    One "rightmost match value so far" associative scan per side —
    the value rides IN the scan carry, so there is no index cummax and
    no per-pixel gather afterwards (take_along_axis lowers to a gather,
    ~6 ms/map on TPU vs ~1 ms for the pure-select scan)."""
    is_match = outlier == MATCH
    mval = jnp.where(is_match, d0, 0.0)

    def op(a, b):  # b is closer to the pixel: take it if it has a match
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh

    lv, lh = jax.lax.associative_scan(op, (mval, is_match), axis=1)
    rv, rh = jax.lax.associative_scan(op, (mval, is_match), axis=1,
                                      reverse=True)
    fill = jnp.where(lh, lv, jnp.where(rh, rv, d0))
    return jnp.where(outlier == OCCLUSION, fill, d0)


# 16 ray directions, (dx, dy), adcensus.cu:1003-1020
_RAY_DIRS = np.array([
    (0, 1), (-0.5, 1), (-1, 1), (-1, 0.5), (-1, 0), (-1, -0.5), (-1, -1),
    (-0.5, -1), (0, -1), (0.5, -1), (1, -1), (1, -0.5), (1, 0), (1, 0.5),
    (1, 1), (0.5, 1)], dtype=np.float32)


def _half_up(v: float) -> int:
    """floor(v + 0.5): what C round() does to the walk's absolute
    coordinates while they are non-negative (adcensus.cu:1039-1044) —
    and unlike round-half-away it is translation invariant, so probe
    offsets are per-pixel constants."""
    return int(math.floor(v + 0.5))


def _shift_state(arr, dy, dx, fill):
    """arr[..., y, x] <- arr[..., y+dy, x+dx], `fill` outside."""
    out = arr
    for axis, k in ((-2, dy), (-1, dx)):
        if k == 0:
            continue
        n = out.shape[axis]
        pad = [(0, 0)] * out.ndim
        pad[axis] = (max(0, -k), max(0, k))
        sl = [slice(None)] * out.ndim
        sl[axis] = slice(max(0, k), n + max(0, k))
        out = jnp.pad(out, pad, constant_values=fill)[tuple(sl)]
    return out


def interpolate_mismatch(d0: jnp.ndarray, outlier: jnp.ndarray) -> jnp.ndarray:
    """Fill mismatched pixels with the median of the 16 nearest
    non-mismatch disparities along fixed rays (adcensus.cu:1001-1057).

    A ray lands on the first probe that is out of frame (contributing
    nothing) or not labeled mismatch (contributing d0 there); the fill
    is the upper median (vals[count/2]) of the contributing rays.

    TPU-native design: the reference walks each ray until it lands —
    unbounded, and worst-case O(16·H·W·max(H,W)) on noisy disparity
    maps. Here each direction's walk is resolved by pointer doubling:
    the probe pattern repeats with period one or two steps, so "first
    non-mismatch along the ray" composes associatively and log2(extent)
    rounds of masked whole-image shifts resolve every ray — bounded,
    data-independent cost.
    """
    d0 = jnp.asarray(d0)
    outlier = jnp.asarray(outlier)
    H, W = d0.shape
    is_mm = outlier == MISMATCH
    not_mm = ~is_mm
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]

    def check(dy, dx, excl_y=False, excl_x=False):
        """Single-probe state at offset (dy, dx) from each pixel:
        (done, has, val). Out of frame -> done with no value.

        excl_y/excl_x: the probe's true coordinate is its integer
        coordinate minus 0.5 (odd steps of negative-half directions),
        so a probe AT row/column 0 is really at -0.5 -> out of frame.
        """
        inside_o = _shift_state(jnp.ones((H, W), bool), dy, dx, False)
        if excl_y:
            inside_o = inside_o & (ys + dy != 0)
        if excl_x:
            inside_o = inside_o & (xs + dx != 0)
        nm = _shift_state(not_mm, dy, dx, True)  # out of frame: lands empty
        val = _shift_state(d0, dy, dx, 0.0)
        done = nm | ~inside_o
        has = nm & inside_o
        return done, has, jnp.where(has, val, 0.0)

    def compose(a, b_shift):
        """Resolve a, else take b shifted to the jump target."""
        (da, ha, va), (db, hb, vb) = a, b_shift
        return (da | db, jnp.where(da, ha, hb), jnp.where(da, va, vb))

    vals_list, has_list = [], []
    for fdx, fdy in _RAY_DIRS:
        u1 = (_half_up(fdy), _half_up(fdx))
        u2 = (_half_up(2 * fdy), _half_up(2 * fdx))
        half = (abs(fdx) == 0.5) or (abs(fdy) == 0.5)
        # base state: probes t=1 (and t=2 for half-step dirs); the ray
        # from t beyond the base is the ray of the pixel at jump J
        state = check(*u1, excl_y=(fdy == -0.5), excl_x=(fdx == -0.5))
        jy, jx = (u2 if half else u1)
        if half:
            s2 = check(*u2)
            state = compose(state, s2)
        n_rounds = math.ceil(math.log2(max(H, W))) + 1
        for _ in range(n_rounds):
            shifted = tuple(
                _shift_state(s, jy, jx, f)
                for s, f in zip(state, (True, False, 0.0)))
            state = compose(state, shifted)
            jy, jx = 2 * jy, 2 * jx
        done, has, val = state
        has_list.append(has)
        vals_list.append(val)

    # upper median vals[cnt/2] via the same fixed-index ±inf split as
    # median2d (a = mid - cnt//2 rays fill -inf, the rest +inf, so the
    # count-dependent rank lands at the FIXED index mid), read through
    # the pruned min/max selection network instead of a 16-way sort +
    # one-hot select
    cnt = sum(h.astype(jnp.int32) for h in has_list)
    mid = len(_RAY_DIRS) // 2
    a = mid - cnt // 2
    rank = jnp.zeros((H, W), jnp.int32)
    vals = []
    for h, v in zip(has_list, vals_list):
        fill = jnp.where(rank < a, -jnp.inf, jnp.inf)
        vals.append(jnp.where(h, v, fill))
        rank = rank + (~h).astype(jnp.int32)
    for i, j in _median_network(len(vals), mid):
        lo = jnp.minimum(vals[i], vals[j])
        hi = jnp.maximum(vals[i], vals[j])
        vals[i], vals[j] = lo, hi
    fill = jnp.where(cnt > 0, vals[mid], d0)
    return jnp.where(is_mm, fill, d0)


def subpixel_enhancement(d0: jnp.ndarray, vol: jnp.ndarray, disp_max: int
                         ) -> jnp.ndarray:
    """Parabola fit over cost at d-1, d, d+1 (adcensus.cu:1205-1219).
    vol: (D, H, W). NaN neighbors disable the refinement (the CUDA
    ``denom > 1e-5`` comparison is false for NaN).

    TPU-native design: the three cost samples are three masked sums
    over the disparity axis, fused by XLA into ONE traversal of the
    volume — no (H, W, D) relayout and no per-pixel gathers (a
    take_along_axis formulation paid a full-volume transpose plus
    three gather passes). A selected NaN cell propagates through its
    sum exactly like the gather would."""
    d = d0.astype(jnp.int32)
    D = vol.shape[0]
    ds = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    dn = d[None]

    def sel(offset):
        m = ds == dn + offset
        return jnp.sum(jnp.where(m, vol, 0.0), axis=0)

    cn, cz, cp = sel(-1), sel(0), sel(1)
    denom = 2 * (cp + cn - 2 * cz)
    refined = d - jnp.clip((cp - cn) / denom, -1.0, 1.0)
    ok = (d >= 1) & (d < disp_max - 1) & (denom > 1e-5)
    return jnp.where(ok, refined, d).astype(jnp.float32)


def _median_network(n: int, mid: int) -> list[tuple[int, int]]:
    """Comparator list selecting sorted index ``mid`` of ``n`` values:
    Batcher's odd-even mergesort, then dead-comparator elimination
    backward from the one needed output (5×5: 140 -> 113 comparators).
    As min/max chains this fuses into one elementwise XLA kernel —
    measured 3.85 -> 1.39 ms per KITTI map vs jnp.sort on v5e."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    needed = {mid}
    kept = []
    for a, b in reversed(pairs):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.add(a)
            needed.add(b)
    return list(reversed(kept))


def median2d(img: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """k×k median with boundary-clipped windows (adcensus.cu:1575-1594):
    out = sorted(in-frame window values)[count/2].

    The clipped-window median is read at a COUNT-DEPENDENT index,
    which would need a k²-way one-hot select after the sort. Instead,
    out-of-frame taps are filled with ±inf split so the target always
    lands at the FIXED middle index: with cnt in-frame values, filling
    ``a = mid - cnt//2`` taps with -inf (the rest +inf) puts
    sorted[mid] at in-frame rank cnt//2 exactly (a -infs sort below
    every real value, so index mid hits real index mid - a). The fill
    assignment is per-tap by its rank among the pixel's invalid taps —
    pure geometry, computed with a running count in the tap unroll.
    The fixed-index read then runs as a pruned min/max selection
    network (:func:`_median_network`) instead of a full sort."""
    assert kernel_size % 2 == 1 and kernel_size <= 11
    r = kernel_size // 2
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    mid = (kernel_size * kernel_size) // 2
    taps = []
    # window iteration order matches adcensus.cu:1584-1590 (xx outer);
    # irrelevant after the sort but kept for the invalid-rank walk.
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            v = jnp.roll(jnp.roll(img, -dy, 0), -dx, 1)
            ok = ((ys + dy >= 0) & (ys + dy < H)
                  & (xs + dx >= 0) & (xs + dx < W))
            taps.append((v, ok))
    cnt = sum(ok.astype(jnp.int32) for _, ok in taps)
    a = mid - cnt // 2  # -inf fills; always in [0, k*k - cnt]
    vals = []
    rank = jnp.zeros((H, W), jnp.int32)  # invalid taps seen so far
    for v, ok in taps:
        fill = jnp.where(rank < a, -jnp.inf, jnp.inf)
        vals.append(jnp.where(ok, v, fill))
        rank = rank + (~ok).astype(jnp.int32)
    for i, j in _median_network(len(vals), mid):
        lo = jnp.minimum(vals[i], vals[j])
        hi = jnp.maximum(vals[i], vals[j])
        vals[i], vals[j] = lo, hi
    return vals[mid]


def gaussian_kernel(sigma: float) -> np.ndarray:
    """Host-side Gaussian (main.lua:528-540): radius ceil(3σ),
    unnormalized exp(-(x²+y²)/2σ²)."""
    kr = math.ceil(sigma * 3)
    y, x = np.mgrid[-kr:kr + 1, -kr:kr + 1]
    return np.exp(-(x * x + y * y) / (2.0 * sigma * sigma)).astype(np.float32)


def mean2d(img: jnp.ndarray, kernel: jnp.ndarray, alpha2: float) -> jnp.ndarray:
    """Thresholded-Gaussian blur (adcensus.cu:1241-1261): weighted mean
    over the kernel window, excluding neighbors whose value differs
    from the center by >= alpha2, boundary-clipped.

    TPU-native design: the hot stage of the whole pipeline (49×49
    window for the KITTI configs). On TPU, the VMEM-resident Pallas
    stencil (:mod:`mccnn_tpu.ops.blur_pallas`, 11.5 -> 8.2 ms at
    KITTI scale); elsewhere a ``lax.scan`` over kernel rows carries
    the accumulators and the column taps are a static unroll of
    shifted masked adds on a NaN-padded image — pure fused VPU
    stencil work, no gathers and no (H, W, ksz) materialization.
    Out-of-frame taps are excluded by the boundary padding (the XLA
    path pads with NaN, which fails the |diff| < alpha2 comparison;
    the Pallas kernel pads with a finite 1e30 for the same effect).

    Input contract: ``img`` values must be FINITE. The Pallas kernel's
    finite-pad form poisons a window via 0*NaN=NaN if an input VALUE
    is NaN, where the XLA form would cleanly exclude that tap — the
    two backends diverge on NaN inputs. The pipeline always satisfies
    this (disparity maps are finite after subpixel/median); callers
    needing NaN-tolerant taps must use the XLA form explicitly."""
    from mccnn_tpu.ops.sgm import _pallas_default

    if _pallas_default():
        from mccnn_tpu.ops.blur_pallas import mean2d_pallas
        return mean2d_pallas(img, kernel, alpha2)
    ksz = kernel.shape[0]
    assert ksz % 2 == 1
    r = ksz // 2
    H, W = img.shape
    # kernel[i] indexed as i = (dx+r)*ksz + (dy+r) (adcensus.cu:1251-1252);
    # with a symmetric Gaussian the transpose is identical, use [dy, dx].
    kern = jnp.asarray(kernel)
    pad = jnp.pad(img, ((r, r), (r, r)), constant_values=jnp.nan)

    def row_step(carry, inp):
        acc, cnt = carry
        dy, wrow = inp
        # rows y+dy for all y: pad[dy+r+y] — one dynamic sublane slice
        rows = jax.lax.dynamic_slice(pad, (dy + r, 0), (H, W + 2 * r))
        for dx in range(ksz):
            win = jax.lax.slice(rows, (0, dx), (H, dx + W))
            ok = jnp.abs(win - img) < alpha2  # False for NaN taps
            w = jnp.where(ok, wrow[dx], 0.0)
            acc = acc + w * jnp.where(ok, win, 0.0)
            cnt = cnt + w
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(
        row_step, (jnp.zeros_like(img), jnp.zeros_like(img)),
        (jnp.arange(-r, r + 1), kern))
    return acc / cnt


def subpixel_enhancement_hwd(d0: jnp.ndarray, vol: jnp.ndarray,
                             disp_max: int, denom_thresh: float = 1e-5
                             ) -> jnp.ndarray:
    """Disparity-minor variant of :func:`subpixel_enhancement` for the
    HWD lane: vol (H, Wp, Dp), d0 (H, Wp) in the SAME storage order as
    vol (the caller flips x-reversed maps).

    ``denom_thresh``: pass 4e-5 when vol carries the un-divided 4-sweep
    SGM sum — cp/cn/cz are then exactly 4x the reference's values, so
    the parabola ratio is bit-identical and only the threshold needs
    the power-of-2 rescale (adcensus.cu:1205-1219 semantics preserved
    exactly)."""
    d = d0.astype(jnp.int32)
    Dp = vol.shape[-1]
    ds = jnp.arange(Dp, dtype=jnp.int32)[None, None, :]
    dn = d[..., None]

    def sel(offset):
        # exactly one selected lane per pixel, so a 16-bit-stored
        # volume sums without accumulation error; the parabola then
        # computes in f32 (only the stored samples are rounded)
        return jnp.sum(jnp.where(ds == dn + offset, vol, 0.0),
                       axis=-1).astype(jnp.float32)

    cn, cz, cp = sel(-1), sel(0), sel(1)
    denom = 2 * (cp + cn - 2 * cz)
    refined = d - jnp.clip((cp - cn) / denom, -1.0, 1.0)
    ok = (d >= 1) & (d < disp_max - 1) & (denom > denom_thresh)
    return jnp.where(ok, refined, d).astype(jnp.float32)

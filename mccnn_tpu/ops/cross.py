"""Cross-based cost aggregation (CBCA).

Reference: ``cross`` adcensus.cu:280-341 (support-arm computation) and
``cbca`` adcensus.cu:343-400 (aggregation over the intersection of the
left and right pixels' support regions).

TPU-native design: instead of one thread walking arms per pixel, arms
come from a short static unroll over arm length (L1 <= 14 in every
config), and the aggregation becomes two prefix-sum+gather passes
(horizontal then vertical) — all dense (D, H, W) vector work, no
data-dependent loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_arms(x0: jnp.ndarray, L1: int, tau1: float) -> jnp.ndarray:
    """Support-arm endpoints for every pixel of a grayscale image (H, W).

    Returns (4, H, W) float32 of *exclusive* break coordinates, exactly
    the reference layout (adcensus.cu:304-321): [0] -x arm (x coord),
    [1] +x, [2] -y (y coord), [3] +y.

    Walk semantics (adcensus.cu:306-319): distance-1 neighbors are
    always inside the region; from distance 2 on, the walk breaks at
    the first probe with |x0[center]-x0[probe]| >= tau1, at distance
    >= L1, or when leaving the frame. The stored value is the break
    coordinate itself (one past the last included pixel).
    """
    H, W = x0.shape
    k_max = max(2, L1)  # rule 2 fires at distance max(2, L1)

    def arm(axis: int, sign: int) -> jnp.ndarray:
        n = x0.shape[axis]
        coord = jnp.arange(n)
        coord = coord[:, None] if axis == 0 else coord[None, :]
        # first color violation at distance >= 2 (else k_max)
        k_break = jnp.full((H, W), k_max, jnp.int32)
        alive = jnp.ones((H, W), bool)
        for k in range(2, k_max):
            probe = jnp.roll(x0, -sign * k, axis=axis)
            in_frame = (coord + sign * k >= 0) & (coord + sign * k < n)
            viol = alive & in_frame & (jnp.abs(x0 - probe) >= tau1)
            k_break = jnp.where(viol, k, k_break)
            alive = alive & ~viol
        # leaving the frame breaks unconditionally (adcensus.cu:307)
        k_oof = jnp.where(sign < 0, coord + 1, n - coord)
        k_break = jnp.minimum(k_break, jnp.broadcast_to(k_oof, (H, W)))
        return (coord + sign * k_break).astype(jnp.float32)

    return jnp.stack([arm(1, -1), arm(1, +1), arm(0, -1), arm(0, +1)])


def _excl_range_sum(csum: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    axis: int) -> jnp.ndarray:
    """Sum over the exclusive open interval (lo, hi) along `axis`, given
    `csum` = cumulative sum with a leading zero (length n+1 on `axis`).
    Sum over indices [lo+1, hi-1] = csum[hi] - csum[lo+1]."""
    n = csum.shape[axis] - 1
    hi_c = jnp.clip(hi, 0, n)
    lo_c = jnp.clip(lo + 1, 0, n)
    return (jnp.take_along_axis(csum, hi_c, axis=axis)
            - jnp.take_along_axis(csum, lo_c, axis=axis))


def cbca(x0c: jnp.ndarray, x1c: jnp.ndarray, vol: jnp.ndarray,
         direction: int) -> jnp.ndarray:
    """One CBCA iteration (adcensus.cu:343-400).

    x0c/x1c: (4, H, W) arms of the left/right image; vol: (D, H, W).
    For each (d, y, x) with x + d*direction in frame, averages vol[d]
    over the region {(yy, xx)}: yy in the open interval bounded by the
    tighter of the two pixels' vertical arms, xx per row bounded by the
    tighter of (yy, x)'s and (yy, x+d*dir)'s horizontal arms (the
    latter shifted back by d*dir). Out-of-frame cells pass through.
    """
    D, H, W = vol.shape
    dd = (jnp.arange(D) * direction)[:, None, None]  # (D,1,1)
    xs = jnp.arange(W)[None, None, :]
    match_x = xs + dd  # (D,1,W) broadcast target column in x1
    valid = (match_x >= 0) & (match_x < W)  # (D,1,W)
    match_clip = jnp.clip(match_x, 0, W - 1)
    match_b = jnp.broadcast_to(match_clip, (D, H, W))

    # --- horizontal pass: row sums with per-(d, yy, x) bounds ----------
    # bounds (adcensus.cu:362-363): intersect pixel (yy, x)'s horizontal
    # arms with pixel (yy, x + d*dir)'s arms shifted back by d*dir.
    x1c0 = jnp.broadcast_to(x1c[0][None], (D, H, W))
    x1c1 = jnp.broadcast_to(x1c[1][None], (D, H, W))
    xx_s = jnp.maximum(x0c[0][None], jnp.take_along_axis(x1c0, match_b, 2) - dd)
    xx_t = jnp.minimum(x0c[1][None], jnp.take_along_axis(x1c1, match_b, 2) - dd)
    xx_s = xx_s.astype(jnp.int32)
    xx_t = xx_t.astype(jnp.int32)

    vol_z = jnp.where(jnp.isnan(vol), 0.0, vol)
    csum_x = jnp.concatenate(
        [jnp.zeros((D, H, 1), vol.dtype), jnp.cumsum(vol_z, axis=2)], axis=2)
    hsum = _excl_range_sum(csum_x, xx_s, xx_t, axis=2)
    hcnt = jnp.maximum(xx_t - xx_s - 1, 0).astype(vol.dtype)

    # --- vertical pass: column sums with per-(d, y, x) bounds ----------
    # bounds (adcensus.cu:359-360): vertical arms of (y, x) and of
    # (y, x + d*dir) — no shift for vertical coordinates.
    x1c2 = jnp.broadcast_to(x1c[2][None], (D, H, W))
    x1c3 = jnp.broadcast_to(x1c[3][None], (D, H, W))
    yy_s = jnp.maximum(x0c[2][None], jnp.take_along_axis(x1c2, match_b, 2)).astype(jnp.int32)
    yy_t = jnp.minimum(x0c[3][None], jnp.take_along_axis(x1c3, match_b, 2)).astype(jnp.int32)

    csum_y = jnp.concatenate(
        [jnp.zeros((D, 1, W), vol.dtype), jnp.cumsum(hsum, axis=1)], axis=1)
    ccnt_y = jnp.concatenate(
        [jnp.zeros((D, 1, W), vol.dtype), jnp.cumsum(hcnt, axis=1)], axis=1)
    vsum = _excl_range_sum(csum_y, yy_s, yy_t, axis=1)
    vcnt = _excl_range_sum(ccnt_y, yy_s, yy_t, axis=1)

    out = vsum / jnp.maximum(vcnt, 1.0)
    return jnp.where(valid, out, vol)

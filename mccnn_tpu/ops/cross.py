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


def _shift2(x: jnp.ndarray, k: int, axis: int, fill=0.0) -> jnp.ndarray:
    """out[i] = x[i + k] along `axis`, `fill` outside (static k)."""
    if k == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(0, -k), max(0, k))
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(max(0, k), n + max(0, k))
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def cbca(x0c: jnp.ndarray, x1c: jnp.ndarray, vol: jnp.ndarray,
         direction: int, L1: int) -> jnp.ndarray:
    """One CBCA iteration (adcensus.cu:343-400).

    x0c/x1c: (4, H, W) arms of the left/right image; vol: (D, H, W).
    For each (d, y, x) with x + d*direction in frame, averages vol[d]
    over the region {(yy, xx)}: yy in the open interval bounded by the
    tighter of the two pixels' vertical arms, xx per row bounded by the
    tighter of (yy, x)'s and (yy, x+d*dir)'s horizontal arms (the
    latter shifted back by d*dir). Out-of-frame cells pass through.

    TPU-native design: arm extents are bounded by K = max(2, L1), so
    each pass is a static unroll of 2K-1 shifted masked adds — dense
    VPU work, no data-dependent gathers (the reference walks pointers
    per thread; a direct translation would gather, which the TPU
    dislikes). The whole iteration runs under one ``lax.map`` over
    disparity, keeping live buffers at (H, W).
    """
    D, H, W = vol.shape
    K = max(2, int(L1))
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(args):
        vol_d, d = args
        delta = d * direction
        # arms of the right pixel at the match column, shifted back to
        # left coordinates (adcensus.cu:359-363)
        a1 = _shift_x4(x1c, delta)
        xx_s = jnp.maximum(x0c[0], a1[0] - delta)
        xx_t = jnp.minimum(x0c[1], a1[1] - delta)
        yy_s = jnp.maximum(x0c[2], a1[2])
        yy_t = jnp.minimum(x0c[3], a1[3])

        vol_z = jnp.where(jnp.isnan(vol_d), 0.0, vol_d)
        hsum = jnp.zeros_like(vol_z)
        hcnt = jnp.zeros_like(vol_z)
        for k in range(-(K - 1), K):
            col = xs + k
            m = (col > xx_s) & (col < xx_t)
            hsum = hsum + jnp.where(m, _shift2(vol_z, k, 1), 0.0)
            hcnt = hcnt + m.astype(vol_z.dtype)
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]
        vsum = jnp.zeros_like(vol_z)
        vcnt = jnp.zeros_like(vol_z)
        for k in range(-(K - 1), K):
            row = ys + k
            m = (row > yy_s) & (row < yy_t)
            vsum = vsum + jnp.where(m, _shift2(hsum, k, 0), 0.0)
            vcnt = vcnt + jnp.where(m, _shift2(hcnt, k, 0), 0.0)

        out = vsum / jnp.maximum(vcnt, 1.0)
        valid = (xs + delta >= 0) & (xs + delta < W)
        return jnp.where(valid, out, vol_d)

    return jax.lax.map(one, (vol, jnp.arange(D)))


def _shift_x4(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Shift a (4, H, W) stack along W by a traced delta via one padded
    dynamic slice (out[..., x] = x[..., x + delta])."""
    W = x.shape[-1]
    padded = jnp.pad(x, ((0, 0), (0, 0), (W, W)))
    return jax.lax.dynamic_slice_in_dim(padded, W + delta, W, axis=2)

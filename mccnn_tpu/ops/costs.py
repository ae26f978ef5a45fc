"""Matching-cost computation: AD, census, and the fast-net dot-product
cost volume.

Conventions (shared across the package):
- grayscale images are ``(H, W)`` float32,
- feature maps are ``(H, W, C)``,
- cost volumes are ``(D, H, W)`` float32, **lower = better**, with NaN
  at disparities whose match falls outside the frame (the reference's
  sentinel, main.lua:933/946/966),
- ``direction`` is -1 for a left-referenced volume (match at ``x - d``
  in the right image) and +1 for right-referenced, matching the
  reference's convention (adcensus.cu:72, main.lua:934-935).

Reference kernels: ``ad`` adcensus.cu:62-114, ``census``
adcensus.cu:117-175, ``StereoJoin`` adcensus.cu:1455-1498.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NAN = jnp.nan


def _shift_x(img: jnp.ndarray, delta: int | jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """out[..., x] = img[..., x + delta], `fill` where out of frame.

    delta may be a traced scalar (used under lax.scan over disparity).
    """
    W = img.shape[-1]
    idx = jnp.arange(W) + delta
    valid = (idx >= 0) & (idx < W)
    gathered = jnp.take(img, jnp.clip(idx, 0, W - 1), axis=-1)
    return jnp.where(valid, gathered, fill)


def _box_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)^2 box sum with zero padding outside the frame."""
    w = 2 * radius + 1
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, w), (1, 1), "SAME")
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (w, 1), (1, 1), "SAME")
    return x


def ad_volume(x0: jnp.ndarray, x1: jnp.ndarray, disp_max: int, direction: int,
              radius: int = 4) -> jnp.ndarray:
    """Absolute-difference cost: mean |x0 - shift(x1)| over a 9×9 window,
    counting only window positions where both xx and xx+d*dir are
    in-frame (adcensus.cu:62-93). NaN where x+d*dir is out of frame.
    """
    H, W = x0.shape
    xs = jnp.arange(W)

    def one(d):
        delta = d * direction
        x1s = _shift_x(x1, delta)
        valid = ((xs + delta >= 0) & (xs + delta < W)).astype(x0.dtype)
        valid2 = jnp.broadcast_to(valid, (H, W))
        diff = jnp.abs(x0 - x1s) * valid2
        num = _box_sum(diff, radius)
        cnt = _box_sum(valid2, radius)
        cost = num / cnt
        return jnp.where(valid2 > 0, cost, NAN)

    return jax.lax.map(one, jnp.arange(disp_max))


def _census_bits(x: jnp.ndarray, radius: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel census transform, packed.

    Returns (bits, valid): uint32 arrays of shape (n_words, H, W) where
    bit k of word w encodes neighbor (dy, dx) = divmod(32*w + k, 2r+1)
    offsets; ``bits`` holds sign(x[neighbor] < x[center]) and ``valid``
    holds in-frame-ness of the neighbor. Matches the comparison at
    adcensus.cu:138.
    """
    H, W = x.shape
    w = 2 * radius + 1
    n = w * w
    n_words = (n + 31) // 32
    bits = jnp.zeros((n_words, H, W), jnp.uint32)
    valid = jnp.zeros((n_words, H, W), jnp.uint32)
    ys = jnp.arange(H)
    for k in range(n):
        dy, dx = divmod(k, w)
        dy -= radius
        dx -= radius
        shifted = jnp.roll(jnp.roll(x, -dy, axis=0), -dx, axis=1)
        in_y = (ys + dy >= 0) & (ys + dy < H)
        in_x = (jnp.arange(W) + dx >= 0) & (jnp.arange(W) + dx < W)
        ok = in_y[:, None] & in_x[None, :]
        b = (shifted < x) & ok
        word, off = divmod(k, 32)
        bits = bits.at[word].set(bits[word] | (b.astype(jnp.uint32) << off))
        valid = valid.at[word].set(valid[word] | (ok.astype(jnp.uint32) << off))
    return bits, valid


def census_volume(x0: jnp.ndarray, x1: jnp.ndarray, disp_max: int,
                  direction: int, radius: int = 4) -> jnp.ndarray:
    """Census cost (adcensus.cu:117-153): hamming distance between 9×9
    census signatures of x0[y,x] and x1[y,x+d*dir]; any window position
    where xx, xx+d*dir, or yy is out of frame contributes +1.

    Images may be (H, W) or (C, H, W); the cost is averaged over
    channels (adcensus.cu:147). TPU-native design: signatures are
    packed into 3 uint32 words and compared with XOR +
    ``lax.population_count`` — 81 window comparisons become 3 vector
    ops per disparity.
    """
    if x0.ndim == 2:
        x0 = x0[None]
        x1 = x1[None]
    C, H, W = x0.shape
    n = (2 * radius + 1) ** 2
    b0, v0 = jax.vmap(lambda im: _census_bits(im, radius))(x0)  # (C, n_words, H, W)
    b1, v1 = jax.vmap(lambda im: _census_bits(im, radius))(x1)
    xs = jnp.arange(W)

    def one(d):
        delta = d * direction
        b1s = _shift_x(b1, delta, fill=jnp.uint32(0))
        v1s = _shift_x(v1, delta, fill=jnp.uint32(0))
        vpair = v0 & v1s
        mism = jax.lax.population_count((b0 ^ b1s) & vpair)
        invalid = n - jax.lax.population_count(vpair).sum(axis=1)  # (C, H, W)
        dist = (mism.sum(axis=1) + invalid).astype(jnp.float32).sum(axis=0) / C
        center_ok = (xs + delta >= 0) & (xs + delta < W)
        return jnp.where(center_ok[None, :], dist, NAN)

    return jax.lax.map(one, jnp.arange(disp_max))


def stereo_join(feat_l: jnp.ndarray, feat_r: jnp.ndarray, disp_max: int
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-arch cost volumes from L2-normalized feature maps (H, W, C).

    vol_L[d, y, x] = -<feat_l[y, x], feat_r[y, x-d]>   (cost: lower = better)
    vol_R[d, y, x] = vol_L[d, y, x+d]

    NaN where the match is out of frame — cells the reference never
    writes into its NaN-filled buffer (adcensus.cu:1455-1498,
    main.lua:946-947).
    """
    H, W, C = feat_l.shape
    xs = jnp.arange(W)

    def one(d):
        r = _shift_x(jnp.moveaxis(feat_r, -1, 0), -d)  # (C, H, W): feat_r[y, x-d]
        s = -jnp.einsum("hwc,chw->hw", feat_l, r, preferred_element_type=jnp.float32)
        vl = jnp.where(xs - d >= 0, s, NAN)
        vr_s = _shift_x(s, d)  # s[y, x+d]
        vr = jnp.where(xs + d < W, vr_s, NAN)
        return vl, vr

    vol_l, vol_r = jax.lax.map(one, jnp.arange(disp_max))
    return vol_l, vol_r


def stereo_l2r(vol_l: jnp.ndarray) -> jnp.ndarray:
    """Derive the right-referenced volume from the left one:
    vol_R[d, y, x] = vol_L[d, y, x+d], INF out of frame
    (adcensus.cu:1500-1528 — registered upstream but unused, since
    StereoJoin emits both volumes; provided for API parity).
    """
    D, H, W = vol_l.shape
    xs = jnp.arange(W)

    def one(d):
        v = _shift_x(vol_l[d], d, fill=jnp.inf)
        return jnp.where(xs + d < W, v, jnp.inf)

    return jax.lax.map(one, jnp.arange(D))


def fix_border(vol: jnp.ndarray, direction: int, n: int) -> jnp.ndarray:
    """Replicate the first valid column over the CNN's half-window border
    (main.lua:922-927): direction=-1 fixes the last n columns from
    column W-1-n; direction=+1 fixes the first n columns from column n.
    vol is (D, H, W).
    """
    if n <= 0:
        return vol
    W = vol.shape[-1]
    if direction == -1:
        src = vol[..., W - 1 - n][..., None]
        return jnp.concatenate([vol[..., : W - n], jnp.broadcast_to(src, vol.shape[:-1] + (n,))], axis=-1)
    else:
        src = vol[..., n][..., None]
        return jnp.concatenate([jnp.broadcast_to(src, vol.shape[:-1] + (n,)), vol[..., n:]], axis=-1)


def wta(vol: jnp.ndarray) -> jnp.ndarray:
    """Winner-take-all argmin over disparity -> float (H, W), 0-based
    (main.lua:1049-1050). NaN cells never win (CUDA `<` semantics,
    adcensus.cu:253-259); ties go to the lowest disparity.
    """
    clean = jnp.where(jnp.isnan(vol), jnp.inf, vol)
    return jnp.argmin(clean, axis=0).astype(jnp.float32)


def wta_hwd(vol: jnp.ndarray) -> jnp.ndarray:
    """WTA for the disparity-minor (H, W, Dp) layout of the HWD lane:
    argmin over the lane axis, NaN-ignoring, 0-based, ties to the
    lowest disparity (same contract as :func:`wta`). Pad lanes are NaN
    and never win; all-NaN columns (pad) return 0 and are sliced away
    by the caller."""
    clean = jnp.where(jnp.isnan(vol), jnp.inf, vol)
    return jnp.argmin(clean, axis=-1).astype(jnp.float32)

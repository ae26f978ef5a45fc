"""Naive NumPy oracles for every kernel, written as straight nested
loops from the reference kernel semantics (the test.lua oracle
pattern). Small inputs only — these are O(everything) loops.

Each function documents the adcensus.cu lines it encodes.
"""

from __future__ import annotations

import math

import numpy as np

NAN = float("nan")


def ad(x0, x1, disp_max, direction, radius=4):
    """adcensus.cu:62-93"""
    H, W = x0.shape
    out = np.full((disp_max, H, W), NAN, np.float32)
    for d0 in range(disp_max):
        d = d0 * direction
        for y in range(H):
            for x in range(W):
                if 0 <= x + d < W:
                    acc, cnt = 0.0, 0
                    for yy in range(y - radius, y + radius + 1):
                        for xx in range(x - radius, x + radius + 1):
                            if 0 <= xx < W and 0 <= xx + d < W and 0 <= yy < H:
                                acc += abs(x0[yy, xx] - x1[yy, xx + d])
                                cnt += 1
                    out[d0, y, x] = acc / cnt
    return out


def census(x0, x1, disp_max, direction, radius=4):
    """adcensus.cu:117-153; x0/x1: (C, H, W)"""
    if x0.ndim == 2:
        x0, x1 = x0[None], x1[None]
    C, H, W = x0.shape
    out = np.full((disp_max, H, W), NAN, np.float32)
    for d0 in range(disp_max):
        d = d0 * direction
        for y in range(H):
            for x in range(W):
                if 0 <= x + d < W:
                    dist = 0.0
                    for c in range(C):
                        for yy in range(y - radius, y + radius + 1):
                            for xx in range(x - radius, x + radius + 1):
                                if 0 <= xx < W and 0 <= xx + d < W and 0 <= yy < H:
                                    if ((x0[c, yy, xx] < x0[c, y, x])
                                            != (x1[c, yy, xx + d] < x1[c, y, x + d])):
                                        dist += 1
                                else:
                                    dist += 1
                    out[d0, y, x] = dist / C
    return out


def stereo_join(feat_l, feat_r, disp_max):
    """adcensus.cu:1455-1475; feats: (H, W, C)"""
    H, W, C = feat_l.shape
    vol_l = np.full((disp_max, H, W), NAN, np.float32)
    vol_r = np.full((disp_max, H, W), NAN, np.float32)
    for y in range(H):
        for x in range(W):
            for d in range(disp_max):
                if x - d >= 0:
                    s = -float(np.dot(feat_l[y, x], feat_r[y, x - d]))
                    vol_l[d, y, x] = s
                    vol_r[d, y, x - d] = s
    return vol_l, vol_r


def cross_arms(x0, L1, tau1):
    """adcensus.cu:280-321"""
    H, W = x0.shape
    out = np.zeros((4, H, W), np.float32)
    dirs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for di, (dx, dy) in enumerate(dirs):
        for y in range(H):
            for x in range(W):
                xx, yy = x + dx, y + dy
                while True:
                    if xx < 0 or xx >= W or yy < 0 or yy >= H:
                        break
                    dist = max(abs(xx - x), abs(yy - y))
                    if dist != 1:
                        if abs(x0[y, x] - x0[yy, xx]) >= tau1:
                            break
                        if dist >= L1:
                            break
                    xx += dx
                    yy += dy
                out[di, y, x] = xx if di <= 1 else yy
    return out


def cbca(x0c, x1c, vol, direction):
    """adcensus.cu:343-377"""
    D, H, W = vol.shape
    out = np.empty_like(vol)
    for d in range(D):
        dd = d * direction
        for y in range(H):
            for x in range(W):
                if not (0 <= x + dd < W):
                    out[d, y, x] = vol[d, y, x]
                    continue
                acc, cnt = 0.0, 0
                yy_s = max(x0c[2, y, x], x1c[2, y, x + dd])
                yy_t = min(x0c[3, y, x], x1c[3, y, x + dd])
                for yy in range(int(yy_s) + 1, int(yy_t)):
                    xx_s = max(x0c[0, yy, x], x1c[0, yy, x + dd] - dd)
                    xx_t = min(x0c[1, yy, x], x1c[1, yy, x + dd] - dd)
                    for xx in range(int(xx_s) + 1, int(xx_t)):
                        v = vol[d, yy, xx]
                        assert not math.isnan(v)
                        acc += v
                        cnt += 1
                assert cnt > 0
                out[d, y, x] = acc / cnt
    return out


def _fmin(a, b):
    """CUDA fminf: NaN-ignoring."""
    if math.isnan(a):
        return b
    if math.isnan(b):
        return a
    return min(a, b)


def sgm(x0, x1, vol, pi1, pi2, tau_so, alpha1, q1, q2, direction):
    """adcensus.cu:535-618 (sgm2), all four sweeps summed. vol: (D,H,W).

    Written scanline-serial like the v1 kernel but with sgm2's exact
    penalty rules, boundary cases, and layout semantics."""
    D, H, W = vol.shape
    out = np.zeros_like(vol)
    for sgm_dir, (dx, dy) in enumerate([(1, 0), (-1, 0), (0, 1), (0, -1)]):
        if dx != 0:
            starts = [(0 if dx == 1 else W - 1, y) for y in range(H)]
        else:
            starts = [(x, 0 if dy == 1 else H - 1) for x in range(W)]
        for x_st, y_st in starts:
            prev = np.zeros(D, np.float32)
            x, y = x_st, y_st
            first = True
            while 0 <= x < W and 0 <= y < H:
                cur = np.zeros(D, np.float32)
                if first:
                    for d in range(D):
                        cur[d] = vol[d, y, x]
                        out[d, y, x] += cur[d]
                    first = False
                else:
                    vals = [v for v in prev if not math.isnan(v)]
                    prev_min = min(vals) if vals else NAN
                    D1 = abs(x0[y, x] - x0[y - dy, x - dx])
                    for d in range(D):
                        xx = x + d * direction
                        if xx < 0 or xx >= W or xx - dx < 0 or xx - dx >= W:
                            D2 = 10.0
                        else:
                            D2 = abs(x1[y, xx] - x1[y - dy, xx - dx])
                        if D1 < tau_so and D2 < tau_so:
                            P1, P2 = pi1, pi2
                        elif D1 > tau_so and D2 > tau_so:
                            P1, P2 = pi1 / (q1 * q2), pi2 / (q1 * q2)
                        else:
                            P1, P2 = pi1 / q1, pi2 / q1
                        cost = _fmin(prev[d], prev_min + P2)
                        if d > 0:
                            cost = _fmin(cost, prev[d - 1] + (P1 / alpha1 if sgm_dir == 2 else P1))
                        if d < D - 1:
                            cost = _fmin(cost, prev[d + 1] + (P1 / alpha1 if sgm_dir == 3 else P1))
                        cur[d] = vol[d, y, x] + cost - prev_min
                        out[d, y, x] += cur[d]
                prev = cur
                x += dx
                y += dy
    return out


def outlier_detection(d0, d1, disp_max):
    """adcensus.cu:878-898"""
    H, W = d0.shape
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            d0i = int(d0[y, x])
            if x - d0i < 0:
                out[y, x] = 1
            elif abs(d0[y, x] - d1[y, x - d0i]) < 1.1:
                out[y, x] = 0
            else:
                out[y, x] = 1
                for d in range(disp_max):
                    if x - d >= 0 and abs(d - d1[y, x - d]) < 1.1:
                        out[y, x] = 2
                        break
    return out


def interpolate_occlusion(d0, outlier):
    """adcensus.cu:1079-1104"""
    H, W = d0.shape
    out = d0.copy()
    for y in range(H):
        for x in range(W):
            if outlier[y, x] != 1:
                continue
            dx = 0
            while x + dx >= 0 and outlier[y, x + dx] != 0:
                dx -= 1
            if x + dx < 0:
                dx = 0
                while x + dx < W and outlier[y, x + dx] != 0:
                    dx += 1
            if x + dx < W:
                out[y, x] = d0[y, x + dx]
            else:
                out[y, x] = d0[y, x]
    return out


_RAY_DIRS = [
    (0, 1), (-0.5, 1), (-1, 1), (-1, 0.5), (-1, 0), (-1, -0.5), (-1, -1),
    (-0.5, -1), (0, -1), (0.5, -1), (1, -1), (1, -0.5), (1, 0), (1, 0.5),
    (1, 1), (0.5, 1)]


def interpolate_mismatch(d0, outlier):
    """adcensus.cu:1001-1057"""
    H, W = d0.shape
    out = d0.copy()
    for y in range(H):
        for x in range(W):
            if outlier[y, x] != 2:
                continue
            vals = []
            def rnd(v):
                # C roundf: half away from zero (adcensus.cu:1039-1044)
                import math as _m
                return int(_m.floor(v + 0.5)) if v >= 0 else int(_m.ceil(v - 0.5))

            for ddx, ddy in _RAY_DIRS:
                xx, yy = float(x), float(y)
                xx_i, yy_i = rnd(xx), rnd(yy)
                while (0 <= yy_i < H and 0 <= xx_i < W
                       and outlier[yy_i, xx_i] == 2):
                    xx += ddx
                    yy += ddy
                    xx_i, yy_i = rnd(xx), rnd(yy)
                if 0 <= yy_i < H and 0 <= xx_i < W:
                    vals.append(d0[yy_i, xx_i])
            assert vals
            vals.sort()
            out[y, x] = vals[len(vals) // 2]
    return out


def subpixel(d0, vol, disp_max):
    """adcensus.cu:1205-1219"""
    H, W = d0.shape
    out = np.empty((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            d = int(d0[y, x])
            out[y, x] = d
            if 1 <= d < disp_max - 1:
                cn = vol[d - 1, y, x]
                cz = vol[d, y, x]
                cp = vol[d + 1, y, x]
                denom = 2 * (cp + cn - 2 * cz)
                if denom > 1e-5:
                    out[y, x] = d - min(1.0, max(-1.0, (cp - cn) / denom))
    return out


def median2d(img, kernel_size):
    """adcensus.cu:1575-1594"""
    H, W = img.shape
    r = kernel_size // 2
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            xs = []
            for xx in range(x - r, x + r + 1):
                for yy in range(y - r, y + r + 1):
                    if 0 <= xx < W and 0 <= yy < H:
                        xs.append(img[yy, xx])
            xs.sort()
            out[y, x] = xs[len(xs) // 2]
    return out


def mean2d(img, kernel, alpha2):
    """adcensus.cu:1241-1261"""
    H, W = img.shape
    r = kernel.shape[0] // 2
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            acc, cnt = 0.0, 0.0
            i = 0
            for xx in range(x - r, x + r + 1):
                for yy in range(y - r, y + r + 1):
                    if (0 <= xx < W and 0 <= yy < H
                            and abs(img[yy, xx] - img[y, x]) < alpha2):
                        acc += img[yy, xx] * kernel.flat[i]
                        cnt += kernel.flat[i]
                    i += 1
            out[y, x] = acc / cnt
    return out


def l2_normalize(x, eps=1e-5):
    """adcensus.cu:1284-1308; x: (H, W, C)"""
    norm = (x * x).sum(-1, keepdims=True) + eps
    return x / np.sqrt(norm)

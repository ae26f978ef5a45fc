#!/usr/bin/env python
"""Per-stage timing of the fast pipeline on the real chip.

Forced-sync protocol: every timed jit reduces its outputs ON DEVICE to
one scalar which is read back (block_until_ready does not synchronize
through the axon tunnel). Each stage is timed as a standalone jit whose
inputs are device-resident, min of N.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.config import make_config
from mccnn_tpu.cli import init_params
from mccnn_tpu import pipeline as pipe
from mccnn_tpu.ops import sgm as sgm_mod
from mccnn_tpu.utils.images import load_gray, standardize


def _force(out):
    float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), out, jnp.float32(0)))


def timed(name, fn, *args, n=10, reps=3):
    """Amortized-sync protocol: the tunnel's scalar readback costs
    ~29 ms, so per-iteration forced reads would swamp the measurement.
    The device executes dispatches in order, so N dispatches + ONE
    final read times N executions with a single readback."""
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms")
    return out


def hwd_lane():
    """Stage timings of the SHIPPING fast lane (_fast_hwd_jit):
    tower -> HWD MXU join -> 2x slab SGM -> WTA/post, plus the fused
    whole."""
    cfg = make_config("kitti", "fast", a="time")
    disp_max = 228
    sample = "/root/reference/samples/input"
    x0 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiL.png"))))
    x1 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiR.png"))))
    params = init_params(cfg)
    H, W = x0.shape
    D = disp_max
    print(f"HWD lane: pair {H}x{W} D={D}")

    from mccnn_tpu.models import towers
    from mccnn_tpu.ops import join_pallas, costs, post

    tower_fn = jax.jit(lambda p, a, b: towers.apply_tower(
        p, jnp.stack([a, b])[..., None], arch="fast", padding="SAME",
        dtype=jnp.float32))
    feats = timed("tower only", tower_fn, params, x0, x1)

    n_fix = (cfg.ws - 1) // 2
    join_fn = jax.jit(lambda f: join_pallas.stereo_join_mxu_hwd(
        f[0], f[1], D, n_fix=n_fix))
    vol_lr, vol_r = timed("HWD MXU join", join_fn, feats)
    vol_lr = jax.device_put(np.asarray(vol_lr))
    vol_r = jax.device_put(np.asarray(vol_r))

    kw = dict(pi1=cfg.pi1, pi2=cfg.pi2, tau_so=cfg.tau_so,
              alpha1=cfg.alpha1, q1=cfg.sgm_q1, q2=cfg.sgm_q2)
    sgm_l = jax.jit(lambda a, b, v: sgm_mod._sgm_slab_hwd(
        a, b, v, D, H, W, xrev=True, **kw))
    sgm_r = jax.jit(lambda a, b, v: sgm_mod._sgm_slab_hwd(
        a, b, v, D, H, W, xrev=False, **kw))
    cur_lr = timed("slab SGM (left, 4 sweeps)", sgm_l, x0, x1, vol_lr)
    cur_r = timed("slab SGM (right, 4 sweeps)", sgm_r, x0, x1, vol_r)
    sgm_l_w = jax.jit(lambda a, b, v: sgm_mod._sgm_slab_hwd(
        a, b, v, D, H, W, xrev=True, wta=True, **kw))
    sgm_r_w = jax.jit(lambda a, b, v: sgm_mod._sgm_slab_hwd(
        a, b, v, D, H, W, xrev=False, wta=True, materialize=False, **kw))
    timed("slab SGM left + fused WTA", sgm_l_w, x0, x1, vol_lr)
    timed("slab SGM right, WTA only (no vol)", sgm_r_w, x0, x1, vol_r)
    cur_lr = jax.device_put(np.asarray(cur_lr))
    cur_r = jax.device_put(np.asarray(cur_r))

    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))

    def post_fn(clr, cr, a0):
        d_l = costs.wta_hwd(clr)[:H, :W][:, ::-1]
        d_r = costs.wta_hwd(cr)[:H, :W]
        outlier = post.outlier_detection(d_l, d_r, D)
        d = post.interpolate_occlusion(d_l, outlier)
        d = post.interpolate_mismatch(d, outlier)
        Wp = clr.shape[1]
        d_rev = jnp.pad(d[:, ::-1], ((0, 0), (0, Wp - W)))
        s = post.subpixel_enhancement_hwd(d_rev, clr[:H], D,
                                          denom_thresh=4e-5)
        d = s[:, :W][:, ::-1]
        d = post.median2d(d, 5)
        return post.mean2d(d, blur_kernel, cfg.blur_t)
    timed("WTA + post (all stages)", jax.jit(post_fn), cur_lr, cur_r, x0)

    full = jax.jit(lambda p, a, b: pipe.stereo_predict(cfg, p, a, b, D))
    timed("FULL fast HWD stereo_predict", full, params, x0, x1)


def main():
    cfg = make_config("kitti", "fast", a="time")
    disp_max = 228
    sample = "/root/reference/samples/input"
    x0 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiL.png"))))
    x1 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiR.png"))))
    params = init_params(cfg)
    H, W = x0.shape
    print(f"pair {H}x{W} D={disp_max}")

    vols_fn = jax.jit(lambda p, a, b: pipe._volumes_jit(
        p, a, b, arch=cfg.arch, disp_max=disp_max, ws=cfg.ws,
        dtype_name=cfg.dtype, use_pallas=True))
    vols = timed("volumes (tower + MXU join)", vols_fn, params, x0, x1)

    sgm_fn = jax.jit(lambda a, b, vm, vp: sgm_mod.sgm_pair(
        a, b, vm, vp, pi1=cfg.pi1, pi2=cfg.pi2, tau_so=cfg.tau_so,
        alpha1=cfg.alpha1, sgm_q1=cfg.sgm_q1, sgm_q2=cfg.sgm_q2))
    vm, vp = vols[-1], vols[1]
    timed("sgm_pair (slab, 4 sweeps, both dirs)", sgm_fn, x0, x1, vm, vp)

    # SGM internals: horizontal family only vs vertical family only
    def h_only(a, b, vm_, vp_):
        D, Hh, Ww = vm_.shape
        return sgm_mod._sgm_slab(a, b, {-1: vm_, 1: vp_}, [-1, 1], D, Hh, Ww,
                                 cfg.pi1, cfg.pi2, cfg.tau_so, cfg.alpha1,
                                 cfg.sgm_q1, cfg.sgm_q2)
    timed("sgm _sgm_slab direct", jax.jit(h_only), x0, x1, vm, vp)

    full = jax.jit(lambda p, a, b: pipe.stereo_predict(cfg, p, a, b, disp_max))
    timed("FULL stereo_predict", full, params, x0, x1)


def internals():
    """Finer-grained: SGM sub-stages + volumes sub-stages."""
    cfg = make_config("kitti", "fast", a="time")
    disp_max = 228
    sample = "/root/reference/samples/input"
    x0 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiL.png"))))
    x1 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiR.png"))))
    params = init_params(cfg)
    from mccnn_tpu.models import towers
    from mccnn_tpu.ops import join_pallas

    tower_fn = jax.jit(lambda p, a, b: towers.apply_tower(
        p, jnp.stack([a, b])[..., None], arch="fast", padding="SAME",
        dtype=jnp.float32))
    feats = timed("tower only", tower_fn, params, x0, x1)

    join_fn = jax.jit(lambda f: join_pallas.stereo_join_mxu(f[0], f[1], disp_max))
    timed("MXU join only", join_fn, feats)

    vols_fn = jax.jit(lambda p, a, b: pipe._volumes_jit(
        p, a, b, arch=cfg.arch, disp_max=disp_max, ws=cfg.ws,
        dtype_name=cfg.dtype, use_pallas=True))
    vols = vols_fn(params, x0, x1)
    vm = jax.device_put(np.asarray(vols[-1]))
    vp = jax.device_put(np.asarray(vols[1]))
    D, H, W = vm.shape
    a = (cfg.pi1, cfg.pi2, cfg.tau_so, cfg.alpha1, cfg.sgm_q1, cfg.sgm_q2)

    # horizontal family alone (layout build + 2 hslab sweeps)
    def h_family(a0, a1, m, p):
        import mccnn_tpu.ops.sgm as S
        dirs = [-1, 1]; vols_ = {-1: m, 1: p}
        n = len(dirs); Dp = -(-D // 128) * 128
        St_h = S._pick_st(H); Hp = -(-H // St_h) * St_h
        GL = -(-(W + D + Dp + 128) // 128) * 128
        WLp = -(-W // 128) * 128
        n_rev_h = Hp // St_h
        vol_x = jnp.concatenate(
            [jnp.pad(jnp.transpose(vols_[d], (2, 1, 0)),
                     ((0, 0), (0, Hp - H), (0, Dp - D)),
                     constant_values=jnp.nan) for d in dirs], axis=1)
        acc_h = None
        for sgm_dir, dx in ((0, 1), (1, -1)):
            d1 = S._grad_with_sentinel(a0, axis=1, step=dx)
            d1p = jnp.pad(d1, ((0, Hp - H), (0, WLp - W)))
            d1_slab = jnp.concatenate([d1p] * n, axis=0)
            g0 = S._d2_columns(a1, dx, 0, 1, D)
            slabs = []
            for direction in dirs:
                core = g0[:, ::-1] if direction < 0 else g0
                slabs.append(jnp.pad(core, ((0, Hp - H), (0, GL - core.shape[1])),
                                     constant_values=10.0))
            g_slab = jnp.concatenate(slabs, axis=0)
            acc_h = S._sweep_stream_hslab(
                vol_x, d1_slab, g_slab, n_rev_h, dx == -1, D, W + D - 1,
                *a[:4], a[4], a[5], sgm_dir, St=St_h, acc=acc_h)
        return acc_h
    timed("  h-family (build + 2 sweeps)", jax.jit(h_family), x0, x1, vm, vp)

    # layout build only
    def build_only(m, p):
        import mccnn_tpu.ops.sgm as S
        dirs = [-1, 1]; vols_ = {-1: m, 1: p}
        Dp = -(-D // 128) * 128
        St_h = S._pick_st(H); Hp = -(-H // St_h) * St_h
        return jnp.concatenate(
            [jnp.pad(jnp.transpose(vols_[d], (2, 1, 0)),
                     ((0, 0), (0, Hp - H), (0, Dp - D)),
                     constant_values=jnp.nan) for d in dirs], axis=1)
    timed("  vol_x build only", jax.jit(build_only), vm, vp)

    # final combine only
    import mccnn_tpu.ops.sgm as S
    St_h = S._pick_st(H); Hp = -(-H // St_h) * St_h
    St_v = S._pick_st(W); Wp = -(-W // St_v) * St_v
    Dp = -(-D // 128) * 128
    acc_h = jax.device_put(np.random.rand(W, 2 * Hp, Dp).astype(np.float32))
    acc_v = jax.device_put(np.random.rand(H, 2 * Wp, Dp).astype(np.float32))
    def combine(ah, av):
        outs = {}
        for i, d in enumerate([-1, 1]):
            vsl = av[:, i * Wp:i * Wp + W, :D]
            if d == -1:
                vsl = vsl[:, ::-1, :]
            outs[d] = (jnp.transpose(ah[:, i * Hp:i * Hp + H, :D], (2, 1, 0))
                       + jnp.transpose(vsl, (2, 0, 1)))
        return outs
    timed("  final combine (transpose-add)", jax.jit(combine), acc_h, acc_v)


if __name__ == "__main__":
    if "--legacy" in sys.argv:
        # the pre-HWD (natural-layout) lane's stages
        main()
        internals()
    else:
        hwd_lane()

#!/usr/bin/env python
"""A/B the bf16 cost-volume storage lane per stage (VERDICT r04 #3).

Times the SGM left chain (+WTA) and the full pipeline with
-vol_dtype float32 vs bfloat16 on the golden pair.
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
from mccnn_tpu.ops import sgm as sgm_mod, join_pallas
from mccnn_tpu.models import towers
from mccnn_tpu.utils.images import load_gray, standardize


def _force(out):
    float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out,
        jnp.float32(0)))


def timed(name, fn, *args, n=10, reps=3):
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:46s} {min(ts)*1e3:8.2f} ms")
    return out


def main():
    cfg = make_config("kitti", "fast", a="time")
    D = 228
    sample = "/root/reference/samples/input"
    x0 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiL.png"))))
    x1 = jax.device_put(standardize(load_gray(os.path.join(sample, "kittiR.png"))))
    params = init_params(cfg)
    H, W = x0.shape
    n_fix = (cfg.ws - 1) // 2
    kw = dict(pi1=cfg.pi1, pi2=cfg.pi2, tau_so=cfg.tau_so,
              alpha1=cfg.alpha1, q1=cfg.sgm_q1, q2=cfg.sgm_q2)

    feats = jax.jit(lambda p, a, b: towers.apply_tower(
        p, jnp.stack([a, b])[..., None], arch="fast", padding="SAME",
        dtype=jnp.float32))(params, x0, x1)

    for dt in (jnp.float32, jnp.bfloat16):
        name = np.dtype(dt).name
        join_fn = jax.jit(lambda f: join_pallas.stereo_join_mxu_hwd(
            f[0], f[1], D, n_fix=n_fix, out_dtype=dt))
        vol_lr, _ = timed(f"join out_dtype={name}", join_fn, feats)
        vol_lr = jax.device_put(np.asarray(vol_lr))
        sgm_l_w = jax.jit(lambda a, b, v: sgm_mod._sgm_slab_hwd(
            a, b, v, D, H, W, xrev=True, wta=True, **kw))
        timed(f"SGM left chain + WTA [{name}]", sgm_l_w, x0, x1, vol_lr)

    for vd in ("float32", "bfloat16"):
        c = make_config("kitti", "fast", a="time", vol_dtype=vd)
        full = jax.jit(lambda p, a, b: pipe.stereo_predict(c, p, a, b, D))
        timed(f"FULL pipeline vol_dtype={vd}", full, params, x0, x1)
    c2 = make_config("kitti", "fast", a="time", vol_dtype="bfloat16",
                     dtype="bfloat16")
    full2 = jax.jit(lambda p, a, b: pipe.stereo_predict(c2, p, a, b, D))
    timed("FULL pipeline bf16 compute+storage", full2, params, x0, x1)


if __name__ == "__main__":
    main()

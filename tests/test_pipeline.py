"""Pipeline-level tests: every arch end-to-end on tiny inputs, the
sm_terminate contract, and the cost-volume cache tier."""

import os

import numpy as np
import pytest

from mccnn_tpu.config import make_config
from mccnn_tpu.pipeline import compute_volumes, stereo_predict
from mccnn_tpu.cli import init_params

H, W, D = 24, 40, 8
rng = np.random.RandomState(11)
X0 = rng.randn(H, W).astype(np.float32)
X1 = rng.randn(H, W).astype(np.float32)


@pytest.mark.parametrize("arch", ["ad", "census", "fast", "slow"])
def test_full_pipeline_all_arches(arch):
    cfg = make_config("kitti", arch, a="predict")
    params = init_params(cfg)
    disp = np.asarray(stereo_predict(cfg, params, X0, X1, D))
    assert disp.shape == (H, W)
    assert np.isfinite(disp).all()
    assert disp.min() >= 0 and disp.max() <= D


def test_terminate_cnn_is_wta_of_volume():
    cfg = make_config("kitti", "ad", a="predict", sm_terminate="cnn")
    disp = np.asarray(stereo_predict(cfg, None, X0, X1, D))
    vols = compute_volumes(cfg, None, X0, X1, D)
    vol = np.asarray(vols[-1])
    want = np.nanargmin(np.where(np.isnan(vol), np.inf, vol), axis=0)
    np.testing.assert_array_equal(disp, want.astype(np.float32))


def test_volume_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config("kitti", "ad", a="test_te", make_cache=True)
    d1 = np.asarray(stereo_predict(cfg, None, X0, X1, D, pair_id=7))
    assert os.path.exists("cache/7.npz")
    cfg2 = make_config("kitti", "ad", a="test_te", use_cache=True)
    d2 = np.asarray(stereo_predict(cfg2, None, X0, X1, D, pair_id=7))
    np.testing.assert_array_equal(d1, d2)


def test_sm_skip_changes_output():
    cfg = make_config("kitti", "census", a="predict")
    base = np.asarray(stereo_predict(cfg, None, X0, X1, D))
    cfg_skip = make_config("kitti", "census", a="predict", sm_skip="sgm")
    skipped = np.asarray(stereo_predict(cfg_skip, None, X0, X1, D))
    assert not np.array_equal(base, skipped)


def test_bf16_compute_dtype_runs():
    """-dtype bfloat16 drives the matching network in bf16 (TPU-native
    extension; the method stages stay f32)."""
    cfg = make_config("kitti", "fast", a="predict", dtype="bfloat16")
    params = init_params(cfg)
    disp = np.asarray(stereo_predict(cfg, params, X0, X1, D))
    assert np.isfinite(disp).all()


def test_fast_hwd_lane_interpret_vs_standard(monkeypatch):
    """The HWD fast lane (MXU join -> chained natural-layout slab SGM
    -> fused WTA -> refinement) run off-TPU via interpret-mode Pallas
    must match the standard DHW lane, for both the disparity-only and
    the predict-mode (return_vols) outputs. This puts the production
    TPU pipeline's orchestration (accumulator chaining, fused-WTA
    unpacking, volume-less right direction) under the CPU suite; the
    TPU lane re-validates the same path on hardware."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mccnn_tpu import pipeline as pipe
    from mccnn_tpu.ops import post

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    cfg = make_config("kitti", "fast", a="predict")
    params = init_params(cfg)
    rng = np.random.RandomState(17)
    H, W, D = 48, 200, 40
    base = rng.randn(H, W + D).astype(np.float32)
    x0 = jnp.asarray(base[:, D:])
    x1 = jnp.asarray(base[:, :-D])
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    common = dict(disp_max=D, kitti=True, ws=cfg.ws, dtype_name="float32",
                  pi1=float(cfg.pi1), pi2=float(cfg.pi2),
                  tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
                  sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
                  sgm_i=int(cfg.sgm_i), blur_t=float(cfg.blur_t),
                  sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip)

    d_h, vl_h, vr_h = pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                          return_vols=True, **common)
    d_only = pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                 return_vols=False, **common)

    vols = pipe._volumes_jit(params, x0, x1, arch="fast", disp_max=D,
                             ws=cfg.ws, dtype_name="float32",
                             use_pallas=False)
    d_s, vl_s, vr_s = pipe._method_jit(
        vols, x0, x1, disp_max=D, directions=(1, -1), kitti=True,
        L1=int(cfg.L1), tau1=float(cfg.tau1), cbca_i1=0, cbca_i2=0,
        pi1=float(cfg.pi1), pi2=float(cfg.pi2), tau_so=float(cfg.tau_so),
        alpha1=float(cfg.alpha1), sgm_q1=float(cfg.sgm_q1),
        sgm_q2=float(cfg.sgm_q2), sgm_i=int(cfg.sgm_i),
        blur_kernel=blur_kernel, blur_t=float(cfg.blur_t),
        sm_terminate="", sm_skip="", return_vols=True, sgm_pallas=False)

    assert np.array_equal(np.asarray(d_h), np.asarray(d_only))
    for name, a, b in (("volL", vl_h, vl_s), ("volR", vr_h, vr_s)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.array_equal(np.isnan(a), np.isnan(b)), name
        assert np.nanmax(np.abs(a - b)) < 1e-3, name
    d_h, d_s = np.asarray(d_h), np.asarray(d_s)
    assert float((np.abs(d_h - d_s) > 0.51).mean()) < 0.01


def test_fast_hwd_single_direction_interpret(monkeypatch):
    """The single-direction HWD lane (Middlebury evaluation runs only
    the -1 reference direction, main.lua:954-955: half the join/SGM
    work, no outlier stage) must match the standard lane in
    interpret-mode Pallas."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mccnn_tpu import pipeline as pipe
    from mccnn_tpu.ops import post

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    cfg = make_config("mb", "fast", a="test_te")
    params = init_params(cfg)
    rng = np.random.RandomState(23)
    H, W, D = 48, 200, 40
    base = rng.randn(H, W + D).astype(np.float32)
    x0 = jnp.asarray(base[:, D:])
    x1 = jnp.asarray(base[:, :-D])
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))

    d_h = pipe._fast_hwd_body(
        params, x0, x1, blur_kernel, disp_max=D, kitti=False, ws=cfg.ws,
        dtype_name="float32", pi1=float(cfg.pi1), pi2=float(cfg.pi2),
        tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
        sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
        sgm_i=int(cfg.sgm_i), blur_t=float(cfg.blur_t),
        sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip,
        return_vols=False, directions=(-1,))

    vols = pipe._volumes_jit(params, x0, x1, arch="fast", disp_max=D,
                             ws=cfg.ws, dtype_name="float32",
                             use_pallas=False)
    d_s = pipe._method_jit(
        {-1: vols[-1]}, x0, x1, disp_max=D, directions=(-1,),
        kitti=False, L1=int(cfg.L1), tau1=float(cfg.tau1), cbca_i1=0,
        cbca_i2=0, pi1=float(cfg.pi1), pi2=float(cfg.pi2),
        tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
        sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
        sgm_i=int(cfg.sgm_i), blur_kernel=blur_kernel,
        blur_t=float(cfg.blur_t), sm_terminate="", sm_skip="",
        return_vols=False, sgm_pallas=False)

    d_h, d_s = np.asarray(d_h), np.asarray(d_s)
    assert float((np.abs(d_h - d_s) > 0.51).mean()) < 0.01


@pytest.mark.parametrize("vol_dtype", ["float16", "bfloat16"])
def test_fast_hwd_vol_dtype_16bit(monkeypatch, vol_dtype):
    """-vol_dtype float16/bfloat16 (16-bit cost-volume STORAGE through
    the join + SGM sweeps; every arithmetic step still computes in
    f32) must stay within rounding distance of the f32 run: same
    shapes, finite output, small WTA-flip rate and sub-pixel mean
    |Δdisp|. The predict-mode volumes widen back to the f32 output
    contract (README:63-66)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mccnn_tpu import pipeline as pipe
    from mccnn_tpu.ops import post

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    cfg = make_config("kitti", "fast", a="predict")
    params = init_params(cfg)
    rng = np.random.RandomState(31)
    H, W, D = 48, 200, 40
    base = rng.randn(H, W + D).astype(np.float32)
    x0 = jnp.asarray(base[:, D:])
    x1 = jnp.asarray(base[:, :-D])
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    common = dict(disp_max=D, kitti=True, ws=cfg.ws, dtype_name="float32",
                  pi1=float(cfg.pi1), pi2=float(cfg.pi2),
                  tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
                  sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
                  sgm_i=int(cfg.sgm_i), blur_t=float(cfg.blur_t),
                  sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip)

    d32 = np.asarray(pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                         return_vols=False, **common))
    d16, vl16, vr16 = pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                          return_vols=True,
                                          vol_dtype=vol_dtype, **common)
    # the predict-mode volumes widen back to the f32 output contract
    # (README:63-66) regardless of the 16-bit storage inside
    assert vl16.dtype == jnp.float32
    assert vr16.dtype == jnp.float32
    d16 = np.asarray(d16)
    assert d16.shape == d32.shape and np.isfinite(d16).all()
    flip = float((np.abs(d16 - d32) > 1.0).mean())
    mad = float(np.abs(d16 - d32).mean())
    # random-noise inputs are the WORST case for 16-bit WTA margins
    # (adjacent costs are statistically close); natural imagery flips
    # far less (the TPU golden-pair test quantifies that).
    assert flip < 0.15, flip
    assert mad < 1.0, mad


def test_vol_dtype_requires_hwd_lane():
    """-vol_dtype on a non-HWD config must error, not silently run the
    f32 standard lane (it would misreport a benchmark)."""
    cfg = make_config("kitti", "fast", a="predict", vol_dtype="float16",
                      cbca_i1=2)  # CBCA forces the standard lane
    params = init_params(cfg)
    with pytest.raises(ValueError, match="vol_dtype"):
        stereo_predict(cfg, params, X0, X1, D)


def test_fast_hwd_bucketed_disp_exact(monkeypatch):
    """D-bucketing through the HWD lane is EXACT: running at a padded
    disp_max bucket with disp_true set must reproduce the exact-shape
    run bit-for-bit (NaN pad lanes never win WTA, drop out of the SGM
    fmin coupling, and poison the subpixel parabola at the
    disp_true-1 boundary into the same keep-d decision as the
    exact-shape bounds guard). disp_true is traced, so every real
    disparity count shares the bucket's compile."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mccnn_tpu import pipeline as pipe
    from mccnn_tpu.ops import post

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    cfg = make_config("kitti", "fast", a="test_te")
    params = init_params(cfg)
    rng = np.random.RandomState(29)
    H, W, D, Db = 48, 200, 40, 64
    base = rng.randn(H, W + D).astype(np.float32)
    x0 = jnp.asarray(base[:, D:])
    x1 = jnp.asarray(base[:, :-D])
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    common = dict(kitti=True, ws=cfg.ws, dtype_name="float32",
                  pi1=float(cfg.pi1), pi2=float(cfg.pi2),
                  tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
                  sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
                  sgm_i=int(cfg.sgm_i), blur_t=float(cfg.blur_t),
                  sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip,
                  return_vols=False)

    d_exact = pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                  disp_max=D, **common)
    d_bucket = pipe._fast_hwd_body(params, x0, x1, blur_kernel,
                                   disp_max=Db, disp_true=D, **common)
    assert np.array_equal(np.asarray(d_exact), np.asarray(d_bucket))


def test_refinement_chain_repairs_occlusions():
    """End-to-end accuracy validation of the KITTI refinement chain on
    a synthetic scene with TRUE occlusions (VERDICT r02 #3): foreground
    rectangles over a background plane, right view forward-splatted
    with a z-buffer, so LR-inconsistent regions exist exactly where
    the reference's outlier_detection -> occlusion fill -> mismatch
    fill chain (main.lua:1054-1066) is supposed to repair them. The
    constant-disparity synthetic sets never exercise this; the
    per-kernel oracles prove semantics but not that the chain REDUCES
    ERROR. This test fails if the fill stages stop helping."""
    from mccnn_tpu.data.datasets import make_occlusion_pair
    from mccnn_tpu.utils.images import standardize

    H, W, D = 64, 160, 24
    left, right, gt, occ, valid = make_occlusion_pair(H, W, D, seed=1)
    x0 = standardize(left)
    x1 = standardize(right)

    def bad3(pred, mask):
        return float((np.abs(pred - gt)[mask] > 3.0).mean())

    cfg_wta = make_config("kitti", "census", a="predict",
                          sm_terminate="cbca2")   # stop right after WTA
    cfg_fill = make_config("kitti", "census", a="predict",
                           sm_terminate="mismatch")  # + outlier/occ/mis
    cfg_full = make_config("kitti", "census", a="predict")
    d_wta = np.asarray(stereo_predict(cfg_wta, None, x0, x1, D))
    d_fill = np.asarray(stereo_predict(cfg_fill, None, x0, x1, D))
    d_full = np.asarray(stereo_predict(cfg_full, None, x0, x1, D))

    m_all = valid
    m_occ = occ & valid
    assert m_occ.sum() > 100  # the scene really has occlusions
    # the fill stages must substantially repair the occluded band
    assert bad3(d_fill, m_occ) < bad3(d_wta, m_occ) - 0.10, (
        bad3(d_fill, m_occ), bad3(d_wta, m_occ))
    # and improve (never regress) the overall error
    assert bad3(d_fill, m_all) < bad3(d_wta, m_all), (
        bad3(d_fill, m_all), bad3(d_wta, m_all))
    # the remaining stages (subpixel/median/blur) must not undo it
    assert bad3(d_full, m_all) <= bad3(d_fill, m_all) + 0.01
    # absolute quality: the full pipeline solves this easy scene
    assert bad3(d_full, m_all) < 0.10, bad3(d_full, m_all)


def test_slow_head_pallas_matches_direct(monkeypatch):
    """The fused slow-head MLP-chain kernel (interpret mode) must match
    the direct per-disparity shift-concat-apply_head formulation
    (main.lua:962-977) to matmul-rounding tolerance, including a
    non-lane-multiple nh2 (zero-padded channels must be exact)."""
    import jax.numpy as jnp

    from mccnn_tpu import pipeline as pipe
    from mccnn_tpu.models import towers
    from mccnn_tpu.ops import costs
    from mccnn_tpu.ops.slow_head_pallas import slow_volumes_mxu

    for nh2, seed in ((16, 43), (24, 44)):
        cfg = make_config("kitti", "slow", a="predict", l1=2, fm=8, l2=3,
                          nh2=nh2)
        params = init_params(cfg)
        rng = np.random.RandomState(seed)
        Hs, Ws, Ds = 11, 140, 19  # awkward: H%R, W%XT, D%K all nonzero
        x0 = jnp.asarray(rng.randn(Hs, Ws).astype(np.float32))
        x1 = jnp.asarray(rng.randn(Hs, Ws).astype(np.float32))
        feats = towers.apply_tower(params, jnp.stack([x0, x1])[..., None],
                                   arch="slow", padding="SAME")
        fl, fr = feats[0], feats[1]

        got_l, got_r = slow_volumes_mxu(params, fl, fr, Ds, interpret=True)

        want_l, want_r = pipe.slow_cost_volumes(params, x0, x1, Ds,
                                                use_pallas=False)
        for got, want in ((got_l, want_l), (got_r, want_r)):
            got, want = np.asarray(got), np.asarray(want)
            assert np.array_equal(np.isnan(got), np.isnan(want))
            # interpret-mode dots run f32 (no bf16 rounding), so the
            # only differences are first-layer factoring accumulation
            # order — tiny
            assert np.nanmax(np.abs(got - want)) < 1e-4

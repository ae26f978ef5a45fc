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

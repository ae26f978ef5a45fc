"""Middlebury path tests on a synthetic dataset: loader structure,
training (light/exposure sampling), eval at light 1, and the PFM
submit output."""

import os

import numpy as np
import pytest

from mccnn_tpu.config import make_config
from mccnn_tpu.data.datasets import load_mb, make_synthetic_mb


@pytest.fixture(scope="module")
def mb_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("mb")
    out = root / "data.mb.imperfect_gray"
    make_synthetic_mb(str(out), n_images=3, height=48, width=96, disp_max=10)
    cfg = make_config("mb", "fast", a="train_tr", data_dir=str(root))
    return cfg, load_mb(cfg)


def test_load_mb_structure(mb_ds):
    cfg, ds = mb_ds
    assert len(ds.X) == 3
    assert ds.X[0][0].shape == (4, 1, 48, 96)       # light 1: 4 views
    assert ds.X[0][1].shape == (2, 2, 1, 48, 96)    # lights 2+: (exp, 2, C, H, W)
    assert int(ds.metadata[0, 2]) == 10
    assert list(ds.te) == [1]
    assert ds.nnz_tr.shape[1] == 4


def test_mb_train_and_eval(mb_ds, capsys):
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.train.evaluate import action_eval
    from mccnn_tpu.train.trainer import train

    cfg, ds = mb_ds
    params = init_params(cfg)
    errs = []
    params, _ = train(cfg, ds, params, epochs=2,
                      log=lambda s: errs.append(s))
    vals = [float(str(e).split("\t")[1]) for e in errs if "\t" in str(e)]
    assert len(vals) == 2 and all(np.isfinite(v) for v in vals)

    cfg.a = "test_te"
    action_eval(cfg, [], params=params, ds=ds)
    out = capsys.readouterr().out.strip().split("\n")
    # te image + extra lighting pairs (5,3),(5,4) clamp... here te=[1]
    # plus (5,3),(5,4) refer to image 5 which doesn't exist in the
    # synthetic set — the reference hard-codes them (main.lua:1129-1131)
    score = float(out[-1])
    assert np.isfinite(score)


def test_mb_submit_writes_pfm(mb_ds, tmp_path, monkeypatch):
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.train.evaluate import action_eval

    cfg, ds = mb_ds
    monkeypatch.chdir(tmp_path)
    cfg2 = make_config("mb", "fast", a="submit", data_dir=cfg.data_dir)
    # submit loops the last 30 images; synthetic has 3, all with
    # fname_submit entries
    ds.n_te = 3
    action_eval(cfg2, [], params=init_params(cfg2), ds=ds)
    assert os.path.exists("out/submission.zip")

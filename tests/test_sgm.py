import numpy as np
import pytest

import naive
from mccnn_tpu.ops import sgm as sgm_mod
from tests_util import assert_close

rng = np.random.RandomState(3)

PARAMS = dict(pi1=4.0, pi2=55.72, tau_so=0.02, alpha1=1.5, sgm_q1=3.0,
              sgm_q2=2.5)


@pytest.mark.parametrize("direction", [-1, 1])
def test_sgm_matches_naive(direction):
    H, W, D = 8, 13, 5
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    vol = rng.rand(D, H, W).astype(np.float32)
    got = sgm_mod.sgm(x0, x1, vol, direction=direction, **PARAMS)
    want = naive.sgm(x0, x1, vol, PARAMS["pi1"], PARAMS["pi2"],
                     PARAMS["tau_so"], PARAMS["alpha1"], PARAMS["sgm_q1"],
                     PARAMS["sgm_q2"], direction)
    assert_close(got, want, tol=1e-4)


def test_sgm_with_nan_cells(direction=-1):
    """NaN cells (out-of-frame disparities) must stay NaN and must not
    poison neighboring scanline states (CUDA fminf semantics)."""
    H, W, D = 6, 10, 4
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    vol = rng.rand(D, H, W).astype(np.float32)
    for d in range(D):
        for x in range(W):
            if x - d < 0:
                vol[d, :, x] = np.nan
    got = sgm_mod.sgm(x0, x1, vol, direction=direction, **PARAMS)
    want = naive.sgm(x0, x1, vol, PARAMS["pi1"], PARAMS["pi2"],
                     PARAMS["tau_so"], PARAMS["alpha1"], PARAMS["sgm_q1"],
                     PARAMS["sgm_q2"], direction)
    assert_close(got, want, tol=1e-4)


def test_sgm_alpha1_affects_vertical_only():
    H, W, D = 6, 9, 4
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    vol = rng.rand(D, H, W).astype(np.float32)
    p2 = dict(PARAMS)
    p2["alpha1"] = 3.0
    a = np.asarray(sgm_mod.sgm(x0, x1, vol, direction=-1, **PARAMS))
    b = np.asarray(sgm_mod.sgm(x0, x1, vol, direction=-1, **p2))
    assert not np.allclose(a, b)

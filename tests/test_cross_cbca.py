import numpy as np
import pytest

import naive
from mccnn_tpu.ops import cross
from tests_util import assert_close


rng = np.random.RandomState(7)


@pytest.mark.parametrize("L1,tau1", [(5, 0.3), (0, 0.0), (14, 0.1), (2, 0.5)])
def test_cross_arms(L1, tau1):
    x0 = rng.rand(12, 18).astype(np.float32)
    got = cross.cross_arms(x0, L1, tau1)
    want = naive.cross_arms(x0, L1, tau1)
    assert_close(got, want)


@pytest.mark.parametrize("direction", [-1, 1])
def test_cbca(direction):
    H, W, D = 12, 18, 6
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    L1, tau1 = 5, 0.4
    x0c = naive.cross_arms(x0, L1, tau1)
    x1c = naive.cross_arms(x1, L1, tau1)
    # volume with the reference NaN pattern (cells never written by
    # StereoJoin)
    vol = rng.rand(D, H, W).astype(np.float32)
    for d in range(D):
        for x in range(W):
            if not (0 <= x + d * direction < W):
                vol[d, :, x] = np.nan
    got = cross.cbca(x0c, x1c, vol, direction, L1)
    want = naive.cbca(x0c, x1c, vol, direction)
    assert_close(got, want, tol=1e-4)


def test_cbca_iterated():
    # two iterations ping-pong (main.lua:998-1001)
    H, W, D = 10, 16, 5
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    x0c = naive.cross_arms(x0, 5, 0.4)
    x1c = naive.cross_arms(x1, 5, 0.4)
    vol = rng.rand(D, H, W).astype(np.float32)
    got = vol
    want = vol.copy()
    for _ in range(2):
        got = np.asarray(cross.cbca(x0c, x1c, got, -1, 5))
        want = naive.cbca(x0c, x1c, want, -1)
    assert_close(got, want, tol=1e-4)

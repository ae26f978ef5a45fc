import jax.numpy as jnp
import numpy as np
import pytest

import naive
from mccnn_tpu.ops import post
from tests_util import assert_close

rng = np.random.RandomState(11)


def _disp_pair(H=10, W=16, D=8):
    d0 = rng.randint(0, D, (H, W)).astype(np.float32)
    d1 = rng.randint(0, D, (H, W)).astype(np.float32)
    return d0, d1, D


def test_outlier_detection():
    d0, d1, D = _disp_pair()
    got = post.outlier_detection(d0, d1, D)
    want = naive.outlier_detection(d0, d1, D)
    assert_close(got, want)


def test_interpolate_occlusion():
    d0, d1, D = _disp_pair()
    outlier = naive.outlier_detection(d0, d1, D)
    got = post.interpolate_occlusion(d0, outlier)
    want = naive.interpolate_occlusion(d0, outlier)
    assert_close(got, want)


def test_interpolate_mismatch():
    d0, d1, D = _disp_pair(12, 20, 9)
    outlier = naive.outlier_detection(d0, d1, D)
    got = post.interpolate_mismatch(d0, outlier)
    want = naive.interpolate_mismatch(d0, outlier)
    assert_close(got, want)


def test_interpolate_mismatch_all_mismatch_row():
    # degenerate: a full mismatch block — rays must cross it
    d0 = rng.randint(0, 5, (9, 15)).astype(np.float32)
    outlier = np.full((9, 15), 2.0, np.float32)
    outlier[0, :] = 0
    outlier[-1, :] = 1
    got = post.interpolate_mismatch(d0, outlier)
    want = naive.interpolate_mismatch(d0, outlier)
    assert_close(got, want)


def test_subpixel():
    H, W, D = 8, 12, 7
    vol = rng.rand(D, H, W).astype(np.float32)
    d0 = rng.randint(0, D, (H, W)).astype(np.float32)
    got = post.subpixel_enhancement(d0, vol, D)
    want = naive.subpixel(d0, vol, D)
    assert_close(got, want, tol=1e-5)


def test_subpixel_nan_neighbors():
    vol = np.full((3, 2, 4), np.nan, np.float32)
    vol[1] = 1.0
    d0 = np.ones((2, 4), np.float32)
    got = np.asarray(post.subpixel_enhancement(d0, vol, 3))
    assert (got == 1.0).all()  # NaN denom -> keep integer d


@pytest.mark.parametrize("k", [3, 5])
def test_median2d(k):
    img = rng.rand(10, 14).astype(np.float32)
    got = post.median2d(img, k)
    want = naive.median2d(img, k)
    assert_close(got, want)


@pytest.mark.parametrize("sigma,alpha2", [(1.0, 0.5), (1.67, 2.0)])
def test_mean2d(sigma, alpha2):
    img = (rng.rand(10, 14) * 4).astype(np.float32)
    kern = post.gaussian_kernel(sigma)
    got = post.mean2d(img, kern, alpha2)
    want = naive.mean2d(img, kern, alpha2)
    assert_close(got, want, tol=1e-4)


def test_gaussian_kernel_matches_lua():
    # main.lua:528-540
    k = post.gaussian_kernel(1.0)
    assert k.shape == (7, 7)
    assert k[3, 3] == 1.0
    assert np.isclose(k[3, 4], np.exp(-0.5))


@pytest.mark.parametrize("shape,sigma,alpha2", [
    ((40, 150), 1.7, 2.0),    # multi-row-group kernel, small image
    ((70, 200), 7.74, 5.0),   # the KITTI 49x49 production kernel
    ((64, 128), 2.78, 3.0),   # exact-tile image
    ((40, 150), 1.33, 2.0),   # ksz=9: ksz % 3 == 0 (tail group lands
                              # exactly on the group size — lc == KXG
                              # branch in blur_pallas tail elision)
])
def test_mean2d_pallas_interpret(shape, sigma, alpha2):
    """The VMEM-resident Pallas blur stencil (interpret mode, runs
    anywhere) against the XLA scan form and the loop oracle. The
    production TPU path is re-validated on hardware by
    tests/test_tpu_kernels.py."""
    import jax

    import naive
    from mccnn_tpu.ops.blur_pallas import mean2d_pallas

    rng2 = np.random.RandomState(sum(shape))
    img = (rng2.rand(*shape) * 30).astype(np.float32)
    kern = post.gaussian_kernel(sigma)
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(mean2d_pallas(jnp.asarray(img), jnp.asarray(kern),
                                       alpha2, interpret=True))
    want = naive.mean2d(img, kern, alpha2)
    assert_close(got, want, tol=1e-4)


@pytest.mark.parametrize("shape,D", [((10, 20), 7), ((33, 141), 25)])
def test_outlier_pallas_interpret(shape, D):
    """The VMEM-resident outlier-labeling kernel (interpret mode) must
    be bit-exact against the unrolled-shift XLA form; the TPU lane
    re-validates on hardware."""
    import jax

    from mccnn_tpu.ops.outlier_pallas import outlier_detection_pallas

    rng2 = np.random.RandomState(sum(shape) + D)
    H, W = shape
    d0 = np.round(rng2.rand(H, W) * (D - 1)).astype(np.float32)
    d1 = np.round(rng2.rand(H, W) * (D - 1)).astype(np.float32)
    want = np.asarray(post.outlier_detection(jnp.asarray(d0),
                                             jnp.asarray(d1), D))
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(outlier_detection_pallas(
            jnp.asarray(d0), jnp.asarray(d1), D, interpret=True))
    np.testing.assert_array_equal(got, want)

import jax.numpy as jnp
import numpy as np
import pytest

import naive
from mccnn_tpu.ops import costs

rng = np.random.RandomState(42)


def assert_close(a, b, tol=2e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    nan_a, nan_b = np.isnan(a), np.isnan(b)
    assert (nan_a == nan_b).all(), "NaN pattern mismatch"
    d = np.abs(a[~nan_a] - b[~nan_b])
    assert d.size == 0 or d.max() < tol, f"max diff {d.max()}"


@pytest.mark.parametrize("direction", [-1, 1])
def test_ad(direction):
    x0 = rng.randn(10, 20).astype(np.float32)
    x1 = rng.randn(10, 20).astype(np.float32)
    got = costs.ad_volume(x0, x1, 7, direction)
    want = naive.ad(x0, x1, 7, direction)
    assert_close(got, want)


@pytest.mark.parametrize("direction", [-1, 1])
def test_census(direction):
    x0 = rng.randn(10, 20).astype(np.float32)
    x1 = rng.randn(10, 20).astype(np.float32)
    got = costs.census_volume(x0, x1, 6, direction)
    want = naive.census(x0, x1, 6, direction)
    assert_close(got, want)


def test_census_multichannel():
    x0 = rng.randn(3, 8, 14).astype(np.float32)
    x1 = rng.randn(3, 8, 14).astype(np.float32)
    got = costs.census_volume(x0, x1, 5, -1)
    want = naive.census(x0, x1, 5, -1)
    assert_close(got, want)


def test_stereo_join():
    fl = rng.randn(10, 20, 16).astype(np.float32)
    fr = rng.randn(10, 20, 16).astype(np.float32)
    got_l, got_r = costs.stereo_join(fl, fr, 9)
    want_l, want_r = naive.stereo_join(fl, fr, 9)
    assert_close(got_l, want_l)
    assert_close(got_r, want_r)


def test_fix_border():
    vol = rng.randn(4, 5, 12).astype(np.float32)
    n = 3
    out = np.asarray(costs.fix_border(vol, -1, n))
    want = vol.copy()
    for i in range(1, n + 1):
        want[..., -i] = vol[..., -(n + 1)]
    assert_close(out, want)
    out = np.asarray(costs.fix_border(vol, 1, n))
    want = vol.copy()
    for i in range(n):
        want[..., i] = vol[..., n]
    assert_close(out, want)


def test_wta_nan_and_ties():
    vol = np.array([[[np.nan, 3.0]], [[2.0, 1.0]], [[2.0, 1.0]]], np.float32)
    out = np.asarray(costs.wta(vol))
    assert out[0, 0] == 1  # NaN at d=0 never wins
    assert out[0, 1] == 1  # tie -> lowest d


def test_stereo_join_mxu_matches_xla():
    """The banded-Gram MXU kernel must reproduce the XLA join exactly
    (f32 HIGHEST matmul precision). TPU only."""
    import jax
    import pytest

    if jnp.zeros(1).device.platform != "tpu":
        pytest.skip("Pallas TPU kernel")
    from mccnn_tpu.ops import costs
    from mccnn_tpu.ops.join_pallas import stereo_join_mxu

    rng2 = np.random.RandomState(9)
    H, W, C, D = 20, 300, 64, 48
    # Contract: L2-normalized descriptors (see the hwd test below).
    fl = rng2.randn(H, W, C).astype(np.float32)
    fr = rng2.randn(H, W, C).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)
    vl0, vr0 = costs.stereo_join(jnp.asarray(fl), jnp.asarray(fr), D)
    vl1, vr1 = stereo_join_mxu(jnp.asarray(fl), jnp.asarray(fr), D)
    for a, b in ((vl0, vl1), (vr0, vr1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.nanmax(np.abs(a - b)) < 1e-4


def test_stereo_join_mxu_hwd_interpret():
    """HWD-layout MXU join (interpret mode, runs anywhere): the padded
    (Hp, Wp, Dp) disparity-minor output with in-kernel mask, negation,
    and fix_border must match the XLA join + fix_border oracle after
    relayout (x-unflip of the mirrored left side, transpose). Pinned to
    CPU: on a TPU backend the XLA oracle einsum itself rounds to bf16
    (default matmul precision), so the comparison would measure the
    oracle's error, not the kernel's."""
    import jax

    from mccnn_tpu.ops.join_pallas import stereo_join_mxu_hwd

    cpu = jax.devices("cpu")[0]
    rng = np.random.RandomState(3)
    H, W, C, D, n = 21, 150, 32, 40, 4
    # The kernel's contract is L2-normalized descriptors (towers end in
    # Normalize2): dots live in [-1, 1], where the bf16x3 matmul is
    # ~1e-6 of the f32 reference.
    fl = rng.randn(H, W, C).astype(np.float32)
    fr = rng.randn(H, W, C).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)
    with jax.default_device(cpu):
        want_l = np.asarray(costs.fix_border(
            costs.stereo_join(jnp.asarray(fl), jnp.asarray(fr), D)[0], -1, n))
        want_r = np.asarray(costs.fix_border(
            costs.stereo_join(jnp.asarray(fl), jnp.asarray(fr), D)[1], 1, n))
        got_lr, got_r = stereo_join_mxu_hwd(
            jnp.asarray(fl), jnp.asarray(fr), D, n_fix=n, interpret=True)
    got_lr, got_r = np.asarray(got_lr), np.asarray(got_r)
    assert np.all(np.isnan(got_r[H:]))        # pad rows
    assert np.all(np.isnan(got_r[:, :, D:]))  # pad lanes
    assert np.all(np.isnan(got_r[:, W:, :]))  # pad columns
    gl = got_lr[:H, :W, :D][:, ::-1].transpose(2, 0, 1)
    gr = got_r[:H, :W, :D].transpose(2, 0, 1)
    for a, b in ((want_l, gl), (want_r, gr)):
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.nanmax(np.abs(a - b)) < 1e-5


@pytest.mark.parametrize("out_dtype", ["float16", "bfloat16"])
def test_stereo_join_mxu_hwd_out_dtype(out_dtype):
    """16-bit STORAGE join (``-vol_dtype``): the half-width output must
    equal the f32 output cast to the storage dtype — the dots compute
    in f32, only the store rounds — with identical NaN pads (rows,
    columns, lanes) and an identical fix_border column fill."""
    import jax

    from mccnn_tpu.ops.join_pallas import stereo_join_mxu_hwd

    cpu = jax.devices("cpu")[0]
    rng = np.random.RandomState(7)
    H, W, C, D, n = 17, 140, 32, 36, 4
    fl = rng.randn(H, W, C).astype(np.float32)
    fr = rng.randn(H, W, C).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)
    with jax.default_device(cpu):
        f32_lr, f32_r = stereo_join_mxu_hwd(
            jnp.asarray(fl), jnp.asarray(fr), D, n_fix=n, interpret=True)
        got_lr, got_r = stereo_join_mxu_hwd(
            jnp.asarray(fl), jnp.asarray(fr), D, n_fix=n, interpret=True,
            out_dtype=out_dtype)
    for f32v, got in ((f32_lr, got_lr), (f32_r, got_r)):
        assert got.dtype == jnp.dtype(out_dtype)
        want = np.asarray(f32v.astype(jnp.dtype(out_dtype))
                          .astype(jnp.float32))
        got = np.asarray(got.astype(jnp.float32))
        assert np.array_equal(np.isnan(want), np.isnan(got))
        assert np.array_equal(np.nan_to_num(want), np.nan_to_num(got))
    # the pad geometry survives the cast
    got_r = np.asarray(got_r.astype(jnp.float32))
    assert np.all(np.isnan(got_r[H:]))
    assert np.all(np.isnan(got_r[:, :, D:]))
    assert np.all(np.isnan(got_r[:, W:, :]))

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


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("D", [100, 128])  # D < Dp (NaN-pad-lane edge
# elision) and D == Dp (explicit d-edge guards) — ops/sgm.py
def test_sweep_hnat_interpret_vs_scan(reverse, D):
    """The natural-layout K-batched horizontal sweep (the HWD lane's
    production horizontal kernel, _sweep_stream_hnat) against the
    lax.scan sweep in interpret mode, including the accumulator chain,
    the fused WTA map, and the write_out=False (WTA-only) variant.
    The TPU lane re-validates the same kernel on hardware
    (tests/test_tpu_kernels.py)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11 + reverse)
    Sp, Tp, Dp = 64, 256, 128   # padded scanlines / steps / lanes
    T, K = 250, 8               # real steps
    vol = rng.rand(Sp, Tp, Dp).astype(np.float32)
    vol[:, :, D:] = np.nan
    vol[:, T:, :] = np.nan
    vol[rng.rand(Sp, Tp, Dp) < 0.05] = np.nan
    WLp = -(-T // 128) * 128 + 128
    GL = -(-(T + K + D + Dp + 128) // 128) * 128
    d1 = (rng.rand(Sp, WLp) * 0.1).astype(np.float32)
    g = (rng.rand(Sp, GL) * 0.1).astype(np.float32)
    g[rng.rand(Sp, GL) < 0.05] = 10.0
    args = (PARAMS["pi1"], PARAMS["pi2"], PARAMS["tau_so"],
            PARAMS["alpha1"], PARAMS["sgm_q1"], PARAMS["sgm_q2"])

    def hnat(sgm_dir, **kw):
        return sgm_mod._sweep_stream_hnat(
            jnp.asarray(vol), jnp.asarray(d1), jnp.asarray(g), reverse,
            D, T, *args, sgm_dir, St=64, K=K, interpret=True, **kw)

    sgm_dir = 1 if reverse else 0
    got = np.asarray(hnat(sgm_dir))

    # scan oracle: steps-major layout, D2[t, s, d] = g[s, t + D + d]
    vol_s = np.transpose(vol[:, :T, :], (1, 0, 2))
    d1_s = np.transpose(d1[:, :T], (1, 0))
    d2_s = np.stack([g[:, x + D:x + D + Dp] for x in range(T)])
    if reverse:
        vol_s, d1_s, d2_s = vol_s[::-1], d1_s[::-1], d2_s[::-1]
    want = np.asarray(sgm_mod._sweep(
        jnp.asarray(np.ascontiguousarray(vol_s)),
        jnp.asarray(np.ascontiguousarray(d1_s)),
        jnp.asarray(np.ascontiguousarray(d2_s)), *args, sgm_dir))
    if reverse:
        want = want[::-1]
    want = np.transpose(want, (1, 0, 2))
    assert np.array_equal(np.isnan(got[:, :T]), np.isnan(want))
    assert np.nanmax(np.abs(got[:, :T] - want)) < 1e-5

    # accumulator chain + fused WTA + volume-less WTA
    acc = hnat(sgm_dir)
    summed, wmap = hnat(1 - sgm_dir, acc=acc, wta=True)
    summed, wmap = np.asarray(summed), np.asarray(wmap)
    ref_sum = np.asarray(acc) + np.asarray(hnat(1 - sgm_dir))
    assert np.nanmax(np.abs(summed[:, :T] - ref_sum[:, :T])) < 1e-5
    want_wta = np.argmin(np.where(np.isnan(summed), np.inf, summed),
                         axis=-1).astype(np.float32)
    assert np.array_equal(wmap[:, :T], want_wta[:, :T])
    wmap2 = np.asarray(hnat(1 - sgm_dir, acc=acc, wta=True,
                            write_out=False))
    assert np.array_equal(wmap2[:, :T], want_wta[:, :T])
    # pad columns beyond the last DMA group keep the accumulator's NaN
    GK = -(-T // K) * K
    assert np.all(np.isnan(summed[:, GK:]))


def test_vslab_class_shear_exact(monkeypatch):
    """The packed-class shear (default; one int32 word carries 8
    steps' 2-bit penalty classes, sheared once per group) must
    reproduce the raw f32 gradient-shear path (MCCNN_VSLAB_PK=0)
    bit-for-bit: the class IS the 3-way tau_so comparison result and
    classification commutes with the shear. Interpret mode; the TPU
    lane revalidates on hardware."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mccnn_tpu.ops.join_pallas import stereo_join_mxu_hwd

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.RandomState(41)
    H, W, C, D = 40, 280, 16, 100
    x0 = rng.rand(H, W).astype(np.float32)
    x1 = rng.rand(H, W).astype(np.float32)
    fl = rng.randn(H, W, C).astype(np.float32)
    fr = rng.randn(H, W, C).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)
    vol = stereo_join_mxu_hwd(jnp.asarray(fl), jnp.asarray(fr), D,
                              n_fix=4, sides="left")
    kw = dict(pi1=PARAMS["pi1"], pi2=PARAMS["pi2"],
              tau_so=PARAMS["tau_so"], alpha1=PARAMS["alpha1"],
              q1=PARAMS["sgm_q1"], q2=PARAMS["sgm_q2"])

    monkeypatch.setenv("MCCNN_VSLAB_PK", "0")
    a = np.asarray(sgm_mod._sgm_slab_hwd(x0, x1, vol, D, H, W, xrev=True,
                                         **kw))
    monkeypatch.setenv("MCCNN_VSLAB_PK", "1")
    b = np.asarray(sgm_mod._sgm_slab_hwd(x0, x1, vol, D, H, W, xrev=True,
                                         **kw))
    assert np.array_equal(a[:H, :W, :D], b[:H, :W, :D], equal_nan=True)

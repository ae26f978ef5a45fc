"""Sharded inference must equal single-device inference.

Runs the full census pipeline row-sharded and batch-sharded over the
8-device virtual CPU mesh and compares with the unsharded pipeline.
"""

import numpy as np
import pytest

import jax

from mccnn_tpu.config import make_config
from mccnn_tpu.parallel.inference import make_batch_predict, make_sharded_predict
from mccnn_tpu.parallel.mesh import make_mesh
from mccnn_tpu.pipeline import stereo_predict

H, W, D = 32, 48, 8


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices("cpu")
    assert len(devs) == 8
    return make_mesh(8, backend="cpu")


def _inputs():
    rng = np.random.RandomState(5)
    return (rng.randn(H, W).astype(np.float32),
            rng.randn(H, W).astype(np.float32))


def test_row_sharded_matches_single(cpu_mesh):
    x0, x1 = _inputs()
    cfg = make_config("kitti", "census", a="predict")
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(stereo_predict(cfg, None, x0, x1, D))
    run = make_sharded_predict(cfg, cpu_mesh, D)
    got = np.asarray(run(None, x0, x1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batch_sharded_matches_single(cpu_mesh):
    x0, x1 = _inputs()
    cfg = make_config("kitti", "census", a="predict")
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(stereo_predict(cfg, None, x0, x1, D))
    B = 8
    x0b = np.broadcast_to(x0, (B, H, W)).copy()
    x1b = np.broadcast_to(x1, (B, H, W)).copy()
    run = make_batch_predict(cfg, cpu_mesh, D)
    got = np.asarray(run(None, x0b, x1b))
    assert got.shape == (B, H, W)
    for b in range(B):
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["census", "fast"])
def test_batch_shardmap_matches_single(cpu_mesh, arch):
    """The shard_map batch-serving path (Pallas pipeline per shard on
    TPU; the same structure lowers to the scan formulation here on the
    CPU mesh) must equal the unsharded pipeline for every pair."""
    from mccnn_tpu.parallel.inference import make_batch_predict_sharded
    from mccnn_tpu.cli import init_params

    rng = np.random.RandomState(7)
    cfg = make_config("kitti", arch, a="predict")
    params = init_params(cfg) if arch == "fast" else None
    B = 8
    x0b = rng.randn(B, H, W).astype(np.float32)
    x1b = rng.randn(B, H, W).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        want = [np.asarray(stereo_predict(cfg, params, x0b[b], x1b[b], D))
                for b in range(B)]
    run = make_batch_predict_sharded(cfg, cpu_mesh, D)
    got = np.asarray(run(params, x0b, x1b))
    assert got.shape == (B, H, W)
    for b in range(B):
        np.testing.assert_allclose(got[b], want[b], rtol=1e-5, atol=1e-5)


def test_row_sharded_fast_matches_single(cpu_mesh):
    """Fast arch through the row-sharded path: shard_map join per
    row-shard + hybrid SGM (shard_map horizontal family, GSPMD
    vertical). H=36 is NOT divisible by the 8-device mesh, so this
    also exercises the pad-rows logic of both shard_maps."""
    from mccnn_tpu.cli import init_params

    Hf = 36
    rng = np.random.RandomState(11)
    x0 = rng.randn(Hf, W).astype(np.float32)
    x1 = rng.randn(Hf, W).astype(np.float32)
    cfg = make_config("kitti", "fast", a="predict")
    params = init_params(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(stereo_predict(cfg, params, x0, x1, D))
    run = make_sharded_predict(cfg, cpu_mesh, D)
    got = np.asarray(run(params, x0, x1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_row_sharded_fast_medium_shape(cpu_mesh):
    """VERDICT r04 #7: the row-sharded hybrid at a MEDIUM shape
    (128x256, D=32 — the other coverage tops out at 48x128), asserting
    (1) equality with the single-device pipeline, and (2) the compiled
    HLO's communication structure: the vertical SGM family's
    GSPMD resharding collective is present (the volume moves to a
    column layout to scan across row shards), while the horizontal
    family and join run inside shard_map with no collective of their
    own — the only collective kinds in the program are the reshard
    all-to-all(/permute) family and small all-reduce/all-gathers from
    GSPMD bookkeeping, never a reduce-scatter (nothing is
    cross-shard-reduced on this path)."""
    from mccnn_tpu.cli import init_params

    Hm, Wm, Dm = 128, 256, 32
    rng2 = np.random.RandomState(13)
    base = rng2.randn(Hm, Wm + Dm).astype(np.float32)
    x0 = base[:, Dm:]
    x1 = base[:, :-Dm]
    cfg = make_config("kitti", "fast", a="predict")
    params = init_params(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(stereo_predict(cfg, params, x0, x1, Dm))
    run = make_sharded_predict(cfg, cpu_mesh, Dm)
    got = np.asarray(run(params, x0, x1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    hlo = run._predict.lower(
        jax.device_put(params), x0, x1).compile().as_text()
    assert ("all-to-all" in hlo) or ("collective-permute" in hlo), (
        "expected the vertical-family GSPMD reshard collective")
    assert "reduce-scatter" not in hlo, (
        "row-sharded path compiled a reduce-scatter; nothing on this "
        "path is cross-shard-reduced")


def test_batch_sharded_vol_dtype_guard():
    """The batch serving lane must reject -vol_dtype when the HWD
    Pallas path is unavailable (same no-silent-f32 contract as
    pipeline.stereo_predict)."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from mccnn_tpu.config import make_config
    from mccnn_tpu.parallel.inference import make_batch_predict_sharded

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))
    cfg = make_config("kitti", "fast", a="test_te", vol_dtype="bfloat16")
    with pytest.raises(ValueError, match="vol_dtype"):
        make_batch_predict_sharded(cfg, mesh, 8)


def test_row_sharded_vol_dtype_guard():
    """The row-sharded single-pair lane never uses the HWD storage
    path, so ANY non-f32 -vol_dtype must hard-error instead of silently
    running the f32 standard lane (ADVICE r03: the benchmark-misreport
    scenario the stereo_predict guard exists to prevent)."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from mccnn_tpu.config import make_config
    from mccnn_tpu.parallel.inference import make_sharded_predict

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))
    cfg = make_config("kitti", "fast", a="predict", vol_dtype="bfloat16")
    with pytest.raises(ValueError, match="vol_dtype"):
        make_sharded_predict(cfg, mesh, 8)


def test_vol_dtype_guard_helper_float16_tpu():
    """The shared check_vol_dtype helper rejects float16 when the mesh
    is TPU even on the HWD lane (Mosaic has no f16 vector type), and
    accepts bfloat16 there — the single contract every entry lane now
    routes through (stereo_predict + both sharded factories)."""
    import pytest

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import check_vol_dtype

    cfg16 = make_config("kitti", "fast", a="predict", vol_dtype="float16")
    with pytest.raises(ValueError, match="bfloat16"):
        check_vol_dtype(cfg16, hwd=True, tpu=True)
    check_vol_dtype(cfg16, hwd=True, tpu=False)  # CPU interpret lane ok
    cfgbf = make_config("kitti", "fast", a="predict", vol_dtype="bfloat16")
    check_vol_dtype(cfgbf, hwd=True, tpu=True)
    with pytest.raises(ValueError, match="HWD"):
        check_vol_dtype(cfgbf, hwd=False, tpu=True)


def test_batch_lane_scaling_curve_shard_independent():
    """VERDICT r03 #7: the batch serving lane at n=1,2,4,8 devices.

    Two checked properties that turn "scales by construction" into a
    tested invariant: (1) the per-pair outputs are identical at every
    mesh size (per-pair work is shard-independent), (2) the compiled
    HLO of the 8-device program contains no cross-shard collectives —
    so pairs/s scales linearly with mesh size because nothing couples
    the shards (BASELINE.md N-chip target)."""
    from mccnn_tpu.parallel.inference import make_batch_predict_sharded

    B, Hm, Wm, Dm = 8, 32, 48, 8
    rng = np.random.RandomState(7)
    x0b = rng.randn(B, Hm, Wm).astype(np.float32)
    x1b = rng.randn(B, Hm, Wm).astype(np.float32)
    cfg = make_config("kitti", "census", a="predict")

    outs = {}
    for n in (1, 2, 4, 8):
        run = make_batch_predict_sharded(cfg, make_mesh(n, backend="cpu"),
                                         Dm)
        outs[n] = np.asarray(run(None, x0b, x1b))
        if n == 8:
            hlo = run._predict.lower(None, x0b, x1b).compile().as_text()
            for coll in ("all-reduce", "all-gather", "all-to-all",
                         "collective-permute", "reduce-scatter"):
                assert coll not in hlo, (
                    f"batch path compiled a cross-shard {coll}")
    for n in (2, 4, 8):
        np.testing.assert_array_equal(
            outs[n], outs[1],
            err_msg=f"batch lane output changed between n=1 and n={n}")

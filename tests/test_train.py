"""Training-path tests: augmentation warp, sampler layout, a short
end-to-end training run on a synthetic dataset (loss must drop), and
the multi-device data-parallel step (8-way virtual CPU mesh).

Oracle pattern per SURVEY.md §4: naive per-pixel references on tiny
tensors.
"""

import numpy as np
import pytest

from mccnn_tpu.config import make_config
from mccnn_tpu.train import augment


def naive_bicubic_warp(win, minv, ws, a=-0.75):
    """Per-pixel reference for warp_patches (cv.cpp:19-45 semantics)."""
    H, W = win.shape

    def kern(x):
        x = abs(x)
        if x <= 1:
            return ((a + 2) * x - (a + 3)) * x * x + 1
        if x < 2:
            return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a
        return 0.0

    out = np.zeros((ws, ws), np.float32)
    for y in range(ws):
        for x in range(ws):
            sx = minv[0] * x + minv[1] * y + minv[2]
            sy = minv[3] * x + minv[4] * y + minv[5]
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            acc = 0.0
            for dy in range(-1, 3):
                for dx in range(-1, 3):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        acc += (win[yy, xx] * kern(sy - yy) * kern(sx - xx))
            out[y, x] = acc
    return out


def test_warp_patches_identity():
    rng = np.random.RandomState(0)
    win = rng.randn(augment.WIN, augment.WIN).astype(np.float32)
    ws = 9
    # identity warp: dst (0..ws) maps to window offset 10
    minv = np.asarray([1, 0, 10, 0, 1, 10], np.float32)
    out = augment.warp_patches(win[None], minv[None],
                               np.zeros(1, np.float32), np.ones(1, np.float32),
                               ws=ws)
    np.testing.assert_allclose(np.asarray(out)[0], win[10:19, 10:19],
                               rtol=1e-5, atol=1e-5)


def test_warp_patches_vs_naive():
    rng = np.random.RandomState(1)
    win = rng.randn(augment.WIN, augment.WIN).astype(np.float32)
    ws = 9
    m = augment.patch_matrix(ws, 16.0, 16.0, (np.float32(0.9), np.float32(0.95)),
                             np.float32(0.1), (np.float32(0.3), np.float32(-0.2)),
                             np.float32(0.05))
    minv = augment.invert_2x3(m[None])[0]
    out = augment.warp_patches(win[None], minv[None],
                               np.zeros(1, np.float32), np.ones(1, np.float32),
                               ws=ws)
    ref = naive_bicubic_warp(win, minv, ws)
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=1e-4, atol=1e-4)


def test_patch_matrix_maps_center():
    """The source center must land at the patch center under the forward
    matrix (make_patch composition, main.lua:606-614)."""
    ws = 11
    m = augment.patch_matrix(ws, 100.0, 50.0, (np.float32(1.0), np.float32(1.0)),
                             np.float32(0.0), (np.float32(0.0), np.float32(0.0)),
                             np.float32(0.0))
    x, y = 100.0, 50.0
    dx = m[0] * x + m[1] * y + m[2]
    dy = m[3] * x + m[4] * y + m[5]
    assert abs(dx - (ws - 1) / 2) < 1e-5
    assert abs(dy - (ws - 1) / 2) < 1e-5


@pytest.fixture(scope="module")
def synth_ds(tmp_path_factory):
    from mccnn_tpu.data.datasets import load_kitti, make_synthetic_kitti

    d = tmp_path_factory.mktemp("synth")
    make_synthetic_kitti(str(d / "data.kitti"), n_images=3, height=48,
                         width=96, disp_max=12)
    cfg = make_config("kitti", "fast", a="train_tr", data_dir=str(d))
    ds = load_kitti(cfg)
    ds.disp_max = 12
    return cfg, ds


def test_sampler_layout(synth_ds):
    cfg, ds = synth_ds
    sampler = augment.AugmentSampler(cfg, np.random.RandomState(0))
    rows = ds.nnz_tr[:8]
    b = sampler.build_batches(np.asarray(ds.X0), np.asarray(ds.X1), rows)
    assert b["windows"].shape == (32, augment.WIN, augment.WIN)
    assert b["minv"].shape == (32, 6)
    # labels interleave (pos=0, neg=1) (main.lua:848-849)
    np.testing.assert_array_equal(b["labels"], np.tile([0.0, 1.0], 8))


def test_train_loss_drops(synth_ds):
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.train.trainer import train

    cfg, ds = synth_ds
    params = init_params(cfg)
    errs = []
    train(cfg, ds, params, epochs=3,
          log=lambda s: errs.append(s) if "\t" in str(s) else None)
    first = float(str(errs[0]).split("\t")[1])
    last = float(str(errs[-1]).split("\t")[1])
    assert last < first, (first, last)


def test_dp_train_step_multidevice(synth_ds):
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.cli import init_params
    from mccnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batch
    from mccnn_tpu.parallel.mesh import make_mesh, replicated

    cfg, ds = synth_ds
    # always exercise the sharded path on the virtual 8-device CPU mesh,
    # even when the default platform is a single TPU
    cpu_devs = jax.devices("cpu")
    n_dev = len(cpu_devs)
    assert n_dev == 8, "conftest should force 8 virtual CPU devices"
    mesh = make_mesh(n_dev, backend="cpu")

    params = init_params(cfg)
    momentum = jax.tree.map(jnp.zeros_like, params)
    params = jax.device_put(params, replicated(mesh))
    momentum = jax.device_put(momentum, replicated(mesh))

    sampler = augment.AugmentSampler(cfg, np.random.RandomState(0))
    rows = ds.nnz_tr[: 2 * n_dev]
    b = sampler.build_batches(np.asarray(ds.X0), np.asarray(ds.X1), rows)
    b = shard_batch(b, mesh)
    step = make_dp_train_step(cfg, mesh)
    params2, momentum2, err = step(params, momentum, jnp.float32(cfg.lr), b)
    assert np.isfinite(float(err))
    # parameters actually moved
    w0 = params2["tower"][0]["w"]
    assert np.any(np.asarray(w0) != 0)


def test_native_gather_matches_numpy():
    from mccnn_tpu.native import get as get_native

    nat = get_native()
    if nat is None:
        import pytest
        pytest.skip("native extension unavailable")
    rng = np.random.RandomState(3)
    X = rng.randn(3, 1, 40, 50).astype(np.float32)
    n = 17
    img = rng.randint(0, 3, n).astype(np.int64)
    oy = rng.randint(-10, 40, n).astype(np.int64)
    ox = rng.randint(-10, 50, n).astype(np.int64)
    got = augment._gather_windows(X, img, oy, ox)
    # numpy fallback path
    H, W = 40, 50
    yy = oy[:, None] + np.arange(augment.WIN)[None, :]
    xx = ox[:, None] + np.arange(augment.WIN)[None, :]
    oky = (yy >= 0) & (yy < H)
    okx = (xx >= 0) & (xx < W)
    want = X[img[:, None, None], 0,
             np.clip(yy, 0, H - 1)[:, :, None],
             np.clip(xx, 0, W - 1)[:, None, :]]
    want = want * (oky[:, :, None] & okx[:, None, :])
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_checkpoint_resume_roundtrip(synth_ds, tmp_path, monkeypatch):
    """Mid-training save + resume reproduces the uninterrupted run
    (capability absent upstream — SURVEY.md §5)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.cli import init_params
    from mccnn_tpu.models import checkpoint
    from mccnn_tpu.train.trainer import train

    monkeypatch.chdir(tmp_path)
    cfg, ds = synth_ds

    # uninterrupted 2-epoch run
    params_full, mom_full = train(cfg, ds, init_params(cfg), epochs=2,
                                  log=lambda s: None)

    # 1 epoch, checkpoint, resume into epoch 2
    saved = {}

    def save_cb(epoch, p, m):
        saved["f"] = checkpoint.save(f"ck_{epoch}.npz", p,
                                     {"epoch": epoch}, extra={"momentum": m})

    cfg.checkpoint_every = 1
    p1, m1 = train(cfg, ds, init_params(cfg), epochs=1, save_cb=save_cb,
                   log=lambda s: None)
    cfg.checkpoint_every = 0
    tmpl = init_params(cfg)
    mom_tmpl = jax.tree.map(jnp.zeros_like, tmpl)
    p_loaded, opt, extras = checkpoint.load(saved["f"], tmpl,
                                            {"momentum": mom_tmpl})
    p2, m2 = train(cfg, ds, p_loaded, momentum=extras["momentum"], epochs=2,
                   start_epoch=int(opt["epoch"]) + 1, log=lambda s: None)

    for a, b in zip(jax.tree.leaves(params_full), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_slow_arch(synth_ds):
    """The slow/accurate arch trains end-to-end (BCE head path): the
    training loss must actually drop (VERDICT r01 #7)."""
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.train.trainer import train

    cfg, ds = synth_ds
    # shallow variant: at this synthetic scale the full-depth net's
    # head-bias noise floor needs far more steps than a test can afford
    # (reference trains ~50M samples; lr tuned so SGD+momentum does not
    # blow through the loss-explosion guard)
    cfg_slow = make_config("kitti", "slow", a="train_tr",
                           data_dir=cfg.data_dir, bs=32,
                           l1=2, l2=2, fm=16, nh2=32)
    cfg_slow.lr = 0.01
    params = init_params(cfg_slow)
    errs = []
    train(cfg_slow, ds, params, epochs=12,
          log=lambda s: errs.append(s) if "\t" in str(s) else None)
    vals = [float(str(e).split("\t")[1]) for e in errs]
    assert all(np.isfinite(v) for v in vals)
    assert vals[-1] < 0.55, vals  # well below the ln(2) chance floor


@pytest.mark.parametrize("arch", ["fast", "slow"])
def test_train_then_val_bad3(synth_ds, arch):
    """train -> full stereo pipeline -> val bad-3px, end to end, for
    BOTH arches (VERDICT r01 #2c). On the synthetic set (right image =
    shifted left) near-zero error is achievable; the assert proves the
    whole train->predict->score chain produces a sane number."""
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.train.evaluate import _eval_error
    from mccnn_tpu.train.trainer import train

    cfg0, ds = synth_ds
    cfg = make_config(
        "kitti", arch, a="train_tr", data_dir=cfg0.data_dir, bs=32,
        **(dict(l1=2, l2=2, fm=16, nh2=32) if arch == "slow" else {}))
    if arch == "slow":
        cfg.lr = 0.01  # stable + learnable at this synthetic scale
    params = init_params(cfg)
    params, _ = train(cfg, ds, params, epochs=2 if arch == "fast" else 12,
                      log=lambda s: None)

    cfg.a = "test_te"
    i = int(ds.te[0])
    x0 = np.asarray(ds.X0[i - 1, 0])
    x1 = np.asarray(ds.X1[i - 1, 0])
    pred = np.asarray(stereo_predict(cfg, params, x0, x1, ds.disp_max))
    assert not np.isnan(pred).any()
    actual = np.asarray(ds.dispnoc[i - 1, 0])
    err = _eval_error(pred, actual, cfg.err_at)
    assert err < 0.05, f"{arch}: val bad-3px {err:.4f}"


def test_train_then_val_on_occlusion_scenes(tmp_path):
    """Learned fast net + the FULL refinement chain on scenes with
    true occlusions (z-buffer-rendered fg/bg discontinuities): train
    on three scenes, evaluate the complete pipeline on a held-out one,
    and require both a sane absolute bad-3px on the non-occluded GT
    and that the occlusion/mismatch fill stages do not regress it
    (r02 VERDICT #3's end-to-end form — the constant-plane test never
    exercises LR-inconsistent regions with a LEARNED net)."""
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.data.datasets import load_kitti, make_synthetic_kitti
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.train.evaluate import _eval_error
    from mccnn_tpu.train.trainer import train

    make_synthetic_kitti(str(tmp_path / "data.kitti"), n_images=4,
                         height=64, width=160, disp_max=24,
                         occlusions=True)
    cfg = make_config("kitti", "fast", a="train_tr",
                      data_dir=str(tmp_path), bs=32)
    ds = load_kitti(cfg)
    ds.disp_max = 24
    params = init_params(cfg)
    params, _ = train(cfg, ds, params, epochs=2, log=lambda s: None)

    cfg.a = "test_te"
    i = int(ds.te[0])
    x0 = np.asarray(ds.X0[i - 1, 0])
    x1 = np.asarray(ds.X1[i - 1, 0])
    actual = np.asarray(ds.dispnoc[i - 1, 0])
    pred = np.asarray(stereo_predict(cfg, params, x0, x1, ds.disp_max))
    assert not np.isnan(pred).any()
    err_full = _eval_error(pred, actual, cfg.err_at)

    cfg_wta = make_config("kitti", "fast", a="test_te",
                          data_dir=str(tmp_path), sm_terminate="cbca2")
    pred_wta = np.asarray(stereo_predict(cfg_wta, params, x0, x1,
                                         ds.disp_max))
    err_wta = _eval_error(pred_wta, actual, cfg.err_at)

    assert err_full < 0.15, f"full-pipeline bad-3px {err_full:.4f}"
    assert err_full <= err_wta + 0.01, (err_full, err_wta)

    # VERDICT r03 #5: on the OCCLUDED pixels (the fixture's z-buffer
    # losers — known exactly, unlike real KITTI), the fill chain must
    # strictly reduce bad-3px vs the same pipeline with the fills
    # skipped (-sm_skip occlusion skips outlier detection AND both
    # fills, the main.lua:1054-1066 quirk). If interpolate_occlusion/
    # interpolate_mismatch are stubbed to identity, full == nofill and
    # the >=20% relative-reduction assert fails.
    from mccnn_tpu.data.datasets import make_occlusion_pair

    _, _, dmap, occ, valid = make_occlusion_pair(64, 160, 24,
                                                 seed=42 + 7 * (i - 1))
    cfg_nofill = make_config("kitti", "fast", a="test_te",
                             data_dir=str(tmp_path), sm_skip="occlusion")
    pred_nofill = np.asarray(stereo_predict(cfg_nofill, params, x0, x1,
                                            ds.disp_max))
    m = occ & valid
    assert m.sum() > 50, "fixture lost its occluded band"
    bad_full = float((np.abs(pred - dmap)[m] > cfg.err_at).mean())
    bad_nofill = float((np.abs(pred_nofill - dmap)[m] > cfg.err_at).mean())
    assert bad_full <= 0.8 * bad_nofill, (
        f"fill chain no longer repairs occlusions: occluded-region "
        f"bad-3px {bad_full:.4f} (with fills) vs {bad_nofill:.4f} "
        f"(fills skipped)")


def test_device_gather_matches_host_gather(tmp_path, monkeypatch):
    """Device-resident training data (VERDICT r03 #3): the on-device
    window gather from the padded HBM image stack must train
    bit-identically to the host gather path — same windows, same
    augmentation, same SGD trajectory."""
    import jax

    from mccnn_tpu.cli import init_params
    from mccnn_tpu.data.datasets import load_kitti, make_synthetic_kitti
    from mccnn_tpu.train.trainer import train

    make_synthetic_kitti(str(tmp_path / "data.kitti"), n_images=3,
                         height=48, width=96, disp_max=12)
    cfg = make_config("kitti", "fast", a="train_tr",
                      data_dir=str(tmp_path), bs=16)
    ds = load_kitti(cfg)
    ds.disp_max = 12
    outs = {}
    for dg in ("0", "1"):
        monkeypatch.setenv("MCCNN_DEVICE_GATHER", dg)
        params = init_params(cfg)
        p, _ = train(cfg, ds, params, epochs=1, log=lambda s: None)
        outs[dg] = jax.tree.map(np.asarray, p)
    for a, b in zip(jax.tree.leaves(outs["0"]), jax.tree.leaves(outs["1"])):
        np.testing.assert_array_equal(a, b)

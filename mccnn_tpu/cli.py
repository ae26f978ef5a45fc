"""The command-line driver.

Mirrors `./main.lua <dataset> <arch> -a <action> [flags]`
(main.lua:10-32): actions train_tr | train_all | test_te | test_all |
submit | time | predict, identical flag names and defaults, identical
stdout contracts (score = last token, hs.py:209-211).
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np

from mccnn_tpu import config as config_mod
from mccnn_tpu.config import Config, cmd_str, parse_args, print_args
from mccnn_tpu.data.bin_io import write_raw_float32
from mccnn_tpu.models import checkpoint, towers
from mccnn_tpu.utils import images as im


def _sync(x):
    """Force completion: reduce on device, read 4 bytes. (On remote
    tunnels block_until_ready returns before execution finishes, and
    bulk device->host reads can be pathologically slow.)"""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def init_params(cfg: Config, seed: int | None = None):
    import jax
    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    if cfg.arch == "fast":
        return towers.init_fast(key, l1=cfg.l1, fm=cfg.fm, ks=cfg.ks,
                                n_input_plane=cfg.n_input_plane)
    if cfg.arch == "slow":
        return towers.init_slow(key, l1=cfg.l1, fm=cfg.fm, ks=cfg.ks,
                                l2=cfg.l2, nh2=cfg.nh2,
                                n_input_plane=cfg.n_input_plane)
    return None  # ad / census need no network


def load_params(cfg: Config):
    """Load -net_fname. A ``.t7`` name loads a reference-format ascii
    checkpoint (main.lua:892-902). Missing net: evaluation actions
    (test_te/test_all/submit) hard-error like the reference — silently
    scoring a random net would produce garbage behind one WARNING line;
    ``-a time``/predict keep the fresh-init convenience (timing and
    smoke runs don't need trained weights)."""
    params = init_params(cfg)
    if params is not None and cfg.net_fname:
        if cfg.net_fname.endswith(".t7"):
            from mccnn_tpu.models.import_t7 import params_from_t7
            params, _ = params_from_t7(cfg.net_fname)
        else:
            params, _, _ = checkpoint.load(cfg.net_fname, params)
    elif params is not None and cfg.a in ("test_te", "test_all", "submit"):
        raise SystemExit(
            f"-a {cfg.a} with arch {cfg.arch} requires -net_fname "
            "(main.lua:892-902)")
    elif params is not None and cfg.a == "predict":
        print("WARNING: no -net_fname given; using randomly initialized weights")
    return params


def action_predict(cfg: Config) -> None:
    """main.lua:1084-1105: arbitrary pair -> left.bin/right.bin (final
    cost volumes) + disp.bin, raw float32, reference layouts."""
    from mccnn_tpu.pipeline import stereo_predict

    x0 = im.standardize(im.load_gray(cfg.left))
    x1 = im.standardize(im.load_gray(cfg.right))
    assert x0.shape == x1.shape
    disp_max = int(cfg.disp_max)
    params = load_params(cfg)
    disp, vol_l, vol_r = stereo_predict(cfg, params, x0, x1, disp_max,
                                        return_vols=True)
    H, W = x0.shape
    for name, vol in (("left", vol_l), ("right", vol_r)):
        if vol is None:
            continue
        print(f"Writing {name}.bin, 1 x {disp_max} x {H} x {W}")
        write_raw_float32(f"{name}.bin", np.asarray(vol))
    print(f"Writing disp.bin, 1 x 1 x {H} x {W}")
    write_raw_float32("disp.bin", np.asarray(disp))


def action_time(cfg: Config) -> None:
    """main.lua:1140-1170: min-of-N wall clock on synthetic sizes."""
    from mccnn_tpu.pipeline import stereo_predict

    if cfg.tiny:
        H, W, disp_max = 240, 320, 32
    elif cfg.dataset in ("kitti", "kitti2015"):
        H, W, disp_max = 350, 1242, 228
    else:
        H, W, disp_max = 1000, 1500, 200

    rng = np.random.RandomState(cfg.seed)
    # inputs live ON DEVICE across iterations, like the reference's
    # x_batch on the GPU (main.lua:1146-1151): passing host numpy into
    # the jit re-uploads ~3.5-12 MB through the tunnel EVERY iteration,
    # which inflated the mb-fast protocol 3x (0.34 -> 0.11 s, PERF.md
    # round 5)
    import jax

    x0 = jax.device_put(rng.randn(H, W).astype(np.float32))
    x1 = jax.device_put(rng.randn(H, W).astype(np.float32))
    params = load_params(cfg)

    n = 30 if cfg.arch == "fast" else 3
    runtime_min = float("inf")
    _sync(stereo_predict(cfg, params, x0, x1, disp_max))  # compile
    for _ in range(n):
        t0 = _time.perf_counter()
        _sync(stereo_predict(cfg, params, x0, x1, disp_max))
        runtime_min = min(runtime_min, _time.perf_counter() - t0)
    print(runtime_min)


def apply_device(cfg: Config) -> None:
    """Honor -backend / -gpu: pin jax's default device.

    ``-gpu N`` is 1-based like the reference's ``cutorch.setDevice``
    (main.lua:16,342); ``-backend`` selects the jax platform ("cpu",
    "tpu", ...). With the defaults (-gpu 1, no -backend) nothing is
    touched, so test lanes that pin their own device are unaffected.
    """
    if not cfg.backend and cfg.gpu == 1:
        return
    import jax

    devices = jax.devices(cfg.backend) if cfg.backend else jax.devices()
    if not 1 <= cfg.gpu <= len(devices):
        raise SystemExit(
            f"-gpu {cfg.gpu}: only {len(devices)} "
            f"{cfg.backend or 'default'} device(s) visible")
    jax.config.update("jax_default_device", devices[cfg.gpu - 1])


def dispatch(cfg: Config, tail: list[str]) -> None:
    if cfg.print_args:
        print_args(cfg)
        return
    apply_device(cfg)
    np.random.seed(cfg.seed)

    if cfg.a == "predict":
        action_predict(cfg)
    elif cfg.a == "time":
        action_time(cfg)
    elif cfg.a in ("train_tr", "train_all"):
        from mccnn_tpu.train.trainer import action_train
        action_train(cfg, tail)
    elif cfg.a in ("test_te", "test_all", "submit"):
        from mccnn_tpu.train.evaluate import action_eval
        action_eval(cfg, tail)
    else:
        raise SystemExit(f"unknown action {cfg.a}")


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    print(" ".join(argv))  # echo argv like main.lua:6-9
    cfg, tail = parse_args(argv)
    dispatch(cfg, tail)


if __name__ == "__main__":
    main()

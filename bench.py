#!/usr/bin/env python
"""Headline benchmark: fast-arch full-pipeline runtime on the bundled
KITTI pair (370x1226) at disp_max 228 — the reference's `-a time`
protocol scale (main.lua:1140-1167).

Real imagery matters: the outlier-interpolation ray walk terminates in
a few steps on natural images but runs to its worst-case bound on
random noise, so noise inputs would overstate the pipeline cost by
orders of magnitude (and trip the TPU watchdog).

Baseline: 0.73 s/pair on a GTX Titan X (README.md:340-353), i.e.
1.37 pairs/s. Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.cli import init_params

    from mccnn_tpu.utils.images import load_gray, standardize

    cfg = make_config("kitti", "fast", a="time")
    disp_max = 228
    sample = "/root/reference/samples/input"
    if os.path.isdir(sample):
        x0 = standardize(load_gray(os.path.join(sample, "kittiL.png")))
        x1 = standardize(load_gray(os.path.join(sample, "kittiR.png")))
    else:
        rng = np.random.RandomState(42)
        base = rng.randn(350, 1242 + disp_max).astype(np.float32)
        x0 = base[:, disp_max:]
        x1 = base[:, :-disp_max]
    params = init_params(cfg)

    import jax.numpy as jnp

    x0 = jax.device_put(x0)
    x1 = jax.device_put(x1)

    def run_once():
        return stereo_predict(cfg, params, x0, x1, disp_max)

    # sync protocol for the remote-TPU tunnel: block_until_ready does
    # not actually synchronize, and a forced scalar readback costs
    # ~29 ms of tunnel RTT. The device executes dispatches in order, so
    # N dispatches + ONE on-device reduction readback times N real
    # executions with a single amortized read — the steady-state
    # serving pattern (a pipeline does not sync between pairs).
    float(jnp.sum(run_once()))  # compile + warm
    N = 10
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            out = run_once()
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    per_pair = best

    baseline_pairs_per_s = 1.0 / 0.73
    pairs_per_s = 1.0 / per_pair

    # Secondary lanes, each behind a wall-clock budget: every lane
    # costs a fresh XLA/Mosaic compile (minutes on the remote tunnel),
    # and a driver-side timeout mid-lane must never eat the headline —
    # skipped lanes report "skipped_budget" instead.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("MCCNN_BENCH_BUDGET_S", "900"))
    extra = {}
    lanes = [
        ("fast_batch8", "fast_batch8_pairs_per_s",
         lambda: _bench_batch8(cfg, params, x0, x1, disp_max)),
        ("slow", "slow_s_per_pair", lambda: _bench_slow(x0, x1, disp_max)),
        ("census", "census_pairs_per_s",
         lambda: _bench_arch("census", x0, x1, disp_max)),
        ("fast_bf16vol", "fast_bf16vol_pairs_per_s",
         lambda: _bench_bf16vol(params, x0, x1, disp_max)),
        ("fast_bf16all", "fast_bf16all_pairs_per_s",
         lambda: _bench_bf16vol(params, x0, x1, disp_max,
                                dtype="bfloat16")),
        ("mb_fast", "mb_fast_pairs_per_s",
         lambda: _bench_mb_fast(x0, x1)),
        # LAST: the heaviest lane (MB half-res scale, ~22 min cold
        # compile through the tunnel — only viable when the persistent
        # compile cache is warm, which the end-of-round warmup ensures;
        # a cache miss burns the remaining budget and later lanes,
        # which is why nothing runs after it)
        ("mb_slow", "mb_slow_s_per_pair",
         lambda: _bench_mb_slow(x0, x1)),
    ]
    for name, key, fn in lanes:
        if time.perf_counter() - t_start > budget_s:
            extra[key] = "skipped_budget"
            continue
        try:
            extra[key] = round(fn(), 4)
        except Exception as e:  # pragma: no cover - keep the headline alive
            extra[f"{name}_error"] = type(e).__name__

    print(json.dumps({
        "metric": "kitti_fast_full_pipeline",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 4),
        **extra,
    }))


def _bench_batch8(cfg, params, x0, x1, disp_max):
    """Batch-of-8 serving throughput (pairs/s) on the local device set
    via the shard_map batch path (BASELINE.md: pairs/s at 1 chip;
    scales with the mesh on larger slices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mccnn_tpu.parallel.inference import make_batch_predict_sharded

    B = 8
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    run = make_batch_predict_sharded(cfg, mesh, disp_max)
    x0b = jnp.broadcast_to(x0, (B,) + x0.shape)
    x1b = jnp.broadcast_to(x1, (B,) + x1.shape)
    float(jnp.sum(run(params, x0b, x1b)))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, x0b, x1b)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / B
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def _bench_bf16vol(params, x0, x1, disp_max, dtype="float32"):
    """Fast pipeline with `-vol_dtype bfloat16` (16-bit cost-volume
    STORAGE through the join + SGM sweeps; compute stays f32), and
    with dtype="bfloat16" additionally the tower/join compute lane.
    Parity-breaking by rounding (golden pair: 0.58% of pixels move
    >1px, mean |Δ| 0.057 px storage-only; 0.62% / 0.062 px combined —
    tests/test_tpu_kernels.py) — reported alongside the f32 headline,
    never as it."""
    import jax.numpy as jnp

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict

    cfg = make_config("kitti", "fast", a="time", vol_dtype="bfloat16",
                      dtype=dtype)
    run = lambda: stereo_predict(cfg, params, x0, x1, disp_max)
    float(jnp.sum(run()))  # compile + warm
    N = 10
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            out = run()
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def _bench_arch(arch, x0, x1, disp_max):
    """Non-learned baseline pipeline pairs/s (census: 12 CBCA
    iterations over D=228 — the heaviest CBCA config, timing the
    production cross/cbca path at real scale)."""
    import jax.numpy as jnp

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict

    cfg = make_config("kitti", arch, a="time")
    run = lambda: stereo_predict(cfg, None, x0, x1, disp_max)
    float(jnp.sum(run()))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def _bench_mb_fast(x0, x1):
    """Fast arch at Middlebury half-res scale (1000x1500, D=200,
    single evaluation direction per main.lua:954-955; the HWD lane —
    MB fast has cbca 0/0). Amortized protocol like the headline;
    measured 106 ms/pair = 9.4 pairs/s (PERF.md round 5)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.cli import init_params

    H, W, D = 1000, 1500, 200
    t0 = jax.device_put(np.tile(np.asarray(x0), (3, 2))[:H, :W])
    t1 = jax.device_put(np.tile(np.asarray(x1), (3, 2))[:H, :W])
    cfg = make_config("mb", "fast", a="time")
    params = init_params(cfg)
    run = lambda: stereo_predict(cfg, params, t0, t1, D)
    sync = lambda o: float(jnp.sum(jnp.nan_to_num(o)))
    sync(run())  # compile + warm
    N = 10
    best = None
    for _ in range(3):
        t_s = time.perf_counter()
        for _ in range(N):
            out = run()
        sync(out)
        dt = (time.perf_counter() - t_s) / N
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def _bench_mb_slow(x0, x1):
    """Accurate arch at Middlebury half-res scale (1000x1500, D=200,
    mb-slow config: cbca_i1=2, cbca_i2=16, sgm_i=1 — main.lua:449-473;
    the reference NEEDS a 12 GB GPU for this config, README.md:11-13).
    Tiled real pair per the noise warning above; min-of-3 s/pair
    (r04 measured 2.639 by hand — this lane makes it driver-captured)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.cli import init_params

    H, W, D = 1000, 1500, 200
    t0 = np.tile(np.asarray(x0), (3, 2))[:H, :W]
    t1 = np.tile(np.asarray(x1), (3, 2))[:H, :W]
    t0 = jax.device_put(t0)
    t1 = jax.device_put(t1)
    cfg = make_config("mb", "slow", a="time")
    params = init_params(cfg)
    run = lambda: stereo_predict(cfg, params, t0, t1, D)
    sync = lambda o: float(jnp.sum(jnp.nan_to_num(o)))  # forced readback
    sync(run())  # compile + warm
    best = None
    for _ in range(3):
        t_s = time.perf_counter()
        out = run()
        sync(out)
        dt = time.perf_counter() - t_s
        best = dt if best is None else min(best, dt)
    return best


def _bench_slow(x0, x1, disp_max):
    """Accurate-arch seconds/pair (reference: ~67 s/pair on a Titan X,
    main.lua:1152 N=3 timing protocol)."""
    import jax.numpy as jnp

    from mccnn_tpu.config import make_config
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.cli import init_params

    cfg = make_config("kitti", "slow", a="time")
    params = init_params(cfg)
    run = lambda: stereo_predict(cfg, params, x0, x1, disp_max)
    float(jnp.sum(run()))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


if __name__ == "__main__":
    main()

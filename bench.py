#!/usr/bin/env python
"""Headline benchmark: fast-arch full-pipeline runtime on a KITTI-sized
pair (350x1242, disp_max 228) — the reference's `-a time` protocol
(min of N runs after warmup, main.lua:1140-1167).

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

    cfg = make_config("kitti", "fast", a="time")
    H, W, disp_max = 350, 1242, 228
    rng = np.random.RandomState(42)
    x0 = rng.randn(H, W).astype(np.float32)
    x1 = rng.randn(H, W).astype(np.float32)
    params = init_params(cfg)

    x0 = jax.device_put(x0)
    x1 = jax.device_put(x1)
    # warm up (compile); the scalar read forces real completion —
    # block_until_ready alone does not synchronize through the axon
    # tunnel, so every measured iteration ends in a device->host read
    float(stereo_predict(cfg, params, x0, x1, disp_max)[0, 0])
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        out = stereo_predict(cfg, params, x0, x1, disp_max)
        float(out[0, 0])
    per_pair = (time.perf_counter() - t0) / N

    baseline_pairs_per_s = 1.0 / 0.73
    pairs_per_s = 1.0 / per_pair
    print(json.dumps({
        "metric": "kitti_fast_full_pipeline",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 4),
    }))


if __name__ == "__main__":
    main()

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

    jax.block_until_ready(stereo_predict(cfg, params, x0, x1, disp_max))  # compile
    # steady-state throughput: N dispatches in flight (the per-call
    # host->device round trip otherwise dominates at ~3 ms)
    N = 30
    t0 = time.perf_counter()
    outs = [stereo_predict(cfg, params, x0, x1, disp_max) for _ in range(N)]
    jax.block_until_ready(outs)
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

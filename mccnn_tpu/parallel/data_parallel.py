"""Data-parallel training over a device mesh.

TPU-native replacement for the reference's "distribution" story (one
independent process per GPU, rgs.py:9-14): a single jitted train step
whose batch is sharded over the mesh's ``data`` axis; parameters and
momentum are replicated, and XLA inserts the gradient all-reduce over
ICI automatically from the sharding annotations (GSPMD).

The update rule is the reference's inline SGD+momentum
(``v = mom*v - lr*g; w += v``, main.lua:871-874).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mccnn_tpu.config import Config
from mccnn_tpu.train.augment import warp_patches
from mccnn_tpu.train.trainer import loss_fn


def make_dp_train_step(cfg: Config, mesh: Mesh, axis: str = "data"):
    """A single jitted DP train step.

    Inputs: params/momentum replicated; batch dict with leading batch
    dim sharded over `axis`. Returns (params, momentum, err).
    """
    arch, ws = cfg.arch, cfg.ws
    m, pow_, mom_c = float(cfg.m), int(cfg.pow), float(cfg.mom)
    dtype = jnp.dtype(cfg.dtype)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def step(params, momentum, lr, batch):
        patches = warp_patches(batch["windows"], batch["minv"],
                               batch["brightness"], batch["contrast"], ws=ws)
        err, grads = jax.value_and_grad(loss_fn)(
            params, patches, batch["labels"], arch=arch, m=m, pow=pow_,
            dtype=dtype)
        momentum = jax.tree.map(lambda v, g: mom_c * v - lr * g, momentum, grads)
        params = jax.tree.map(lambda w, v: w + v, params, momentum)
        return params, momentum, err

    batch_shardings = {"windows": shard, "minv": shard, "brightness": shard,
                       "contrast": shard, "labels": shard}
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_shardings),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device_put a host batch with the leading dim sharded over `axis`."""
    shard = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, shard) for k, v in batch.items()}

"""Sharded inference over a device mesh.

The reference's cost volumes are the memory wall (KITTI ≈ 0.8 GB live,
Middlebury needs a 12 GB GPU — README.md:11-13; SURVEY.md §5 calls this
the "long context" of the system). TPU-native answer: spatial sharding.
Images and volumes are sharded over image **rows** (the `model` axis):

- cost volumes / CBCA / refinement: row-parallel; the column-shift
  taps inside CBCA and the blur become halo exchanges
  (collective-permute) that XLA inserts from the sharding annotations,
- horizontal SGM sweeps: scanlines = rows → embarrassingly parallel,
- vertical SGM sweeps: XLA reshards to columns for the scan
  (all-to-all over ICI), then back.

There is no hand-written collective here — the mesh + sharding
constraints ARE the distribution strategy (GSPMD).

``make_batch_predict`` additionally maps the whole pipeline over a
leading batch-of-pairs axis sharded on `data` — multi-pair serving
throughput on a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mccnn_tpu.config import Config
from mccnn_tpu.ops import post
from mccnn_tpu import pipeline as pipe


def _method_kwargs(cfg: Config, disp_max: int, directions):
    return dict(
        disp_max=int(disp_max), directions=directions,
        kitti=cfg.dataset in ("kitti", "kitti2015"),
        L1=int(cfg.L1), tau1=float(cfg.tau1),
        cbca_i1=int(cfg.cbca_i1), cbca_i2=int(cfg.cbca_i2),
        pi1=float(cfg.pi1), pi2=float(cfg.pi2), tau_so=float(cfg.tau_so),
        alpha1=float(cfg.alpha1), sgm_q1=float(cfg.sgm_q1),
        sgm_q2=float(cfg.sgm_q2), sgm_i=int(cfg.sgm_i),
        blur_t=float(cfg.blur_t),
        sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip,
        return_vols=False,
        # the Pallas sweep is a single-device kernel; under GSPMD let
        # XLA's scan formulation partition freely (the MXU join gets
        # the same treatment via use_pallas=False in _volumes_jit)
        sgm_pallas=False)


def make_sharded_predict(cfg: Config, mesh: Mesh, disp_max: int,
                         axis: str | None = None):
    """One jitted pair→disparity function with rows sharded over `axis`
    (default: the mesh's first axis).

    Inputs: x0/x1 (H, W) row-sharded; params replicated. The full
    pipeline (volumes + method) runs under one jit so XLA plans all
    reshards."""
    axis = axis or mesh.axis_names[0]
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    kw = _method_kwargs(cfg, disp_max, (1, -1))
    row = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=row)
    def predict(params, x0, x1):
        x0 = jax.lax.with_sharding_constraint(x0, row)
        x1 = jax.lax.with_sharding_constraint(x1, row)
        vols = pipe._volumes_jit(params, x0, x1, arch=cfg.arch,
                                 disp_max=int(disp_max), ws=cfg.ws,
                                 dtype_name=cfg.dtype, use_pallas=False)
        vol_row = NamedSharding(mesh, P(None, axis, None))
        vols = {k: jax.lax.with_sharding_constraint(v, vol_row)
                for k, v in vols.items()}
        return pipe._method_jit(vols, x0, x1, blur_kernel=blur_kernel, **kw)

    def run(params, x0, x1):
        x0 = jax.device_put(jnp.asarray(x0), row)
        x1 = jax.device_put(jnp.asarray(x1), row)
        params = jax.device_put(params, repl)
        return predict(params, x0, x1)

    return run


def make_batch_predict_sharded(cfg: Config, mesh: Mesh, disp_max: int,
                               axis: str | None = None):
    """Batch-of-pairs serving throughput via ``shard_map``: the batch
    axis is sharded over the mesh and each device runs its LOCAL pairs
    sequentially through the full single-device pipeline — on TPU that
    is the Pallas fast lane (MXU join + streaming slab SGM), which
    GSPMD cannot partition but shard_map never needs to: every pair
    lives whole on one chip. Off-TPU the same body lowers to the scan
    formulation, so the 8-virtual-device CPU tests exercise the exact
    sharding structure.

    This is the serving-throughput answer to the reference's
    one-process-per-GPU ssh fan-out (rgs.py:9-14): one jitted dispatch
    per batch, pairs/s scaling with the mesh size."""
    import os

    from jax import shard_map

    from mccnn_tpu.ops.sgm import _pallas_default

    axis = axis or mesh.axis_names[0]
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    # Gate the Pallas lane on the MESH's devices, not the process
    # default backend: an 8-virtual-CPU test mesh must lower to the
    # scan formulation even when the process also has a TPU attached.
    mesh_tpu = mesh.devices.flat[0].platform == "tpu"
    pallas = _pallas_default() and mesh_tpu
    use_hwd = (cfg.arch == "fast" and int(cfg.cbca_i1) == 0
               and int(cfg.cbca_i2) == 0 and pallas
               and os.environ.get("MCCNN_SGM_HSLAB", "1") != "0"
               and os.environ.get("MCCNN_FAST_HWD", "1") != "0")
    kw = _method_kwargs(cfg, disp_max, (1, -1))
    kw["sgm_pallas"] = pallas  # single-device inside the shard

    def one(params, x0, x1):
        if use_hwd:
            return pipe._fast_hwd_body(
                params, x0, x1, blur_kernel, disp_max=int(disp_max),
                kitti=cfg.dataset in ("kitti", "kitti2015"), ws=cfg.ws,
                dtype_name=cfg.dtype, pi1=float(cfg.pi1),
                pi2=float(cfg.pi2), tau_so=float(cfg.tau_so),
                alpha1=float(cfg.alpha1), sgm_q1=float(cfg.sgm_q1),
                sgm_q2=float(cfg.sgm_q2), sgm_i=int(cfg.sgm_i),
                blur_t=float(cfg.blur_t), sm_terminate=cfg.sm_terminate,
                sm_skip=cfg.sm_skip, return_vols=False)
        vols = pipe._volumes_jit(params, x0, x1, arch=cfg.arch,
                                 disp_max=int(disp_max), ws=cfg.ws,
                                 dtype_name=cfg.dtype, use_pallas=pallas)
        return pipe._method_jit(vols, x0, x1, blur_kernel=blur_kernel, **kw)

    P_b = P(axis, None, None)
    body = shard_map(
        lambda p, a, b: jax.lax.map(lambda ab: one(p, ab[0], ab[1]), (a, b)),
        mesh=mesh, in_specs=(P(), P_b, P_b), out_specs=P_b,
        check_vma=False)
    predict = jax.jit(body)
    batch = NamedSharding(mesh, P_b)
    repl = NamedSharding(mesh, P())

    def run(params, x0b, x1b):
        x0b = jax.device_put(jnp.asarray(x0b), batch)
        x1b = jax.device_put(jnp.asarray(x1b), batch)
        params = jax.device_put(params, repl)
        return predict(params, x0b, x1b)

    return run


def make_batch_predict(cfg: Config, mesh: Mesh, disp_max: int,
                       axis: str | None = None):
    """Batched pair→disparity: (B, H, W) pairs sharded over `axis` —
    data-parallel serving throughput (B pairs per dispatch)."""
    axis = axis or mesh.axis_names[0]
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    kw = _method_kwargs(cfg, disp_max, (1, -1))
    batch = NamedSharding(mesh, P(axis, None, None))
    repl = NamedSharding(mesh, P())

    def one(params, x0, x1):
        vols = pipe._volumes_jit(params, x0, x1, arch=cfg.arch,
                                 disp_max=int(disp_max), ws=cfg.ws,
                                 dtype_name=cfg.dtype, use_pallas=False)
        return pipe._method_jit(vols, x0, x1, blur_kernel=blur_kernel, **kw)

    @functools.partial(jax.jit, out_shardings=batch)
    def predict(params, x0b, x1b):
        x0b = jax.lax.with_sharding_constraint(x0b, batch)
        x1b = jax.lax.with_sharding_constraint(x1b, batch)
        return jax.vmap(lambda a, b: one(params, a, b))(x0b, x1b)

    def run(params, x0b, x1b):
        x0b = jax.device_put(jnp.asarray(x0b), batch)
        x1b = jax.device_put(jnp.asarray(x1b), batch)
        params = jax.device_put(params, repl)
        return predict(params, x0b, x1b)

    return run

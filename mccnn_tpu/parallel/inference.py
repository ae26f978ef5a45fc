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
import os

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


def _make_rowsharded_sgm(cfg: Config, mesh: Mesh, axis: str,
                         use_slab: bool):
    """The four-sweep SGM for the row-sharded path.

    Horizontal sweeps: scanlines ARE image rows, so each row-shard runs
    its sweeps with zero communication — via ``shard_map``, on the
    streaming Pallas slab kernel when the mesh is TPU (the kernel is a
    single-device program GSPMD could never partition), on the
    ``lax.scan`` formulation elsewhere (same sharding structure, so the
    8-virtual-CPU equality tests exercise this exact path). Vertical
    sweeps scan across the row shards; they stay GSPMD — XLA reshards
    the volume to columns (all-to-all over ICI) and scans.
    """
    from jax import shard_map

    from mccnn_tpu.ops import sgm as sgm_mod

    n_dev = mesh.devices.size
    kwp = dict(pi1=float(cfg.pi1), pi2=float(cfg.pi2),
               tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
               q1=float(cfg.sgm_q1), q2=float(cfg.sgm_q2))

    def sgm_fn(x0, x1, vols):
        dirs = sorted(vols)
        D, H, W = vols[dirs[0]].shape
        Hp = -(-H // n_dev) * n_dev  # shard_map needs exact divisibility
        x0p = jnp.pad(x0, ((0, Hp - H), (0, 0)))
        x1p = jnp.pad(x1, ((0, Hp - H), (0, 0)))
        vps = [jnp.pad(vols[d], ((0, 0), (0, Hp - H), (0, 0)),
                       constant_values=jnp.nan) for d in dirs]

        def horiz(x0l, x1l, *vs):
            vd = dict(zip(dirs, vs))
            Hl = x0l.shape[0]
            if use_slab:
                outs = sgm_mod._sgm_slab_horiz(
                    x0l, x1l, vd, dirs, D, Hl, W, **kwp)
            else:
                outs = sgm_mod._sgm_scan_horiz(
                    sgm_mod._sweep, x0l, x1l, vd, dirs, D, Hl, W, **kwp)
            return tuple(outs[d] for d in dirs)

        row = P(axis, None)
        vrow = P(None, axis, None)
        h_outs = shard_map(
            horiz, mesh=mesh,
            in_specs=(row, row) + (vrow,) * len(dirs),
            out_specs=(vrow,) * len(dirs), check_vma=False)(x0p, x1p, *vps)
        h = {d: o[:, :H] for d, o in zip(dirs, h_outs)}
        v = sgm_mod._sgm_scan_vert(sgm_mod._sweep, x0, x1, vols, dirs,
                                   D, H, W, **kwp)
        return {d: h[d] + v[d] for d in dirs}

    return sgm_fn


def make_sharded_predict(cfg: Config, mesh: Mesh, disp_max: int,
                         axis: str | None = None):
    """One jitted pair→disparity function with rows sharded over `axis`
    (default: the mesh's first axis).

    Inputs: x0/x1 (H, W) row-sharded; params replicated. The full
    pipeline (volumes + method) runs under one jit so XLA plans all
    reshards. The horizontal SGM family runs the per-shard Pallas slab
    kernels under ``shard_map`` on TPU meshes (see
    :func:`_make_rowsharded_sgm`)."""
    from mccnn_tpu.ops.sgm import _pallas_default

    axis = axis or mesh.axis_names[0]
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    kw = _method_kwargs(cfg, disp_max, (1, -1))
    mesh_tpu = mesh.devices.flat[0].platform == "tpu"
    # the row-sharded lane never uses the HWD storage path, so any
    # non-f32 -vol_dtype must hard-error here (no-silent-f32 contract)
    pipe.check_vol_dtype(cfg, hwd=False, tpu=mesh_tpu)
    use_slab = (_pallas_default() and mesh_tpu
                and os.environ.get("MCCNN_SGM_HSLAB", "1") != "0")
    kw["sgm_fn"] = _make_rowsharded_sgm(cfg, mesh, axis, use_slab)
    row = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    vol_row = NamedSharding(mesh, P(None, axis, None))

    def fast_vols_sharded(params, x0, x1):
        """Fast-arch volumes with the JOIN per row-shard: the tower
        runs GSPMD (XLA inserts the conv halo exchanges), then each
        shard joins its own rows — the dot products at row y read only
        row y, so the single-device MXU Pallas kernel runs whole inside
        ``shard_map`` (the XLA einsum join off-TPU, same structure)."""
        from jax import shard_map

        from mccnn_tpu.models import towers
        from mccnn_tpu.ops import costs
        from mccnn_tpu.ops.sgm import _pallas_default

        D = int(disp_max)
        H = x0.shape[0]
        n_dev = mesh.devices.size
        use_mxu = _pallas_default() and mesh_tpu
        dtype = jnp.dtype(cfg.dtype)
        feats = towers.apply_tower(params, jnp.stack([x0, x1])[..., None],
                                   arch="fast", padding="SAME", dtype=dtype)
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P(None, axis, None, None)))
        Hp = -(-H // n_dev) * n_dev
        fpad = jnp.pad(feats, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        n_fix = (cfg.ws - 1) // 2

        def join(fl, fr):
            if use_mxu:
                from mccnn_tpu.ops.join_pallas import stereo_join_mxu
                vl, vr = stereo_join_mxu(fl.astype(jnp.float32),
                                         fr.astype(jnp.float32), D)
            else:
                vl, vr = costs.stereo_join(fl, fr, D)
            return costs.fix_border(vl, -1, n_fix), costs.fix_border(
                vr, 1, n_fix)

        frow = P(axis, None, None)
        vl, vr = shard_map(join, mesh=mesh, in_specs=(frow, frow),
                           out_specs=(P(None, axis, None),) * 2,
                           check_vma=False)(fpad[0], fpad[1])
        return {-1: vl[:, :H], 1: vr[:, :H]}

    @jax.jit
    def predict(params, x0, x1):
        x0 = jax.lax.with_sharding_constraint(x0, row)
        x1 = jax.lax.with_sharding_constraint(x1, row)
        if cfg.arch == "fast":
            vols = fast_vols_sharded(params, x0, x1)
        else:
            vols = pipe._volumes_jit(params, x0, x1, arch=cfg.arch,
                                     disp_max=int(disp_max), ws=cfg.ws,
                                     dtype_name=cfg.dtype, use_pallas=False)
        vols = {k: jax.lax.with_sharding_constraint(v, vol_row)
                for k, v in vols.items()}
        return pipe._method_jit(vols, x0, x1, blur_kernel=blur_kernel, **kw)

    def run(params, x0, x1):
        x0, x1 = jnp.asarray(x0), jnp.asarray(x1)
        # device_put rejects uneven shardings; GSPMD inside the jit
        # handles them (the with_sharding_constraint pads internally),
        # so place indivisible inputs replicated and let XLA scatter.
        in_sh = row if x0.shape[0] % mesh.devices.size == 0 else repl
        x0 = jax.device_put(x0, in_sh)
        x1 = jax.device_put(x1, in_sh)
        params = jax.device_put(params, repl)
        return predict(params, x0, x1)

    # exposed for tests: lets the medium-shape equality test inspect
    # the compiled HLO (vertical-family resharding present, horizontal
    # family communication-free)
    run._predict = predict
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
    pipe.check_vol_dtype(cfg, hwd=use_hwd, tpu=mesh_tpu)
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
                sm_skip=cfg.sm_skip, return_vols=False,
                vol_dtype=cfg.vol_dtype)
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

    # exposed for tests: lets the scaling test inspect the compiled
    # HLO (no cross-shard collectives on the batch path, by
    # construction — checked, not assumed)
    run._predict = predict
    return run


def make_batch_predict(cfg: Config, mesh: Mesh, disp_max: int,
                       axis: str | None = None):
    """Batched pair→disparity: (B, H, W) pairs sharded over `axis` —
    data-parallel serving throughput (B pairs per dispatch)."""
    axis = axis or mesh.axis_names[0]
    pipe.check_vol_dtype(cfg, hwd=False,
                         tpu=mesh.devices.flat[0].platform == "tpu")
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

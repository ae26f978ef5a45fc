"""The stereo inference pipeline.

Orchestration contract: ``stereo_predict`` (main.lua:929-1082) —
per-arch cost volumes, then per reference direction: CBCA → SGM →
CBCA → WTA; then (KITTI only) LR outlier detection + occlusion and
mismatch filling; then subpixel refinement (reading the
last-processed direction's volume, which is always the left/-1
volume), 5×5 median, and thresholded-Gaussian blur.

``sm_terminate`` stops the method after a named stage and ``sm_skip``
skips one stage, with the exact gate placement of main.lua:988-1080
(including the quirk that the mismatch stage is skipped by
``-sm_skip occlusion``).

Everything numeric is jitted; the per-(cfg, shape) pipelines are
cached on first use.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.config import Config
from mccnn_tpu.models import towers
from mccnn_tpu.ops import costs, cross, post, sgm as sgm_mod


def slow_cost_volumes(params, x0, x1, disp_max: int, dtype=jnp.float32,
                      use_pallas=None):
    """Accurate-arch cost volumes over full images.

    The reference runs the conv tower once per image and then loops
    d = 1..disp_max, applying the FC head (as 1×1 convs) to
    shift-concatenated feature maps (main.lua:962-977, the ~67 s/pair
    hot loop).

    TPU path: the fused Pallas MLP-chain kernel
    (:mod:`mccnn_tpu.ops.slow_head_pallas`) — the FC head's weights
    live in VMEM, activations never touch HBM, and the shifted
    right-feature slab is loaded once per (row, column) tile and
    reused across a whole chunk of disparities. Elsewhere: a
    ``lax.map`` over disparity, each step one (H·W, 2C)×(2C, nh2) MXU
    matmul chain. (A chunked/first-layer-factored XLA variant was
    measured SLOWER than this map on the chip — the per-step matmul
    chain is HBM-bound and the factoring only traded matmul time for
    un-overlapped elementwise traffic.)

    Returns (vol_L, vol_R), each (D, H, W), NaN out of frame; output is
    P(non-match) in (0,1), lower = better.
    """
    from mccnn_tpu.ops.sgm import _pallas_default

    feats = towers.apply_tower(params, jnp.stack([x0, x1])[..., None],
                               arch="slow", padding="SAME", dtype=dtype)
    fl, fr = feats[0], feats[1]  # (H, W, C)
    H, W, C = fl.shape
    xs = jnp.arange(W)
    D = disp_max

    pallas = _pallas_default() if use_pallas is None else use_pallas
    if pallas and len(params["head"]) >= 3:  # kernel needs >=1 mid layer
        from mccnn_tpu.ops.slow_head_pallas import slow_volumes_mxu
        return slow_volumes_mxu(params, fl, fr, D, dtype=dtype)

    def one(d):
        # pair left pixel x with right pixel x-d (left-referenced)
        fr_s = costs._shift_x(jnp.moveaxis(fr, -1, 0), -d)  # (C,H,W): fr[y, x-d]
        pair = jnp.concatenate([fl, jnp.moveaxis(fr_s, 0, -1)], axis=-1)
        s = towers.apply_head(params, pair, dtype=dtype)  # (H, W)
        vl = jnp.where(xs - d >= 0, s, jnp.nan)
        vr = jnp.where(xs + d < W, costs._shift_x(s, d), jnp.nan)
        return vl, vr

    vol_l, vol_r = jax.lax.map(one, jnp.arange(disp_max))
    return vol_l, vol_r


def _active_after(terminate: str, stage: str) -> bool:
    """Whether the method is still active after `stage`, given
    -sm_terminate. Stage order per main.lua:988-1075."""
    order = ["cnn", "cbca1", "sgm", "cbca2", "occlusion", "mismatch",
             "subpixel_enchancement", "median"]
    if terminate not in order:
        return True
    return order.index(stage) < order.index(terminate)


@functools.partial(jax.jit, static_argnames=("arch", "disp_max", "ws",
                                             "dtype_name", "use_pallas",
                                             "disp_true"))
def _volumes_jit(params, x0, x1, *, arch, disp_max, ws, dtype_name,
                 use_pallas=None, disp_true=None):
    """Cost volumes for both reference directions
    (main.lua:932-951, 958-987). Returns {-1: vol, +1: vol}.

    ``use_pallas=None`` means "Pallas MXU join on TPU, XLA join
    elsewhere". Sharded inference passes False: the Pallas kernel is a
    single-device program, so under GSPMD the einsum formulation (which
    XLA can partition) is used instead — same escape hatch as the SGM
    sweeps (parallel/inference.py).

    ``disp_true`` (shape bucketing): when disp_max was padded up to a
    compile bucket, planes d >= disp_true get a large finite cost. A
    large sentinel (not NaN: the CBCA mean would zero it) is stable
    through every stage — CBCA averages it to itself, the SGM min-plus
    recurrence never selects it, WTA never picks it. The one residual
    effect: pixels whose winner is exactly disp_true-1 see a huge
    cost at d+1 and get a clamped -0.5 subpixel shift where the
    exact-shape run's bounds guard would keep d.
    """
    dtype = jnp.dtype(dtype_name)
    D = disp_max

    def mask_pad(vols):
        if disp_true is not None and disp_true < D:
            ds_idx = jnp.arange(D)[:, None, None]
            vols = {k: jnp.where(ds_idx < disp_true, v, 1e9)
                    for k, v in vols.items()}
        return vols

    if arch == "ad":
        return mask_pad({-1: costs.ad_volume(x0, x1, D, -1),
                         1: costs.ad_volume(x1, x0, D, 1)})
    if arch == "census":
        return mask_pad({-1: costs.census_volume(x0, x1, D, -1),
                         1: costs.census_volume(x1, x0, D, 1)})
    if arch == "fast":
        feats = towers.apply_tower(params, jnp.stack([x0, x1])[..., None],
                                   arch="fast", padding="SAME", dtype=dtype)
        from mccnn_tpu.ops.sgm import _pallas_default
        if _pallas_default() if use_pallas is None else use_pallas:
            from mccnn_tpu.ops.join_pallas import stereo_join_mxu
            vol_l, vol_r = stereo_join_mxu(feats[0], feats[1], D)
        else:
            vol_l, vol_r = costs.stereo_join(feats[0], feats[1], D)
    elif arch == "slow":
        vol_l, vol_r = slow_cost_volumes(params, x0, x1, D, dtype=dtype,
                                         use_pallas=use_pallas)
    else:
        raise ValueError(arch)
    n = (ws - 1) // 2
    return mask_pad({-1: costs.fix_border(vol_l, -1, n),
                     1: costs.fix_border(vol_r, 1, n)})


@functools.partial(jax.jit, static_argnames=(
    "disp_max", "directions", "kitti", "L1", "cbca_i1", "cbca_i2",
    "sgm_i", "sm_terminate", "sm_skip", "return_vols", "sgm_pallas",
    "sgm_fn",
    # compile-time constants for the Pallas SGM sweep (config values,
    # one compile per stereo-method configuration anyway)
    "pi1", "pi2", "tau_so", "alpha1", "sgm_q1", "sgm_q2"))
def _method_jit(vols, x0, x1, *, disp_max, directions, kitti,
                L1, tau1, cbca_i1, cbca_i2, pi1, pi2, tau_so, alpha1,
                sgm_q1, sgm_q2, sgm_i, blur_kernel, blur_t,
                sm_terminate, sm_skip, return_vols, sgm_pallas=None,
                sgm_fn=None):
    D = disp_max
    sm_active = _active_after(sm_terminate, "cnn")
    do_cbca = sm_active and sm_skip != "cbca"
    if do_cbca:
        x0c = cross.cross_arms(x0, L1, tau1)
        x1c = cross.cross_arms(x1, L1, tau1)

    cur = {}
    for direction in directions:
        vol = vols[direction]
        if do_cbca:
            for _ in range(cbca_i1):
                vol = cross.cbca(x0c, x1c, vol, direction, L1)
        cur[direction] = vol

    if _active_after(sm_terminate, "cbca1") and sm_skip != "sgm":
        # both reference directions share one fused sweep set — the
        # serialized SGM steps are the pipeline's critical path.
        # ``sgm_fn`` (static) substitutes the whole sweep set — the
        # row-sharded path passes its shard_map hybrid here.
        for _ in range(sgm_i):
            if sgm_fn is not None:
                outs = sgm_fn(x0, x1, cur)
            else:
                outs = sgm_mod._sgm_multi(
                    x0, x1, cur, pi1=pi1, pi2=pi2, tau_so=tau_so,
                    alpha1=alpha1, sgm_q1=sgm_q1, sgm_q2=sgm_q2,
                    use_pallas=sgm_pallas)
            cur = {d: v / 4.0 for d, v in outs.items()}

    disp = {}
    final_vols = {}
    for direction in directions:
        vol = cur[direction]
        if _active_after(sm_terminate, "sgm") and do_cbca:
            for _ in range(cbca_i2):
                vol = cross.cbca(x0c, x1c, vol, direction, L1)
        disp[direction] = costs.wta(vol)
        final_vols[direction] = vol

    d_final = disp[directions[-1]]  # the -1 (left-reference) map
    vol_final = final_vols[directions[-1]]
    sm_active = _active_after(sm_terminate, "cbca2")

    if kitti and len(directions) == 2:
        outlier = post.outlier_detection(disp[-1], disp[1], D)
        if sm_active and sm_skip != "occlusion":
            d_final = post.interpolate_occlusion(d_final, outlier)
        if _active_after(sm_terminate, "occlusion") and sm_skip != "occlusion":
            d_final = post.interpolate_mismatch(d_final, outlier)
        sm_active = _active_after(sm_terminate, "mismatch")

    if sm_active and sm_skip != "subpixel_enchancement":
        d_final = post.subpixel_enhancement(d_final, vol_final, D)
    sm_active = sm_active and _active_after(sm_terminate, "subpixel_enchancement")

    if sm_active and sm_skip != "median":
        d_final = post.median2d(d_final, 5)
    sm_active = sm_active and _active_after(sm_terminate, "median")

    if sm_active and sm_skip != "bilateral":
        d_final = post.mean2d(d_final, blur_kernel, blur_t)

    if return_vols:
        return d_final, final_vols.get(-1), final_vols.get(1)
    return d_final


def _fast_hwd_body(params, x0, x1, blur_kernel, *, disp_max, kitti, ws,
                   dtype_name, pi1, pi2, tau_so, alpha1, sgm_q1, sgm_q2,
                   sgm_i, blur_t, sm_terminate, sm_skip, return_vols,
                   directions=(1, -1), disp_true=None,
                   vol_dtype="float32"):
    """The fast-arch pipeline in the join's native disparity-minor
    layout (TPU default when no CBCA is configured — every KITTI fast
    config has cbca_i1 = cbca_i2 = 0).

    One fused jit: tower -> HWD MXU join (mask/negate/fix_border
    in-kernel) -> per-direction slab SGM consuming the padded
    (Hp, Wp, Dp) buffers as-is -> lane-axis WTA -> refinement. The
    left volume lives x-REVERSED end to end (only (H, W) disparity
    maps are ever flipped); no full-volume relayout except the
    horizontal sweep family's (W, H) transpose inside the slab SGM.
    The /4 after the sweep sum is elided: WTA is scale-invariant and
    the subpixel parabola is bit-exact under the power-of-2 rescale
    with its threshold at 4e-5 (see subpixel_enhancement_hwd); the
    predict-mode volume dump divides by 4 on the way out.

    Stage gates (sm_terminate/sm_skip) follow main.lua:988-1080 like
    _method_jit; the CBCA stages do not exist in this lane.

    directions=(-1,) (Middlebury evaluation, main.lua:954-955) builds
    and processes only the left volume — half the join and SGM work.

    disp_true (TRACED scalar, shape bucketing): when disp_max was
    padded up to a compile bucket, the join emits NaN at lanes
    d >= disp_true, which is EXACT through this lane — NaN lanes
    never win the (inf-substituted) WTA, fmin drops them from the SGM
    neighbor coupling exactly like the real d-range boundary, and the
    subpixel parabola at d == disp_true-1 sees a NaN denominator and
    keeps d, the same decision the exact-shape bounds guard makes.
    (The standard lane's large-finite sentinel is approximate at that
    boundary; this lane has no CBCA mean to protect, so NaN is safe.)

    vol_dtype (``-vol_dtype``, TPU-native extension): STORAGE dtype of
    the cost volume through the join and the SGM sweeps. The SGM
    streaming traffic is the pipeline's dominant cost (~5.4 GB per
    direction at KITTI scale in f32), so float16/bfloat16 halve it;
    every arithmetic step — the join's dots, the SGM recurrence, the
    WTA compare, the subpixel parabola — still computes in f32 and
    only the values written back to HBM round (f16: 10 mantissa bits
    + denormals; bf16: 8 bits). Parity-breaking by rounding, never by
    semantics: NaN masks, fix_border and the fused WTA flow
    identically. Accuracy qualification: tests/test_tpu_kernels.py
    asserts bounded WTA-flip rate and |Δdisp| vs the f32 run; PERF.md
    records the measured rates on the golden pair.
    """
    from mccnn_tpu.ops.join_pallas import stereo_join_mxu_hwd

    single = tuple(directions) == (-1,)
    assert not (single and kitti)  # KITTI always runs both directions
    D = int(disp_max)
    H, W = x0.shape
    dtype = jnp.dtype(dtype_name)
    feats = towers.apply_tower(params, jnp.stack([x0, x1])[..., None],
                               arch="fast", padding="SAME", dtype=dtype)
    n_fix = (ws - 1) // 2
    fl = feats[0].astype(jnp.float32)
    fr = feats[1].astype(jnp.float32)
    if single:
        cur_lr = stereo_join_mxu_hwd(fl, fr, D, n_fix=n_fix, sides="left",
                                     d_true=disp_true, out_dtype=vol_dtype)
        cur_r = None
    else:
        cur_lr, cur_r = stereo_join_mxu_hwd(fl, fr, D, n_fix=n_fix,
                                            d_true=disp_true,
                                            out_dtype=vol_dtype)

    sgm_ran = _active_after(sm_terminate, "cbca1") and sm_skip != "sgm"
    if sgm_ran:
        kw = dict(pi1=pi1, pi2=pi2, tau_so=tau_so, alpha1=alpha1,
                  q1=sgm_q1, q2=sgm_q2)
        for i in range(sgm_i):
            if i > 0:  # sgm_i is 1 in every config; keep re-iteration exact
                cur_lr = cur_lr / 4.0
                cur_r = None if single else cur_r / 4.0
            last = i == sgm_i - 1
            # final iteration: WTA fused into the last sweep (the
            # volume never needs a separate argmin read); the right
            # volume is consumed ONLY by its WTA map, so unless the
            # caller wants the volume dumps its final sweep skips the
            # volume write altogether.
            cur_lr = sgm_mod._sgm_slab_hwd(x0, x1, cur_lr, D, H, W,
                                           xrev=True, wta=last, **kw)
            if not single:
                out_r = sgm_mod._sgm_slab_hwd(
                    x0, x1, cur_r, D, H, W, xrev=False, wta=last,
                    materialize=return_vols or not last, **kw)
                cur_r = out_r if not last else (
                    out_r[0] if return_vols else None)
        cur_lr, wta_l = cur_lr
        d_l = wta_l[:H, :W][:, ::-1]
        if not single:
            wta_r = out_r[1] if return_vols else out_r
            d_r = wta_r[:H, :W]
    else:
        d_l = costs.wta_hwd(cur_lr)[:H, :W][:, ::-1]
        if not single:
            d_r = costs.wta_hwd(cur_r)[:H, :W]
    d_final = d_l
    sm_active = _active_after(sm_terminate, "cbca2")

    if kitti:
        outlier = post.outlier_detection(d_l, d_r, D)
        if sm_active and sm_skip != "occlusion":
            d_final = post.interpolate_occlusion(d_final, outlier)
        if _active_after(sm_terminate, "occlusion") and sm_skip != "occlusion":
            d_final = post.interpolate_mismatch(d_final, outlier)
        sm_active = _active_after(sm_terminate, "mismatch")

    if sm_active and sm_skip != "subpixel_enchancement":
        Wp = cur_lr.shape[1]
        d_rev = jnp.pad(d_final[:, ::-1], ((0, 0), (0, Wp - W)))
        thresh = 4e-5 if sgm_ran else 1e-5
        s = post.subpixel_enhancement_hwd(d_rev, cur_lr[:H], D,
                                          denom_thresh=thresh)
        d_final = s[:, :W][:, ::-1]
    sm_active = sm_active and _active_after(sm_terminate,
                                            "subpixel_enchancement")

    if sm_active and sm_skip != "median":
        d_final = post.median2d(d_final, 5)
    sm_active = sm_active and _active_after(sm_terminate, "median")

    if sm_active and sm_skip != "bilateral":
        d_final = post.mean2d(d_final, blur_kernel, blur_t)

    if return_vols:
        # Relayout to the natural (D, H, W) .bin contract in-graph.
        # (Rounds 1-2 had to return the STORED layout and relayout in
        # a separate jit: the axon runtime materialized
        # reversed+transposed Pallas-derived jit outputs corrupted at
        # KITTI scale. The runtime has since been fixed — verified
        # bit-identical fused vs split through the full pipeline on
        # the golden pair; `tools/check_axon_relayout.py` re-probes
        # for regressions.)
        kwv = dict(D=D, H=H, W=W, scale4=sgm_ran)
        vol_l = _hwd_unpack_vol(cur_lr, xrev=True, **kwv)
        vol_r = (None if cur_r is None
                 else _hwd_unpack_vol(cur_r, xrev=False, **kwv))
        return d_final, vol_l, vol_r
    return d_final


_fast_hwd_jit = functools.partial(jax.jit, static_argnames=(
    "disp_max", "kitti", "ws", "dtype_name", "sgm_i", "blur_t",
    "sm_terminate", "sm_skip", "return_vols", "directions",
    "pi1", "pi2", "tau_so", "alpha1", "sgm_q1", "sgm_q2",
    "vol_dtype"))(_fast_hwd_body)


def _hwd_unpack_vol(vol, *, D, H, W, xrev, scale4):
    """Stored-layout (H', Wp, Dp) HWD volume -> natural (D, H, W) for
    the predict-mode .bin dumps. ``scale4`` applies the deferred /4 of
    the SGM sweep sum; 16-bit-stored volumes widen to the f32 output
    contract (README:63-66). Called inside _fast_hwd_body (traceable;
    works standalone too)."""
    v = vol[:H, :W, :D].astype(jnp.float32)
    if xrev:
        v = v[:, ::-1]
    if scale4:
        v = v * 0.25
    return jnp.transpose(v, (2, 0, 1))


def _hwd_eligible(cfg: Config, directions, disp_max, disp_true) -> bool:
    """The HWD lane covers the fast arch with no CBCA and no volume
    cache on the TPU Pallas default path — for both reference
    directions (KITTI, and MB predict) or the left direction alone
    (MB evaluation), including D-bucketed shapes (disp_true rides as
    a traced scalar and the NaN pad lanes make the bucket exact)."""
    import os

    from mccnn_tpu.ops.sgm import _pallas_default

    return (cfg.arch == "fast" and tuple(directions) in ((1, -1), (-1,))
            and int(cfg.cbca_i1) == 0 and int(cfg.cbca_i2) == 0
            and not cfg.use_cache and not cfg.make_cache
            and _pallas_default()
            and os.environ.get("MCCNN_SGM_HSLAB", "1") != "0"
            and os.environ.get("MCCNN_FAST_HWD", "1") != "0")


def compute_volumes(cfg: Config, params, x0, x1, disp_max: int,
                    pair_id=None, disp_true=None):
    """Cost volumes with the reference's second cache tier
    (main.lua:959-982): with ``-use_cache`` volumes are loaded from
    ``cache/<id>.npz`` when present; ``-make_cache`` writes them after
    computing. The cache lets stereo-method hyperparameter search skip
    the expensive slow-arch CNN pass (hs.py:205-206)."""
    import os

    import numpy as np

    cache_f = None
    if pair_id is not None and (cfg.use_cache or cfg.make_cache):
        cache_f = os.path.join("cache", f"{pair_id}.npz")
    if cache_f and cfg.use_cache and os.path.exists(cache_f):
        z = np.load(cache_f)
        return {-1: jnp.asarray(z["vol_m1"]), 1: jnp.asarray(z["vol_p1"])}
    vols = _volumes_jit(params, jnp.asarray(x0), jnp.asarray(x1),
                        arch=cfg.arch, disp_max=int(disp_max), ws=cfg.ws,
                        dtype_name=cfg.dtype,
                        disp_true=None if disp_true is None else int(disp_true))
    if cache_f and cfg.make_cache:
        os.makedirs("cache", exist_ok=True)
        np.savez(cache_f, vol_m1=np.asarray(vols[-1]),
                 vol_p1=np.asarray(vols[1]))
    return vols


def check_vol_dtype(cfg: Config, hwd: bool, tpu: bool) -> None:
    """The ``-vol_dtype`` contract, shared by every entry lane
    (stereo_predict and both sharded factories in parallel/inference).

    16-bit cost-volume STORAGE exists only on the fast HWD Pallas lane;
    a configuration that would silently fall back to the f32 standard
    lane must hard-error (it would misreport a benchmark). float16 on
    TPU also hard-errors: the Mosaic TPU dialect has no f16 vector type
    on v5e — the kernel would die deep in the compiler — and bfloat16
    is the chip's native 16-bit storage with the same halved HBM
    traffic (float16 stays supported in the interpret-mode CPU lane,
    where the tests qualify it)."""
    if cfg.vol_dtype != "float32" and not hwd:
        raise ValueError(
            f"-vol_dtype {cfg.vol_dtype} requires the fast HWD lane "
            "(fast arch, cbca_i1=cbca_i2=0, no volume cache, TPU "
            "Pallas path)")
    if cfg.vol_dtype == "float16" and tpu:
        raise ValueError(
            "-vol_dtype float16 is unsupported by the TPU Mosaic "
            "dialect; use -vol_dtype bfloat16")


def stereo_predict(cfg: Config, params, x0, x1, disp_max: int,
                   return_vols: bool = False, pair_id=None,
                   disp_true=None):
    """Run the full stereo method on one standardized pair.

    x0/x1: (H, W) float32 (already per-image standardized). Returns the
    left-reference disparity map (H, W) float32; with return_vols also
    the final left and right cost volumes (for predict-mode .bin dumps
    and debugging, main.lua:1042-1047). ``disp_true``: see _volumes_jit
    (shape bucketing).
    """
    if cfg.dataset == "mb":
        directions = (1, -1) if cfg.a == "predict" else (-1,)
    else:
        directions = (1, -1)
    blur_kernel = jnp.asarray(post.gaussian_kernel(cfg.blur_sigma))
    hwd = _hwd_eligible(cfg, directions, disp_max, disp_true)
    check_vol_dtype(cfg, hwd=hwd, tpu=jax.default_backend() == "tpu")
    if hwd:
        out = _fast_hwd_jit(
            params, jnp.asarray(x0), jnp.asarray(x1), blur_kernel,
            disp_max=int(disp_max),
            kitti=cfg.dataset in ("kitti", "kitti2015"), ws=cfg.ws,
            dtype_name=cfg.dtype, pi1=float(cfg.pi1), pi2=float(cfg.pi2),
            tau_so=float(cfg.tau_so), alpha1=float(cfg.alpha1),
            sgm_q1=float(cfg.sgm_q1), sgm_q2=float(cfg.sgm_q2),
            sgm_i=int(cfg.sgm_i), blur_t=float(cfg.blur_t),
            sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip,
            return_vols=return_vols, directions=tuple(directions),
            disp_true=(None if disp_true is None
                       or int(disp_true) == int(disp_max)
                       else int(disp_true)),
            vol_dtype=cfg.vol_dtype)
        return out
    vols = compute_volumes(cfg, params, x0, x1, disp_max, pair_id=pair_id,
                           disp_true=disp_true)
    return _method_jit(
        vols, jnp.asarray(x0), jnp.asarray(x1),
        disp_max=int(disp_max), directions=directions,
        kitti=cfg.dataset in ("kitti", "kitti2015"),
        L1=int(cfg.L1), tau1=float(cfg.tau1),
        cbca_i1=int(cfg.cbca_i1), cbca_i2=int(cfg.cbca_i2),
        pi1=float(cfg.pi1), pi2=float(cfg.pi2), tau_so=float(cfg.tau_so),
        alpha1=float(cfg.alpha1), sgm_q1=float(cfg.sgm_q1),
        sgm_q2=float(cfg.sgm_q2), sgm_i=int(cfg.sgm_i),
        blur_kernel=blur_kernel, blur_t=float(cfg.blur_t),
        sm_terminate=cfg.sm_terminate, sm_skip=cfg.sm_skip,
        return_vols=return_vols)

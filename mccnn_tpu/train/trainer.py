"""The training loop.

Behavior contract (main.lua:753-890): SGD with momentum implemented
inline (``v = mom*v - lr*g; w += v``, main.lua:871-874), 14 epochs with
lr/10 at epoch 12, minibatches of ``bs/2`` ground-truth points → 4
patches each (anchor, pos, anchor, neg), hinge loss (fast) / BCE
(slow), loss-explosion guard (batches with err<0 or err>=100 excluded
with a WARNING, main.lua:861-866), per-epoch
``(epoch, mean_err, lr, elapsed)`` print, final checkpoint to
``net/net_<cmd_str>``, then the action chains into test_te (train_tr)
or submit (train_all) (main.lua:884-888).

TPU-native design: the host only samples augmentation parameters and
gathers source windows (vectorized numpy over a whole *chunk* of
minibatches); the device runs ``lax.scan`` over the chunk — bicubic
warp + forward + backward + SGD update per step — so dispatch overhead
and host↔device transfers are amortized over dozens of steps.
"""

from __future__ import annotations

import functools
import time as _time

import numpy as np

from mccnn_tpu.config import Config, cmd_str
from mccnn_tpu.data.datasets import StereoDataset, load_dataset, subset_nnz
from mccnn_tpu.models import checkpoint, towers
from mccnn_tpu.train import losses
from mccnn_tpu.train.augment import AugmentSampler, warp_patches

# minibatches fused into one device dispatch
CHUNK_STEPS = 32


def n_epoch_steps(n_rows: int, bs_half: int) -> int:
    """Minibatch count of one epoch: the reference loop
    `for t = 1, N - bs/2, bs/2` (main.lua:789) runs while
    t <= N - bs/2 — one more step than plain floor division whenever
    N % bs/2 != 0."""
    return 1 + (n_rows - bs_half - 1) // bs_half if n_rows > bs_half else 0


def loss_fn(params, patches, labels, *, arch: str, m: float, pow: int,
            dtype):
    """patches: (2*bs, ws, ws) — consecutive (L, R) siamese pairs.

    fast: L2-normalized descriptors, cosine similarity of each pair,
    hinge over interleaved (pos, neg) pairs (Margin2.lua).
    slow: concat descriptors → FC head → sigmoid, BCE vs labels
    (0 = match) (BCECriterion2.lua, main.lua:848-849).
    """
    import jax.numpy as jnp

    feats = towers.apply_tower(params, patches[..., None], arch=arch,
                               padding="VALID", dtype=dtype)
    desc = feats.reshape(feats.shape[0], -1)  # (2bs, fm): center pixel only
    if arch == "fast":
        scores = jnp.sum(desc[0::2] * desc[1::2], axis=-1)  # (bs,)
        return losses.hinge(scores, margin=m, pow=pow)
    pair = jnp.concatenate([desc[0::2], desc[1::2]], axis=-1)  # (bs, 2fm)
    p = towers.apply_head(params, pair, dtype=dtype)
    return losses.bce(p, labels)


def make_train_chunk(cfg: Config, device_gather: bool = False):
    """Build the jitted scan-over-minibatches update function.

    device_gather: the chunk carries window ORIGINS instead of window
    pixels; each step gathers its (4n, WIN, WIN) windows from the
    HBM-resident padded image stack (``augment.pad_image_stack``) —
    the per-step host->device transfer drops from ~1 MB of windows to
    ~10 KB of origins/affines (VERDICT r03 #3)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.train.augment import gather_windows_device

    arch, ws = cfg.arch, cfg.ws
    m, pow_, mom = float(cfg.m), int(cfg.pow), float(cfg.mom)
    dtype = jnp.dtype(cfg.dtype)

    def make_step(Xpad):
        def step(carry, batch):
            params, momentum, lr = carry
            if device_gather:
                windows = gather_windows_device(
                    Xpad, batch["src"], batch["oy"], batch["ox"])
            else:
                windows = batch["windows"]
            patches = warp_patches(windows, batch["minv"],
                                   batch["brightness"], batch["contrast"],
                                   ws=ws)
            err, grads = jax.value_and_grad(loss_fn)(
                params, patches, batch["labels"], arch=arch, m=m, pow=pow_,
                dtype=dtype)
            momentum = jax.tree.map(lambda v, g: mom * v - lr * g,
                                    momentum, grads)
            params = jax.tree.map(lambda w, v: w + v, params, momentum)
            return (params, momentum, lr), err
        return step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, momentum, lr, batches, Xpad=None):
        (params, momentum, _), errs = jax.lax.scan(
            make_step(Xpad), (params, momentum, lr), batches)
        return params, momentum, errs

    return train_chunk


def _stack_chunk(sampler: AugmentSampler, ds: StereoDataset,
                 nnz_rows: np.ndarray, n_steps: int, bs_half: int,
                 X0=None, X1=None, device_gather: bool = False) -> dict:
    """Host side of a chunk: windows/matrices/photometrics for n_steps
    minibatches, shaped (n_steps, per-step...)."""
    if ds.dataset == "mb":
        b = sampler.build_batches_mb(ds.X, nnz_rows)
    else:
        b = sampler.build_batches(X0, X1, nnz_rows,
                                  device_gather=device_gather)
    n4 = 4 * bs_half
    out = {
        "minv": b["minv"].reshape(n_steps, n4, 6),
        "brightness": b["brightness"].reshape(n_steps, n4),
        "contrast": b["contrast"].reshape(n_steps, n4),
        "labels": b["labels"].reshape(n_steps, 2 * bs_half),
    }
    if device_gather:
        for k in ("src", "oy", "ox"):
            out[k] = b[k].reshape(n_steps, n4)
    else:
        out["windows"] = b["windows"].reshape(n_steps, n4,
                                              *b["windows"].shape[1:])
    return out


def train(cfg: Config, ds: StereoDataset, params, *, epochs: int = 14,
          momentum=None, log=print, save_cb=None, start_epoch: int = 1):
    """Run the reference schedule; returns (params, momentum).

    ``save_cb(epoch, params, momentum)`` is invoked after each epoch
    when per-epoch checkpointing is enabled (reference: -debug only,
    main.lua:877-879; here also -checkpoint_every for true mid-train
    resume, which the reference lacks — SURVEY.md §5).
    ``start_epoch`` > 1 resumes the schedule mid-way (lr drop at epoch
    12 still applies).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(cfg.seed)
    nnz = ds.nnz_for_action(cfg.a)
    if cfg.subset < 1:
        if ds.dataset == "mb":
            # per-generation sampling (main.lua:630-640): 2014 / 2006 /
            # 2005 / 2003 / 2001 image-id ranges
            ids = []
            for lo, hi in ((11, 23), (24, 44), (45, 50), (51, 52), (53, 60)):
                r = np.arange(lo, hi + 1)
                keep = rng.permutation(len(r))[: int(len(r) * cfg.subset)]
                ids.append(r[keep])
            nnz = subset_nnz(nnz, np.concatenate(ids))
        else:
            keep = rng.permutation(len(ds.tr))[: int(len(ds.tr) * cfg.subset)]
            nnz = subset_nnz(nnz, ds.tr[keep])

    if momentum is None:
        momentum = jax.tree.map(jnp.zeros_like, params)
    # device-resident training data (VERDICT r03 #3): KITTI image
    # stacks fit HBM whole, so windows are gathered ON DEVICE and the
    # host ships only origins. MB keeps the host gather (per-image
    # shapes + lights/exposures don't stack).
    import os as _os
    device_gather = (ds.dataset != "mb"
                     and _os.environ.get("MCCNN_DEVICE_GATHER", "1") != "0")
    train_chunk = make_train_chunk(cfg, device_gather=device_gather)

    bs_half = cfg.bs // 2
    lr = float(cfg.lr)
    Xpad = None
    if ds.dataset == "mb":
        X0 = X1 = None
    else:
        X0 = np.asarray(ds.X0[:, 0])[:, None]  # materialize mmap once
        X1 = np.asarray(ds.X1[:, 0])[:, None]
        if device_gather:
            from mccnn_tpu.train.augment import pad_image_stack
            Xpad = jax.device_put(pad_image_stack(X0, X1))
    t0 = _time.time()
    for epoch in range(1, epochs + 1):
        if epoch == 12:
            lr = lr / 10
        if epoch < start_epoch:
            continue
        # per-epoch seeding: the shuffle and every augmentation draw
        # derive from (seed, epoch), so a resumed run replays the exact
        # stream of the uninterrupted schedule
        rng_e = np.random.RandomState(cfg.seed * 1000003 + epoch)
        sampler = AugmentSampler(cfg, rng_e)
        perm = rng_e.permutation(len(nnz))
        n_steps_total = n_epoch_steps(len(nnz), bs_half)
        err_sum, err_cnt = 0.0, 0

        # host chunks are built one step ahead of the device (the
        # reference interleaves CPU warps with GPU steps serially,
        # main.lua:843-869 — a known bottleneck, SURVEY.md §7.3)
        def chunks():
            pos = 0
            while pos < n_steps_total:
                k = min(CHUNK_STEPS, n_steps_total - pos)
                rows = nnz[perm[pos * bs_half:(pos + k) * bs_half]]
                yield _stack_chunk(sampler, ds, rows, k, bs_half, X0, X1,
                                   device_gather=device_gather)
                pos += k

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            it = chunks()
            fut = pool.submit(lambda: next(it, None))
            while True:
                chunk = fut.result()
                if chunk is None:
                    break
                fut = pool.submit(lambda: next(it, None))
                params, momentum, errs = train_chunk(
                    params, momentum, jnp.float32(lr), chunk, Xpad)
                errs = np.asarray(errs)
                good = (errs >= 0) & (errs < 100)
                for e in errs[~good]:
                    log(f"WARNING! err={e:f}")
                err_sum += float(errs[good].sum())
                err_cnt += int(good.sum())
        log(f"{epoch}\t{err_sum / max(err_cnt, 1)}\t{lr}\t{_time.time() - t0}")
        if save_cb is not None and (
                cfg.debug or (cfg.checkpoint_every and
                              epoch % cfg.checkpoint_every == 0)):
            save_cb(epoch, params, momentum)
    return params, momentum


def action_train(cfg: Config, tail: list[str]) -> None:
    import jax.numpy as jnp
    from mccnn_tpu.cli import init_params

    ds = load_dataset(cfg)
    towers.print_net(cfg)  # net topology echo (main.lua:751)
    params = init_params(cfg)
    momentum = None
    start_epoch = 1
    if cfg.resume:
        import jax
        momentum = jax.tree.map(jnp.zeros_like, params)
        params, opt, extras = checkpoint.load(cfg.resume, params,
                                              {"momentum": momentum})
        momentum = extras["momentum"]
        start_epoch = int(opt.get("epoch", 0)) + 1
        print(f"resuming from {cfg.resume} at epoch {start_epoch}")

    name = cmd_str(cfg, tail)

    def save_cb(epoch, p, m):
        checkpoint.save(f"net/net_{name}_{epoch}.npz", p,
                        {"cfg": vars(cfg), "epoch": epoch},
                        extra={"momentum": m})

    params, momentum = train(cfg, ds, params, momentum=momentum,
                             save_cb=save_cb, start_epoch=start_epoch)

    fname = f"net/net_{name}.npz"
    checkpoint.save(fname, params, {"cfg": vars(cfg)})
    cfg.net_fname = fname

    # chain into evaluation (main.lua:884-888)
    cfg.a = "test_te" if cfg.a == "train_tr" else "submit"
    from mccnn_tpu.train.evaluate import action_eval
    action_eval(cfg, tail, params=params, ds=ds)

#!/usr/bin/env python
"""Training-throughput bench on a KITTI-scale synthetic set.

Measures SGD steps/s through the REAL train() loop (host sampling +
chunk prefetch + device scan) for both window transports:

  - host gather  (MCCNN_DEVICE_GATHER=0): the host C++/numpy kernel
    gathers (4n, WIN, WIN) pixel windows and ships ~1 MB/step through
    the tunnel (the r03 bottleneck, PERF.md training section);
  - device gather (default): the padded image stack lives in HBM, the
    host ships only ~10 KB/step of origins/affines and each step
    gathers its windows on device (train/augment.gather_windows_device).

Protocol: 2 epochs over a trimmed nnz table (~target_steps
steps/epoch); epoch 1 pays the jit compile, epoch 2 is the measured
steady state (the per-epoch log line carries cumulative elapsed).
Run:  python tools/train_bench.py [host|device|both]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(device_gather: bool, data_dir: str, target_steps: int = 400):
    os.environ["MCCNN_DEVICE_GATHER"] = "1" if device_gather else "0"
    from mccnn_tpu.config import make_config
    from mccnn_tpu.data.datasets import load_kitti
    from mccnn_tpu.cli import init_params
    from mccnn_tpu.train import trainer

    cfg = make_config("kitti", "fast", a="train_tr")
    cfg.data_dir = data_dir
    ds = load_kitti(cfg)
    bs_half = cfg.bs // 2
    # cap the epoch at ~target_steps minibatches by trimming the nnz
    # table directly (cfg.subset subsets whole IMAGES — too coarse for
    # a bench); the rows are pre-shuffled at generation time
    ds.nnz_tr = ds.nnz_tr[: target_steps * bs_half + bs_half]
    n_steps = trainer.n_epoch_steps(len(ds.nnz_tr), bs_half)
    params = init_params(cfg)

    lines = []
    trainer.train(cfg, ds, params, epochs=2, log=lambda m: lines.append(str(m)))
    epoch_lines = [l for l in lines if l.split("\t")[0] in ("1", "2")]
    assert len(epoch_lines) == 2, lines
    e1 = float(epoch_lines[0].split("\t")[3])
    e2 = float(epoch_lines[1].split("\t")[3])
    steady = e2 - e1
    name = "device" if device_gather else "host"
    print(f"{name}-gather: {n_steps} steps/epoch, epoch1 {e1:.1f}s "
          f"(incl compile), epoch2 {steady:.1f}s -> "
          f"{n_steps / steady:.1f} steps/s "
          f"({n_steps / steady * cfg.bs * 2:.0f} patch-pair examples/s)",
          flush=True)
    return n_steps / steady


def main():
    d = os.environ.get("MCCNN_TRAIN_BENCH_DIR")
    if not d:
        d = os.path.join(tempfile.gettempdir(), "mccnn_train_bench")
    data = os.path.join(d, "data.kitti")
    if not os.path.exists(os.path.join(data, "x0.bin")):
        print("generating KITTI-scale synthetic set (8 x 350x1242)...",
              flush=True)
        from mccnn_tpu.data.datasets import make_synthetic_kitti
        make_synthetic_kitti(data, n_images=8, height=350, width=1242,
                             disp_max=228)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    res = {}
    if which in ("both", "host"):
        res["host"] = bench(False, d)
    if which in ("both", "device"):
        res["device"] = bench(True, d)
    if len(res) == 2:
        print(f"device/host speedup: {res['device'] / res['host']:.2f}x")


if __name__ == "__main__":
    main()

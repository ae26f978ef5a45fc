#!/usr/bin/env python3
"""Coordinated multi-worker hyperparameter search — the reference's
rgs.py (leveled random-restart hill climbing over ssh workers,
rgs.py:9-135) rebuilt against `python main.py`.

Workers are (host, extra-flags) pairs; jobs are dispatched over a
process pool (local workers run the CLI directly, remote ones through
ssh). Worker failures map to score 1 (rgs.py:89-91). The TPU build's
single process already uses the whole chip, so the reference's
`-gpu N` flags are usually replaced by per-host entries.

Usage: python tools/rgs.py <dataset> <arch> <action> <net_fname>
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import random
import subprocess
import sys

# (host, extra flag string); 'localhost' runs without ssh
WORKERS = [
    ("localhost", ""),
]

PARAMS = [
    ("L1", [0, 1, 2, 3, 4, 5, 6]),
    ("cbca_i1", [0, 2, 4, 6, 8]),
    ("cbca_i2", [0, 2, 4, 6, 8]),
    ("tau1", [0.01, 0.02, 0.03, 0.05, 0.08, 0.13, 0.22, 0.36, 0.6, 1.0]),
    ("pi1", [0.25, 0.33, 0.44, 0.57, 0.76, 1.0, 1.32, 1.74, 2.3, 3.03, 4.0]),
    ("pi2", [8.0, 10.56, 13.93, 18.38, 24.25, 32.0, 42.22, 55.72, 73.52,
             97.01, 128.0]),
    ("sgm_q1", [3, 3.5, 4, 4.5, 5]),
    ("sgm_q2", [2, 2.5, 3, 3.5, 4, 4.5]),
    ("alpha1", [1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75]),
    ("tau_so", [0.01, 0.02, 0.03, 0.05, 0.08, 0.13, 0.22, 0.36, 0.6, 1.0]),
    ("blur_sigma", [1.0, 1.29, 1.67, 2.15, 2.78, 3.59, 4.64, 5.99, 7.74, 10.0]),
    ("blur_t", [1, 2, 3, 4, 5, 6, 7]),
]

_worker_cycle = itertools.cycle(range(len(WORKERS)))


def run_job(args):
    (dataset, arch, action, net_fname, ps, worker_id) = args
    host, extra = WORKERS[worker_id % len(WORKERS)]
    flags = []
    for k, v in ps.items():
        flags += [f"-{k}", str(v)]
    cmd = [sys.executable, "main.py", dataset, arch, "-a", action]
    if net_fname and net_fname != "-":
        cmd += ["-net_fname", net_fname]
    cmd += extra.split() + flags
    if host != "localhost":
        cmd = ["ssh", host, " ".join(["cd", "mc-cnn_tpu", "&&"] + cmd)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=24 * 3600)
        return float(out.stdout.split()[-1]), ps
    except Exception:
        return 1.0, ps  # rgs.py:89-91


def neighbors(ps):
    for k, vs in PARAMS:
        i = vs.index(ps[k]) if ps[k] in vs else 0
        for j in (i - 1, i + 1):
            if 0 <= j < len(vs):
                q = dict(ps)
                q[k] = vs[j]
                if q.get("pi1", 0) <= q.get("pi2", 1e9):
                    yield q


def main():
    dataset, arch, action, net_fname = sys.argv[1:5]
    rng = random.Random(42)
    visited = set()
    pool = mp.Pool(len(WORKERS))

    def key(ps):
        return tuple(sorted(ps.items()))

    best_score, best = float("inf"), None
    while True:
        if best is None:
            cand = [{k: rng.choice(vs) for k, vs in PARAMS}
                    for _ in range(len(WORKERS))]
            cand = [c for c in cand if c["pi1"] <= c["pi2"]] or cand
        else:
            cand = [c for c in neighbors(best) if key(c) not in visited]
            if not cand:  # level exhausted: random restart (rgs.py:108-135)
                best = None
                continue
        jobs = [(dataset, arch, action, net_fname, c, i)
                for i, c in enumerate(cand)]
        for score, ps in pool.map(run_job, jobs):
            visited.add(key(ps))
            line = " ".join([str(score)] + [f"-{k} {v}" for k, v in ps.items()])
            print(line, flush=True)
            if score < best_score:
                best_score, best = score, ps


if __name__ == "__main__":
    main()

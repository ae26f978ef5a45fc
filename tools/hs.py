#!/usr/bin/env python3
"""Hyperparameter search over the CLI — the reference's hs.py harness
(hs.py:1-212) rebuilt against `python main.py`.

Same contract: propose a config (random sampling or hill-climbing from
previously logged results), launch the CLI as a subprocess, parse the
score from the LAST stdout token (hs.py:209-211), log one result line
per run. Hill-climb state is recovered by re-parsing log files
(hs.py:159-177).

Usage:
    python tools/hs.py <random|hillclimb> <dataset> <arch> <action> <net_fname> [log ...]
"""

from __future__ import annotations

import glob
import os
import random
import subprocess
import sys

GRIDS = {
    # stereo-method search (test_te), hs.py:54-69 (shared by all arches
    # up to small per-dataset tweaks)
    "test_te": [
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
    ],
    # net-architecture search (train_tr), hs.py:38-47
    "train_tr": [
        ("l1", [3, 4, 5]),
        ("fm", [32, 48, 64, 96, 112]),
        ("l2", [3, 4, 5, 6]),
        ("nh2", [200, 300, 384, 400, 500]),
        ("lr", [0.001, 0.002, 0.003, 0.01]),
    ],
}


def valid(ps: dict) -> bool:
    if "pi1" in ps and "pi2" in ps and ps["pi1"] > ps["pi2"]:
        return False  # constraint hs.py:68-69
    return True


def propose_random(grid, rng):
    while True:
        ps = {k: rng.choice(vs) for k, vs in grid}
        if valid(ps):
            return ps


def parse_log(log_files):
    """(score, params-dict) per line: `score -k v -k v ...`."""
    results = []
    for fname in log_files:
        for line in open(fname):
            toks = line.split()
            if not toks:
                continue
            try:
                score = float(toks[0])
            except ValueError:
                continue
            ps = {}
            it = iter(toks[1:])
            for k in it:
                if k.startswith("-"):
                    ps[k[1:]] = float(next(it))
            results.append((score, ps))
    return results


def propose_hillclimb(grid, rng, results):
    if not results:
        return propose_random(grid, rng)
    best_score, best = min(results, key=lambda r: r[0])
    while True:
        ps = dict(best)
        k, vs = grid[rng.randrange(len(grid))]
        vs = [float(v) for v in vs]
        cur = ps.get(k, vs[0])
        i = min(range(len(vs)), key=lambda j: abs(vs[j] - cur))
        j = max(0, min(len(vs) - 1, i + rng.choice([-1, 1])))
        ps[k] = vs[j]
        if valid(ps):
            return ps


def main():
    method, dataset, arch, action, net_fname = sys.argv[1:6]
    log_files = sys.argv[6:] or glob.glob("hs_log.*")
    grid = GRIDS["test_te" if action == "test_te" else "train_tr"]
    rng = random.Random()

    while True:
        results = parse_log(log_files) if method != "random" else []
        ps = (propose_random(grid, rng) if method == "random"
              else propose_hillclimb(grid, rng, results))
        flags = []
        for k, v in ps.items():
            flags += [f"-{k}", str(v)]
        cmd = [sys.executable, "main.py", dataset, arch, "-a", action]
        if net_fname and net_fname != "-":
            cmd += ["-net_fname", net_fname]
        if arch == "slow" and action == "test_te":
            cmd += ["-use_cache"]
        cmd += flags
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=24 * 3600)
            score = float(out.stdout.split()[-1])  # hs.py:209-211 contract
        except Exception as e:
            print(f"FAILED: {e}", file=sys.stderr)
            score = 1.0
        line = " ".join([str(score)] + flags)
        print(line, flush=True)
        with open("hs_log.0", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

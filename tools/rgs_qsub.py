#!/usr/bin/env python3
"""Cluster-scheduler variant of the hyperparameter search — the
reference's rgs_qsub.py (PBS qsub/qstat job driving, rgs_qsub.py:11-158)
rebuilt against `python main.py`.

Jobs are submitted through a scheduler command template (PBS `qsub` by
default; any batch system with a submit/poll pair works), results are
collected from the job stdout files (score = last token), and
SIGINT/SIGTERM delete outstanding jobs (rgs_qsub.py:95-101).

Usage: python tools/rgs_qsub.py <dataset> <arch> <action> <net_fname>
"""

from __future__ import annotations

import glob
import os
import random
import signal
import subprocess
import sys
import time

SUBMIT = ["qsub"]          # submit command; reads the job script on stdin
POLL = ["qstat"]           # returns nonzero/empty when the job is done
DELETE = ["qdel"]          # cancel a job
JOB_DIR = "qsub_jobs"

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

outstanding: set[str] = set()


def cleanup(signum, frame):
    for job in outstanding:
        subprocess.run(DELETE + [job], capture_output=True)
    sys.exit(1)


def submit(dataset, arch, action, net_fname, ps, idx):
    os.makedirs(JOB_DIR, exist_ok=True)
    flags = " ".join(f"-{k} {v}" for k, v in ps.items())
    net = f"-net_fname {net_fname}" if net_fname and net_fname != "-" else ""
    out = os.path.abspath(os.path.join(JOB_DIR, f"job_{idx}.out"))
    script = (f"#!/bin/sh\ncd {os.getcwd()}\n"
              f"{sys.executable} main.py {dataset} {arch} -a {action} "
              f"{net} {flags} > {out} 2>&1\n")
    r = subprocess.run(SUBMIT, input=script, capture_output=True, text=True)
    job_id = r.stdout.strip().split()[0] if r.stdout.strip() else ""
    return job_id, out, ps


def wait_all(jobs):
    results = []
    for job_id, out, ps in jobs:
        while True:
            r = subprocess.run(POLL + [job_id], capture_output=True, text=True)
            if r.returncode != 0 or not r.stdout.strip():
                break
            time.sleep(10)
        outstanding.discard(job_id)
        try:
            score = float(open(out).read().split()[-1])
        except Exception:
            score = 1.0
        results.append((score, ps))
    return results


def main():
    dataset, arch, action, net_fname = sys.argv[1:5]
    signal.signal(signal.SIGINT, cleanup)
    signal.signal(signal.SIGTERM, cleanup)
    rng = random.Random(42)
    idx = 0
    while True:
        batch = []
        for _ in range(4):
            ps = {k: rng.choice(vs) for k, vs in PARAMS}
            if ps["pi1"] > ps["pi2"]:
                continue
            job = submit(dataset, arch, action, net_fname, ps, idx)
            outstanding.add(job[0])
            batch.append(job)
            idx += 1
        for score, ps in wait_all(batch):
            print(" ".join([str(score)] +
                           [f"-{k} {v}" for k, v in ps.items()]), flush=True)


if __name__ == "__main__":
    main()

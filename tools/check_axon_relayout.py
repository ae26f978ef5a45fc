#!/usr/bin/env python
"""Probe for the axon-runtime relayout bug worked around in
pipeline._fast_hwd_body (the `return_vols` note).

Symptom (observed r01-r02): a jit OUTPUT that is a reversed+transposed
view of a Pallas-derived buffer materializes corrupted at KITTI scale
on the axon remote runtime, while the identical array compares clean
INSIDE the graph. The production workaround splits the relayout into a
second jit (_hwd_unpack_vol).

Run this after runtime updates:

    python tools/check_axon_relayout.py

prints CLEAN if the fused relayout now materializes correctly (then
fuse _hwd_unpack_vol back into _fast_hwd_jit and delete this probe) or
CORRUPTED while the workaround is still needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from mccnn_tpu.ops.join_pallas import stereo_join_mxu_hwd

    rng = np.random.RandomState(0)
    H, W, C, D = 350, 1242, 64, 228  # the scale the bug manifests at
    fl = rng.randn(H, W, C).astype(np.float32)
    fr = rng.randn(H, W, C).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)

    @jax.jit
    def fused(fl, fr):
        vol_lr, _ = stereo_join_mxu_hwd(fl, fr, D, n_fix=4)
        # the problematic pattern: reversed+transposed Pallas output
        # as a jit output, plus an in-graph checksum of the same value
        v = jnp.transpose(vol_lr[:H, :W, :D][:, ::-1], (2, 0, 1))
        return v, jnp.nansum(v, dtype=jnp.float64)

    @jax.jit
    def stored(fl, fr):
        vol_lr, _ = stereo_join_mxu_hwd(fl, fr, D, n_fix=4)
        return vol_lr

    @jax.jit
    def unpack(vol_lr):
        return jnp.transpose(vol_lr[:H, :W, :D][:, ::-1], (2, 0, 1))

    v_fused, chk = fused(fl, fr)
    v_split = unpack(stored(fl, fr))
    v_fused, v_split = np.asarray(v_fused), np.asarray(v_split)
    same = np.array_equal(np.nan_to_num(v_fused), np.nan_to_num(v_split)) \
        and np.array_equal(np.isnan(v_fused), np.isnan(v_split))
    chk_host = float(np.nansum(v_fused.astype(np.float64)))
    print(f"in-graph checksum {float(chk):.6f}  host checksum {chk_host:.6f}")
    if same and abs(float(chk) - chk_host) < 1e-3 * max(1.0, abs(chk_host)):
        print("CLEAN: fused relayout materializes correctly — the "
              "pipeline._fast_hwd_body split-jit workaround can be removed")
        return 0
    print("CORRUPTED: keep the split-jit workaround "
          "(pipeline._hwd_unpack_vol)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

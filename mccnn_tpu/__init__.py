"""mccnn_tpu — a TPU-native stereo depth engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
mc-cnn (Zbontar & LeCun, JMLR 2016): learned patch-similarity cost
volumes (fast dot-product and accurate FC-head variants), classical
cost baselines (AD, census), cross-based cost aggregation, semiglobal
matching, and disparity refinement — designed TPU-first:

- dense compute (conv towers, cost volumes, FC heads) rides the MXU as
  large batched matmuls,
- scanline dynamic programs (SGM) are `lax.scan`s / Pallas kernels with
  the DP state resident in VMEM,
- scale-out uses `jax.sharding.Mesh` + collectives (data-parallel
  training, halo-tiled inference), not per-process GPUs.

Reference behavior contract: /root/reference (jzbontar/mc-cnn),
primarily main.lua and adcensus.cu. Citations in docstrings use
`file:line` into that tree.
"""

__version__ = "0.1.0"

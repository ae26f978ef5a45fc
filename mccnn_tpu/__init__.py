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


def _enable_compilation_cache() -> None:
    """Persist compiled executables across processes (first compile of
    the full pipeline takes minutes; subsequent runs hit the cache)."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "MCCNN_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "mccnn_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache setup break the library
        pass


_enable_compilation_cache()

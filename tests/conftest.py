import os

# TPU lane: MCCNN_TEST_TPU=1 runs the production Pallas kernels on the
# real chip (tests/test_tpu_kernels.py); everything in that lane is
# gated by a skipif, and the CPU pinning below is bypassed.
if os.environ.get("MCCNN_TEST_TPU"):
    os.environ.setdefault("MCCNN_SGM_PALLAS", "1")
else:
    # Tests run on CPU with 8 virtual devices so sharding paths are
    # exercised without TPU hardware. Force (not default) the platform:
    # the environment may pre-set JAX_PLATFORMS to the remote-TPU
    # plugin, and running the "CPU" suite there silently changes
    # matmul precision (finite-difference checks break) and serializes
    # every test through the tunnel. The env var is NOT enough here —
    # this interpreter pre-imports jax from sitecustomize, so
    # jax.config already captured JAX_PLATFORMS at startup; the config
    # update below works because backends initialize lazily. XLA_FLAGS
    # is still read from the environment at backend init, so setting it
    # here (before any backend is touched) is in time.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

# Optional CPU-only test lane: MCCNN_TEST_CPU=1 pins the default device
# to host CPU (insulates tests from remote-TPU tunnel state) and turns
# off the TPU-only Pallas kernels.
if os.environ.get("MCCNN_TEST_CPU"):
    os.environ.setdefault("MCCNN_SGM_PALLAS", "0")
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

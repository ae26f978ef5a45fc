from mccnn_tpu.ops import costs, cross, sgm, post  # noqa: F401

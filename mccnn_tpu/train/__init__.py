from mccnn_tpu.train import losses, trainer  # noqa: F401

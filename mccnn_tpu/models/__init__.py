from mccnn_tpu.models.towers import (  # noqa: F401
    init_fast, init_slow, apply_tower, apply_head, l2_normalize,
    fast_describe, slow_describe,
)
from mccnn_tpu.models import checkpoint  # noqa: F401

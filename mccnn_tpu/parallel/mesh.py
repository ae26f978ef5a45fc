"""Device-mesh construction.

The reference has no in-process distribution at all (SURVEY.md §5:
multi-GPU = independent processes over ssh/PBS). Here scaling is
first-class: a `jax.sharding.Mesh` with a ``data`` axis (batch /
image-pair parallelism) and a ``model`` axis (disparity-plane or
row-tile parallelism for the big cost volumes).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              backend: Optional[str] = None) -> Mesh:
    """Mesh over the first `n_devices` devices.

    axes=("data",) for pure DP; axes=("data", "model") with `shape`
    (e.g. (2, 4)) for combined batch × volume sharding. `backend`
    selects a platform explicitly (e.g. "cpu" for the virtual 8-device
    test mesh even when a TPU is present).
    """
    devs = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) if len(axes) == 1 else None
    assert shape is not None, "shape required for multi-axis meshes"
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data", dim: int = 0) -> NamedSharding:
    spec = [None] * (dim + 1)
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))

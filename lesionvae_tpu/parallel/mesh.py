"""Device-mesh helpers (SURVEY.md §5.8: JAX collectives over ICI, no
hand-written comm backend).

The workload's scaling axis is the batch (tens of thousands of streamlines /
lesions / profile rows — SURVEY.md §5.7), so the primary mesh axis is
``data``; an optional ``model`` axis tensor-shards the VAE's large Dense
kernels.  All communication is XLA-inserted collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis (batch/streamline/lesion axis)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0
                    ) -> Tuple[np.ndarray, int]:
    """Pad ``axis`` up to a multiple (sharded dims must divide evenly)."""
    n = arr.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(arr, pad_width, mode="edge"), n

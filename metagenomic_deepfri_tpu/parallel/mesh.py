"""Device-mesh construction for single-host slices and multi-host pods.

TPU-first replacement for the reference's absent distributed backend
(SURVEY.md §2.3: no NCCL/MPI — files on disk were the only "communication").
Here the communication substrate is XLA collectives over ICI, expressed by
sharding arrays over a named ``jax.sharding.Mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    Args:
        n_devices: how many devices to use (default: all visible).
        model_parallel: size of the model/tensor axis; must divide n_devices.
            The data axis gets the rest. ``model_parallel=1`` is pure DP.
        axis_names: names for (data, model) axes.
        devices: explicit device list (default ``jax.devices()``). On a real
            pod slice, callers should order devices so the model axis maps to
            ICI neighbours; ``jax.devices()`` order already does this for a
            single host.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} visible")
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n} devices")
    grid = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)

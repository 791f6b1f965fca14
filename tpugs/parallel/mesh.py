"""Device mesh construction for multi-chip / multi-host training.

The reference has no distributed code at all (SURVEY.md §2.8); scaling here is
native: one jax.sharding.Mesh with axes
  - "data":  camera-batch data parallelism (each device renders different views)
  - "gauss": Gaussian-array sharding (projection/Adam are embarrassingly
             parallel in N)
XLA emits the psum/all_gather collectives over ICI from sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "gauss"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on the "data" axis, "gauss" axis size 1 (replicated
    params + DP) — the phase-1 distribution (SURVEY.md §7).
    """
    devs = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs), 1)
    assert int(np.prod(axis_sizes)) == len(devs), (axis_sizes, len(devs))
    arr = np.asarray(devs).reshape(axis_sizes)
    return Mesh(arr, axis_names)

"""Device-mesh construction.

The reference is strictly single-process / single-GPU (SURVEY.md §2 rows
26-27); all parallelism here is new design. The primary axis is ``data``:
mini-batch rows and the per-node state tables (memory, T-PPR index) shard
over it, parameters replicate, and XLA inserts the psum/all-gather
collectives. On a real slice the axis rides ICI; under
``--xla_force_host_platform_device_count`` it maps to virtual CPU devices for
testing."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int = 0, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices <= 0:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))

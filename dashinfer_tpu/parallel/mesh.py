"""Device mesh construction.

Replaces the reference's device plumbing — NCCL clique per engine role,
per-rank worker threads, WorkerCoodinator barrier (SURVEY.md §2.2, §2.13) —
with a `jax.sharding.Mesh` over ("data", "model"): tensor parallelism rides
the "model" axis (ICI), replica/data parallelism the "data" axis. XLA emits
and schedules the collectives; there is no rank loop to coordinate.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Tuple[int, int] = (1, 1),
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh. model axis should map to the fastest interconnect
    (ICI within a host/slice); jax mesh_utils handles the physical layout."""
    devices = list(devices if devices is not None else jax.devices())
    d, m = mesh_shape
    if d * m > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {d*m} devices, "
                         f"have {len(devices)}")
    if d * m == 1:
        dev_array = np.asarray(devices[:1]).reshape(1, 1)
    else:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh((d, m),
                                                  devices=devices[:d * m])
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))

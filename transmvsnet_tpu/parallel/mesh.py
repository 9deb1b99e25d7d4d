"""Device-mesh construction: (data, view, depth) axes.

The TPU-native parallelism design (SURVEY.md §2.6):
- ``data``: batch sharding — gradients/batch-norm statistics reduce over it
  automatically under GSPMD (the DDP-allreduce / SyncBN analog).
- ``view``: source views of the cost-volume accumulation — the per-view
  similarity sum is associative, so sharding V turns it into a psum.
- ``depth``: depth-hypothesis slabs — softmax/argmax over D become
  axis-collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from transmvsnet_tpu.config import MeshConfig

AXES = ("data", "view", "depth")


def make_mesh(
    config: MeshConfig | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, view, depth) mesh.

    With no config, all devices go to the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if config is None:
        shape = (n, 1, 1)
    else:
        shape = (config.data, config.view, config.depth)
        needed = int(np.prod(shape))
        if needed > n:
            raise ValueError(f"mesh {shape} needs {needed} devices, have {n}")
        devices = devices[:needed]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def local_batch_slice(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """(start, size) of this process's slice of the global batch dimension."""
    data_size = mesh.shape["data"]
    assert global_batch % data_size == 0
    # Single-process: the full batch. Multi-process JAX would slice by
    # process index along the data axis.
    if jax.process_count() == 1:
        return 0, global_batch
    per_proc = global_batch // jax.process_count()
    return jax.process_index() * per_proc, per_proc

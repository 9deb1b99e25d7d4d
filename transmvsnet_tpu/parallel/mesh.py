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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bootstrap — the torch.distributed.launch/NCCL-env analog
    (reference train.py:296-301).

    With no arguments, jax.distributed.initialize auto-detects the cluster
    from the environment (TPU pod metadata / SLURM / OMPI vars). Explicit
    arguments support manual launches and the two-process CPU test.
    Idempotent: safe to call when already initialized.
    """
    # Note: must run before any other JAX call — touching a backend first
    # (even jax.devices()) locks in single-process mode.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise

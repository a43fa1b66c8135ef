"""Device mesh and sharding helpers (the framework's distribution plane).

The reference is single-GPU with no distribution (SURVEY.md §2.7); the TPU
build distributes the two embarrassingly-parallel axes over ICI with XLA
collectives instead of any hand-written communication:

- training: batch axis sharded over the mesh ('data'), params replicated —
  gradients are combined by XLA-inserted psums under jit-with-shardings;
- inference: the frame axis of a pullback is sharded over the mesh (the
  OCT analog of sequence parallelism, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'data',
              devices: Optional[list] = None) -> Mesh:
    """1-D mesh over the given devices (default: first n of all local ones).

    ``devices`` lets callers build disjoint submeshes — the concurrent tuner
    runs one trial per device group (octseg.tune.tune).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f'need {n_devices} devices, have {len(devices)}'
                )
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch/frame) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = 'data') -> Any:
    """Device-put a host batch (pytree of arrays) sharded on its leading axis."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k

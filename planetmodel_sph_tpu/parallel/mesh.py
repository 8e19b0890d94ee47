"""Device mesh helpers.

The reference is single-process shared-memory (SURVEY.md §2c): its
"communication layer" is NativeStream buffers + JobHandle DAG edges. The
TPU-native equivalent for multi-chip scaling is a 1-D data-parallel mesh over
particles with XLA collectives riding ICI: the neighbor/gravity source set is
``all_gather``-ed (the analog of every job seeing the whole PhysicsWorld),
while targets stay sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D particle-data-parallel mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Shard particle axis 0 across the dp axis (all state leaves)."""
    return NamedSharding(mesh, P(DP_AXIS))


def shard_state(state, mesh: Mesh):
    """Place a ParticleState with axis 0 sharded over the mesh."""
    sh = particle_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)

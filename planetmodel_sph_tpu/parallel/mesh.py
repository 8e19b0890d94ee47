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
    """1-D particle-data-parallel mesh over the first n_devices devices.

    Raises when fewer devices exist than requested rather than silently
    truncating: a "mesh of 8" that is actually 1 device makes every
    collective a self-loop — ppermute ring collection then hands each
    shard R copies of ITSELF as "neighbors" (duplicated sources, ~Rx
    densities, eventual NaN) with nothing loudly wrong. This exact trap
    cost a round of halo-collision diagnostics: the driver forced CPU
    via env vars alone, which the session's TPU plugin overrides — use
    jax.config.update('jax_platforms', 'cpu') as tests/conftest.py and
    __graft_entry__.dryrun_multichip do."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"make_mesh({n_devices}) but only {len(devices)} "
                    f"device(s) visible ({devices[0].platform}); force "
                    f"the virtual CPU mesh via jax.config.update("
                    f"'jax_platforms', 'cpu') + "
                    f"--xla_force_host_platform_device_count")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Shard particle axis 0 across the dp axis (all state leaves)."""
    return NamedSharding(mesh, P(DP_AXIS))


def shard_state(state, mesh: Mesh):
    """Place a ParticleState with axis 0 sharded over the mesh."""
    sh = particle_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)

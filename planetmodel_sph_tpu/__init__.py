"""planetmodel_sph_tpu — TPU-native SPH engine for self-gravitating gas planets.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
project PlanetModel-SPH (Unity DOTS/ECS + vendored Unity.Physics; see
SURVEY.md). The compute path is pure functional JAX compiled by XLA, with
fused Pallas pairwise kernels on the hot path and `shard_map` data
parallelism over a device mesh for multi-chip scaling.
"""

from . import config, state  # noqa: F401
from .config import (  # noqa: F401
    SimConfig, auto, basalt_impact, default, jupiter_3k, jupiter_100k, parity,
)
from .state import ParticleState  # noqa: F401

__version__ = "0.2.0"

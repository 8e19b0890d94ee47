"""Particle state as an HBM-resident struct-of-arrays pytree.

The reference stores per-particle quantities as Unity ECS components
(``ParticleMass``/``ParticleDensity`` in ``Assets/Scripts/Components/DensityField.cs``,
``GravityField.cs``, ``PressureField.cs``, ``ParticleSmoothing.cs``) gathered
chunk-wise into ``PhysicsWorld`` arrays every step
(``BuildPhysicsWorld.cs:440-540``). On TPU the natural layout is a single
struct-of-arrays pytree that lives in HBM across the whole ``lax.scan`` — no
gather/scatter bridge is needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import SimConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ParticleState:
    """Struct-of-arrays particle state.

    Shapes: ``N = config.n`` particles. All float arrays share the config
    dtype (f32 by default).

    Component mapping to the reference:

    ==============  =====================================================
    field           reference component
    ==============  =====================================================
    pos [N,3]       ``Translation`` (+ ``PhysicsWorld`` motion data)
    vel [N,3]       ``PhysicsVelocity.Linear``
    mass [N]        ``ParticleMass.Value``
    h [N]           ``ParticleSmoothing.h``
    rho [N]         ``ParticleDensity.Value``
    pressure [N]    ``ParticlePressure.Value``
    grad_p [N,3]    ``ParticlePressureGrad.Value``
    phi [N]         ``GravityField.Value.w``  (potential)
    grad_phi [N,3]  ``GravityField.Value.xyz`` (gradient of potential)
    n_neighbors[N]  ``ParticleSmoothing.neighbors`` (W(r,h_i)>0 count from
                    the previous step, drives adaptive h)
    n_direct [N]    ``GravityField.numParticles`` (P2P terms used)
    n_approx [N]    ``GravityField.numApprox``   (M2P multipole terms used)
    accel [N,3]     carried acceleration for leapfrog KDK (no reference
                    analog; the reference re-derives dv/dt in VelocitySystem)
    u [N]           specific internal energy (no reference analog: evolved
                    only under cfg.eos_mode='adiabatic'; carried but unused
                    for the reference's barotropic EOS)
    du_dt [N]       carried du/dt for the KDK energy half-kicks (the u
                    analog of `accel`; zero when eos_mode='polytropic')
    matid [N]       per-particle material id (ops.eos.MATERIAL_INDEX; no
                    reference analog: consumed only under
                    eos_mode='tillotson' for multi-material bodies —
                    differentiated planets, mixed-material impacts)
    balsara [N]     Balsara (1995) AV limiter factor from the previous
                    step's div/curl sums (1 = unlimited; no reference
                    analog — consumed only under cfg.av_balsara)
    ==============  =====================================================
    """

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array
    h: jax.Array
    rho: jax.Array
    pressure: jax.Array
    grad_p: jax.Array
    phi: jax.Array
    grad_phi: jax.Array
    n_neighbors: jax.Array
    n_direct: jax.Array
    n_approx: jax.Array
    accel: jax.Array
    u: jax.Array
    du_dt: jax.Array
    matid: jax.Array
    balsara: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)


def zeros(config: SimConfig) -> ParticleState:
    """All-zero state with the right shapes/dtypes (useful for tests)."""
    n = config.n
    dt = config.jnp_dtype
    v3 = jnp.zeros((n, 3), dt)
    v1 = jnp.zeros((n,), dt)
    i1 = jnp.zeros((n,), jnp.int32)
    return ParticleState(
        pos=v3, vel=v3, mass=v1, h=v1, rho=v1, pressure=v1, grad_p=v3,
        phi=v1, grad_phi=v3, n_neighbors=i1, n_direct=i1, n_approx=i1,
        accel=v3, u=v1, du_dt=v1, matid=i1,
        balsara=jnp.ones((n,), dt),
    )

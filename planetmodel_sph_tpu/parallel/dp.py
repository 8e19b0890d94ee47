"""Data-parallel simulation step over a device mesh (shard_map + collectives).

Design (SURVEY.md §2c "TPU-native equivalent"): particles are sharded over a
1-D ``dp`` mesh axis. Each step:

1. every shard ``all_gather``s the source fields it needs (positions,
   smoothing lengths, masses — and densities/pressures for pass 2) over ICI;
2. each device runs the *same* blocked pairwise passes as the single-chip
   path (``ops.dense``) with its local shard as targets and the gathered
   global set as sources (``target_offset`` keeps self-pair masking correct);
3. integration and the adaptive-h update are purely local (elementwise).

At the target scale (100k particles, f32) a full gather is ~1.2 MB/field —
negligible against ICI bandwidth — so this "replicated sources, sharded
targets" layout beats any halo-exchange scheme until the particle count is
orders of magnitude larger. Gravity needs globally gathered sources anyway.

The same function compiles single-chip (mesh of 1) and multi-chip; the
driver validates it on a virtual 8-device CPU mesh (see
``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import SimConfig
from ..models import planet
from ..ops import dense, eos as eos_ops
from .mesh import DP_AXIS


def _dp_forces(cfg: SimConfig, axis: str):
    """Forces closure running inside shard_map: local targets, global sources."""

    def forces(pos, h, mass, vel=None):
        if cfg.grad_p_mode == "grad_h":
            raise NotImplementedError(
                "grad_p_mode='grad_h' is not wired into the dp path yet; "
                "it would silently fall back to the symmetric force law")
        if cfg.av_alpha > 0.0:
            raise NotImplementedError(
                "artificial viscosity is not wired into the dp path yet; "
                "it would be silently dropped")
        local_n = pos.shape[0]
        off = jax.lax.axis_index(axis) * local_n
        pos_g = jax.lax.all_gather(pos, axis, tiled=True)
        h_g = jax.lax.all_gather(h, axis, tiled=True)
        mass_g = jax.lax.all_gather(mass, axis, tiled=True)

        # SPH pairs: the dense target/source pass handles any neighbor_mode
        # under dp (the grid path's group adjacency is single-set; with
        # all-gathered sources the dense pass is the same math — grid-mode
        # sharded adjacency is a future optimization, not a correctness gap).
        p1 = dense.pass1(pos, h, mass, cfg, src=(pos_g, h_g, mass_g),
                         target_offset=off)
        rho, nn, phi, grad_phi, n_direct = p1
        n_approx = jnp.zeros_like(n_direct)

        if cfg.gravity_solver == "tree":
            from ..ops import tree as tree_ops
            phi, grad_phi, n_direct, n_approx = tree_ops.gravity(
                pos, h, mass, cfg, src=(pos_g, h_g, mass_g), target_offset=off)

        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        rho_g = jax.lax.all_gather(rho, axis, tiled=True)
        prs_g = jax.lax.all_gather(prs, axis, tiled=True)
        grad_p = dense.pass2(pos, h, mass, rho, prs, cfg,
                             src=(pos_g, h_g, mass_g, rho_g, prs_g),
                             target_offset=off)

        accel = -grad_p / rho[:, None] - grad_phi
        return planet.Forces(rho, prs, grad_p, phi, grad_phi, nn,
                             n_direct, n_approx, accel, h)

    return forces


def make_step(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted sharded step: ParticleState (axis-0 sharded) -> ParticleState."""

    def local_step(state):
        return planet.step(state, cfg, forces_fn=_dp_forces(cfg, axis))

    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=P(axis), out_specs=P(axis))
    return jax.jit(sharded)


def make_run(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted n-step scan of the sharded step (n_steps static)."""

    def local_run(state, n_steps):
        def body(s, _):
            return planet.step(s, cfg, forces_fn=_dp_forces(cfg, axis)), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    def run(state, n_steps):
        f = shard_map(partial(local_run, n_steps=n_steps), mesh=mesh,
                      in_specs=P(axis), out_specs=P(axis))
        return f(state)

    return jax.jit(run, static_argnames=("n_steps",))


def make_prime(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    def local_prime(state):
        return planet.prime(state, cfg, forces_fn=_dp_forces(cfg, axis))
    return jax.jit(shard_map(local_prime, mesh=mesh,
                             in_specs=P(axis), out_specs=P(axis)))

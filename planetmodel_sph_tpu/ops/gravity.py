"""Pairwise (P2P) and multipole (M2P) gravity terms.

Behavioral spec from ``Assets/Scripts/Systems/GravityFieldSystem.cs``:

- P2P uses the Dyer & Ip (1993) uniform-density-sphere softened force law
  (``GravityContributionParticle``, :332-356) with softening length ``a``:

    r >= a:  dPhi/dr * rhat / r = m / r^3 ;   phi = -m/r
    r <  a:  with x = r/a,
             |grad phi| / r = (m/a^3) (8 - 9x + 2x^3)
             phi = -(m/a) (2.4 - 4x^2 + 3x^3 - 0.4 x^5)

  The returned packed value is (grad phi, phi) — the *potential gradient*;
  the acceleration applied later is g = -grad phi (``VelocitySystem.cs:31``).

- M2P is an unsoftened monopole (``GravitationalMoment.GravityContribution``,
  :428-442): grad phi = m d / r^3, phi = -m/r.

- G = 1 by default (:26). The reference softens with only the *receiver's* h
  (:144 ``float a = smoothing.h``); ``softening_mode='symmetric_max'`` uses
  max(h_i, h_j) instead, which restores Newton's third law pairwise.

All functions are elementwise/broadcastable and NaN-free for r >= 0, a > 0
(branches not taken still execute under ``jnp.where``; r = a = 0 is excluded
by construction since h > 0 everywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dyer_ip_fast(dx, r2, m, inv_a, g_const: float = 1.0):
    """Softened P2P term in reciprocal form (the hot-path variant).

    Same math as :func:`dyer_ip` but written for VPU throughput: one
    ``rsqrt`` instead of sqrt+divisions, and the softening enters as a
    precomputed reciprocal ``inv_a = 1/a`` (per-particle 1/h values are
    computed once per step, so per-pair softening symmetrization becomes
    ``min(inv_h_i, inv_h_j)``).

    Args:
      dx: (..., 3) displacement x_field - x_source.
      r2: (...,) |dx|^2.
      m:  (...,) source mass (0 masks the pair).
      inv_a: (...,) reciprocal softening length.
    """
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    x = r2 * inv_r * inv_a                         # == r/a; 0 at r=0
    x2 = x * x
    x3 = x2 * x
    inv_a3 = inv_a * inv_a * inv_a
    inner_mag_over_r = (m * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
    inner_phi = -(m * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3 - 0.4 * x2 * x3)
    outer_mag_over_r = m * inv_r * inv_r * inv_r
    outer_phi = -m * inv_r
    near = x < 1.0                                 # r=0 falls here (softened)
    mag_over_r = jnp.where(near, inner_mag_over_r, outer_mag_over_r)
    phi = jnp.where(near, inner_phi, outer_phi)
    grad_phi = dx * (g_const * mag_over_r)[..., None]
    return grad_phi, g_const * phi


def dyer_ip(dx, r, m, a, g_const: float = 1.0):
    """Softened P2P contribution of a source (mass m at distance r) on a field point.

    Args:
      dx: (..., 3) displacement x_field - x_source.
      r:  (...,) |dx|.
      m:  (...,) source mass (set 0 to mask a pair — all terms scale with m).
      a:  (...,) softening length.

    Returns:
      (grad_phi, phi): potential gradient (..., 3) and potential (...,).
    """
    r_safe = jnp.where(r > 0.0, r, 1.0)
    x = r / a
    x2 = x * x
    x3 = x2 * x
    inner_mag_over_r = (m / (a * a * a)) * (8.0 - 9.0 * x + 2.0 * x3)
    inner_phi = -(m / a) * (2.4 - 4.0 * x2 + 3.0 * x3 - 0.4 * x2 * x3)
    outer_mag_over_r = m / (r_safe * r_safe * r_safe)
    outer_phi = -m / r_safe
    near = r < a
    mag_over_r = jnp.where(near, inner_mag_over_r, outer_mag_over_r)
    phi = jnp.where(near, inner_phi, outer_phi)
    grad_phi = dx * (g_const * mag_over_r)[..., None]
    return grad_phi, g_const * phi


def monopole(dx, r, m, g_const: float = 1.0):
    """Unsoftened monopole M2P term (``GravityFieldSystem.cs:428-442``).

    Same signature/returns as :func:`dyer_ip`; `m` is the node's monopole
    moment and `dx` points from the node's center of mass to the field point.
    """
    r_safe = jnp.where(r > 0.0, r, 1.0)
    mag_over_r = m / (r_safe * r_safe * r_safe)
    phi = -m / r_safe
    grad_phi = dx * (g_const * mag_over_r)[..., None]
    return grad_phi, g_const * phi


def accept_bmax(r2, bmax2, theta: float):
    """Salmon & Warren (1993) bmax multipole acceptance criterion.

    ``GravityFieldSystem.AcceptApproximation`` (:229-247): accept a node when
    bmax^2 / r^2 < theta^2, where bmax is the distance from the node's center
    of mass to the farthest corner of its AABB and r is the CM→field-point
    distance. Compares squared lengths to avoid sqrt, as the reference does.
    """
    return bmax2 < (theta * theta) * r2

"""Monaghan–Lattanzio (1983) cubic spline SPH kernel, vectorized for TPU.

Behavioral spec from the reference's ``Assets/Scripts/Util/SplineKernel.cs``:

- 3D normalization 1/(pi h^3), support radius ``kappa*h`` with kappa=2
  (``SplineKernel.cs:44,55-89``).
- ``W(r,h)``: piecewise in q = r/h —
  q < 1:       (1 - 1.5 q^2 + 0.75 q^3) / (pi h^3)         (:73-79)
  1 <= q < 2:  0.25 (2-q)^3 / (pi h^3)                      (:80-87)
  q >= 2:      0                                            (:61-64)
- ``dW/dr``: q < 1: (-3q + 2.25 q^2)/(pi h^4); 1<=q<2: -0.75 (2-q)^2/(pi h^4).

NOTE — reference sign bug: ``SplineKernel.cs:135`` computes the q<1 branch as
``(+3q + 2.25 q^2)/(pi h^4)`` (positive 3q). The true Monaghan–Lattanzio
derivative is ``-3q + 2.25 q^2`` (and the reference's outer branch at :142 is
correctly negative, so the two branches are inconsistent and the derivative is
discontinuous at q=1). We implement the correct derivative by default and
reproduce the bug when ``sign_bug=True`` for behavioral parity.

Everything is plain elementwise jnp (VPU-friendly), safe for arbitrary
broadcasting, and NaN-free for r >= 0, h > 0 (needed because branches not
taken still execute under ``jnp.where``).
"""

from __future__ import annotations

import jax.numpy as jnp

KAPPA = 2.0
_PI = jnp.pi


def w(r, h):
    """Kernel value W(r, h). Shapes broadcast."""
    q = r / h
    inv_pi_h3 = 1.0 / (_PI * h * h * h)
    q2 = q * q
    inner = (1.0 - 1.5 * q2 + 0.75 * q2 * q) * inv_pi_h3
    t = 2.0 - q
    outer = 0.25 * t * t * t * inv_pi_h3
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def w0(h):
    """W(0, h) = 1/(pi h^3) — the self-density term (DensityFieldSystem.cs:45)."""
    return 1.0 / (_PI * h * h * h)


def dw_dr(r, h, sign_bug: bool = False):
    """Radial derivative dW/dr.

    ``sign_bug=True`` reproduces the reference's q<1 branch
    (``SplineKernel.cs:135``, ``+3q`` instead of ``-3q``).
    """
    q = r / h
    inv_pi_h4 = 1.0 / (_PI * h * h * h * h)
    inner_lin = 3.0 * q if sign_bug else -3.0 * q
    inner = (inner_lin + 2.25 * q * q) * inv_pi_h4
    t = 2.0 - q
    outer = -0.75 * t * t * inv_pi_h4
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def dw_dr_over_r(r, h, sign_bug: bool = False):
    """(dW/dr)/r, finite at r=0 (limit -3/(pi h^5); +3/(pi h^5) with the bug).

    Used to form the gradient w.r.t. particle i:
    grad_i W = (x_i - x_j) * (dW/dr)/r  (``SplineKernel.cs:94-100``).
    The reference divides by r with no guard (NaN at r=0); we take the
    analytic limit instead.
    """
    h5 = h * h * h * h * h
    q = r / h
    inv_pi_h5 = 1.0 / (_PI * h5)
    lin = 3.0 if sign_bug else -3.0
    inner = (lin + 2.25 * q) * inv_pi_h5
    t = 2.0 - q
    r_safe = jnp.where(r > 0.0, r, 1.0)
    outer = -0.75 * t * t / (_PI * h * h * h * h * r_safe)
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def w_and_grad(dx, r, h, sign_bug: bool = False):
    """Fused (W, grad_i W) for a displacement dx = x_i - x_j with |dx| = r.

    Mirrors ``SplineKernel.KernelAndGradienti`` (``SplineKernel.cs:102-111``):
    returns the kernel value and its gradient w.r.t. particle i.

    Args:
      dx: (..., 3) displacement x_i - x_j.
      r: (...,) euclidean norm of dx (precomputed by the caller, which
         usually already has it for the gravity pass).
      h: (...,) smoothing length the kernel is evaluated at.

    Returns:
      (w, grad): shapes (...,), (..., 3).
    """
    wv = w(r, h)
    grad = dx * dw_dr_over_r(r, h, sign_bug)[..., None]
    return wv, grad


def dw_dh(r, h):
    """Partial derivative of W w.r.t. the smoothing length h.

    For W(r,h) = f(r/h)/h^3:  dW/dh = -(3 W + r dW/dr)/h, written fully in
    q = r/h so no branch multiplies r into a zero (r may be huge/inf for
    padded slots and inf*0 would poison the untaken branch with NaN).
    Used by the grad-h (Springel & Hernquist 2002) correction factors —
    a capability beyond the reference (its adaptive-h scheme has no
    energy-consistent correction; SURVEY.md §7 'hard parts').
    """
    q = r / h
    inv_pi_h4 = 1.0 / (_PI * h * h * h * h)
    q2 = q * q
    # 3 f(q) + q f'(q), piecewise
    inner = 3.0 * (1.0 - 1.5 * q2 + 0.75 * q2 * q) + (-3.0 * q2 + 2.25 * q2 * q)
    t = 2.0 - q
    outer = 0.75 * t * t * t - 0.75 * q * t * t
    val = jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
    return -val * inv_pi_h4


def interacts(r2, h_i, h_j, kappa: float = KAPPA):
    """Pair predicate from ``SplineKernel.Interacts`` (:47-53).

    True iff r^2 < (kappa * max(h_i, h_j))^2 — i.e. the pair is inside the
    larger of the two support radii (so the symmetrized kernel is nonzero).
    """
    s = jnp.maximum(h_i, h_j) * kappa
    return r2 < s * s

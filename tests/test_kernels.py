"""Property tests for the cubic spline kernel.

These are the "Unit Tests for mathematics" the reference's roadmap lists as
unbuilt (``README.md:43-45``, ``SplineKernel.cs:43`` "TODO: learn to write
tests in unity!").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planetmodel_sph_tpu.ops import kernels


@pytest.mark.parametrize("h", [0.5, 1.0, 2.5, 3.75])
def test_normalization(h):
    # int_0^{2h} W(r,h) 4 pi r^2 dr = 1
    r = jnp.linspace(0.0, 2.0 * h, 20001)
    w = kernels.w(r, h)
    integral = np.trapezoid(np.asarray(w * 4 * jnp.pi * r * r), np.asarray(r))
    assert abs(integral - 1.0) < 1e-4


@pytest.mark.parametrize("h", [0.5, 1.0, 3.0])
def test_compact_support(h):
    assert kernels.w(2.0 * h, h) == 0.0
    assert kernels.w(2.5 * h, h) == 0.0
    assert kernels.dw_dr(2.0 * h, h) == 0.0
    assert kernels.w(1.999 * h, h) > 0.0


def test_w0_matches_w_at_zero():
    for h in [0.5, 1.0, 2.5]:
        assert jnp.allclose(kernels.w(0.0, h), kernels.w0(h))


def test_continuity_at_h():
    h = 1.3
    eps = 1e-5
    assert abs(kernels.w(h - eps, h) - kernels.w(h + eps, h)) < 1e-3
    # The *correct* derivative is continuous at r=h...
    d_in = kernels.dw_dr(h - eps, h)
    d_out = kernels.dw_dr(h + eps, h)
    assert abs(d_in - d_out) < 1e-3
    # ...while the reference's sign bug makes it discontinuous
    # (SplineKernel.cs:135 vs :142).
    d_in_bug = kernels.dw_dr(h - eps, h, sign_bug=True)
    assert abs(d_in_bug - d_out) > 1.0 / (jnp.pi * h**4)


def test_deriv_matches_autodiff():
    h = 1.7
    r = jnp.linspace(0.05, 2.5 * h, 101)
    auto = jax.vmap(jax.grad(lambda rr: kernels.w(rr, h)))(r)
    manual = kernels.dw_dr(r, h)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual),
                               rtol=1e-4, atol=1e-6)


def test_grad_matches_autodiff_3d():
    h = 2.0
    key = jax.random.PRNGKey(0)
    xi = jax.random.normal(key, (16, 3)) * 1.5
    xj = jnp.zeros((16, 3))

    def w_of_xi(x):
        return kernels.w(jnp.linalg.norm(x), h)

    auto = jax.vmap(jax.grad(w_of_xi))(xi)
    dx = xi - xj
    r = jnp.linalg.norm(dx, axis=-1)
    _, manual = kernels.w_and_grad(dx, r, h)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual),
                               rtol=1e-3, atol=1e-5)


def test_grad_finite_at_zero():
    dx = jnp.zeros((3,))
    w, g = kernels.w_and_grad(dx, jnp.asarray(0.0), 1.0)
    assert jnp.isfinite(w) and bool(jnp.all(jnp.isfinite(g)))
    assert bool(jnp.all(g == 0.0))


def test_interacts_predicate():
    # r^2 < (kappa*max(h_i,h_j))^2  (SplineKernel.cs:47-53)
    assert bool(kernels.interacts(jnp.asarray(15.9**2), 2.0, 8.0))
    assert not bool(kernels.interacts(jnp.asarray(16.1**2), 2.0, 8.0))
    assert not bool(kernels.interacts(jnp.asarray(4.1**2), 2.0, 1.0))


def test_dw_dr_over_r_limit():
    h = 1.1
    val = kernels.dw_dr_over_r(jnp.asarray(0.0), h)
    assert jnp.allclose(val, -3.0 / (jnp.pi * h**5), rtol=1e-6)
    val_bug = kernels.dw_dr_over_r(jnp.asarray(0.0), h, sign_bug=True)
    assert jnp.allclose(val_bug, 3.0 / (jnp.pi * h**5), rtol=1e-6)

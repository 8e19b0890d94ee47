"""Property tests for the Dyer-Ip softened pair gravity and monopole term."""

import jax
import jax.numpy as jnp
import numpy as np

from planetmodel_sph_tpu.ops import gravity


def _pair(r_vec, m=2.0, a=1.5):
    dx = jnp.asarray(r_vec)
    r = jnp.linalg.norm(dx)
    return gravity.dyer_ip(dx, r, m, a)


def test_newtonian_far_field():
    gp, phi = _pair([3.0, 0.0, 0.0], m=2.0, a=1.5)
    np.testing.assert_allclose(float(phi), -2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), [2.0 / 9.0, 0, 0], rtol=1e-6)


def test_continuity_at_a():
    a = 1.5
    eps = 1e-4
    gp_in, phi_in = _pair([a - eps, 0, 0], a=a)
    gp_out, phi_out = _pair([a + eps, 0, 0], a=a)
    assert abs(float(phi_in - phi_out)) < 1e-3
    np.testing.assert_allclose(np.asarray(gp_in), np.asarray(gp_out),
                               rtol=1e-2, atol=1e-4)


def test_grad_phi_is_gradient_of_phi():
    # The packed (grad phi, phi) must be consistent: grad phi == d phi / dx,
    # including inside the softened region (checks the Dyer-Ip polynomial
    # coefficients in GravityFieldSystem.cs:345-346 against each other).
    m, a = 2.0, 1.5

    def phi_of_x(x):
        _, phi = gravity.dyer_ip(x, jnp.linalg.norm(x), m, a)
        return phi

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (32, 3))  # mix of r<a and r>a
    auto = jax.vmap(jax.grad(phi_of_x))(pts)
    manual = jax.vmap(lambda x: gravity.dyer_ip(x, jnp.linalg.norm(x), m, a)[0])(pts)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual),
                               rtol=1e-3, atol=1e-5)


def test_softened_center_finite_and_zero_force():
    gp, phi = _pair([0.0, 0.0, 0.0], m=2.0, a=1.5)
    assert np.isfinite(float(phi))
    np.testing.assert_allclose(np.asarray(gp), 0.0, atol=1e-7)
    # phi(0) = -(m/a) * 2.4 (GravityFieldSystem.cs:346)
    np.testing.assert_allclose(float(phi), -2.0 / 1.5 * 2.4, rtol=1e-6)


def test_monopole_matches_newtonian():
    dx = jnp.asarray([0.0, 4.0, 0.0])
    gp, phi = gravity.monopole(dx, jnp.linalg.norm(dx), 8.0)
    np.testing.assert_allclose(float(phi), -2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), [0, 0.5, 0], rtol=1e-6)


def test_accept_bmax():
    # bmax^2/r^2 < theta^2 (GravityFieldSystem.cs:229-247), theta=0.7
    assert bool(gravity.accept_bmax(jnp.asarray(100.0), jnp.asarray(48.9), 0.7))
    assert not bool(gravity.accept_bmax(jnp.asarray(100.0), jnp.asarray(49.1), 0.7))


def test_mass_zero_masks_pair():
    gp, phi = gravity.dyer_ip(jnp.zeros(3), jnp.asarray(0.0), 0.0, 1.0)
    assert float(phi) == 0.0 and not np.any(np.asarray(gp))

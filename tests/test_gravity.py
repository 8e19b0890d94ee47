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


# ---- COM momentum correction (cfg.grav_com_correction) ---------------------
# Tree gravity's MAC acceptance is target-dependent, so pairwise forces don't
# cancel — the reference leaves the same asymmetry as an open TODO
# (GravityFieldSystem.cs:277-283). The opt-in knob subtracts the mass-weighted
# net gravitational force (a uniform frame acceleration).

def _tree_cfg(**kw):
    from planetmodel_sph_tpu import config
    base = dict(n=2048, neighbor_mode="grid", gravity_solver="tree",
                nbr_group_size=64, nbr_group_level=3, nbr_window=256,
                p2p_window=256, m2p_window=256, theta=0.7)
    base.update(kw)
    return config.SimConfig(**base)


def _net_grav_force(cfg, seed=3):
    from planetmodel_sph_tpu.models import planet
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = 20.0 * jax.random.normal(k1, (cfg.n, 3))
    h = 1.0 + jax.random.uniform(k2, (cfg.n,))
    mass = jnp.full((cfg.n,), 0.05)
    f = planet.compute_forces(pos, h, mass, cfg)
    net = jnp.sum(mass[:, None] * (-f.grad_phi), axis=0)
    return f, float(jnp.linalg.norm(net)), pos, h, mass


def test_com_correction_zeroes_net_gravity():
    f_off, net_off, pos, h, mass = _net_grav_force(_tree_cfg())
    f_on, net_on, *_ = _net_grav_force(
        _tree_cfg(grav_com_correction=True))
    # uncorrected tree leaves a measurable net force; the knob kills it
    assert net_off > 1e-6, net_off
    # exact in real arithmetic; fp32 re-summation leaves ~1e-7 residue
    assert net_on < 1e-3 * net_off, (net_on, net_off)
    # the correction is a uniform frame shift: relative accelerations
    # (pairwise differences) are untouched
    d_off = f_off.grad_phi - f_off.grad_phi[:1]
    d_on = f_on.grad_phi - f_on.grad_phi[:1]
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off),
                               rtol=1e-5, atol=1e-6)


def test_com_correction_dp_matches_single_chip():
    """Under dp the net-force reduction must be psum'd over the mesh axis,
    not taken per shard (a per-shard mean would apply a DIFFERENT frame
    acceleration to each shard, distorting cross-shard dynamics)."""
    import pytest
    from planetmodel_sph_tpu.models import ics, planet
    from planetmodel_sph_tpu.parallel import dp, mesh as mesh_mod
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = _tree_cfg(n=4096, grav_com_correction=True, radius=12.0,
                    particle_radius=2.5)
    st = planet.prime(ics.jupiter(cfg), cfg)
    ref = planet.run(st, cfg, 3)
    mesh = mesh_mod.make_mesh(8)
    sharded = mesh_mod.shard_state(st, mesh)
    out = dp.make_run(cfg, mesh)(sharded, 3)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=2e-3, atol=2e-3)
    # the invariant the knob buys: total momentum conserved under dp
    # (symmetric grad-P + corrected gravity; a per-shard — unpsum'd —
    # correction would leave a net impulse each step)
    p0 = np.sum(np.asarray(st.mass)[:, None] * np.asarray(st.vel), axis=0)
    p1 = np.sum(np.asarray(out.mass)[:, None] * np.asarray(out.vel), axis=0)
    pscale = np.sum(np.asarray(st.mass)
                    * np.linalg.norm(np.asarray(out.vel), axis=-1))
    assert np.linalg.norm(p1 - p0) < 1e-5 * pscale + 1e-7, (p0, p1)

"""End-to-end model tests: ICs, stepping, conservation, parity ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import diagnostics


def small_cfg(**kw):
    base = dict(n=256, radius=10.0, total_mass=100.0, particle_radius=2.2,
                gravity_solver="direct", neighbor_mode="dense", block_n=256)
    base.update(kw)
    return psph.default(**base)


class TestICs:
    def test_uniform_sphere_inside(self):
        pts = ics.uniform_sphere(jax.random.PRNGKey(0), 500, 7.0)
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        assert (r < 7.0).all()
        # roughly uniform: median radius of uniform ball = R * 0.5^(1/3)
        assert abs(np.median(r) - 7.0 * 0.5 ** (1 / 3)) < 0.5

    def test_rejection_matches_direct_statistics(self):
        a = ics.uniform_sphere(jax.random.PRNGKey(1), 2000, 5.0, method="rejection")
        b = ics.uniform_sphere(jax.random.PRNGKey(2), 2000, 5.0, method="direct")
        ra = np.linalg.norm(np.asarray(a), axis=-1)
        rb = np.linalg.norm(np.asarray(b), axis=-1)
        assert abs(np.mean(ra) - np.mean(rb)) < 0.2

    def test_jupiter_state(self):
        cfg = small_cfg()
        st = ics.jupiter(cfg)
        assert st.pos.shape == (cfg.n, 3)
        np.testing.assert_allclose(float(jnp.sum(st.mass)), cfg.total_mass,
                                   rtol=1e-5)
        h = np.asarray(st.h)
        # h in [particleRadius/kappa, 1.5*particleRadius/kappa)
        assert (h >= cfg.particle_radius / cfg.kappa - 1e-6).all()
        assert (h <= 1.5 * cfg.particle_radius / cfg.kappa + 1e-6).all()
        assert not np.asarray(st.vel).any()

    def test_deterministic(self):
        cfg = small_cfg()
        a, b = ics.jupiter(cfg), ics.jupiter(cfg)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))

    def test_two_planet_collision(self):
        cfg = small_cfg(n=200)
        st = ics.two_planet_collision(cfg, separation=60.0, approach_speed=1.0)
        assert st.pos.shape == (200, 3)
        x = np.asarray(st.pos)[:, 0]
        assert (x[:100] < 0).mean() > 0.9 and (x[100:] > 0).mean() > 0.9
        vx = np.asarray(st.vel)[:, 0]
        assert (vx[:100] == 0.5).all() and (vx[100:] == -0.5).all()

    def test_rotating_planet(self):
        cfg = small_cfg()
        st = ics.rotating_planet(cfg, omega=0.1)
        d = diagnostics.measure(st, cfg)
        assert float(d["angular_momentum_z"]) > 0.0


class TestStep:
    @pytest.mark.parametrize("integrator", ["staggered_euler", "leapfrog_kdk"])
    def test_steps_finite(self, integrator):
        cfg = small_cfg(integrator=integrator)
        st = planet.prime(ics.jupiter(cfg), cfg)
        st = planet.run(st, cfg, 10)
        for leaf in jax.tree.leaves(st):
            assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite state"

    def test_staggered_matches_reference_ordering(self):
        # x_{n+1} = x_n + v_n dt with the OLD velocity; v uses forces at x_n.
        cfg = small_cfg(integrator="staggered_euler", adaptive_h=False)
        st = planet.prime(ics.rotating_planet(cfg, 0.05), cfg)
        nxt = planet.step(st, cfg)
        np.testing.assert_allclose(
            np.asarray(nxt.pos), np.asarray(st.pos + st.vel * cfg.dt), rtol=1e-6)
        f = planet.compute_forces(st.pos, st.h, st.mass, cfg)
        np.testing.assert_allclose(
            np.asarray(nxt.vel), np.asarray(st.vel + f.accel * cfg.dt), rtol=1e-5)

    def test_adaptive_h_moves_toward_target(self):
        cfg = small_cfg(adaptive_h=True)
        st = planet.prime(ics.jupiter(cfg), cfg)
        before = float(jnp.mean(jnp.abs(
            st.n_neighbors.astype(jnp.float32) - cfg.target_neighbors)))
        st = planet.run(st, cfg, 5)
        after = float(jnp.mean(jnp.abs(
            st.n_neighbors.astype(jnp.float32) - cfg.target_neighbors)))
        assert after < before

    def test_update_h_formula(self):
        cfg = small_cfg()
        h = jnp.asarray([1.0, 2.0, 3.0])
        nn = jnp.asarray([50, 400, 0], jnp.int32)
        out = np.asarray(planet.update_h(h, nn, cfg))
        np.testing.assert_allclose(out[0], 1.0, rtol=1e-6)   # at target
        np.testing.assert_allclose(out[1], 2.0 * 0.5 * (1 + 0.5), rtol=1e-6)
        np.testing.assert_allclose(out[2], 3.0)              # N=0 unchanged

    def test_momentum_conserved_symmetric(self):
        cfg = small_cfg(grad_p_mode="symmetric", softening_mode="symmetric_max",
                        integrator="leapfrog_kdk", adaptive_h=False)
        st = planet.prime(ics.jupiter(cfg), cfg)
        st = planet.run(st, cfg, 20)
        d = diagnostics.measure(st, cfg)
        # momentum stays ~0 relative to typical |m v| magnitude
        scale = float(jnp.sum(st.mass * jnp.linalg.norm(st.vel, axis=-1))) + 1e-12
        assert float(d["momentum_mag"]) < 1e-3 * scale

    def test_energy_bounded_short_run(self):
        cfg = small_cfg(grad_p_mode="symmetric", softening_mode="symmetric_max",
                        integrator="leapfrog_kdk", adaptive_h=False)
        st = planet.prime(ics.jupiter(cfg), cfg)
        _, diags = planet.run_with_diagnostics(st, cfg, n_chunks=10, chunk=5)
        drift = np.asarray(diagnostics.energy_drift(diags))
        assert np.isfinite(drift).all()
        assert drift[-1] < 0.05  # loose bound for a 50-step smoke test

    def test_run_with_diagnostics_shapes(self):
        cfg = small_cfg()
        st = planet.prime(ics.jupiter(cfg), cfg)
        _, diags = planet.run_with_diagnostics(st, cfg, n_chunks=3, chunk=2)
        assert diags["total_energy"].shape == (3,)
        assert float(diags["mass"][0]) == pytest.approx(cfg.total_mass, rel=1e-5)

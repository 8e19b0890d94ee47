"""Physics integration tests: collapse toward hydrostatic equilibrium,
radial profile sanity, energy conservation.

These supply the "Simulation tests" the reference's roadmap never built
(``README.md:43-45``): the cold uniform ball must contract under self-
gravity, develop a centrally-peaked density profile, and (with the
corrected symmetric physics + leapfrog) conserve energy and momentum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import diagnostics


@pytest.fixture(scope="module")
def collapse():
    """384-particle planet run 600 steps (~2.3 free-fall times).

    Scale note: with P = K rho^2 the gravity/pressure ratio is
    4 pi G R^2 / (3K) — independent of mass — so a small test planet needs a
    smaller K to be gravity-dominated like the reference's R=50/K=1000 scene
    (ratio ~10). R=14 with K=50 gives ratio ~16.
    """
    cfg = psph.default(n=384, radius=14.0, particle_radius=5.5,
                       total_mass=100.0, eos_k=50.0,
                       gravity_solver="direct",
                       neighbor_mode="dense", block_n=384,
                       grad_p_mode="symmetric",
                       softening_mode="symmetric_max",
                       integrator="leapfrog_kdk",
                       adaptive_h=False)   # fixed h: exact energy bookkeeping
    st0 = planet.prime(ics.jupiter(cfg), cfg)
    # ~360 steps reaches maximum compression of the first collapse
    final, diags = planet.run_with_diagnostics(st0, cfg, n_chunks=30,
                                               chunk=12)
    return cfg, st0, final, diags


def test_planet_contracts(collapse):
    cfg, st0, final, diags = collapse
    r = np.asarray(diags["radius_rms"])
    r0 = float(jnp.sqrt(jnp.mean(jnp.sum(st0.pos * st0.pos, axis=-1))))
    assert r.min() < 0.8 * r0, "planet failed to contract under self-gravity"
    # pressure must halt the collapse well before total implosion
    assert r.min() > 0.15 * r0, "unphysical total collapse (no pressure)"


def test_density_profile_centrally_peaked(collapse):
    cfg, _, final, _ = collapse
    com = np.average(np.asarray(final.pos), axis=0,
                     weights=np.asarray(final.mass))
    r = np.linalg.norm(np.asarray(final.pos) - com, axis=-1)
    rho = np.asarray(final.rho)
    order = np.argsort(r)
    inner = rho[order[: len(r) // 4]].mean()
    outer = rho[order[-len(r) // 4:]].mean()
    assert inner > 2.0 * outer, (
        f"density profile not centrally peaked: inner={inner} outer={outer}")


def test_pressure_tracks_density_eos(collapse):
    cfg, _, final, _ = collapse
    np.testing.assert_allclose(
        np.asarray(final.pressure),
        cfg.eos_k * np.asarray(final.rho) ** 2, rtol=1e-5)


def test_energy_momentum_conservation(collapse):
    cfg, _, _, diags = collapse
    e = np.asarray(diags["total_energy"])
    assert np.isfinite(e).all()
    drift = np.abs(e - e[0]) / np.abs(e[0])
    # the cold collapse is violent; leapfrog + softened forces should still
    # bound drift to a few percent over the compression
    assert drift.max() < 0.10, f"energy drift {drift.max():.3f}"
    p = np.asarray(diags["momentum_mag"])
    # total |p| stays tiny relative to sum m|v| ~ O(10)
    assert p.max() < 1e-2


def test_angular_momentum_conserved_rotating():
    cfg = psph.default(n=256, radius=12.0, particle_radius=3.0,
                       gravity_solver="direct", neighbor_mode="dense",
                       block_n=256, grad_p_mode="symmetric",
                       softening_mode="symmetric_max")
    st = planet.prime(ics.rotating_planet(cfg, omega=0.05), cfg)
    _, diags = planet.run_with_diagnostics(st, cfg, n_chunks=10, chunk=20)
    lz = np.asarray(diags["angular_momentum_z"])
    assert np.abs(lz - lz[0]).max() < 0.02 * abs(lz[0])


def test_two_planet_collision_merges():
    cfg = psph.default(n=256, radius=10.0, particle_radius=3.0,
                       gravity_solver="direct", neighbor_mode="dense",
                       block_n=256, grad_p_mode="symmetric",
                       softening_mode="symmetric_max")
    st = planet.prime(
        ics.two_planet_collision(cfg, separation=50.0, approach_speed=3.0),
        cfg)
    out = planet.run(st, cfg, 400)
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # the planets must have approached each other
    x = np.asarray(out.pos)[:, 0]
    sep0 = 50.0
    sep = abs(x[: cfg.n // 2].mean() - x[cfg.n // 2:].mean())
    assert sep < 0.7 * sep0


def test_staggered_vs_kdk_similar_short_term():
    # both integrators should agree closely over a few steps (first-order
    # difference ~ dt^2 per step)
    base = dict(n=256, radius=12.0, particle_radius=3.0,
                gravity_solver="direct", neighbor_mode="dense", block_n=256,
                adaptive_h=False)
    a_cfg = psph.default(integrator="staggered_euler", **base)
    b_cfg = psph.default(integrator="leapfrog_kdk", **base)
    st = ics.jupiter(a_cfg)
    a = planet.run(planet.prime(st, a_cfg), a_cfg, 10)
    b = planet.run(planet.prime(st, b_cfg), b_cfg, 10)
    # schemes differ at O(a dt^2) per step; this R=12/K=1000 ball is strongly
    # pressure-driven (a ~ 15), so ~0.006/step -> ~0.07 over 10 steps
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=0.15)
    d = np.abs(np.asarray(a.pos) - np.asarray(b.pos)).max()
    assert d > 1e-5, "integrators produced identical output (dispatch bug?)"


def test_polytrope_ic_matches_lane_emden():
    """ics.polytrope samples the analytic n=1 solution for P = K rho^2."""
    cfg = psph.default(n=4096, eos_k=50.0, total_mass=100.0,
                      gravity_solver="direct", neighbor_mode="dense",
                      block_n=512, adaptive_h=False)
    st = ics.polytrope(cfg)
    r1 = float(np.pi * np.sqrt(cfg.eos_k / (2 * np.pi * cfg.g_const)))
    r = np.linalg.norm(np.asarray(st.pos), axis=-1)
    assert r.max() <= r1 * 1.001
    # sampled median radius vs the enclosed-mass CDF
    # (sin xi - xi cos xi)/pi = 1/2  at  xi ~ 1.9049
    assert abs(np.median(r) - 1.9049 / np.pi * r1) < 0.03 * r1
    # SPH-measured central density near the analytic rho_c (kernel
    # smoothing + sampling noise allow a loose band)
    rho_c = cfg.total_mass * np.pi**2 / (4 * r1**3)
    st = planet.prime(st, cfg)
    assert 0.5 * rho_c < float(jnp.max(st.rho)) < 2.0 * rho_c
    # near equilibrium: mean radial acceleration ~0 (noise survives
    # pointwise but the shell-averaged pressure/gravity balance must hold)
    a_rad = np.sum(np.asarray(st.accel) * np.asarray(st.pos), axis=-1) / \
        np.maximum(r, 1e-6)
    g_half = cfg.g_const * cfg.total_mass / (0.5 * r1) ** 2
    assert abs(a_rad.mean()) < 0.3 * g_half


def test_polytrope_stays_put_cold_ball_collapses():
    cfg = psph.default(n=512, eos_k=50.0, radius=8.86, particle_radius=3.0,
                      gravity_solver="direct", neighbor_mode="dense",
                      block_n=512, adaptive_h=False)
    poly = planet.run(planet.prime(ics.polytrope(cfg), cfg), cfg, 200)
    cold = planet.run(planet.prime(ics.jupiter(cfg), cfg), cfg, 200)
    r0p = float(jnp.sqrt(jnp.mean(jnp.sum(ics.polytrope(cfg).pos**2, -1))))
    r0c = float(jnp.sqrt(jnp.mean(jnp.sum(ics.jupiter(cfg).pos**2, -1))))
    rp = float(jnp.sqrt(jnp.mean(jnp.sum(poly.pos**2, -1))))
    rc = float(jnp.sqrt(jnp.mean(jnp.sum(cold.pos**2, -1))))
    # at 512 particles the discrete SPH equilibrium sits ~10% off the
    # analytic profile (kernel smoothing + sampling noise), so the claim
    # is contrast: the polytrope drifts a little, the cold ball collapses
    assert abs(rp - r0p) / r0p < 0.15      # near-equilibrium: radius holds
    assert (r0c - rc) / r0c > 0.15         # cold ball contracts hard
    assert abs(rp - r0p) < 0.5 * (r0c - rc)


def test_vel_damping_decays_kinetic_energy():
    base = dict(n=256, radius=12.0, particle_radius=4.0, eos_k=50.0,
                gravity_solver="direct", neighbor_mode="dense", block_n=256,
                adaptive_h=False)
    cfg_d = psph.default(vel_damping=0.5, **base)
    cfg_u = psph.default(**base)
    st0 = planet.prime(ics.jupiter(cfg_u), cfg_u)
    ke = lambda s: float(0.5 * jnp.sum(s.mass * jnp.sum(s.vel**2, -1)))
    damped = planet.run(st0, cfg_d, 120)
    undamped = planet.run(st0, cfg_u, 120)
    assert ke(damped) < 0.5 * ke(undamped)
    # damping must also flow through the cached block pipeline
    cfg_dc = cfg_d.replace(rebuild_every=4, gravity_solver="tree",
                           neighbor_mode="grid")
    damped_c = planet.run(st0, cfg_dc, 120)
    assert ke(damped_c) < 0.5 * ke(undamped)

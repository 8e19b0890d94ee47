"""Tillotson material EOS (eos_mode='tillotson') + basalt_impact scenario.

New capability beyond the reference: the standard planetary-impact EOS
(Tillotson 1962; constants from Benz & Asphaug 1999 / Melosh 1989) riding
the evolved internal-energy channel, in cgs units.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import eos, structure
from planetmodel_sph_tpu.utils import diagnostics

BAS = eos.TILLOTSON_MATERIALS["basalt"]
RHO0, A_BULK = BAS[0], BAS[3]


def test_cold_reference_state():
    """P(rho0, 0) = 0 and the cold bulk sound speed is sqrt(dP/drho)."""
    p0 = float(eos.tillotson_pressure(jnp.asarray(RHO0), jnp.asarray(0.0)))
    assert abs(p0) < 1e-6 * A_BULK
    cs = float(eos.tillotson_sound_speed(jnp.asarray(RHO0),
                                         jnp.asarray(0.0)))
    # dP/drho at (rho0, 0) = (A + ... ) / rho0 with B entering at O(mu)
    assert cs == pytest.approx(float(np.sqrt(A_BULK / RHO0)), rel=0.05)


def test_cold_compression_stiffness():
    """P(1.1 rho0, 0) = A mu + B mu^2 exactly (u = 0 kills the thermal
    term)."""
    mu = 0.1
    want = BAS[3] * mu + BAS[4] * mu * mu
    got = float(eos.tillotson_pressure(jnp.asarray(1.1 * RHO0),
                                       jnp.asarray(0.0)))
    assert got == pytest.approx(want, rel=1e-4)


def test_hot_expanded_ideal_gas_limit():
    """Far-expanded hot material: P -> a rho u (the exponential terms
    die), i.e. an ideal gas with gamma = 1 + a."""
    rho, u = 0.2, 1e12
    got = float(eos.tillotson_pressure(jnp.asarray(rho), jnp.asarray(u)))
    assert got == pytest.approx(BAS[1] * rho * u, rel=1e-3)


def test_hybrid_branch_continuous_in_u():
    """The e_iv/e_cv interpolation must be continuous (no pressure jumps
    that would kick particles across the vaporization boundary)."""
    for ub in (BAS[6], BAS[7]):
        lo = float(eos.tillotson_pressure(jnp.asarray(2.0),
                                          jnp.asarray(ub * 0.999)))
        hi = float(eos.tillotson_pressure(jnp.asarray(2.0),
                                          jnp.asarray(ub * 1.001)))
        assert abs(hi - lo) < 0.01 * max(abs(lo), abs(hi))


@pytest.mark.parametrize("material", sorted(eos.TILLOTSON_MATERIALS))
def test_finite_everywhere(material):
    """P and c_s finite (and c_s > 0) across vacuum, tension, compression
    and vaporized states — the f32 overflow/underflow guards."""
    r = jnp.asarray([1e-30, 1e-8, 1e-3, 0.1, 0.9, 1.0, 2.7, 8.0, 27.0])
    u = jnp.asarray([0.0, 1e8, 1e10, 5e10, 2e11, 1e13, 1e15])
    R, U = jnp.meshgrid(r, u)
    P = eos.tillotson_pressure(R, U, material)
    CS = eos.tillotson_sound_speed(R, U, material)
    assert bool(jnp.all(jnp.isfinite(P)))
    assert bool(jnp.all(jnp.isfinite(CS)))
    assert bool(jnp.all(CS > 0))


def test_negative_u_evaluates_as_cold():
    """The energy-debt convention: a (numerically) negative u must give
    exactly the cold pressure, not NaN or tension blowup."""
    p_neg = float(eos.tillotson_pressure(jnp.asarray(3.0),
                                         jnp.asarray(-1e10)))
    p_zero = float(eos.tillotson_pressure(jnp.asarray(3.0),
                                          jnp.asarray(0.0)))
    assert p_neg == p_zero


def _impact(n=1024, steps=500, **kw):
    cfg = psph.basalt_impact(n=n, **kw)
    st = ics.two_planet_collision(cfg, separation=2.5e7,
                                  approach_speed=3.0e5)
    st = planet.prime(st, cfg)
    e0 = float(diagnostics.measure(st, cfg)["total_energy"])
    out = planet.run(st, cfg, steps)
    d = diagnostics.measure(out, cfg)
    return (float(d["total_energy"]) - e0) / abs(e0), st, out, d


def test_basalt_impact_heats_and_conserves():
    """3 km/s basalt impact (Mach ~10 vs the cold bulk sound speed):
    kinetic energy converts into heat past incipient vaporization, total
    energy conserved to the measured first-order-in-dt error envelope."""
    drift, st, out, d = _impact()
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    assert bool(jnp.all(jnp.isfinite(out.u)))
    # impact heating: hottest material passes incipient vaporization
    assert float(jnp.max(out.u)) > BAS[6]
    assert float(d["internal_energy"]) > 2.0 * float(
        diagnostics.measure(st, psph.basalt_impact(n=1024))["internal_energy"])
    assert abs(drift) < 0.06, drift


def test_impact_drift_converges_with_dt():
    d1, *_ = _impact(steps=150, cfl_number=0.2)
    d2, *_ = _impact(steps=300, cfl_number=0.1)
    assert abs(d2) < 0.75 * abs(d1), (d1, d2)


def test_tillotson_grid_matches_dense():
    """The block pipeline sees Tillotson only through precomputed P and
    c_s per particle, so it must agree with the dense oracle bitwise-to-
    tolerance (same machinery as the adiabatic test, stiffer numbers)."""
    kw = dict(n=512, neighbor_mode="grid", gravity_solver="tree",
              nbr_group_size=64, nbr_window=128, p2p_window=128,
              m2p_window=128, nbr_group_level=2, block_chunk=512,
              eos_mode="tillotson", material="basalt", u0=1e9,
              g_const=6.674e-8, av_alpha=1.0, av_beta=2.0)
    cfg = config.SimConfig(**kw)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    pos = 5e6 * jax.random.normal(k1, (cfg.n, 3))
    h = 1e6 * (1.0 + jax.random.uniform(k2, (cfg.n,)))
    vel = 1e5 * jax.random.normal(k3, (cfg.n, 3))
    mass = jnp.full((cfg.n,), 1e18)
    u = 1e9 + jnp.linspace(0, 5e10, cfg.n)

    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel, u=u)

    from planetmodel_sph_tpu.ops import dense
    dcfg = cfg.replace(neighbor_mode="dense", gravity_solver="direct")
    p1 = dense.pass1(pos, h, mass, dcfg)
    prs = eos.pressure_cfg(p1.rho, dcfg, u=u)
    gp, du = dense.pass2(pos, h, mass, p1.rho, prs, dcfg, vel=vel,
                         energy=True, u=u)
    np.testing.assert_allclose(np.asarray(bf.rho), np.asarray(p1.rho),
                               rtol=2e-6)
    scale_du = float(jnp.max(jnp.abs(du)))
    np.testing.assert_allclose(np.asarray(bf.du_dt), np.asarray(du),
                               rtol=1e-4, atol=1e-5 * scale_du)
    scale_gp = float(jnp.max(jnp.abs(gp)))
    np.testing.assert_allclose(np.asarray(bf.grad_p), np.asarray(gp),
                               rtol=1e-4, atol=1e-4 * scale_gp)


def test_cli_preset_registered():
    from planetmodel_sph_tpu.cli import _PRESETS
    cfg = _PRESETS["basalt_impact"]()
    assert cfg.eos_mode == "tillotson" and cfg.evolves_u

"""Adiabatic EOS + internal-energy equation (cfg.eos_mode='adiabatic').

New capability beyond the reference (whose barotropic P = K rho^2 implies
but never evolves a thermal state): u is evolved by the conjugate SPH
energy equation so shocks convert kinetic energy into heat instead of
silently destroying it through the AV channel. The conservation tests
below are the acceptance criterion: total E = KE + E_int must be
conserved through an AV-dissipated collision, where the polytropic
bookkeeping loses a few percent by construction.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense, eos as eos_ops, structure
from planetmodel_sph_tpu.utils import checkpoint, diagnostics


def test_eos_cfg_switch():
    rho = jnp.asarray([0.5, 1.0, 2.0])
    u = jnp.asarray([3.0, 4.0, 5.0])
    poly = config.SimConfig(n=8, eos_k=100.0, eos_gamma=2.0)
    np.testing.assert_allclose(
        np.asarray(eos_ops.pressure_cfg(rho, poly)),
        np.asarray(100.0 * rho * rho))
    adia = dataclasses.replace(poly, eos_mode="adiabatic")
    np.testing.assert_allclose(
        np.asarray(eos_ops.pressure_cfg(rho, adia, u=u)),
        np.asarray((2.0 - 1.0) * rho * u))
    # c_s^2 = gamma P / rho for the ideal gas
    cs = eos_ops.sound_speed_cfg(rho, adia, u=u)
    np.testing.assert_allclose(np.asarray(cs * cs),
                               np.asarray(2.0 * 1.0 * u), rtol=1e-6)
    with pytest.raises(ValueError):
        eos_ops.pressure_cfg(rho, adia)


def _shock_cfg(eos_mode, **kw):
    base = dict(n=512, radius=8.0, particle_radius=2.2, block_n=64,
                gravity_solver="none", adaptive_h=False,
                eos_mode=eos_mode, av_alpha=1.0, av_beta=2.0, dt=0.002)
    base.update(kw)
    return psph.default(**base)


def _drift(cfg, steps):
    st = ics.two_planet_collision(cfg, separation=20.0, approach_speed=6.0)
    st = planet.prime(st, cfg)
    e0 = float(diagnostics.measure(st, cfg)["total_energy"])
    out = planet.run(st, cfg, steps)
    d = diagnostics.measure(out, cfg)
    return (float(d["total_energy"]) - e0) / abs(e0), out, d


def test_shock_conserves_total_energy():
    """AV-dissipated collision: adiabatic total energy is conserved where
    the polytropic bookkeeping (u implied by rho) loses percent-level
    energy by construction. Measured: 2.0e-3 vs -3.7e-2 over 120 steps."""
    drift_a, out, d = _drift(_shock_cfg("adiabatic"), 120)
    drift_p, _, _ = _drift(_shock_cfg("polytropic"), 120)
    assert abs(drift_a) < 8e-3, drift_a
    assert abs(drift_a) < abs(drift_p) / 5.0, (drift_a, drift_p)
    assert bool(jnp.all(out.u >= 0.0))
    assert bool(jnp.all(jnp.isfinite(out.u)))


def test_shock_drift_converges_with_dt():
    """The residual drift is integration error: halving dt (same physical
    time) must cut it ~in half (measured exactly 2.0x)."""
    d1, _, _ = _drift(_shock_cfg("adiabatic", dt=0.002), 60)
    d2, _, _ = _drift(_shock_cfg("adiabatic", dt=0.001), 120)
    assert abs(d2) < 0.7 * abs(d1), (d1, d2)


def test_av_heats_compressed_gas():
    """Head-on approach must INCREASE u where the polytropic run cannot
    (du_dt > 0 somewhere, total E_int grows vs the adiabatic-reversible
    baseline once AV bites)."""
    cfg = _shock_cfg("adiabatic", dt=0.001)
    st = ics.two_planet_collision(cfg, separation=6.0, approach_speed=8.0)
    st = planet.prime(st, cfg)
    out = planet.run(st, cfg, 40)
    assert float(jnp.max(out.du_dt)) > 0.0
    # somewhere in the impact zone the gas got hotter than anywhere at t=0
    assert float(jnp.max(out.u)) > float(jnp.max(st.u)) * 1.01


@pytest.mark.parametrize("mode", ["symmetric", "grad_h"])
@pytest.mark.parametrize("av", [0.0, 1.0])
def test_grid_du_matches_dense(mode, av):
    cfg = config.SimConfig(
        n=512, neighbor_mode="grid", gravity_solver="tree",
        nbr_group_size=64, nbr_window=128, p2p_window=128, m2p_window=128,
        nbr_group_level=2, block_chunk=512, grad_p_mode=mode,
        eos_mode="adiabatic", av_alpha=av, av_beta=2 * av)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pos = 10.0 * jax.random.normal(k1, (cfg.n, 3))
    h = 1.0 + jax.random.uniform(k2, (cfg.n,))
    vel = jax.random.normal(k3, (cfg.n, 3))
    mass = jnp.full((cfg.n,), 0.05)
    u = 2.0 + jnp.linspace(0, 1, cfg.n)

    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel, u=u)

    dcfg = cfg.replace(neighbor_mode="dense", gravity_solver="direct")
    if mode == "grad_h":
        rho, omega, _ = dense.density_gradh(pos, h, mass, dcfg)
        prs = eos_ops.pressure_cfg(rho, dcfg, u=u)
        _, du = dense.pass2_gradh(pos, h, mass, rho, omega, prs, dcfg,
                                  energy=True, vel=vel)
        if av:
            _, av_du = dense.viscosity_accel(pos, vel, h, mass, rho, dcfg,
                                             energy=True, u=u)
            du = du + av_du
    else:
        p1 = dense.pass1(pos, h, mass, dcfg)
        rho = p1.rho
        prs = eos_ops.pressure_cfg(rho, dcfg, u=u)
        _, du = dense.pass2(pos, h, mass, rho, prs, dcfg, vel=vel,
                            energy=True, u=u)
    np.testing.assert_allclose(np.asarray(bf.rho), np.asarray(rho),
                               rtol=2e-6)
    scale = float(jnp.max(jnp.abs(du)))
    np.testing.assert_allclose(np.asarray(bf.du_dt), np.asarray(du),
                               rtol=1e-4, atol=1e-5 * scale)


def test_cached_adiabatic_matches_exact():
    """Verlet-cached spans must evolve u identically (to MAC/frozen-moment
    tolerance) to per-step rebuilds."""
    base = dict(n=512, radius=10.0, particle_radius=2.5,
                neighbor_mode="grid", gravity_solver="tree",
                adaptive_h=False, eos_mode="adiabatic",
                av_alpha=1.0, av_beta=2.0, nbr_group_level=3,
                nbr_window=256, p2p_window=256, m2p_window=256)
    exact = psph.default(rebuild_every=1, **base)
    cached = psph.default(rebuild_every=4, **base)
    st = ics.two_planet_collision(exact, separation=25.0, approach_speed=3.0)
    st = planet.prime(st, exact)
    a = planet.run(st, exact, 8)
    b = planet.run(st, cached, 8)
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=5e-3, atol=1e-4 * float(jnp.max(a.u)))


def test_adiabatic_rejects_asymmetric_pressure():
    cfg = _shock_cfg("adiabatic", grad_p_mode="reference_asymmetric")
    st = ics.jupiter(cfg)
    with pytest.raises(ValueError):
        planet.prime(st, cfg)


def test_checkpoint_backfills_missing_thermal_fields(tmp_path):
    """Old checkpoints (pre-u/du_dt) must load with u back-filled from the
    polytropic relation at the stored density."""
    cfg = psph.default(n=64, radius=6.0, particle_radius=2.0)
    st = ics.jupiter(cfg)
    path = tmp_path / "old.npz"
    arrays = {f.name: np.asarray(getattr(st, f.name))
              for f in dataclasses.fields(st)
              if f.name not in ("u", "du_dt")}
    with open(path, "wb") as f:
        np.savez(f,
                 __config__=np.frombuffer(
                     json.dumps(dataclasses.asdict(cfg)).encode(),
                     dtype=np.uint8),
                 __step__=np.asarray(7, np.int64), **arrays)
    state, cfg2, step = checkpoint.load(str(path))
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(state.u),
        np.asarray(eos_ops.internal_energy(st.rho, cfg.eos_k,
                                           cfg.eos_gamma)))
    assert float(jnp.max(jnp.abs(state.du_dt))) == 0.0


def test_polytropic_u_carried_unchanged():
    """The thermal channel must be inert under the reference EOS: u rides
    along untouched and du_dt stays zero (no perf or physics side effect)."""
    cfg = psph.default(n=256, radius=10.0, particle_radius=2.2, block_n=64)
    st = planet.prime(ics.jupiter(cfg), cfg)
    out = planet.run(st, cfg, 4)
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(st.u))
    assert float(jnp.max(jnp.abs(out.du_dt))) == 0.0

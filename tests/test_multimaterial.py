"""Per-particle materials (ParticleState.matid) under the Tillotson EOS.

New capability beyond the reference: differentiated bodies (iron core +
basalt mantle) and mixed-material impacts, with the material id threaded
through every pipeline (dense, grid/block, cached, dp) exactly as the
internal energy is.
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
from planetmodel_sph_tpu.parallel import dp, mesh as mesh_mod
from planetmodel_sph_tpu.utils import checkpoint, diagnostics

IRON = eos.material_index("iron")
BASALT = eos.material_index("basalt")
ICE = eos.material_index("ice")


def test_uniform_matid_matches_named_material():
    """A constant matid array must reproduce the scalar-constant path
    bitwise (same formula, constants broadcast instead of inlined)."""
    rho = jnp.asarray([0.1, 0.9, 2.7, 3.5, 8.0])
    u = jnp.asarray([0.0, 1e9, 5e10, 2e11, 1e12])
    mid = jnp.full((5,), ICE, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(eos.tillotson_pressure(rho, u, mid)),
        np.asarray(eos.tillotson_pressure(rho, u, "ice")), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(eos.tillotson_sound_speed(rho, u, mid)),
        np.asarray(eos.tillotson_sound_speed(rho, u, "ice")), rtol=1e-6)


def test_mixed_matid_is_elementwise():
    """Mixed ids = per-material evaluation stitched elementwise."""
    rho = jnp.asarray([2.7, 7.86, 0.917, 2.7])
    u = jnp.asarray([1e10, 1e10, 1e10, 1e10])
    mid = jnp.asarray([BASALT, IRON, ICE, IRON], jnp.int32)
    got = np.asarray(eos.tillotson_pressure(rho, u, mid))
    for i, name in enumerate(("basalt", "iron", "ice", "iron")):
        want = float(eos.tillotson_pressure(rho[i], u[i], name))
        assert got[i] == pytest.approx(want, rel=1e-6), name


def test_differentiated_ic_structure():
    cfg = psph.basalt_impact(n=1024)
    st = ics.differentiated_planet(cfg, core_material="iron",
                                   mantle_material="basalt",
                                   core_mass_frac=0.3)
    mid = np.asarray(st.matid)
    r = np.linalg.norm(np.asarray(st.pos), axis=-1)
    assert set(np.unique(mid)) == {IRON, BASALT}
    # core strictly inside the mantle shell
    assert r[mid == IRON].max() < r[mid == BASALT].min() + 1e-3 * r.max()
    # cold reference densities and ~pressure-free start
    np.testing.assert_allclose(np.asarray(st.rho)[mid == IRON], 7.86,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.rho)[mid == BASALT], 2.70,
                               rtol=1e-5)
    # near-pressure-free start: only the small u0 thermal term remains
    # (mu = 0 kills the cold A mu + B mu^2 terms), well under the bulk
    # modulus scale A
    assert float(jnp.max(jnp.abs(st.pressure))) < 0.1 * 2.67e11
    # equal-mass split: core mass fraction honored
    m = np.asarray(st.mass)
    assert m[mid == IRON].sum() == pytest.approx(0.3 * cfg.total_mass,
                                                 rel=1e-3)


def test_mixed_material_impact_conserves_and_heats():
    """Basalt-on-ice hypervelocity impact: total energy tracked within the
    first-order-in-dt envelope, ice (softer, lower e_iv) heats past its
    incipient-vaporization energy."""
    cfg = psph.basalt_impact(n=1024)
    st = ics.two_planet_collision(cfg, separation=2.5e7,
                                  approach_speed=3.0e5,
                                  materials=("basalt", "ice"))
    st = planet.prime(st, cfg)
    e0 = float(diagnostics.measure(st, cfg)["total_energy"])
    out = planet.run(st, cfg, 400)
    d = diagnostics.measure(out, cfg)
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    assert bool(jnp.all(jnp.isfinite(out.u)))
    drift = (float(d["total_energy"]) - e0) / abs(e0)
    assert abs(drift) < 0.06, drift
    u = np.asarray(out.u)
    mid = np.asarray(out.matid)
    e_iv_ice = eos.TILLOTSON_MATERIALS["ice"][6]
    assert u[mid == ICE].max() > e_iv_ice


def test_grid_matches_dense_mixed_materials():
    """The block pipeline sees materials only through the per-particle
    P/cs coefficients; mixed matids must agree with the dense oracle."""
    kw = dict(n=512, neighbor_mode="grid", gravity_solver="tree",
              nbr_group_size=64, nbr_window=128, p2p_window=128,
              m2p_window=128, nbr_group_level=2, block_chunk=512,
              eos_mode="tillotson", material="basalt", u0=1e9,
              g_const=6.674e-8, av_alpha=1.0, av_beta=2.0)
    cfg = config.SimConfig(**kw)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    pos = 5e6 * jax.random.normal(k1, (cfg.n, 3))
    h = 1e6 * (1.0 + jax.random.uniform(k2, (cfg.n,)))
    vel = 1e5 * jax.random.normal(k3, (cfg.n, 3))
    mass = jnp.full((cfg.n,), 1e18)
    u = 1e9 + jnp.linspace(0, 5e10, cfg.n)
    mid = jax.random.randint(k4, (cfg.n,), 0, len(eos.MATERIAL_NAMES),
                             jnp.int32)

    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel, u=u, matid=mid)

    from planetmodel_sph_tpu.ops import dense
    dcfg = cfg.replace(neighbor_mode="dense", gravity_solver="direct")
    p1 = dense.pass1(pos, h, mass, dcfg)
    prs = eos.pressure_cfg(p1.rho, dcfg, u=u, matid=mid)
    gp, du = dense.pass2(pos, h, mass, p1.rho, prs, dcfg, vel=vel,
                         energy=True, u=u, matid=mid)
    np.testing.assert_allclose(np.asarray(bf.rho), np.asarray(p1.rho),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(bf.pressure), np.asarray(prs),
                               rtol=2e-5)
    scale_du = float(jnp.max(jnp.abs(du)))
    np.testing.assert_allclose(np.asarray(bf.du_dt), np.asarray(du),
                               rtol=1e-4, atol=1e-5 * scale_du)
    scale_gp = float(jnp.max(jnp.abs(gp)))
    np.testing.assert_allclose(np.asarray(bf.grad_p), np.asarray(gp),
                               rtol=1e-4, atol=1e-4 * scale_gp)


@pytest.mark.parametrize("neighbor_mode", ["dense", "grid"])
def test_dp_matches_single_chip_mixed_materials(neighbor_mode):
    kw = dict(n=256, eos_mode="tillotson", material="basalt", u0=1e9,
              g_const=6.674e-8, av_alpha=1.0, av_beta=2.0,
              gravity_solver="direct", dt=0.5)
    if neighbor_mode == "grid":
        kw.update(neighbor_mode="grid", nbr_group_size=32, nbr_window=96,
                  nbr_group_level=2, block_chunk=256, gravity_solver="tree",
                  p2p_window=96, m2p_window=96)
    cfg = psph.basalt_impact(**kw)
    st = ics.two_planet_collision(cfg, separation=2.0e7,
                                  approach_speed=2.0e5,
                                  materials=("iron", "ice"))
    st = planet.prime(st, cfg)
    ref = planet.step(st, cfg)

    mesh = mesh_mod.make_mesh(8)
    out = dp.make_step(cfg, mesh)(mesh_mod.shard_state(st, mesh))
    for name in ("pos", "vel", "rho", "pressure", "u", "du_dt"):
        a, b = np.asarray(getattr(out, name)), np.asarray(getattr(ref, name))
        scale = max(np.max(np.abs(b)), 1e-30)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-4 * scale,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(out.matid),
                                  np.asarray(ref.matid))


def test_cached_run_preserves_matid_through_sort():
    """The sorted-chunk cached runner permutes the whole state; matid must
    come back in original order (int round-trip through the packed float
    gather)."""
    cfg = psph.basalt_impact(
        n=256, neighbor_mode="grid", gravity_solver="tree",
        nbr_group_size=32, nbr_window=96, p2p_window=96, m2p_window=96,
        nbr_group_level=2, block_chunk=256, rebuild_every=4,
        sorted_chunks=True)
    st = ics.two_planet_collision(cfg, separation=2.0e7,
                                  approach_speed=2.0e5,
                                  materials=("basalt", "ice"))
    st = planet.prime(st, cfg)
    out = planet.run(st, cfg, 8)
    np.testing.assert_array_equal(np.asarray(out.matid),
                                  np.asarray(st.matid))
    assert bool(jnp.all(jnp.isfinite(out.pos)))


def test_checkpoint_roundtrip_and_backfill(tmp_path):
    cfg = psph.basalt_impact(n=128)
    st = ics.differentiated_planet(cfg)
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, st, cfg, step=3)
    st2, cfg2, step = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(st2.matid),
                                  np.asarray(st.matid))
    assert step == 3 and cfg2.eos_mode == "tillotson"

    # old checkpoint without matid: backfilled from cfg.material
    import numpy as onp
    with onp.load(p) as z:
        kept = {k: z[k] for k in z.files if k not in ("matid",)}
    with open(p, "wb") as f:
        onp.savez(f, **kept)
    st3, cfg3, _ = checkpoint.load(p)
    assert set(onp.unique(onp.asarray(st3.matid))) == \
        {eos.material_index(cfg3.material)}

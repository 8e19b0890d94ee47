"""Balsara (1995) AV limiter (cfg.av_balsara) across every pipeline.

f_i = |div v| / (|div v| + |curl v| + 1e-4 c/h), applied to Pi_ij as
0.5 (f_i + f_j) one step lagged (state.balsara). New capability beyond
the reference (which has no shock treatment at all): suppresses the
spurious shear dissipation of plain Monaghan AV in differentially
rotating flows while keeping full strength in compressive shocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense, kernels, structure, eos as eos_ops
from planetmodel_sph_tpu.parallel import dp, mesh as mesh_mod
from planetmodel_sph_tpu.utils import checkpoint, diagnostics


def _dense_cfg(**kw):
    base = dict(n=128, radius=8.0, particle_radius=2.0, block_n=128,
                gravity_solver="direct", av_alpha=1.0, av_beta=2.0)
    base.update(kw)
    return psph.default(**base)


def _rand_fields(cfg, seed=0, scale=4.0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    pos = scale * jax.random.normal(k1, (cfg.n, 3))
    h = 1.5 + jax.random.uniform(k2, (cfg.n,))
    vel = jax.random.normal(k3, (cfg.n, 3))
    mass = jnp.full((cfg.n,), 0.03)
    fb = jax.random.uniform(k4, (cfg.n,))
    return pos, h, vel, mass, fb


def test_unit_factors_reproduce_plain_av():
    """fbal = 1 multiplies Pi_ij by exactly 1: grad_p bitwise-closes on
    the plain-AV sweep (the limiter only ever weakens AV)."""
    cfg = _dense_cfg()
    pos, h, vel, mass, _ = _rand_fields(cfg)
    p1 = dense.pass1(pos, h, mass, cfg)
    prs = eos_ops.pressure_cfg(p1.rho, cfg)
    gp0 = dense.pass2(pos, h, mass, p1.rho, prs, cfg, vel=vel)
    gp1, _ = dense.pass2(pos, h, mass, p1.rho, prs,
                         cfg.replace(av_balsara=True), vel=vel,
                         fbal=jnp.ones_like(h))
    np.testing.assert_allclose(np.asarray(gp0), np.asarray(gp1), rtol=1e-6)


def test_divcurl_sums_match_brute_force():
    cfg = _dense_cfg(av_balsara=True)
    pos, h, vel, mass, fb = _rand_fields(cfg)
    p1 = dense.pass1(pos, h, mass, cfg)
    prs = eos_ops.pressure_cfg(p1.rho, cfg)
    _, dc = dense.pass2(pos, h, mass, p1.rho, prs, cfg, vel=vel, fbal=fb)
    P, H, V, M = map(np.asarray, (pos, h, vel, mass))
    n = cfg.n
    D = np.zeros(n)
    C = np.zeros((n, 3))
    for i in range(n):
        dx = P[i] - P
        r = jnp.asarray(np.sqrt((dx ** 2).sum(-1)))
        gw = 0.5 * (np.asarray(kernels.dw_dr_over_r(r, jnp.asarray(H[i]),
                                                    False))
                    + np.asarray(kernels.dw_dr_over_r(r, jnp.asarray(H),
                                                      False)))
        dv = V[i] - V
        m = M.copy()
        m[i] = 0.0
        D[i] = (m * (dv * dx).sum(-1) * gw).sum()
        C[i] = (m[:, None] * np.cross(dv, dx) * gw[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(dc[:, 0]), D, rtol=1e-4,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(dc[:, 1:]), C, rtol=1e-4,
                               atol=1e-8)


def test_factor_analytic_limits():
    """Solid-body rotation (div=0) -> f ~ 0; radial compression
    (curl=0) -> f ~ 1."""
    cfg = _dense_cfg(av_balsara=True)
    pos, h, _, mass, _ = _rand_fields(cfg)
    p1 = dense.pass1(pos, h, mass, cfg)
    prs = eos_ops.pressure_cfg(p1.rho, cfg)
    cs = eos_ops.sound_speed_cfg(p1.rho, cfg)
    ones = jnp.ones_like(h)
    om = jnp.asarray([0.0, 0.0, 1.0])
    vrot = jnp.cross(jnp.broadcast_to(om, pos.shape), pos)
    _, dcr = dense.pass2(pos, h, mass, p1.rho, prs, cfg, vel=vrot,
                         fbal=ones)
    f_rot = dense.balsara_factor(dcr, cs, p1.rho, h)
    _, dcc = dense.pass2(pos, h, mass, p1.rho, prs, cfg, vel=-pos,
                         fbal=ones)
    f_comp = dense.balsara_factor(dcc, cs, p1.rho, h)
    assert float(f_rot.mean()) < 0.05
    assert float(f_comp.mean()) > 0.9


def test_grid_and_pallas_match_dense_oracle():
    """Block pipeline and the fused dense Pallas kernel (interpret mode on
    CPU) agree with the dense sweep on grad_p AND the next-step factor,
    with nontrivial lagged factors threaded in."""
    from planetmodel_sph_tpu.ops.pallas import pairwise
    kw = dict(n=512, neighbor_mode="grid", gravity_solver="tree",
              nbr_group_size=64, nbr_window=128, p2p_window=128,
              m2p_window=128, nbr_group_level=2, block_chunk=512,
              av_alpha=1.0, av_beta=2.0, av_balsara=True)
    cfg = config.SimConfig(**kw)
    pos, h, vel, mass, fb = _rand_fields(cfg, seed=7, scale=5.0)
    dcfg = cfg.replace(neighbor_mode="dense", gravity_solver="direct")
    p1 = dense.pass1(pos, h, mass, dcfg)
    prs = eos_ops.pressure_cfg(p1.rho, dcfg)
    gp, dc = dense.pass2(pos, h, mass, p1.rho, prs, dcfg, vel=vel, fbal=fb)
    cs = eos_ops.sound_speed_cfg(p1.rho, dcfg)
    f_ref = dense.balsara_factor(dc, cs, p1.rho, h)
    sgp = float(jnp.max(jnp.abs(gp)))

    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel, fbal=fb)
    np.testing.assert_allclose(np.asarray(bf.grad_p), np.asarray(gp),
                               rtol=1e-4, atol=1e-4 * sgp)
    np.testing.assert_allclose(np.asarray(bf.balsara), np.asarray(f_ref),
                               rtol=1e-3, atol=1e-4)

    gp2, dc2 = pairwise.pass2(pos, h, mass, p1.rho, prs, dcfg, vel=vel,
                              fbal=fb)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gp), rtol=1e-4,
                               atol=1e-4 * sgp)
    sdc = float(jnp.max(jnp.abs(dc)))
    np.testing.assert_allclose(np.asarray(dc2), np.asarray(dc), rtol=1e-4,
                               atol=1e-5 * sdc)


@pytest.mark.parametrize("neighbor_mode", ["dense", "grid"])
def test_dp_matches_single_chip(neighbor_mode):
    kw = dict(n=256, av_alpha=1.0, av_beta=2.0, av_balsara=True,
              gravity_solver="direct")
    if neighbor_mode == "grid":
        kw.update(neighbor_mode="grid", nbr_group_size=32, nbr_window=96,
                  nbr_group_level=2, block_chunk=256, gravity_solver="tree",
                  p2p_window=96, m2p_window=96)
    cfg = psph.default(**kw)
    st = planet.prime(ics.rotating_planet(cfg, omega=0.05), cfg)
    st = planet.run(st, cfg, 2)       # nontrivial state.balsara
    ref = planet.step(st, cfg)
    mesh = mesh_mod.make_mesh(8)
    out = dp.make_step(cfg, mesh)(mesh_mod.shard_state(st, mesh))
    for name in ("pos", "vel", "rho", "balsara"):
        a, b = np.asarray(getattr(out, name)), np.asarray(getattr(ref, name))
        scale = max(np.max(np.abs(b)), 1e-30)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-4 * scale,
                                   err_msg=name)


def _av_accel_norm(state, cfg, fbal):
    bcfg = cfg.replace(av_balsara=True)
    acc, _ = dense.viscosity_accel(state.pos, state.vel, state.h,
                                   state.mass, state.rho, bcfg, fbal=fbal)
    return float(jnp.mean(jnp.linalg.norm(acc, axis=-1)))


def test_limiter_suppresses_shear_but_keeps_shocks():
    """The headline physics: on an EVOLVED rotating-planet state the
    limited AV force nearly vanishes (spurious shear dissipation killed),
    while on a head-on collision state (compressive shock) it survives
    nearly untouched."""
    cfg = psph.default(n=384, av_alpha=1.0, av_beta=2.0,
                       gravity_solver="direct")
    rot = planet.run(planet.prime(ics.rotating_planet(cfg, omega=0.08),
                                  cfg), cfg, 50)
    cs = eos_ops.sound_speed_cfg(rot.rho, cfg)
    ones = jnp.ones_like(rot.h)
    _, dcr = dense.pass2(rot.pos, rot.h, rot.mass, rot.rho, rot.pressure,
                         cfg.replace(av_balsara=True), vel=rot.vel,
                         fbal=ones)
    f_rot = dense.balsara_factor(dcr, cs, rot.rho, rot.h)
    ratio_rot = _av_accel_norm(rot, cfg, f_rot) / _av_accel_norm(rot, cfg,
                                                                 ones)

    col = planet.prime(ics.two_planet_collision(cfg, separation=90.0,
                                                approach_speed=3.0), cfg)
    col = planet.run(col, cfg, 30)          # bodies in contact, shocking
    csc = eos_ops.sound_speed_cfg(col.rho, cfg)
    _, dcc = dense.pass2(col.pos, col.h, col.mass, col.rho, col.pressure,
                         cfg.replace(av_balsara=True), vel=col.vel,
                         fbal=jnp.ones_like(col.h))
    f_col = dense.balsara_factor(dcc, csc, col.rho, col.h)
    ratio_col = _av_accel_norm(col, cfg, f_col) / _av_accel_norm(
        col, cfg, jnp.ones_like(col.h))

    assert ratio_rot < 0.15, ratio_rot     # shear: AV nearly gone
    assert ratio_col > 0.5, ratio_col      # shock: AV mostly retained
    assert ratio_col > 4.0 * ratio_rot


def test_cached_runner_and_checkpoint_roundtrip(tmp_path):
    cfg = psph.default(n=256, neighbor_mode="grid", gravity_solver="tree",
                       nbr_group_size=32, nbr_window=96, p2p_window=96,
                       m2p_window=96, nbr_group_level=2, block_chunk=256,
                       rebuild_every=4, sorted_chunks=True,
                       av_alpha=1.0, av_beta=2.0, av_balsara=True)
    st = planet.prime(ics.rotating_planet(cfg, omega=0.05), cfg)
    out = planet.run(st, cfg, 8)
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    assert not np.allclose(np.asarray(st.balsara), np.asarray(out.balsara))

    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, out, cfg, step=8)
    st2, _, _ = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(st2.balsara),
                                  np.asarray(out.balsara))

    # old checkpoint without the field: backfilled with ones
    import numpy as onp
    with onp.load(p) as z:
        kept = {k: z[k] for k in z.files if k != "balsara"}
    with open(p, "wb") as f:
        onp.savez(f, **kept)
    st3, _, _ = checkpoint.load(p)
    assert onp.all(onp.asarray(st3.balsara) == 1.0)

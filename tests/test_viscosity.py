"""Monaghan artificial viscosity (flag-gated, beyond-reference capability)."""

import jax.numpy as jnp
import numpy as np

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense
from planetmodel_sph_tpu.utils import diagnostics


def cfg_av(**kw):
    base = dict(n=256, radius=10.0, particle_radius=3.0, eos_k=50.0,
                gravity_solver="direct", neighbor_mode="dense", block_n=256,
                grad_p_mode="symmetric", softening_mode="symmetric_max",
                av_alpha=1.0, av_beta=2.0)
    base.update(kw)
    return psph.default(**base)


def test_av_zero_is_identity():
    on = cfg_av()
    off = cfg_av(av_alpha=0.0, av_beta=0.0)
    st = ics.jupiter(off)
    a_off = planet.compute_forces(st.pos, st.h, st.mass, off, vel=st.vel)
    a_on = planet.compute_forces(st.pos, st.h, st.mass, on, vel=st.vel)
    # at rest nothing approaches: AV contributes exactly zero
    np.testing.assert_array_equal(np.asarray(a_on.accel),
                                  np.asarray(a_off.accel))


def test_av_opposes_approach_and_conserves_momentum():
    cfg = cfg_av(gravity_solver="none")
    st = ics.two_planet_collision(cfg, separation=18.0, approach_speed=4.0)
    visc = dense.viscosity_accel(st.pos, st.vel, st.h, st.mass, st.rho, cfg)
    force = st.mass[:, None] * visc
    # momentum conserved exactly (pairwise antisymmetric)
    total = np.asarray(jnp.sum(force, axis=0))
    scale = float(jnp.sum(jnp.abs(force))) + 1e-12
    np.testing.assert_allclose(total, 0.0, atol=1e-5 * scale)
    # AV removes kinetic energy from the relative motion
    power = float(jnp.sum(st.mass[:, None] * visc * st.vel))
    assert power < 0.0


def test_av_damps_collision():
    on = cfg_av()
    off = cfg_av(av_alpha=0.0, av_beta=0.0)
    st = ics.two_planet_collision(off, separation=16.0, approach_speed=3.0)

    def ke_after(cfg):
        out = planet.run(planet.prime(st, cfg), cfg, 120)
        return float(diagnostics.measure(out, cfg)["kinetic_energy"])

    assert ke_after(on) < ke_after(off)


def test_av_dissipates_even_with_parity_sign_bug():
    # the parity kernel-derivative bug must NOT leak into AV (it would flip
    # the q<1 gradient and make AV inject energy into approaching pairs)
    cfg = cfg_av(gravity_solver="none", kernel_deriv_sign_bug=True)
    st = ics.two_planet_collision(cfg, separation=18.0, approach_speed=4.0)
    visc = dense.viscosity_accel(st.pos, st.vel, st.h, st.mass, st.rho, cfg)
    power = float(jnp.sum(st.mass[:, None] * visc * st.vel))
    assert power < 0.0


def test_av_receding_pairs_unaffected():
    cfg = cfg_av(gravity_solver="none")
    st = ics.jupiter(cfg)
    # pure expansion: all pairs recede -> AV exactly zero
    st = st.replace(vel=0.5 * st.pos)
    visc = dense.viscosity_accel(st.pos, st.vel, st.h, st.mass, st.rho, cfg)
    np.testing.assert_array_equal(np.asarray(visc), 0.0)

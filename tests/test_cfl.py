"""Adaptive global CFL timestep (cfg.dt_mode='cfl').

New capability beyond the reference (fixed 50 Hz step,
``TimeManager.asset:6``): dt adapts to the Courant + force criteria so a
two-planet collision at alpha=1 AV stays stable, and dt visibly shrinks at
the bounce.
"""

import jax
import jax.numpy as jnp
import numpy as np

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet


def _cfg(**kw):
    base = dict(n=512, radius=10.0, particle_radius=2.5,
                gravity_solver="direct", av_alpha=1.0, av_beta=2.0,
                dt_mode="cfl", cfl_number=0.25, dt=0.02)
    base.update(kw)
    return psph.default(**base)


def test_fixed_mode_unchanged():
    cfg = _cfg(dt_mode="fixed")
    st = planet.prime(ics.jupiter(cfg), cfg)
    assert np.isclose(float(planet.current_dt(st, cfg)), cfg.dt)


def test_cfl_dt_bounded_and_responsive():
    cfg = _cfg()
    st = planet.prime(ics.jupiter(cfg), cfg)
    dt0 = float(planet.current_dt(st, cfg))
    assert cfg.dt_min <= dt0 <= cfg.dt
    # boosting velocities 100x must shrink the Courant timestep
    fast = st.replace(vel=st.vel + 100.0)
    fast = planet.prime(fast, cfg)
    dt1 = float(planet.current_dt(fast, cfg))
    assert dt1 < dt0 or dt0 == cfg.dt_min


def test_collision_stable_and_dt_recovers_after_bounce():
    # dt ceiling set high so the step is genuinely CFL-limited. During the
    # approach/impact the Courant term (|v| up, then cs up as rho spikes)
    # and the AV decelerations hold dt down; once the merged blob relaxes,
    # dt must recover well above the collision-phase floor.
    cfg = _cfg(n=512, dt=0.2)
    st = planet.prime(ics.two_planet_collision(cfg, approach_speed=2.0,
                                               separation=26.0), cfg)
    dts, states = [], st
    run8 = jax.jit(lambda s: planet.run(s, cfg, 8))
    for _ in range(30):
        dts.append(float(planet.current_dt(states, cfg)))
        states = run8(states)
    for leaf in jax.tree.leaves(states):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    dts = np.asarray(dts)
    # collision-phase dt sits far below the settled post-collision dt ...
    assert dts.min() < 0.3 * dts[-1], dts
    # ... and the floor happens during the collision, not at the end
    assert dts.argmin() < len(dts) // 2, dts
    # dt must stay within the configured bounds throughout (the ceiling is
    # the f32 rounding of cfg.dt — 0.2 rounds UP in float32)
    assert dts.min() >= cfg.dt_min
    assert dts.max() <= float(np.float32(cfg.dt))


def test_h_max_caps_halo_growth():
    """Isolated (zero-neighbor... few-neighbor) particles relax h upward;
    h_max must bound it (unbounded halo h overflows the fixed interaction
    windows at scale — the measured 100k runaway)."""
    cfg = _cfg(dt_mode="fixed", h_max=3.0, n=256, radius=30.0,
               particle_radius=2.0)
    st = planet.prime(ics.jupiter(cfg), cfg)
    for _ in range(6):
        st = planet.step(st, cfg)
    assert float(jnp.max(st.h)) <= 3.0 + 1e-6
    # and the uncapped config grows past the cap on the same scenario
    cfg0 = cfg.replace(h_max=0.0)
    st0 = planet.prime(ics.jupiter(cfg0), cfg0)
    for _ in range(6):
        st0 = planet.step(st0, cfg0)
    assert float(jnp.max(st0.h)) > 3.0

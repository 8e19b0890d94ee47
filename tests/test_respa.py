"""RESPA multirate tree gravity (cfg.respa_every).

The far tiers (ring sub-block monopoles + dense block scan) vary slowly;
impulse-RESPA evaluates them every m steps and applies half-period
velocity kicks around the inner near-field (SPH + P2P) steps (Tuckerman,
Berne & Martyna 1992). The reference evaluates its whole monopole tree
every step (``GravityFieldSystem.OnUpdate``); the split is a TPU-side
throughput capability with no reference analog, so it is validated
against our own full-rate pipeline.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure
from planetmodel_sph_tpu.utils import diagnostics


def _cfg(**kw):
    base = dict(n=2048, neighbor_mode="grid", gravity_solver="tree",
                grad_p_mode="grad_h", h_mode="newton", adaptive_h=True,
                nbr_group_level=3, nbr_window=192, p2p_window=256,
                m2p_window=256, rebuild_every=8, h_track_margin=0.04)
    base.update(kw)
    return config.SimConfig(**base)


def test_tier_split_sums_to_fused():
    """forces(grav_tiers='near') + gravity_far must reproduce the fused
    all-tier launch exactly (same kernels, same tier partition — only the
    launch is split), including the approx/direct counters."""
    cfg = _cfg()
    state = planet.prime(ics.jupiter(cfg), cfg)
    st = planet._build_caches(state.pos, state.h, state.mass, state.vel,
                              cfg, accel=state.accel)
    bf_all = structure.forces(state.pos, state.h, state.mass, cfg, st)
    bf_near = structure.forces(state.pos, state.h, state.mass, cfg, st,
                               grav_tiers="near")
    phi_f, gphi_f, na_f = structure.gravity_far(state.pos, state.h,
                                                state.mass, cfg, st)
    np.testing.assert_allclose(bf_near.phi + phi_f, bf_all.phi,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(bf_near.grad_phi + gphi_f, bf_all.grad_phi,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(bf_near.n_direct, bf_all.n_direct)
    np.testing.assert_array_equal(na_f, bf_all.n_approx)
    # SPH outputs are untouched by the gravity tier selection
    np.testing.assert_array_equal(bf_near.rho, bf_all.rho)


def test_respa_tracks_full_rate_run():
    """A respa_every=4 run must track the full-rate run closely over a
    few rebuild periods (the far field changes little over 4 steps) and
    conserve energy comparably."""
    cfg_full = _cfg()
    cfg_respa = _cfg(respa_every=4)
    state = planet.prime(ics.jupiter(cfg_full), cfg_full)
    n_steps = 24
    a, info_a = planet.run_info(state, cfg_full, n_steps)
    b, info_b = planet.run_info(state, cfg_respa, n_steps)
    assert int(info_b["nbr_overflow"]) == 0
    assert int(info_b["tree_overflow"]) == 0
    # same trajectory to within the multirate splitting error
    scale = float(jnp.max(jnp.abs(np.asarray(a.pos))))
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               atol=2e-3 * scale)
    # diagnostics see the full potential (phi carries the far tier)
    da = diagnostics.measure(a, cfg_full)
    db = diagnostics.measure(b, cfg_respa)
    ea, eb = float(da["total_energy"]), float(db["total_energy"])
    assert abs(eb - ea) / abs(ea) < 2e-3, (ea, eb)
    # counters: inner steps ran near-only, the carried n_approx must be
    # the far eval's (nonzero for a tree run)
    assert float(jnp.mean(b.n_approx)) > 0


def test_respa_requires_supported_pipeline():
    cfg = _cfg(respa_every=4, dt_mode="cfl")
    state = planet.prime(ics.jupiter(cfg), cfg)
    with pytest.raises(ValueError, match="respa"):
        planet.run(state, cfg, 8)


def test_respa_remainder_chunk_falls_back_to_full_rate():
    """A chunk length respa_every can't divide (e.g. the remainder of a
    diag cadence over long Verlet chunks) runs full-rate — identical
    physics, no raise, finite outputs."""
    cfg = _cfg(respa_every=8, rebuild_every=8)
    state = planet.prime(ics.jupiter(cfg), cfg)
    out, info = planet.run_info(state, cfg, 12)   # 8 respa + 4 full-rate
    assert not bool(jnp.any(jnp.isnan(out.pos)))
    assert float(jnp.max(out.rho)) > 1e-6

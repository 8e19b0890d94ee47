"""Verlet-skin cached stepping vs per-step rebuild.

With a conservative skin the cached trajectories must track the exact ones
closely over a rebuild period (lists are a superset; only the frozen M2P
moments introduce error, bounded well below the MAC tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet


def cfg_pair(**kw):
    base = dict(n=512, radius=12.0, particle_radius=2.5,
                neighbor_mode="grid", gravity_solver="tree",
                adaptive_h=True)
    base.update(kw)
    exact = psph.default(rebuild_every=1, **base)
    cached = psph.default(rebuild_every=4, **base)
    return exact, cached


def test_cached_matches_exact_over_short_run():
    # adaptive h off: cached mode legitimately applies the h relaxation only
    # at rebuild steps, so trajectories are only comparable at frozen h
    exact, cached = cfg_pair(adaptive_h=False)
    st = planet.prime(ics.jupiter(exact), exact)
    a = planet.run(st, exact, 8)
    b = planet.run(st, cached, 8)
    # same physics to tree-MAC accuracy + frozen-moment staleness
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-2, atol=5e-3)
    for leaf in jax.tree.leaves(b):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_cached_run_with_diagnostics():
    _, cached = cfg_pair()
    st = ics.jupiter(cached)
    final, diags = planet.run_with_diagnostics(st, cached, n_chunks=3, chunk=4)
    assert diags["total_energy"].shape == (3,)
    assert np.isfinite(np.asarray(diags["total_energy"])).all()


def test_cached_adaptive_h_still_converges():
    _, cached = cfg_pair(adaptive_h=True)
    st = ics.jupiter(cached)
    before = planet.prime(st, cached)
    out = planet.run(st, cached, 12)
    gap_before = abs(float(jnp.mean(before.n_neighbors.astype(jnp.float32)))
                     - cached.target_neighbors)
    gap_after = abs(float(jnp.mean(out.n_neighbors.astype(jnp.float32)))
                    - cached.target_neighbors)
    assert gap_after < gap_before


def test_carry_step_rebuild_cadence():
    _, cached = cfg_pair()
    st = ics.jupiter(cached)
    c = planet.init_carry(st, cached)
    assert int(c.tick) == 0
    for i in range(3):
        c = planet.step_carry(c, cached)
    assert int(c.tick) == 3
    for leaf in jax.tree.leaves(c.state):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_skin_zero_when_disabled():
    # _skin is PER-PARTICLE (a global max was the measured 100k runaway)
    exact, cached = cfg_pair()
    v = jnp.ones((4, 3))
    a = jnp.zeros((4, 3))
    assert float(jnp.max(planet._skin(exact, v, a))) == 0.0
    expected = 2.0 * 4 * exact.dt * float(jnp.sqrt(3.0))
    assert float(jnp.max(planet._skin(cached, v, a))) == pytest.approx(
        expected, rel=1e-5)
    # acceleration contributes 0.5*a*T^2
    a2 = jnp.ones((4, 3))
    t = 4 * exact.dt
    expected2 = 2.0 * (t + 0.5 * t * t) * float(jnp.sqrt(3.0))
    assert float(jnp.max(planet._skin(cached, v, a2))) == pytest.approx(
        expected2,
                                                               rel=1e-5)


def test_sorted_chunks_transparent():
    """cfg.sorted_chunks keeps state Morton-sorted across a rebuild period;
    results must be bitwise-identical to the per-step sort/unsort path
    (padding slots duplicate their cell's last particle and integrate to
    identical values)."""
    base = dict(n=512, radius=12.0, particle_radius=2.5,
                neighbor_mode="grid", gravity_solver="tree",
                adaptive_h=True, rebuild_every=4, sort_every=8)
    on = psph.default(sorted_chunks=True, **base)
    off = psph.default(sorted_chunks=False, **base)
    st = planet.prime(ics.jupiter(on), on)
    a, ia = planet.run_info(st, on, 10)    # 2 full chunks + remainder
    b, ib = planet.run_info(st, off, 10)
    # ULP-tight, not bitwise: the two compiled programs fuse differently,
    # which reorders a few window reductions (measured 1-ULP phi diffs)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if jnp.issubdtype(la.dtype, jnp.integer):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        else:
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=1e-6)
    assert int(ia["nbr_overflow"]) == int(ib["nbr_overflow"])


def test_cached_dense_direct_also_works():
    # caching machinery must be a no-op-equivalent for the dense pipeline
    base = dict(n=256, radius=10.0, particle_radius=2.2,
                neighbor_mode="dense", gravity_solver="direct",
                adaptive_h=False)  # h cadence is the only cached/exact diff
    exact = psph.default(rebuild_every=1, **base)
    cached = psph.default(rebuild_every=4, **base)
    st = planet.prime(ics.jupiter(exact), exact)
    a = planet.run(st, exact, 6)
    b = planet.run(st, cached, 6)
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-4, atol=1e-5)


def test_cached_collision_approach_no_overflow():
    """Fast approaching clusters: the per-particle skin and the motion-
    conservative MAC (d_eff = d - deltas, bmax + 2*delta_src) must keep
    the frozen structure valid while the bulk velocity closes ~a block
    width per rebuild period. Regression target: the frozen M2P/P2P split
    silently going stale under coherent motion."""
    base = dict(n=512, radius=10.0, particle_radius=2.5,
                neighbor_mode="grid", gravity_solver="tree",
                adaptive_h=False, nbr_group_level=3, nbr_window=256,
                p2p_window=256, m2p_window=256)
    exact = psph.default(rebuild_every=1, **base)
    cached = psph.default(rebuild_every=8, **base)
    st = ics.two_planet_collision(exact, separation=35.0,
                                  approach_speed=8.0)
    st = planet.prime(st, exact)
    a, ia = planet.run_info(st, exact, 8)
    b, ib = planet.run_info(st, cached, 8)
    assert int(ib["nbr_overflow"]) == 0 and int(ib["tree_overflow"]) == 0
    for leaf in jax.tree.leaves(b):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=5e-3)


def test_h_tracking_follows_density_between_rebuilds():
    """cfg.h_track_margin: per-step h from the previous step's density,
    clamped around the chunk-boundary Newton solution. During the cold
    ball's initial collapse rho rises steadily, so the FROZEN-h cached
    run drifts away from the per-step-rebuild oracle h while the tracked
    run follows it — the grad-h consistency relation h = eta (m/rho)^(1/3)
    is what makes the force conservative (SimConfig.h_track_margin; the
    K=16 frozen-h 100k drift run pumped energy exponentially)."""
    base = dict(n=2048, radius=12.0, particle_radius=2.5,
                neighbor_mode="grid", gravity_solver="tree",
                adaptive_h=True, grad_p_mode="grad_h", h_mode="newton",
                nbr_group_level=3, nbr_window=192, p2p_window=256,
                m2p_window=256)
    gold_cfg = psph.default(rebuild_every=1, **base)
    frozen_cfg = psph.default(rebuild_every=8, **base)
    track_cfg = psph.default(rebuild_every=8, h_track_margin=0.05, **base)

    st = planet.prime(ics.jupiter(gold_cfg), gold_cfg)
    n_steps = 16
    gold = planet.run(st, gold_cfg, n_steps)
    frozen, info_f = planet.run_info(st, frozen_cfg, n_steps)
    track, info_t = planet.run_info(st, track_cfg, n_steps)
    assert int(info_t["nbr_overflow"]) == 0
    assert int(info_t["tree_overflow"]) == 0

    hg = np.asarray(gold.h)
    err_frozen = float(np.mean(np.abs(np.asarray(frozen.h) - hg) / hg))
    err_track = float(np.mean(np.abs(np.asarray(track.h) - hg) / hg))
    # tracking must recover most of the per-step-rebuild h fidelity
    assert err_track < 0.5 * err_frozen, (err_track, err_frozen)
    # outliers are clamp-limited by design (the margin protects window
    # validity, not tracking): worst-case must still be no worse than
    # the frozen behavior
    mx_frozen = float(np.max(np.abs(np.asarray(frozen.h) - hg) / hg))
    mx_track = float(np.max(np.abs(np.asarray(track.h) - hg) / hg))
    assert mx_track <= mx_frozen * 1.05, (mx_track, mx_frozen)

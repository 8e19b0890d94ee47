"""Preset configuration contracts."""

import planetmodel_sph_tpu as psph


def test_auto_small_uses_dense_direct():
    cfg = psph.auto(n=3000)
    assert cfg.neighbor_mode == "dense" and cfg.gravity_solver == "direct"


def test_auto_large_uses_grid_tree():
    cfg = psph.auto(n=100000)
    assert cfg.neighbor_mode == "grid" and cfg.gravity_solver == "tree"
    assert cfg.rebuild_every > 1


def test_auto_large_is_the_validated_operating_point():
    # auto(100k) must hand out EXACTLY the drift-validated production
    # preset — not a stale approximation of it (VERDICT r3 weak #6)
    assert psph.auto(n=100_000) == psph.jupiter_100k()
    # and at other n the full stack still comes along, scaled
    cfg = psph.auto(n=50_000)
    assert cfg.grad_p_mode == "grad_h" and cfg.h_mode == "newton"
    assert cfg.sph_refine_subblock and cfg.h_track_margin > 0.0
    assert cfg.respa_every > 1 and cfg.multipole_order == 2
    assert cfg.particle_radius == 5.0 * (3000 / 50_000) ** (1.0 / 3.0)


def test_auto_explicit_overrides():
    cfg = psph.auto(n=100000, gravity_solver="direct",
                    neighbor_mode="dense")
    assert cfg.gravity_solver == "direct"


def test_parity_flags():
    cfg = psph.parity()
    assert cfg.kernel_deriv_sign_bug
    assert cfg.grad_p_mode == "reference_asymmetric"
    assert cfg.softening_mode == "receiver_h"
    assert cfg.integrator == "staggered_euler"
    assert cfg.gravity_solver == "tree"
    # the reference scene parameters (SimScene.unity:276-279)
    assert (cfg.n, cfg.radius, cfg.total_mass, cfg.particle_radius) == \
        (3000, 50.0, 100.0, 5.0)
    assert cfg.dt == 0.02 and cfg.theta == 0.7 and cfg.eos_k == 1000.0


def test_jupiter_100k_overflow_safe_knobs():
    cfg = psph.jupiter_100k()
    # capacities cover the measured settled-state window maxima with the
    # preset's K=32 skin (tools/ksweep2 'r3q10sbrk32r8w': sph pre-refine
    # max 187 / post-refine max 64, ring max 92 sub-blocks; with pass-2
    # P2P fusion the p2p tier keeps only NON-SPH near sub-blocks, max
    # 108 — the r4fuse ladder rows)
    assert cfg.nbr_window >= 187
    assert cfg.sph_refined_window >= 64 + 16
    assert cfg.fuse_p2p_sph and cfg.p2p_window >= 108
    assert cfg.m2p_window >= 92
    # The drift-validated operating point: long Verlet chunks are stable
    # ONLY with per-step h tracking (frozen h pumps energy — the r2
    # 'q10 pumps' diagnosis was frozen-h in disguise; both far fields
    # are drift-flat with tracking, docs/results/drift100k_v2 + _q10t).
    # Do NOT change these knobs without a full 12k-step drift run
    # (tools/drift100k.py) proving the new point stable — the r4 point
    # (fusion + refined window 80 + far field once per rebuild period)
    # is proved in docs/results/drift100k_r4ship32 (1.46e-5/10k,
    # |p| 7.2e-5, zero overflow; the respa-16 intermediate in
    # _r4ship: 2.03e-5/10k).
    assert cfg.h_track_margin > 0.0
    assert cfg.rebuild_every == 32 and cfg.respa_every == 32
    assert cfg.multipole_order == 2 and cfg.theta == 1.0

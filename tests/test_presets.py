"""Preset configuration contracts."""

import planetmodel_sph_tpu as psph


def test_auto_small_uses_dense_direct():
    cfg = psph.auto(n=3000)
    assert cfg.neighbor_mode == "dense" and cfg.gravity_solver == "direct"


def test_auto_large_uses_grid_tree():
    cfg = psph.auto(n=100000)
    assert cfg.neighbor_mode == "grid" and cfg.gravity_solver == "tree"
    assert cfg.rebuild_every > 1


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
    # preset's skin (tools/ksweep3 'mono_k16' at sub=32, K=16, monopole
    # theta=0.7: sph max 179, p2p max 251, ring max 134 sub-blocks)
    assert cfg.nbr_window >= 179
    assert cfg.p2p_window >= 251
    assert cfg.m2p_window >= 134
    # the STABLE operating point: the r3 TPU drift-probe A/B ladder
    # showed every quadrupole variant pumping energy from the settled
    # polytrope (monotone dE trend) while monopole theta=0.7 oscillates
    # around zero — the r2 'q10' preset was drift-invalid (VERDICT r2
    # weak #1). Do NOT flip multipole_order back without a full 12k-step
    # drift run (tools/drift100k.py) proving the point stable.
    assert cfg.multipole_order == 1 and cfg.theta == 0.7
    assert cfg.rebuild_every == 16

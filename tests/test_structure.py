"""Block-unified structure (ops/structure.py) vs the dense exact oracle.

The reference validates its acceleration structures by cross-checking against
brute force (``BoundingVolumeHierarchyBuilderTests.cs:86-146``,
``BroadphaseTests.cs``); same pattern here: the windowed Pallas pipeline must
reproduce the dense all-pairs pipeline bit-for-tolerance on random clouds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.ops import dense, eos as eos_ops, structure


def _cloud(n, seed=0, radius=10.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = radius * jax.random.normal(k1, (n, 3))
    h = 1.0 + jax.random.uniform(k2, (n,))
    mass = jnp.full((n,), 0.05)
    return pos, h, mass


def _cfg(**kw):
    base = dict(n=512, neighbor_mode="grid", gravity_solver="tree",
                nbr_group_size=64, nbr_window=128, p2p_window=128,
                m2p_window=128,
                nbr_group_level=2, block_chunk=512)
    base.update(kw)
    return config.SimConfig(**base)


def _dense_cfg(cfg, **kw):
    return cfg.replace(neighbor_mode="dense", gravity_solver="direct", **kw)


def test_pass1_pass2_match_dense():
    cfg = _cfg(grad_p_mode="symmetric")
    pos, h, mass = _cloud(cfg.n)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0 and int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)

    dcfg = _dense_cfg(cfg)
    p1 = dense.pass1(pos, h, mass, dcfg)
    np.testing.assert_allclose(bf.rho, p1.rho, rtol=2e-6)
    np.testing.assert_array_equal(bf.n_neighbors, p1.n_neighbors)
    prs = eos_ops.pressure(p1.rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2(pos, h, mass, p1.rho, prs, dcfg)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)


def test_asymmetric_and_sign_bug_match_dense():
    cfg = _cfg(grad_p_mode="reference_asymmetric", kernel_deriv_sign_bug=True)
    pos, h, mass = _cloud(cfg.n, seed=3)
    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st)
    dcfg = _dense_cfg(cfg)
    p1 = dense.pass1(pos, h, mass, dcfg)
    prs = eos_ops.pressure(p1.rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2(pos, h, mass, p1.rho, prs, dcfg)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)


def test_gravity_exact_when_theta_zero():
    """theta -> 0 rejects every block: pure P2P must equal direct gravity."""
    cfg = _cfg(theta=1e-6, p2p_window=256, softening_mode="symmetric_max")
    pos, h, mass = _cloud(cfg.n, seed=1)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    p1 = dense.pass1(pos, h, mass, _dense_cfg(cfg))
    np.testing.assert_allclose(bf.phi, p1.phi, rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(bf.grad_phi, p1.grad_phi, rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_array_equal(bf.n_direct, p1.n_direct)
    assert int(jnp.sum(bf.n_approx)) == 0


def test_gravity_tree_close_to_direct():
    """theta=0.7 block-monopole far field: small controlled MAC error."""
    cfg = _cfg(n=4096, theta=0.7, softening_mode="receiver_h",
               nbr_group_level=3, nbr_window=512, p2p_window=512,
               m2p_window=512)
    pos, h, mass = _cloud(cfg.n, seed=2, radius=30.0)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0 and int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    p1 = dense.pass1(pos, h, mass, _dense_cfg(cfg))
    # every source block lands exactly once in M2P or P2P
    np.testing.assert_array_equal(bf.n_direct + bf.n_approx * 0,
                                  bf.n_direct)  # shape sanity
    assert int(jnp.sum(bf.n_approx)) > 0        # far field actually used
    scale = jnp.max(jnp.abs(p1.grad_phi))
    err = jnp.max(jnp.abs(bf.grad_phi - p1.grad_phi)) / scale
    assert float(err) < 0.02, float(err)
    phi_err = jnp.max(jnp.abs(bf.phi - p1.phi)) / jnp.max(jnp.abs(p1.phi))
    assert float(phi_err) < 0.02, float(phi_err)


def test_quadrupole_beats_monopole():
    """cfg.multipole_order=2: traceless quadrupoles on every moment tier
    must cut the far-field error vs the direct oracle several-fold at
    equal theta (the reference's tree is monopole-only —
    GravityFieldSystem.cs GenerateMomentsSTJob — so this is parity-plus)."""
    cfg1 = _cfg(n=4096, theta=0.7, softening_mode="receiver_h",
                nbr_group_level=3, nbr_window=512, p2p_window=512,
                m2p_window=512)
    cfg2 = cfg1.replace(multipole_order=2)
    pos, h, mass = _cloud(cfg1.n, seed=2, radius=30.0)
    p1 = dense.pass1(pos, h, mass, _dense_cfg(cfg1))
    scale = jnp.max(jnp.abs(p1.grad_phi))
    errs = {}
    for tag, cfg in (("mono", cfg1), ("quad", cfg2)):
        st = structure.build(pos, h, mass, cfg)
        bf = structure.forces(pos, h, mass, cfg, st)
        errs[tag] = float(jnp.max(jnp.abs(bf.grad_phi - p1.grad_phi))
                          / scale)
        assert int(jnp.sum(bf.n_approx)) > 0
    assert errs["quad"] < errs["mono"] / 3.0, errs


def test_quadrupole_supergroup_tier():
    """Quadrupoles through the supergroup partition (parallel-axis
    aggregation of block quadrupoles) must also beat the monopole sg
    far field."""
    base = _cfg(n=4096, theta=0.7, softening_mode="receiver_h",
                nbr_group_level=3, nbr_window=512, p2p_window=512,
                m2p_window=512, sg_blocks=4, blk_window=256)
    pos, h, mass = _cloud(base.n, seed=2, radius=30.0)
    p1 = dense.pass1(pos, h, mass, _dense_cfg(base))
    scale = jnp.max(jnp.abs(p1.grad_phi))
    errs = {}
    for tag, cfg in (("mono", base), ("quad",
                                      base.replace(multipole_order=2))):
        st = structure.build(pos, h, mass, cfg)
        assert int(st.blk_overflow) == 0
        bf = structure.forces(pos, h, mass, cfg, st)
        errs[tag] = float(jnp.max(jnp.abs(bf.grad_phi - p1.grad_phi))
                          / scale)
    assert errs["quad"] < errs["mono"] / 2.0, errs


def test_every_block_counted_once():
    """The three gravity tiers partition the live SUB-blocks per group:
    block-accepted (expanded to subs) + ring monopoles + P2P, disjoint and
    jointly covering every live sub-block."""
    cfg = _cfg(theta=0.7)
    pos, h, mass = _cloud(cfg.n, seed=5)
    st = structure.build(pos, h, mass, cfg)
    g = st.groups.live.shape[0]
    spb = cfg.nbr_group_size // cfg.nbr_sub
    live_sub = np.asarray(jnp.any(
        st.groups.live.reshape(g * spb, cfg.nbr_sub), axis=1))
    live_subs = set(np.nonzero(live_sub)[0].tolist())
    accept = np.asarray(st.accept[:, :g]) > 0.5
    tvalid = np.asarray(jnp.any(st.groups.live, axis=1))
    for gi in range(g):
        if not tvalid[gi]:
            continue
        acc_blocks = np.nonzero(accept[gi])[0]
        acc = set(int(b * spb + s1) for b in acc_blocks for s1 in range(spb)
                  if live_sub[b * spb + s1])
        ids_p = np.asarray(st.p2p_idx[gi])
        near = set(int(i) for i in ids_p[ids_p >= 0])
        ids_r = np.asarray(st.m2p_idx[gi])
        ring = set(int(i) for i in ids_r[ids_r >= 0])
        assert acc.isdisjoint(near) and acc.isdisjoint(ring)
        assert near.isdisjoint(ring)
        assert acc | near | ring == live_subs


def test_gradh_matches_dense():
    cfg = _cfg(grad_p_mode="grad_h", gravity_solver="none")
    pos, h, mass = _cloud(cfg.n, seed=7)
    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st)
    dcfg = cfg.replace(neighbor_mode="dense")
    rho, omega, nn = dense.density_gradh(pos, h, mass, dcfg)
    np.testing.assert_allclose(bf.rho, rho, rtol=2e-6)
    np.testing.assert_array_equal(bf.n_neighbors, nn)
    prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2_gradh(pos, h, mass, rho, omega, prs, dcfg)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["symmetric", "grad_h"])
def test_av_fused_matches_dense(mode):
    cfg = _cfg(grad_p_mode=mode, gravity_solver="none",
               av_alpha=1.0, av_beta=2.0)
    pos, h, mass = _cloud(cfg.n, seed=9)
    vel = jax.random.normal(jax.random.PRNGKey(11), (cfg.n, 3))
    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel)

    dcfg = cfg.replace(neighbor_mode="dense")
    if mode == "grad_h":
        rho, omega, _ = dense.density_gradh(pos, h, mass, dcfg)
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2_gradh(pos, h, mass, rho, omega, prs, dcfg)
    else:
        p1 = dense.pass1(pos, h, mass, dcfg.replace(gravity_solver="none"))
        rho = p1.rho
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2(pos, h, mass, rho, prs, dcfg)
    visc = dense.viscosity_accel(pos, vel, h, mass, rho, dcfg)
    # block grad_p folds AV in as an effective gradient: -gp/rho must match
    want = -gp / rho[:, None] + visc
    got = -bf.grad_p / bf.rho[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_overflow_counted_not_silent():
    cfg = _cfg(nbr_window=2)
    pos, h, mass = _cloud(cfg.n, seed=4)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) > 0


def test_bf16_gravity_close_to_f32():
    # bf16 pair math on the gravity sweeps: error must stay well below the
    # theta=0.7 MAC's own approximation error (~1e-2 vs direct)
    cfg = _cfg(grad_p_mode="symmetric")
    pos, h, mass = _cloud(cfg.n, seed=5)
    st = structure.build(pos, h, mass, cfg)
    f32 = structure.gravity(pos, h, mass, cfg, st)
    b16 = structure.gravity(pos, h, mass,
                            cfg.replace(grav_pair_dtype="bfloat16"), st)
    np.testing.assert_allclose(b16[0], f32[0], rtol=5e-3)      # phi
    scale = float(jnp.max(jnp.abs(f32[1])))
    np.testing.assert_allclose(np.asarray(b16[1]) / scale,
                               np.asarray(f32[1]) / scale, atol=1e-2)
    np.testing.assert_array_equal(b16[2], f32[2])              # counters
    np.testing.assert_array_equal(b16[3], f32[3])


def test_gravity_supergroup_tier_close_to_direct():
    """sg_blocks>1: dense supergroup scan + windowed block tier must stay
    within the MAC error band of direct gravity (the four-tier partition
    keeps every source counted exactly once)."""
    cfg = _cfg(n=4096, theta=0.7, softening_mode="receiver_h",
               nbr_group_level=3, nbr_window=512, p2p_window=512,
               m2p_window=512, sg_blocks=4, blk_window=256)
    pos, h, mass = _cloud(cfg.n, seed=2, radius=30.0)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.p2p_overflow) == 0 and int(st.blk_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    assert float(jnp.mean(st.accept)) > 0.0       # sg tier actually used
    assert int(jnp.sum(st.n_blk)) > 0             # block tier actually used
    p1 = dense.pass1(pos, h, mass, _dense_cfg(cfg))
    scale = jnp.max(jnp.abs(p1.grad_phi))
    err = jnp.max(jnp.abs(bf.grad_phi - p1.grad_phi)) / scale
    assert float(err) < 0.02, float(err)
    phi_err = jnp.max(jnp.abs(bf.phi - p1.phi)) / jnp.max(jnp.abs(p1.phi))
    assert float(phi_err) < 0.02, float(phi_err)
    # both counters live: P2P particles and far-field monopole entries
    assert int(jnp.sum(bf.n_direct)) > 0 and int(jnp.sum(bf.n_approx)) > 0


def test_supergroup_partition_counts_every_block_once():
    cfg = _cfg(theta=0.7, sg_blocks=4, blk_window=128)
    pos, h, mass = _cloud(cfg.n, seed=5)
    st = structure.build(pos, h, mass, cfg)
    g = st.groups.live.shape[0]
    spb = cfg.nbr_group_size // cfg.nbr_sub
    live_sub = np.asarray(jnp.any(
        st.groups.live.reshape(g * spb, cfg.nbr_sub), axis=1))
    live_subs = set(np.nonzero(live_sub)[0].tolist())
    nsg = -(-g // cfg.sg_blocks)
    accept_sg = np.asarray(st.accept[:, :nsg]) > 0.5
    tvalid = np.asarray(jnp.any(st.groups.live, axis=1))
    bmass_live = np.asarray(jnp.any(st.groups.live, axis=1))
    for gi in range(g):
        if not tvalid[gi]:
            continue
        sg_blocks = [b for s1 in np.nonzero(accept_sg[gi])[0]
                     for b in range(s1 * cfg.sg_blocks,
                                    min((s1 + 1) * cfg.sg_blocks, g))
                     if bmass_live[b]]
        ids_b = np.asarray(st.blk_idx[gi])
        far_blocks = sg_blocks + [int(b) for b in ids_b[ids_b >= 0]]
        assert len(far_blocks) == len(set(far_blocks))   # tiers disjoint
        far = set(int(b * spb + s2) for b in far_blocks
                  for s2 in range(spb) if live_sub[b * spb + s2])
        ids_p = np.asarray(st.p2p_idx[gi])
        near = set(int(i) for i in ids_p[ids_p >= 0])
        ids_r = np.asarray(st.m2p_idx[gi])
        ring = set(int(i) for i in ids_r[ids_r >= 0])
        assert far.isdisjoint(near) and far.isdisjoint(ring)
        assert near.isdisjoint(ring)
        assert far | near | ring == live_subs


@pytest.mark.parametrize("mode", ["symmetric", "grad_h",
                                  "reference_asymmetric"])
def test_exact_candidate_lists_match_dense(mode):
    """cfg.sph_exact_window: the rebuild-time true-predicate refinement
    (particle-granularity candidate lists) must be transparent — identical
    densities, neighbor counts, and gradients vs the dense oracle."""
    cfg = _cfg(grad_p_mode=mode, gravity_solver="none",
               sph_exact_window=640)
    pos, h, mass = _cloud(cfg.n, seed=13)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0
    # the refined window is a particle count now, far below the sub-slot
    # candidate total (the whole point)
    assert float(jnp.mean(st.n_sph)) < 0.25 * float(
        jnp.mean(structure.build(pos, h, mass,
                                 cfg.replace(sph_exact_window=0)).n_sph)
        * cfg.nbr_sub)
    bf = structure.forces(pos, h, mass, cfg, st)
    dcfg = cfg.replace(neighbor_mode="dense")
    if mode == "grad_h":
        rho, omega, nn = dense.density_gradh(pos, h, mass, dcfg)
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2_gradh(pos, h, mass, rho, omega, prs, dcfg)
    else:
        p1 = dense.pass1(pos, h, mass, dcfg)
        rho, nn = p1.rho, p1.n_neighbors
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2(pos, h, mass, rho, prs, dcfg)
    np.testing.assert_allclose(bf.rho, rho, rtol=2e-6)
    np.testing.assert_array_equal(bf.n_neighbors, nn)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["symmetric", "grad_h"])
def test_subblock_refine_matches_dense(mode):
    """cfg.sph_refine_subblock: the true-predicate refinement at SUB-BLOCK
    granularity must be transparent (identical densities, neighbor counts,
    gradients vs the dense oracle) while dropping a solid fraction of the
    AABB window's rows — the middle point between the raw sub-AABB window
    and the (measured net-slower) particle-exact lists."""
    cfg = _cfg(grad_p_mode=mode, gravity_solver="none",
               sph_refine_subblock=True)
    pos, h, mass = _cloud(cfg.n, seed=13)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0
    n_raw = float(jnp.mean(structure.build(
        pos, h, mass, cfg.replace(sph_refine_subblock=False)).n_sph))
    assert float(jnp.mean(st.n_sph)) < 0.8 * n_raw
    bf = structure.forces(pos, h, mass, cfg, st)
    dcfg = cfg.replace(neighbor_mode="dense")
    if mode == "grad_h":
        rho, omega, nn = dense.density_gradh(pos, h, mass, dcfg)
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2_gradh(pos, h, mass, rho, omega, prs, dcfg)
    else:
        p1 = dense.pass1(pos, h, mass, dcfg)
        rho, nn = p1.rho, p1.n_neighbors
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        gp = dense.pass2(pos, h, mass, rho, prs, dcfg)
    np.testing.assert_allclose(bf.rho, rho, rtol=2e-6)
    np.testing.assert_array_equal(bf.n_neighbors, nn)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)


def test_subblock_refine_cached_run_matches_unrefined():
    """Over a Verlet-cached chunk the refined window must stay valid for
    the whole rebuild period (the filter predicate carries the same skin
    + h-margin inflation as the AABB pass): a multi-step cached run with
    the refine on must match the refine-off run to fp-reassociation
    tolerance, with zero overflow."""
    from planetmodel_sph_tpu import config as config_mod
    from planetmodel_sph_tpu.models import ics, planet

    kw = dict(n=2048, neighbor_mode="grid", gravity_solver="tree",
              grad_p_mode="grad_h", h_mode="newton", adaptive_h=True,
              nbr_group_level=3, nbr_window=192, p2p_window=256,
              m2p_window=256, rebuild_every=8, h_track_margin=0.04)
    cfg_off = config_mod.SimConfig(**kw)
    cfg_on = config_mod.SimConfig(sph_refine_subblock=True, **kw)
    state = planet.prime(ics.jupiter(cfg_off), cfg_off)
    a, info_a = planet.run_info(state, cfg_off, 16)
    b, info_b = planet.run_info(state, cfg_on, 16)
    assert int(info_b["nbr_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=1e-4)


def test_subblock_refined_window_truncation():
    """cfg.sph_refined_window: ample capacity is transparent vs the
    untruncated refine (the per-step gathers just shrink); an undersized
    capacity drops interactions LOUDLY via the sph overflow counter."""
    cfg = _cfg(grad_p_mode="symmetric", gravity_solver="none",
               sph_refine_subblock=True)
    pos, h, mass = _cloud(cfg.n, seed=13)
    st_full = structure.build(pos, h, mass, cfg)
    wmax = int(jnp.max(st_full.n_sph))
    ample = cfg.replace(sph_refined_window=wmax + 8)
    st_a = structure.build(pos, h, mass, ample)
    assert int(st_a.sph_overflow) == 0
    assert st_a.sph_idx.shape[1] == wmax + 8
    bf_a = structure.forces(pos, h, mass, ample, st_a)
    bf_f = structure.forces(pos, h, mass, cfg, st_full)
    np.testing.assert_allclose(bf_a.rho, bf_f.rho, rtol=1e-6)
    np.testing.assert_array_equal(bf_a.n_neighbors, bf_f.n_neighbors)
    tight = cfg.replace(sph_refined_window=max(wmax // 2, 1))
    st_t = structure.build(pos, h, mass, tight)
    assert int(st_t.sph_overflow) > 0


def test_exact_candidate_overflow_counted_not_silent():
    cfg = _cfg(sph_exact_window=8, gravity_solver="none")
    pos, h, mass = _cloud(cfg.n, seed=4)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) > 0


@pytest.mark.parametrize("xw", [0, 512])
def test_dead_groups_no_nan_in_sorted_io(xw):
    """Empty Morton cells produce fully-dead groups whose rho sits at the
    1e-30 floor; the P/rho^2 coefficient there is 0/0. The exact-list
    single-trip sweep evaluates those rows (0-mass x NaN = NaN), which
    poisoned entire cached sorted-chunk runs. All outputs must be finite
    on every slot, and a multi-step cached run must stay finite."""
    from planetmodel_sph_tpu import config as config_mod
    from planetmodel_sph_tpu.models import ics, planet

    kw = dict(n=2048, neighbor_mode="grid", gravity_solver="tree",
              nbr_group_level=3, nbr_window=128, p2p_window=128,
              m2p_window=128, rebuild_every=4)
    if xw:
        # also covers the padded-row entry gathers (result-transparent)
        kw.update(sph_exact_window=xw, gather_pad_rows=32)
    cfg = config_mod.SimConfig(**kw)
    state = ics.jupiter(cfg)
    st = planet._build_caches(state.pos, state.h, state.mass, state.vel,
                              cfg, accel=state.accel)
    grp = st.groups
    assert int(jnp.sum(~jnp.any(grp.live, axis=1))) > 0, \
        "scenario must contain fully-dead groups"
    sp = state.pos[grp.tgt_idx]
    bf = structure.forces(sp, state.h[grp.tgt_idx],
                          state.mass[grp.tgt_idx], cfg, st, sorted_io=True)
    for f in (bf.rho, bf.grad_p, bf.phi, bf.grad_phi):
        assert not bool(jnp.any(jnp.isnan(f)))
    out, info = planet.run_info(state, cfg, 8)
    assert not bool(jnp.any(jnp.isnan(out.vel)))
    assert float(jnp.max(out.rho)) > 1e-6


# ---------------------------------------------------------------------------
# pass-2 P2P fusion (cfg.fuse_p2p_sph)
# ---------------------------------------------------------------------------

def test_fused_p2p_partition_counts_every_subblock_once():
    """With the fusion on, the partition gains a fourth tier — the SPH
    window rows (evaluated exactly inside pass 2) — and the four tiers
    must stay disjoint and jointly cover every live sub-block."""
    cfg = _cfg(theta=0.7, fuse_p2p_sph=True)
    pos, h, mass = _cloud(cfg.n, seed=5)
    st = structure.build(pos, h, mass, cfg)
    g = st.groups.live.shape[0]
    spb = cfg.nbr_group_size // cfg.nbr_sub
    live_sub = np.asarray(jnp.any(
        st.groups.live.reshape(g * spb, cfg.nbr_sub), axis=1))
    live_subs = set(np.nonzero(live_sub)[0].tolist())
    accept = np.asarray(st.accept[:, :g]) > 0.5
    tvalid = np.asarray(jnp.any(st.groups.live, axis=1))
    for gi in range(g):
        if not tvalid[gi]:
            continue
        acc_blocks = np.nonzero(accept[gi])[0]
        acc = set(int(b * spb + s1) for b in acc_blocks
                  for s1 in range(spb) if live_sub[b * spb + s1])
        ids_p = np.asarray(st.p2p_idx[gi])
        near = set(int(i) for i in ids_p[ids_p >= 0])
        ids_r = np.asarray(st.m2p_idx[gi])
        ring = set(int(i) for i in ids_r[ids_r >= 0])
        ids_s = np.asarray(st.sph_idx[gi])
        sph = set(int(i) for i in ids_s[ids_s >= 0])
        for a, b2 in ((acc, near), (acc, ring), (acc, sph), (near, ring),
                      (near, sph), (ring, sph)):
            assert a.isdisjoint(b2)
        assert acc | near | ring | sph == live_subs


@pytest.mark.parametrize("soft", ["receiver_h", "symmetric_max"])
def test_fused_p2p_exact_when_theta_zero(soft):
    """theta -> 0: everything is near-field, split between the fused
    pass-2 rows and the remainder P2P window — the union must equal the
    direct dense oracle exactly (same per-pair math, both softenings)."""
    cfg = _cfg(theta=1e-6, p2p_window=256, softening_mode=soft,
               fuse_p2p_sph=True, grad_p_mode="grad_h")
    pos, h, mass = _cloud(cfg.n, seed=1)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    dcfg = _dense_cfg(cfg, grad_p_mode="symmetric")
    p1 = dense.pass1(pos, h, mass, dcfg)
    np.testing.assert_allclose(bf.phi, p1.phi, rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(bf.grad_phi, p1.grad_phi, rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_array_equal(bf.n_direct, p1.n_direct)
    assert int(jnp.sum(bf.n_approx)) == 0


def test_fused_p2p_tree_no_worse_than_unfused():
    """At theta=0.7 the fusion promotes some monopole-approximated
    sub-blocks to exact evaluation — the far-field error vs the direct
    oracle must not grow."""
    base = _cfg(n=4096, theta=0.7, softening_mode="receiver_h",
                nbr_group_level=3, nbr_window=512, p2p_window=512,
                m2p_window=512)
    pos, h, mass = _cloud(base.n, seed=2, radius=30.0)
    p1 = dense.pass1(pos, h, mass, _dense_cfg(base))
    scale = float(jnp.max(jnp.abs(p1.grad_phi)))
    errs = {}
    for tag, cfg in (("plain", base),
                     ("fused", base.replace(fuse_p2p_sph=True))):
        st = structure.build(pos, h, mass, cfg)
        bf = structure.forces(pos, h, mass, cfg, st)
        errs[tag] = float(jnp.max(jnp.abs(bf.grad_phi - p1.grad_phi))
                          / scale)
    assert errs["fused"] <= errs["plain"] * 1.05 + 1e-7, errs


def test_fused_p2p_with_refine_truncation_cached_run():
    """The fusion composes with the production stack (refine +
    truncation + cached sorted chunks + RESPA): finite trajectory,
    tracking the unfused run to MAC accuracy."""
    from planetmodel_sph_tpu.models import ics, planet
    cfg = config.SimConfig(
        n=1024, radius=30.0, particle_radius=3.0, neighbor_mode="grid",
        gravity_solver="tree", grad_p_mode="grad_h", h_mode="newton",
        h_track_margin=0.04, sph_refine_subblock=True,
        sph_refined_window=64, rebuild_every=4, respa_every=2,
        multipole_order=2, nbr_group_size=32, nbr_sub=16,
        nbr_group_level=2, nbr_window=128, p2p_window=128, m2p_window=128)
    st0 = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1,
                                                     respa_every=1))
    ref, info_ref = planet.run_info(st0, cfg, 8)
    out, info = planet.run_info(st0, cfg.replace(fuse_p2p_sph=True), 8)
    assert int(info["nbr_overflow"]) == 0 == int(info["tree_overflow"])
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=2e-3)


def test_fused_p2p_guards():
    cfg = _cfg(fuse_p2p_sph=True, sph_exact_window=512)
    pos, h, mass = _cloud(cfg.n)
    with pytest.raises(ValueError):
        structure.build(pos, h, mass, cfg)
    with pytest.raises(ValueError):
        structure.fuse_active(_cfg(fuse_p2p_residual=True))


def test_fused_residual_matches_separate_launch():
    """fuse_p2p_residual sweeps the SAME residual-p2p window with the
    SAME Dyer-Ip math inside the pass-2 launch — forces must match the
    two-launch fused path to accumulation-order tolerance, for both
    softening modes."""
    for soft in ("receiver_h", "min_h"):
        base = _cfg(fuse_p2p_sph=True, softening_mode=soft,
                    grad_p_mode="grad_h")
        pos, h, mass = _cloud(base.n, seed=3, radius=20.0)
        st = structure.build(pos, h, mass, base)
        ref = structure.forces(pos, h, mass, base, st)
        out = structure.forces(pos, h, mass,
                               base.replace(fuse_p2p_residual=True), st)
        np.testing.assert_allclose(np.asarray(out.phi),
                                   np.asarray(ref.phi), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.grad_phi),
                                   np.asarray(ref.grad_phi), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out.n_direct),
                                      np.asarray(ref.n_direct))
        np.testing.assert_allclose(np.asarray(out.grad_p),
                                   np.asarray(ref.grad_p), rtol=1e-6,
                                   atol=1e-6)


def test_fused_residual_cached_run_tracks_unmerged():
    """The merge under the FULL production stack (refine + truncation +
    cached sorted chunks + RESPA near/far split): trajectories must
    track the unmerged fused run."""
    from planetmodel_sph_tpu.models import ics, planet
    cfg = config.SimConfig(
        n=1024, radius=30.0, particle_radius=3.0, neighbor_mode="grid",
        gravity_solver="tree", grad_p_mode="grad_h", h_mode="newton",
        h_track_margin=0.04, sph_refine_subblock=True,
        sph_refined_window=64, rebuild_every=4, respa_every=2,
        multipole_order=2, nbr_group_size=32, nbr_sub=16,
        nbr_group_level=2, nbr_window=128, p2p_window=128,
        m2p_window=128, fuse_p2p_sph=True)
    st0 = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1,
                                                     respa_every=1))
    ref, info_ref = planet.run_info(st0, cfg, 8)
    out, info = planet.run_info(
        st0, cfg.replace(fuse_p2p_residual=True), 8)
    assert int(info["nbr_overflow"]) == 0 == int(info["tree_overflow"])
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-4)

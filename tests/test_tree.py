"""Barnes-Hut tree gravity vs brute force — the reference's BVH-test pattern
(build the structure, cross-check results against the naive path,
``BoundingVolumeHierarchyBuilderTests.cs``) applied to the Morton octree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense, morton, tree


@pytest.fixture(scope="module")
def setup():
    cfg = psph.default(n=1500, gravity_solver="direct", block_n=512)
    st = ics.jupiter(cfg)
    p1 = dense.pass1(st.pos, st.h, st.mass, cfg)
    return cfg, st, p1


def test_morton_roundtrip_ordering():
    # codes must order lexicographically with interleaved octants
    pts = jnp.asarray([[0.0, 0, 0], [9.9, 9.9, 9.9], [5.1, 5.1, 5.1],
                       [4.9, 4.9, 4.9]])
    lo = jnp.zeros(3)
    hi = jnp.full(3, 10.0)
    c = np.asarray(morton.encode(pts, lo, hi))
    assert c[0] < c[3] < c[2] <= c[1]
    # level-1 cell = octant
    assert morton.cell_of(c[0], 1) == 0
    assert morton.cell_of(c[1], 1) == 7
    assert morton.cell_of(c[2], 1) == 7
    assert morton.cell_of(c[3], 1) == 0


def test_expand_bits():
    assert int(morton.expand_bits(jnp.asarray(0b111))) == 0b1001001
    assert int(morton.expand_bits(jnp.asarray(1))) == 1
    assert int(morton.expand_bits(jnp.asarray(0x3FF))) == 0x09249249


def test_tree_matches_direct(setup):
    cfg, st, p1 = setup
    out = tree.gravity_full(st.pos, st.h, st.mass,
                            cfg.replace(gravity_solver="tree"))
    assert int(out.m2p_overflow) == 0 and int(out.p2p_overflow) == 0
    rel_phi = np.abs(np.asarray(out.phi - p1.phi)) / np.abs(np.asarray(p1.phi))
    assert rel_phi.mean() < 2e-3 and rel_phi.max() < 2e-2
    gmag = np.linalg.norm(np.asarray(p1.grad_phi), axis=-1).mean()
    rel_g = np.linalg.norm(np.asarray(out.grad_phi - p1.grad_phi),
                           axis=-1) / gmag
    assert rel_g.mean() < 2e-2


def test_counters_populated(setup):
    cfg, st, _ = setup
    out = tree.gravity_full(st.pos, st.h, st.mass,
                            cfg.replace(gravity_solver="tree"))
    # Every particle either used approximations or direct terms; totals are
    # bounded by N-1 per particle (GravityField.numParticles/numApprox analog)
    nd = np.asarray(out.n_direct)
    na = np.asarray(out.n_approx)
    assert (nd + na > 0).all()
    assert (nd <= cfg.n - 1).all()
    assert na.mean() > 1  # multipoles actually used


def test_theta_zero_is_all_direct(setup):
    # theta -> 0 accepts nothing: pure P2P, must match direct summation tightly
    cfg, st, p1 = setup
    tcfg = cfg.replace(gravity_solver="tree", theta=0.0,
                       tree_p2p_cap=2048, tree_p2p_cell_cap=2048)
    out = tree.gravity_full(st.pos, st.h, st.mass, tcfg)
    assert int(out.p2p_overflow) == 0
    assert int(np.asarray(out.n_approx).sum()) == 0
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(p1.phi),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out.grad_phi),
                               np.asarray(p1.grad_phi), rtol=5e-3, atol=1e-6)


def test_zero_mass_sources_inert(setup):
    cfg, st, _ = setup
    tcfg = cfg.replace(gravity_solver="tree")
    base = tree.gravity_full(st.pos, st.h, st.mass, tcfg)
    # append dead sources far away AND inside the cloud
    extra_pos = jnp.concatenate([st.pos[:10] + 0.5, st.pos[:5] * 3.0])
    src = (jnp.concatenate([st.pos, extra_pos]),
           jnp.concatenate([st.h, jnp.full((15,), 1.0)]),
           jnp.concatenate([st.mass, jnp.zeros((15,))]))
    out = tree.gravity_full(st.pos, st.h, st.mass, tcfg, src=src)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(base.phi),
                               rtol=2e-3)


def test_target_source_split_consistent(setup):
    cfg, st, _ = setup
    tcfg = cfg.replace(gravity_solver="tree")
    full = tree.gravity_full(st.pos, st.h, st.mass, tcfg)
    half = cfg.n // 2
    part = tree.gravity_full(st.pos[half:], st.h[half:], st.mass[half:],
                             tcfg, src=(st.pos, st.h, st.mass),
                             target_offset=half)
    # group boxes differ between the two runs, so acceptance differs at the
    # MAC level — agreement is to MAC accuracy, not bitwise
    np.testing.assert_allclose(np.asarray(part.phi),
                               np.asarray(full.phi[half:]), rtol=1e-2)


def test_parity_preset_step_runs():
    cfg = psph.parity(n=512, radius=12.0, particle_radius=2.5, block_n=256)
    st = planet.prime(ics.jupiter(cfg), cfg)
    st = planet.run(st, cfg, 3)
    for leaf in jax.tree.leaves(st):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert int(jnp.sum(st.n_approx)) >= 0

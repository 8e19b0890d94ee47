"""Adversarial geometries for the block pipeline vs the dense oracle.

The standard structure tests use single Gaussian clouds; the production
scenarios that actually broke round 2 have harder shapes: the two-planet
collision (two dense clusters separated by empty space -> mostly-dead
Morton cells, the geometry that exposed the dead-group 0/0 NaN poisoning),
coincident particles (r=0 pairs between distinct particles), and extreme
smoothing-length contrast. Same cross-check pattern as the reference's
structure tests (``BroadphaseTests.cs``): windowed pipeline vs brute force.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.ops import dense, eos as eos_ops, structure


def _cfg(**kw):
    base = dict(n=512, neighbor_mode="grid", gravity_solver="tree",
                nbr_group_size=64, nbr_window=128, p2p_window=128,
                m2p_window=128, nbr_group_level=2, block_chunk=512)
    base.update(kw)
    return config.SimConfig(**base)


def _dense_cfg(cfg, **kw):
    return cfg.replace(neighbor_mode="dense", gravity_solver="direct", **kw)


def _two_clusters(n, seed=0, sep=60.0, radius=4.0):
    """Collision-style IC: two compact clusters, wide dead space between."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    half = n // 2
    a = radius * jax.random.normal(k1, (half, 3))
    b = radius * jax.random.normal(k2, (n - half, 3))
    pos = jnp.concatenate([a - jnp.array([sep / 2, 0.0, 0.0]),
                           b + jnp.array([sep / 2, 0.0, 0.0])])
    h = 1.0 + jax.random.uniform(k3, (n,))
    mass = jnp.full((n,), 0.05)
    return pos, h, mass


def _check_sph(bf, pos, h, mass, cfg):
    dcfg = _dense_cfg(cfg)
    p1 = dense.pass1(pos, h, mass, dcfg)
    np.testing.assert_allclose(bf.rho, p1.rho, rtol=2e-6)
    np.testing.assert_array_equal(bf.n_neighbors, p1.n_neighbors)
    prs = eos_ops.pressure(p1.rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2(pos, h, mass, p1.rho, prs, dcfg)
    np.testing.assert_allclose(bf.grad_p, gp, rtol=1e-4, atol=1e-6)
    return p1


@pytest.mark.parametrize("xw", [0, 256])
def test_two_cluster_matches_dense(xw):
    """Collision geometry: mostly-empty cells between the clusters.

    Every output must be finite and match brute force — the dead groups
    at the rho floor are exactly where the round-2 NaN poisoning lived.
    """
    cfg = _cfg(theta=1e-6, p2p_window=256, softening_mode="symmetric_max",
               sph_exact_window=xw)
    pos, h, mass = _two_clusters(cfg.n, seed=5)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0 and int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    for f in (bf.rho, bf.grad_p, bf.phi, bf.grad_phi):
        assert bool(jnp.all(jnp.isfinite(f)))
    p1 = _check_sph(bf, pos, h, mass, cfg)
    # theta ~ 0: pure P2P must equal direct gravity ACROSS the gap too
    np.testing.assert_allclose(bf.phi, p1.phi, rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(bf.grad_phi, p1.grad_phi, rtol=3e-4,
                               atol=3e-5)


def test_two_cluster_far_field_tiers():
    """Production far field (quad + supergroups) across the empty gap.

    The opposite cluster is far field for every target; the supergroup
    reach bound and quadrupole moments must stay accurate on this
    maximally-clustered mass distribution. Measured on this geometry
    (matched-softening oracle): quad theta=0.9 max 3.0% on one rim
    particle / rms 0.23%, vs mono theta=0.9 max 8.4% / rms 0.87% — the
    max tolerance below is MAC truncation headroom, not a bug allowance;
    structural failures show up as tens-of-percent errors or NaNs."""
    def run(order, sg):
        cfg = _cfg(n=2048, theta=0.9, multipole_order=order, sg_blocks=sg,
                   blk_window=192, nbr_group_level=3, nbr_window=256,
                   p2p_window=256, m2p_window=256,
                   softening_mode="receiver_h")
        pos, h, mass = _two_clusters(cfg.n, seed=7, sep=80.0, radius=8.0)
        st = structure.build(pos, h, mass, cfg)
        assert int(st.p2p_overflow) == 0 and int(st.m2p_overflow) == 0
        assert int(st.blk_overflow) == 0
        bf = structure.forces(pos, h, mass, cfg, st)
        assert int(jnp.sum(bf.n_approx)) > 0      # far field in use
        p1 = dense.pass1(pos, h, mass, _dense_cfg(cfg))
        d2 = jnp.sum((bf.grad_phi - p1.grad_phi) ** 2, axis=-1)
        scale = jnp.max(jnp.abs(p1.grad_phi))
        err_max = float(jnp.sqrt(jnp.max(d2)) / scale)
        err_rms = float(jnp.sqrt(jnp.mean(d2)
                                 / jnp.mean(jnp.sum(p1.grad_phi ** 2, -1))))
        return err_max, err_rms

    qmax, qrms = run(order=2, sg=4)
    assert qmax < 0.05, qmax
    assert qrms < 0.005, qrms
    # quadrupoles must genuinely beat monopoles at equal theta here
    _, mrms = run(order=1, sg=4)
    assert qrms < 0.5 * mrms, (qrms, mrms)


def test_coincident_particles_finite():
    """Distinct particles at IDENTICAL positions: r=0 pairs must produce
    finite density/forces (softened gravity, W(0) self-like kernel terms)
    and still match the dense oracle, which shares the same math."""
    cfg = _cfg(theta=1e-6, p2p_window=256, softening_mode="symmetric_max")
    pos, h, mass = _two_clusters(cfg.n, seed=9)
    # pin 8 pairs to exactly coincident coordinates
    pos = pos.at[1:16:2].set(pos[0:16:2])
    st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st)
    for f in (bf.rho, bf.grad_p, bf.phi, bf.grad_phi):
        assert bool(jnp.all(jnp.isfinite(f)))
    _check_sph(bf, pos, h, mass, cfg)


def test_extreme_h_contrast():
    """50x smoothing-length contrast: the block adjacency cutoff uses
    max(h) per sub-block, so giant-h particles must not cause dropped
    interactions (conservative windows) nor wrong sums."""
    cfg = _cfg(theta=1e-6, nbr_window=192, p2p_window=256,
               softening_mode="symmetric_max")
    pos, h, mass = _two_clusters(cfg.n, seed=11, sep=30.0)
    k = jax.random.PRNGKey(13)
    h = jnp.where(jax.random.uniform(k, h.shape) < 0.02, h * 50.0, h)
    st = structure.build(pos, h, mass, cfg)
    assert int(st.sph_overflow) == 0 and int(st.p2p_overflow) == 0
    bf = structure.forces(pos, h, mass, cfg, st)
    _check_sph(bf, pos, h, mass, cfg)

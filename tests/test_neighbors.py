"""Grid (Morton-group) neighbor path vs the exact dense path.

The reference's validation pattern: broadphase/BVH results cross-checked
against brute force (``BroadphaseTests.cs``, BVH overlap tests). Here the
grid pass must reproduce the dense pass bit-for-bit up to summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense, eos as eos_ops, neighbors
from planetmodel_sph_tpu.utils import diagnostics


def cfgs(n=700, **kw):
    base = dict(n=n, radius=12.0, particle_radius=2.4, gravity_solver="none",
                block_n=512)
    base.update(kw)
    dense_cfg = psph.default(neighbor_mode="dense", **base)
    grid_cfg = psph.default(neighbor_mode="grid", **base)
    return dense_cfg, grid_cfg


@pytest.mark.parametrize("mode", ["reference_asymmetric", "symmetric"])
def test_grid_matches_dense(mode):
    dense_cfg, grid_cfg = cfgs(grad_p_mode=mode)
    st = ics.jupiter(dense_cfg)
    p1d = dense.pass1(st.pos, st.h, st.mass, dense_cfg)
    prs = eos_ops.pressure(p1d.rho, dense_cfg.eos_k, dense_cfg.eos_gamma)
    gpd = dense.pass2(st.pos, st.h, st.mass, p1d.rho, prs, dense_cfg)

    p1g, grad_fn = neighbors.make_passes(st.pos, st.h, st.mass, grid_cfg)
    np.testing.assert_allclose(np.asarray(p1g.rho), np.asarray(p1d.rho),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1g.n_neighbors),
                                  np.asarray(p1d.n_neighbors))
    gpg = grad_fn(p1g.rho, prs, grid_cfg)
    np.testing.assert_allclose(np.asarray(gpg), np.asarray(gpd),
                               rtol=1e-3, atol=1e-6)


def test_grid_overflow_counted():
    _, grid_cfg = cfgs()
    st = ics.jupiter(grid_cfg)
    lists = neighbors.build(st.pos, st.h, grid_cfg)
    assert int(lists.overflow) == 0
    # pathologically tiny window must overflow loudly, not silently
    tiny = grid_cfg.replace(nbr_window=1)
    lists2 = neighbors.build(st.pos, st.h, tiny)
    assert int(lists2.overflow) > 0


def test_grid_nonmultiple_group_size():
    dense_cfg, grid_cfg = cfgs(n=701)  # not a multiple of 32
    st = ics.jupiter(dense_cfg)
    p1d = dense.pass1(st.pos, st.h, st.mass, dense_cfg)
    p1g, _ = neighbors.make_passes(st.pos, st.h, st.mass, grid_cfg)
    np.testing.assert_allclose(np.asarray(p1g.rho), np.asarray(p1d.rho),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1g.n_neighbors),
                                  np.asarray(p1d.n_neighbors))


def test_grid_rejects_direct_gravity():
    _, grid_cfg = cfgs(gravity_solver="direct")
    st = ics.jupiter(grid_cfg)
    with pytest.raises(ValueError):
        neighbors.make_passes(st.pos, st.h, st.mass, grid_cfg)


def test_full_step_grid_plus_tree_matches_dense_plus_direct():
    # end-to-end: one step of the production 100k-style pipeline vs the
    # exact small-N pipeline
    base = dict(n=600, radius=12.0, particle_radius=2.4, adaptive_h=True)
    exact = psph.default(neighbor_mode="dense", gravity_solver="direct",
                         **base)
    prod = psph.default(neighbor_mode="grid", gravity_solver="tree", **base)
    st = ics.jupiter(exact)
    a = planet.step(planet.prime(st, exact), exact)
    b = planet.step(planet.prime(st, prod), prod)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=1e-4)
    # positions after one step differ only through the tree's MAC error
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-3, atol=2e-3)
    d = diagnostics.measure(b, prod)
    assert np.isfinite(float(d["total_energy"]))

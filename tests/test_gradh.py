"""Grad-h SPH formulation: density/Omega correctness and the payoff —
energy conservation WITH adaptive smoothing lengths (Newton h-solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import dense, kernels
from planetmodel_sph_tpu.utils import diagnostics


def base_cfg(**kw):
    d = dict(n=256, radius=12.0, particle_radius=4.0, total_mass=100.0,
             eos_k=50.0, gravity_solver="direct", neighbor_mode="dense",
             block_n=256, softening_mode="symmetric_max",
             integrator="leapfrog_kdk")
    d.update(kw)
    return psph.default(**d)


def test_dw_dh_matches_autodiff():
    r = jnp.linspace(0.05, 2.4, 64)
    h0 = 1.3
    auto = jax.vmap(jax.grad(lambda hh, rr: kernels.w(rr, hh),
                             argnums=0), in_axes=(None, 0))(h0, r)
    manual = kernels.dw_dh(r, h0)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual),
                               rtol=1e-4, atol=1e-6)


def test_density_gradh_vs_naive():
    cfg = base_cfg(n=64, block_n=48)
    st = ics.jupiter(cfg)
    rho, omega, nn = dense.density_gradh(st.pos, st.h, st.mass, cfg)
    pos = np.asarray(st.pos); h = np.asarray(st.h); m = np.asarray(st.mass)
    n = len(pos)
    rho_n = np.zeros(n); xi_n = np.zeros(n)
    for i in range(n):
        rho_n[i] = m[i] * float(kernels.w0(h[i]))
        xi_n[i] = -3 * m[i] * float(kernels.w0(h[i])) / h[i]
        for j in range(n):
            if i == j:
                continue
            r = np.linalg.norm(pos[i] - pos[j])
            rho_n[i] += m[j] * float(kernels.w(r, h[i]))
            xi_n[i] += m[j] * float(kernels.dw_dh(r, h[i]))
    om_n = 1 + h * xi_n / (3 * rho_n)
    np.testing.assert_allclose(np.asarray(rho), rho_n, rtol=1e-5)
    # omega can sit near 0 in this deliberately under-resolved case, so
    # compare with an absolute floor as well
    np.testing.assert_allclose(np.asarray(omega), om_n, rtol=1e-3,
                               atol=1e-5)


def test_gradh_force_momentum_conserving():
    cfg = base_cfg(grad_p_mode="grad_h", gravity_solver="none")
    st = ics.jupiter(cfg)
    f = planet.compute_forces(st.pos, st.h, st.mass, cfg)
    force = st.mass[:, None] * f.accel
    total = np.asarray(jnp.sum(force, axis=0))
    scale = float(jnp.sum(jnp.abs(force))) + 1e-12
    np.testing.assert_allclose(total, 0.0, atol=1e-5 * scale)


def test_newton_h_hits_target_neighbors():
    cfg = base_cfg(grad_p_mode="grad_h", h_mode="newton",
                   h_newton_iters=6, target_neighbors=32.0)
    st = ics.jupiter(cfg)
    f = planet.compute_forces(st.pos, st.h, st.mass, cfg)
    nn = np.asarray(f.n_neighbors)
    # h = eta (m/rho)^(1/3) is a convention, not an exact count constraint:
    # kernel weighting makes the realized count sit below the geometric
    # estimate; within a factor ~2 of target with a tight spread is the
    # expected behavior (the IC's h jitter gives counts spanning ~8x)
    assert 12 < np.median(nn) < 50
    st_nn = np.asarray(planet.prime(st, cfg.replace(
        grad_p_mode="symmetric", h_mode="relax")).n_neighbors)
    assert nn.std() / max(nn.mean(), 1) < st_nn.std() / max(st_nn.mean(), 1)
    assert bool(jnp.all(f.h > 0))


def test_gradh_newton_energy_conservation_beats_relax():
    """The whole point: adaptive h WITH grad-h terms conserves energy much
    better than the relaxation scheme without them."""
    relax = base_cfg(grad_p_mode="symmetric", h_mode="relax",
                     adaptive_h=True)
    gradh = base_cfg(grad_p_mode="grad_h", h_mode="newton",
                     adaptive_h=True, h_newton_iters=4)
    st = ics.jupiter(relax)

    def drift(cfg):
        s = planet.prime(st, cfg)
        _, d = planet.run_with_diagnostics(s, cfg, n_chunks=10, chunk=30)
        e = np.asarray(d["total_energy"])
        return np.abs(e - e[0]).max() / abs(e[0])

    d_relax = drift(relax)
    d_gradh = drift(gradh)
    assert np.isfinite(d_gradh)
    assert d_gradh < d_relax, (
        f"grad-h drift {d_gradh:.2e} not better than relax {d_relax:.2e}")
    assert d_gradh < 0.02


def test_gradh_grid_matches_dense():
    dense_cfg = base_cfg(grad_p_mode="grad_h", gravity_solver="none",
                         h_mode="relax")
    grid_cfg = base_cfg(grad_p_mode="grad_h", gravity_solver="none",
                        h_mode="relax", neighbor_mode="grid")
    st = ics.jupiter(dense_cfg)
    a = planet.compute_forces(st.pos, st.h, st.mass, dense_cfg)
    b = planet.compute_forces(st.pos, st.h, st.mass, grid_cfg)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.n_neighbors),
                                  np.asarray(a.n_neighbors))
    np.testing.assert_allclose(np.asarray(b.grad_p), np.asarray(a.grad_p),
                               rtol=1e-3, atol=1e-5)


def test_gradh_grid_newton_close_to_dense():
    """Grid + Newton-h now runs on the block pipeline (bounded solve).

    The per-call clamp means a cold start converges over several solves
    (one per rebuild in production); starting FROM the dense Newton solution
    the block solve must recognize the same fixed point."""
    dense_cfg = base_cfg(grad_p_mode="grad_h", gravity_solver="none",
                         h_mode="newton")
    grid_cfg = dense_cfg.replace(neighbor_mode="grid")
    st = ics.jupiter(dense_cfg)
    # converge the dense fixed point (3 iters/call are not enough from the
    # jittered IC h)
    h = st.h
    for _ in range(5):
        h = planet.compute_forces(st.pos, h, st.mass, dense_cfg).h
    a = planet.compute_forces(st.pos, h, st.mass, dense_cfg)
    b = planet.compute_forces(st.pos, a.h, st.mass, grid_cfg)
    for leaf in [b.rho, b.grad_p, b.h]:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    np.testing.assert_allclose(np.asarray(b.h), np.asarray(a.h), rtol=0.02)
    # and a cold start must strictly approach the fixed point
    c = planet.compute_forces(st.pos, st.h, st.mass, grid_cfg)
    err0 = np.abs(np.asarray(st.h) / np.asarray(a.h) - 1.0)
    err1 = np.abs(np.asarray(c.h) / np.asarray(a.h) - 1.0)
    assert np.median(err1) < 0.5 * np.median(err0)


def test_gradh_grid_cached_runs():
    cfg = base_cfg(grad_p_mode="grad_h", neighbor_mode="grid",
                   gravity_solver="tree", h_mode="relax", rebuild_every=4)
    st = ics.jupiter(cfg)
    out = planet.run(st, cfg, 8)
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf)))

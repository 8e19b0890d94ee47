"""Cross-check the blocked all-pairs passes against a naive numpy double loop.

This is the reference's own validation pattern (BVH overlap results checked
against brute force, ``BoundingVolumeHierarchyBuilderTests.cs:330-331``)
applied to our dense pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.ops import dense, eos as eos_ops


def _naive(pos, h, mass, cfg):
    """Straight transliteration of the reference's per-pair math in numpy."""
    n = len(pos)
    pos, h, mass = map(np.asarray, (pos, h, mass))
    rho = mass / (np.pi * h**3)
    nn = np.zeros(n, np.int32)
    phi = np.zeros(n)
    gphi = np.zeros((n, 3))

    def w(r, hh):
        q = r / hh
        if q < 1:
            return (1 - 1.5 * q**2 + 0.75 * q**3) / (np.pi * hh**3)
        if q < 2:
            return 0.25 * (2 - q) ** 3 / (np.pi * hh**3)
        return 0.0

    def dw(r, hh):
        q = r / hh
        if q < 1:
            return (-3 * q + 2.25 * q**2) / (np.pi * hh**4)
        if q < 2:
            return -0.75 * (2 - q) ** 2 / (np.pi * hh**4)
        return 0.0

    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            r = np.linalg.norm(d)
            rho[i] += mass[j] * 0.5 * (w(r, h[i]) + w(r, h[j]))
            if w(r, h[i]) > 0:
                nn[i] += 1
            a = max(h[i], h[j]) if cfg.softening_mode == "symmetric_max" else h[i]
            if r < a:
                x = r / a
                mag = (mass[j] / a**3) * (8 - 9 * x + 2 * x**3)
                phi[i] += -(mass[j] / a) * (2.4 - 4 * x**2 + 3 * x**3 - 0.4 * x**5)
            else:
                mag = mass[j] / r**3
                phi[i] += -mass[j] / r
            gphi[i] += d * mag

    prs = np.asarray(eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma))
    gp = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            r = np.linalg.norm(d)
            gsym = d * 0.5 * ((dw(r, h[i]) + dw(r, h[j])) / r if r > 0 else 0.0)
            if cfg.grad_p_mode == "reference_asymmetric":
                gp[i] += gsym * mass[j] * prs[j] / rho[j]
            else:
                gp[i] += gsym * mass[j] * rho[i] * (
                    prs[i] / rho[i] ** 2 + prs[j] / rho[j] ** 2)
    return rho, nn, phi, gphi, gp


@pytest.mark.parametrize("mode", ["reference_asymmetric", "symmetric"])
@pytest.mark.parametrize("softening", ["receiver_h", "symmetric_max"])
def test_dense_vs_naive(mode, softening):
    cfg = psph.default(n=64, block_n=48, grad_p_mode=mode,
                       softening_mode=softening, gravity_solver="direct")
    key = jax.random.PRNGKey(3)
    pos = jax.random.uniform(key, (cfg.n, 3), minval=-4.0, maxval=4.0)
    h = jax.random.uniform(jax.random.PRNGKey(4), (cfg.n,), minval=0.8, maxval=1.6)
    mass = jnp.full((cfg.n,), 0.5)

    p1 = dense.pass1(pos, h, mass, cfg)
    prs = eos_ops.pressure(p1.rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2(pos, h, mass, p1.rho, prs, cfg)

    rho_n, nn_n, phi_n, gphi_n, gp_n = _naive(pos, h, mass, cfg)
    np.testing.assert_allclose(np.asarray(p1.rho), rho_n, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(p1.n_neighbors), nn_n)
    np.testing.assert_allclose(np.asarray(p1.phi), phi_n, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1.grad_phi), gphi_n,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), gp_n, rtol=1e-3, atol=1e-4)


def test_symmetric_pressure_conserves_momentum():
    cfg = psph.default(n=96, grad_p_mode="symmetric", gravity_solver="none")
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (cfg.n, 3), minval=-3.0, maxval=3.0)
    h = jnp.full((cfg.n,), 1.2)
    mass = jnp.full((cfg.n,), 0.3)
    p1 = dense.pass1(pos, h, mass, cfg)
    prs = eos_ops.pressure(p1.rho, cfg.eos_k, cfg.eos_gamma)
    gp = dense.pass2(pos, h, mass, p1.rho, prs, cfg)
    # sum_i m_i * (-grad P_i / rho_i) == 0 for the symmetric form
    force = -mass[:, None] * gp / p1.rho[:, None]
    total = np.asarray(jnp.sum(force, axis=0))
    scale = float(jnp.sum(jnp.abs(force)))
    np.testing.assert_allclose(total, 0.0, atol=1e-5 * max(scale, 1.0))


def test_symmetric_gravity_conserves_momentum():
    cfg = psph.default(n=96, softening_mode="symmetric_max",
                       gravity_solver="direct")
    key = jax.random.PRNGKey(6)
    pos = jax.random.uniform(key, (cfg.n, 3), minval=-3.0, maxval=3.0)
    h = jax.random.uniform(jax.random.PRNGKey(7), (cfg.n,), minval=0.8, maxval=1.5)
    mass = jnp.full((cfg.n,), 0.3)
    p1 = dense.pass1(pos, h, mass, cfg)
    force = -mass[:, None] * p1.grad_phi
    total = np.asarray(jnp.sum(force, axis=0))
    scale = float(jnp.sum(jnp.abs(force)))
    np.testing.assert_allclose(total, 0.0, atol=1e-5 * max(scale, 1.0))


def test_block_size_invariance():
    cfg_a = psph.default(n=100, block_n=100, gravity_solver="direct")
    cfg_b = cfg_a.replace(block_n=32)   # forces padding + multiple blocks
    key = jax.random.PRNGKey(8)
    pos = jax.random.uniform(key, (100, 3), minval=-3.0, maxval=3.0)
    h = jnp.full((100,), 1.0)
    mass = jnp.full((100,), 0.1)
    a = dense.pass1(pos, h, mass, cfg_a)
    b = dense.pass1(pos, h, mass, cfg_b)
    for xa, xb in zip(a, b):
        # summation order differs between blockings — fp32 tolerance only
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-4, atol=1e-6)

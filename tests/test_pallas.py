"""Fused Pallas pairwise kernels vs the reference dense path.

On CPU these run in interpret mode (same code path the TPU compiles), which
gives the immediate-vs-scheduled dual-execution testing pattern the
reference uses (``ExecuteImpl`` convention, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics
from planetmodel_sph_tpu.ops import dense, eos as eos_ops
from planetmodel_sph_tpu.ops.pallas import pairwise


def small(**kw):
    base = dict(n=200, radius=8.0, particle_radius=2.0,
                gravity_solver="direct", block_n=256)
    base.update(kw)
    return psph.default(**base)


@pytest.mark.parametrize("softening", ["receiver_h", "symmetric_max"])
def test_pass1_matches_dense(softening):
    cfg = small(softening_mode=softening)
    st = ics.jupiter(cfg)
    a = dense.pass1(st.pos, st.h, st.mass, cfg)
    b = pairwise.pass1(st.pos, st.h, st.mass, cfg)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.n_neighbors),
                                  np.asarray(a.n_neighbors))
    np.testing.assert_allclose(np.asarray(b.phi), np.asarray(a.phi), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.grad_phi), np.asarray(a.grad_phi),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.n_direct),
                                  np.asarray(a.n_direct))


@pytest.mark.parametrize("mode", ["reference_asymmetric", "symmetric"])
@pytest.mark.parametrize("bug", [False, True])
def test_pass2_matches_dense(mode, bug):
    cfg = small(grad_p_mode=mode, kernel_deriv_sign_bug=bug)
    st = ics.jupiter(cfg)
    a = dense.pass1(st.pos, st.h, st.mass, cfg)
    prs = eos_ops.pressure(a.rho, cfg.eos_k, cfg.eos_gamma)
    gpa = dense.pass2(st.pos, st.h, st.mass, a.rho, prs, cfg)
    gpb = pairwise.pass2(st.pos, st.h, st.mass, a.rho, prs, cfg)
    np.testing.assert_allclose(np.asarray(gpb), np.asarray(gpa),
                               rtol=1e-3, atol=1e-5)


def test_pass1_no_gravity():
    cfg = small(gravity_solver="none")
    st = ics.jupiter(cfg)
    b = pairwise.pass1(st.pos, st.h, st.mass, cfg)
    assert not np.asarray(b.phi).any()
    assert not np.asarray(b.n_direct).any()
    a = dense.pass1(st.pos, st.h, st.mass, cfg)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=1e-5)


def test_nonmultiple_padding():
    cfg = small(n=137)
    st = ics.jupiter(cfg)
    a = dense.pass1(st.pos, st.h, st.mass, cfg)
    b = pairwise.pass1(st.pos, st.h, st.mass, cfg)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=1e-5)
    assert bool(jnp.all(jnp.isfinite(b.grad_phi)))

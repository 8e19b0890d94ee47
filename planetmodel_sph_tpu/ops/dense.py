"""Exact all-pairs SPH + gravity passes (blocked, memory-bounded).

This is the TPU-native replacement for the reference's whole
broadphase→filter→sort→``CalculateInteractionJob`` pipeline
(``KernelSystem.cs:97-335``) and its two gravity paths
(``GravityFieldSystem.cs``): rather than building explicit per-particle
interaction buffers, each i-block evaluates the kernel against *all* j in a
dense tile and masks pairs outside the support. For N up to ~16k this is both
exact and faster on TPU than any sparse structure, because the work is pure
vectorized VPU math on contiguous tiles with zero gather/scatter.

Memory is bounded by blocking over i with ``jax.lax.map`` (tile shape
``(block, N)``), so the N^2 pair tensor is never materialized at once.

Two passes mirror the reference's data flow:

- pass 1 (``DensityFieldSystem.cs:38-56`` + ``GravityFieldSystem.cs``):
  density (self term + symmetrized-kernel sum), neighbor counts
  (W(r, h_i) > 0, ``ParticleSmoothingSystem.cs:33-43``), and softened direct
  gravity.
- pass 2 (``PressureFieldSystem.cs:44-70``): pressure gradient from the
  symmetrized kernel gradient, in either the reference's asymmetric form or
  the standard momentum-conserving symmetric form.

Both passes support a target/source split (targets = the i rows being
computed, sources = the j set being summed over). With the defaults the two
sets coincide; under `shard_map` data parallelism the targets are the local
shard and the sources are the all-gathered global set, with
``target_offset`` giving the shard's global index offset for self-pair
masking.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import gravity as grav_ops
from . import kernels


class Pass1Out(NamedTuple):
    rho: jax.Array          # [N]   SPH density
    n_neighbors: jax.Array  # [N]   count of j with W(r, h_i) > 0
    phi: jax.Array          # [N]   gravitational potential
    grad_phi: jax.Array     # [N,3] potential gradient (accel = -grad_phi)
    n_direct: jax.Array     # [N]   P2P terms used (diagnostic parity with
                            #       GravityField.numParticles)


def _pad_to(x, n_pad, fill=0.0):
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def _block(x, nb, b):
    return x.reshape((nb, b) + x.shape[1:])


def _prep_targets(pos, h, cfg, target_offset):
    n = pos.shape[0]
    b = min(cfg.block_n, n)
    nb = -(-n // b)
    n_pad = nb * b
    big = jnp.asarray(1e30, pos.dtype)
    pos_t = _pad_to(pos, n_pad, 0.0).at[n:].set(big)
    h_t = _pad_to(h, n_pad, 1.0)
    h_t = jnp.where(h_t > 0, h_t, 1.0)
    gidx = jnp.arange(n_pad, dtype=jnp.int32) + jnp.asarray(target_offset, jnp.int32)
    return n, b, nb, n_pad, pos_t, h_t, gidx


def _prep_sources(src_arrays, dtype):
    pos_s, h_s, mass_s = src_arrays[:3]
    h_s = jnp.where(h_s > 0, h_s, 1.0)
    return (pos_s, h_s, mass_s) + tuple(src_arrays[3:])


def pass1(
    pos, h, mass, cfg: SimConfig,
    src: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    target_offset: int = 0,
) -> Pass1Out:
    """Density + neighbor count + direct gravity in one fused sweep.

    Args:
      pos/h/mass: target particles ([N,3], [N], [N]).
      src: optional (pos_src, h_src, mass_src) source set; sources with
        mass 0 are inert (used for padding). Defaults to the targets.
      target_offset: global index of targets[0] within the source ordering
        (for self-pair masking under sharding).
    """
    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg, target_offset)
    if src is None:
        src = (pos, h, mass)
    pos_s, h_s, mass_s = _prep_sources(src, pos.dtype)
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0
    mass_t = _pad_to(mass, n_pad, 0.0)

    do_gravity = cfg.gravity_solver == "direct"

    def body(args):
        pos_i, h_i, idx_i, m_i = args               # [b,3], [b], [b], [b]
        dx = pos_i[:, None, :] - pos_s[None, :, :]  # [b,S,3]
        r2 = jnp.sum(dx * dx, axis=-1)
        r = jnp.sqrt(r2)
        pair_mask = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]

        w_i = kernels.w(r, h_i[:, None])
        w_j = kernels.w(r, h_s[None, :])
        w_sym = 0.5 * (w_i + w_j)

        m_eff = jnp.where(pair_mask, mass_s[None, :], 0.0)
        rho = m_i * kernels.w0(h_i) + jnp.sum(m_eff * w_sym, axis=-1)
        nn = jnp.sum((w_i > 0.0) & pair_mask, axis=-1).astype(jnp.int32)

        if do_gravity:
            if cfg.softening_mode == "receiver_h":
                a = jnp.broadcast_to(h_i[:, None], r.shape)
            else:
                a = jnp.maximum(h_i[:, None], h_s[None, :])
            gp, phi = grav_ops.dyer_ip(dx, r, m_eff, a, cfg.g_const)
            phi_i = jnp.sum(phi, axis=-1)
            grad_phi_i = jnp.sum(gp, axis=-2)
            n_direct = jnp.sum(pair_mask, axis=-1).astype(jnp.int32)
        else:
            phi_i = jnp.zeros_like(rho)
            grad_phi_i = jnp.zeros_like(pos_i)
            n_direct = jnp.zeros_like(nn)
        return rho, nn, phi_i, grad_phi_i, n_direct

    out = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(h_t, nb, b), _block(gidx, nb, b),
         _block(mass_t, nb, b)),
    )
    rho, nn, phi, grad_phi, n_direct = jax.tree.map(
        lambda x: x.reshape((n_pad,) + x.shape[2:])[:n], out
    )
    return Pass1Out(rho, nn, phi, grad_phi, n_direct)


def pass2(
    pos, h, mass, rho, pressure, cfg: SimConfig,
    src: Optional[Tuple[jax.Array, ...]] = None,
    target_offset: int = 0,
) -> jax.Array:
    """Pressure gradient grad P_i, shape [N,3].

    'reference_asymmetric' (``PressureFieldSystem.cs:44-70``):
        grad P_i = sum_j (m_j / rho_j) P_j gradW_sym   (no self term)
    'symmetric' (standard SPH momentum equation, exposed as an effective
    gradient so VelocitySystem's dv/dt = -grad P / rho stays unchanged):
        grad P_i = rho_i * sum_j m_j (P_i/rho_i^2 + P_j/rho_j^2) gradW_sym

    `src`, if given, is (pos_src, h_src, mass_src, rho_src, prs_src).
    """
    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg, target_offset)
    if src is None:
        src = (pos, h, mass, rho, pressure)
    pos_s, h_s, mass_s, rho_s, prs_s = _prep_sources(src, pos.dtype)
    rho_s = jnp.where(rho_s > 0, rho_s, 1.0)
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0

    rho_t = _pad_to(rho, n_pad, 1.0)
    rho_t = jnp.where(rho_t > 0, rho_t, 1.0)
    prs_t = _pad_to(pressure, n_pad, 0.0)

    sign_bug = cfg.kernel_deriv_sign_bug

    def body(args):
        pos_i, h_i, idx_i, rho_i, prs_i = args
        dx = pos_i[:, None, :] - pos_s[None, :, :]
        r2 = jnp.sum(dx * dx, axis=-1)
        r = jnp.sqrt(r2)
        pair_mask = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]

        gw_i = kernels.dw_dr_over_r(r, h_i[:, None], sign_bug)
        gw_j = kernels.dw_dr_over_r(r, h_s[None, :], sign_bug)
        gsym = 0.5 * (gw_i + gw_j)                    # [b,S] radial factor

        m_eff = jnp.where(pair_mask, mass_s[None, :], 0.0)
        if cfg.grad_p_mode == "reference_asymmetric":
            coef = m_eff * (prs_s / rho_s)[None, :]
        else:
            coef = m_eff * (
                (prs_i / (rho_i * rho_i))[:, None]
                + (prs_s / (rho_s * rho_s))[None, :]
            ) * rho_i[:, None]
        return jnp.sum(dx * (gsym * coef)[..., None], axis=-2)

    out = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(h_t, nb, b), _block(gidx, nb, b),
         _block(rho_t, nb, b), _block(prs_t, nb, b)),
    )
    return out.reshape((n_pad, 3))[:n]

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


def _prep_sources(src_arrays):
    pos_s, h_s, mass_s = src_arrays[:3]
    h_s = jnp.where(h_s > 0, h_s, 1.0)
    return (pos_s, h_s, mass_s) + tuple(src_arrays[3:])


def pass1(
    pos, h, mass, cfg: SimConfig,
    src: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    target_offset: int = 0,
    sph: bool = True,
) -> Pass1Out:
    """Density + neighbor count + direct gravity in one fused sweep.

    Args:
      pos/h/mass: target particles ([N,3], [N], [N]).
      src: optional (pos_src, h_src, mass_src) source set; sources with
        mass 0 are inert (used for padding). Defaults to the targets.
      target_offset: global index of targets[0] within the source ordering
        (for self-pair masking under sharding).
      sph: False skips the kernel math (gravity-only sweep — rho and
        n_neighbors come back zero); used when the density is computed by
        another formulation (grad-h) and only the potential sums are needed.
    """
    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg, target_offset)
    if src is None:
        src = (pos, h, mass)
    pos_s, h_s, mass_s = _prep_sources(src)
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

        m_eff = jnp.where(pair_mask, mass_s[None, :], 0.0)
        if sph:
            w_i = kernels.w(r, h_i[:, None])
            w_j = kernels.w(r, h_s[None, :])
            w_sym = 0.5 * (w_i + w_j)
            rho = m_i * kernels.w0(h_i) + jnp.sum(m_eff * w_sym, axis=-1)
            nn = jnp.sum((w_i > 0.0) & pair_mask, axis=-1).astype(jnp.int32)
        else:
            rho = jnp.zeros_like(h_i)
            nn = jnp.zeros_like(idx_i)

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


def density_gradh(pos, h, mass, cfg: SimConfig, src=None, target_offset=0):
    """Gather-form density + grad-h correction factor (blocked all-pairs).

    The grad-h SPH formulation (Springel & Hernquist 2002) uses the
    single-h density  rho_i = sum_j m_j W(r_ij, h_i)  (self term included)
    and the correction factor
        Omega_i = 1 + (h_i / (3 rho_i)) * sum_j m_j dW/dh(r_ij, h_i),
    which makes the pairwise pressure force exactly energy-consistent with
    adaptive smoothing lengths. Returns (rho, omega, n_neighbors).

    `src`: optional (pos_src, h_src, mass_src) global source set (dp mode;
    `target_offset` places the targets inside the source index space).
    """
    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg,
                                                      target_offset)
    if src is None:
        src = (pos, h, mass)
    pos_s, h_s, mass_s = _prep_sources(src)
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0
    mass_t = _pad_to(mass, n_pad, 0.0)

    def body(args):
        pos_i, h_i, idx_i, m_i = args
        dx = pos_i[:, None, :] - pos_s[None, :, :]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        pair = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]
        m_eff = jnp.where(pair, mass_s[None, :], 0.0)
        w_i = kernels.w(r, h_i[:, None])
        rho = m_i * kernels.w0(h_i) + jnp.sum(m_eff * w_i, axis=-1)
        # self term of dW/dh: dW/dh(0,h) = -3 W(0,h)/h
        xi = (-3.0 * m_i * kernels.w0(h_i) / h_i
              + jnp.sum(m_eff * kernels.dw_dh(r, h_i[:, None]), axis=-1))
        omega = 1.0 + h_i * xi / (3.0 * rho)
        nn = jnp.sum((w_i > 0.0) & pair, axis=-1).astype(jnp.int32)
        return rho, omega, nn

    out = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(h_t, nb, b), _block(gidx, nb, b),
         _block(mass_t, nb, b)),
    )
    rho, omega, nn = jax.tree.map(lambda x: x.reshape((n_pad,))[:n], out)
    return rho, omega, nn


def pass2_gradh(pos, h, mass, rho, omega, pressure, cfg: SimConfig,
                src=None, target_offset=0, energy: bool = False,
                vel=None, vel_src=None):
    """Grad-h symmetric pressure force, returned as an effective gradient.

    a_i = -sum_j m_j [ P_i/(Omega_i rho_i^2) gradW_i(h_i)
                     + P_j/(Omega_j rho_j^2) gradW_i(h_j) ]
    exposed as gradP_i = -rho_i * a_i so dv/dt = -gradP/rho is unchanged.

    `src`: optional (pos_src, h_src, mass_src, coef_src) where coef_src is
    the precomputed P/(Omega rho^2) of the global source set (dp mode).

    `energy=True` (cfg.eos_mode='adiabatic') returns (grad_p, du_dt) with
    the Springel & Hernquist (2002) conjugate energy equation accumulated
    in the same sweep:
        du_i/dt = P_i/(Omega_i rho_i^2) sum_j m_j v_ij . gradW(r, h_i)
    (AV heating is handled by viscosity_accel's own energy term on this
    pipeline). Requires `vel` (+ `vel_src` under dp).
    """
    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg,
                                                      target_offset)
    if energy and vel is None:
        raise ValueError("the energy equation needs velocities; pass vel=")
    # robustness floor: at very low neighbor counts the discrete Omega can
    # approach 0 (the density becomes locally non-monotone in h) and the
    # 1/Omega force would blow up; clamping keeps the pairwise terms
    # antisymmetric, so momentum conservation is unaffected
    om = jnp.maximum(omega, 0.1)
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    coef = pressure / (om * rho_safe * rho_safe)
    if src is None:
        src = (pos, h, mass, coef)
    pos_s, h_s, mass_s = _prep_sources(src[:3])
    coef_s = src[3]
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0

    rho_t = jnp.where(_pad_to(rho, n_pad, 1.0) > 0,
                      _pad_to(rho, n_pad, 1.0), 1.0)
    coef_t = _pad_to(coef, n_pad, 0.0)
    sign_bug = cfg.kernel_deriv_sign_bug
    if energy:
        vel_s = vel if src is None or vel_src is None else vel_src
        vel_t = _pad_to(vel, n_pad, 0.0)
    else:
        vel_s = None
        vel_t = jnp.zeros((n_pad, 3), pos.dtype)

    def body(args):
        pos_i, h_i, idx_i, rho_i, coef_i, vel_i = args
        dx = pos_i[:, None, :] - pos_s[None, :, :]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        pair = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]
        m_eff = jnp.where(pair, mass_s[None, :], 0.0)
        gw_i = kernels.dw_dr_over_r(r, h_i[:, None], sign_bug)
        gw_j = kernels.dw_dr_over_r(r, h_s[None, :], sign_bug)
        radial = m_eff * (coef_i[:, None] * gw_i + coef_s[None, :] * gw_j)
        accel = -jnp.sum(dx * radial[..., None], axis=-2)
        if energy:
            dv = vel_i[:, None, :] - vel_s[None, :, :]
            vdotr = jnp.sum(dv * dx, axis=-1)
            du = coef_i * jnp.sum(m_eff * gw_i * vdotr, axis=-1)
        else:
            du = jnp.zeros_like(rho_i)
        return -rho_i[:, None] * accel, du        # effective grad P

    out, du = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(h_t, nb, b), _block(gidx, nb, b),
         _block(rho_t, nb, b), _block(coef_t, nb, b), _block(vel_t, nb, b)),
    )
    grad_p = out.reshape((n_pad, 3))[:n]
    if energy:
        return grad_p, du.reshape((n_pad,))[:n]
    return grad_p


def balsara_factor(dc, cs, rho, h):
    """Balsara (1995) AV limiter f = |div v| / (|div v| + |curl v| +
    1e-4 c/h) from the RAW pass-2 sums dc[N,4] (rho*div, rho*curl up to
    sign — the shared 1/rho cancels between numerator and denominator,
    so the eps term carries the rho instead)."""
    d = jnp.abs(dc[:, 0])
    c = jnp.sqrt(jnp.sum(dc[:, 1:] * dc[:, 1:], axis=-1))
    eps = 1e-4 * cs * jnp.maximum(rho, 1e-30) / jnp.maximum(h, 1e-30)
    return d / (d + c + eps + 1e-30)


def viscosity_accel(pos, vel, h, mass, rho, cfg: SimConfig,
                    src=None, target_offset=0, energy: bool = False,
                    u=None, u_src=None, matid=None, matid_src=None,
                    fbal=None, fbal_src=None):
    """Monaghan (1992) artificial-viscosity acceleration (blocked all-pairs).

    Pi_ij = (-alpha cbar mu + beta mu^2)/rhobar for approaching pairs,
    mu = hbar (v_ij . x_ij) / (r^2 + 0.01 hbar^2);  a_i -= sum m_j Pi grad W_sym.

    New capability beyond the reference (it handles no shocks); with the
    barotropic EOS there is no thermal feedback, so AV acts as a bounded
    momentum-conserving dissipation channel (flag-gated, av_alpha=0 off).
    The hot paths fuse this term into pass 2; this standalone sweep serves
    the dense grad-h pipeline and the tests' oracle.

    `src`: optional (pos, vel, h, mass, rho) global source set (dp mode).
    `energy=True` (cfg.eos_mode='adiabatic') returns (accel, du_dt) with
    the conjugate shock-heating rate du_i/dt = 1/2 sum_j m_j Pi_ij
    v_ij.gradW_sym accumulated in the same sweep; `u`/`u_src` then feed
    the adiabatic sound speed in Pi_ij.

    `cfg.av_balsara`: Pi_ij is limited by 0.5 (f_i + f_j) from the lagged
    factors `fbal`/`fbal_src` (default 1), and the raw div/curl sums
    dc[N,4] are appended to the return (see pass2's docstring).
    """
    from . import eos as eos_ops

    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg,
                                                      target_offset)
    balsara = cfg.av_balsara
    if src is None:
        src = (pos, vel, h, mass, rho)
        u_src = u
        matid_src = matid
        fbal_src = fbal
    pos_s, vel_s, h_s, mass_s, rho_s = src
    h_s = jnp.where(h_s > 0, h_s, 1.0)
    rho_s = jnp.where(rho_s > 0, rho_s, 1.0)
    cs_s = eos_ops.sound_speed_cfg(rho_s, cfg, u=u_src, matid=matid_src)
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0

    vel_t = _pad_to(vel, n_pad, 0.0)
    rho_t = jnp.where(_pad_to(rho, n_pad, 1.0) > 0,
                      _pad_to(rho, n_pad, 1.0), 1.0)
    cs_t = eos_ops.sound_speed_cfg(
        rho_t, cfg, u=_pad_to(u, n_pad, 0.0) if u is not None else None,
        matid=_pad_to(matid, n_pad, 0) if matid is not None else None)
    # AV is a beyond-reference capability: always use the CORRECT kernel
    # derivative. With the parity sign bug the q<1 gradient flips and AV
    # would accelerate approaching pairs (inject energy) instead of
    # dissipating.
    sign_bug = False
    if balsara:
        fb_t = _pad_to(fbal if fbal is not None
                       else jnp.ones_like(rho), n_pad, 1.0)
        fb_s = fbal_src if fbal_src is not None else jnp.ones_like(rho_s)
    else:
        fb_t = jnp.ones((n_pad,), pos.dtype)
        fb_s = None

    def body(args):
        pos_i, vel_i, h_i, idx_i, rho_i, cs_i, fb_i = args
        dx = pos_i[:, None, :] - pos_s[None, :, :]
        dv = vel_i[:, None, :] - vel_s[None, :, :]
        r2 = jnp.sum(dx * dx, axis=-1)
        vdotr = jnp.sum(dv * dx, axis=-1)
        pair = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]
        approaching = pair & (vdotr < 0.0)
        hbar = 0.5 * (h_i[:, None] + h_s[None, :])
        mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
        cbar = 0.5 * (cs_i[:, None] + cs_s[None, :])
        rhobar = 0.5 * (rho_i[:, None] + rho_s[None, :])
        pi_ij = jnp.where(
            approaching,
            (-cfg.av_alpha * cbar * mu + cfg.av_beta * mu * mu) / rhobar,
            0.0)
        if balsara:
            pi_ij = pi_ij * (0.5 * (fb_i[:, None] + fb_s[None, :]))
        r = jnp.sqrt(r2)
        gsym = 0.5 * (kernels.dw_dr_over_r(r, h_i[:, None], sign_bug)
                      + kernels.dw_dr_over_r(r, h_s[None, :], sign_bug))
        m_eff = jnp.where(pair, mass_s[None, :], 0.0)
        acc = -jnp.sum(dx * (m_eff * pi_ij * gsym)[..., None], axis=-2)
        if balsara:
            g_dc = m_eff * gsym
            div_sum = jnp.sum(g_dc * vdotr, axis=-1)
            curl_sum = jnp.sum(jnp.cross(dv, dx) * g_dc[..., None], axis=-2)
            dc = jnp.concatenate([div_sum[:, None], curl_sum], axis=-1)
        else:
            dc = jnp.zeros((acc.shape[0], 4), acc.dtype)
        if energy:
            du = 0.5 * jnp.sum(m_eff * pi_ij * gsym * vdotr, axis=-1)
        else:
            du = jnp.zeros_like(rho_i)
        return acc, du, dc

    out, du, dc = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(vel_t, nb, b), _block(h_t, nb, b),
         _block(gidx, nb, b), _block(rho_t, nb, b), _block(cs_t, nb, b),
         _block(fb_t, nb, b)),
    )
    accel = out.reshape((n_pad, 3))[:n]
    ret = (accel,)
    if energy:
        ret += (du.reshape((n_pad,))[:n],)
    if balsara:
        ret += (dc.reshape((n_pad, 4))[:n],)
    return ret if len(ret) > 1 else accel


def pass2(
    pos, h, mass, rho, pressure, cfg: SimConfig,
    src: Optional[Tuple[jax.Array, ...]] = None,
    target_offset: int = 0,
    vel: Optional[jax.Array] = None,
    energy: bool = False,
    u: Optional[jax.Array] = None,
    u_src: Optional[jax.Array] = None,
    matid: Optional[jax.Array] = None,
    matid_src: Optional[jax.Array] = None,
    fbal: Optional[jax.Array] = None,
    fbal_src: Optional[jax.Array] = None,
):
    """Pressure gradient grad P_i, shape [N,3].

    'reference_asymmetric' (``PressureFieldSystem.cs:44-70``):
        grad P_i = sum_j (m_j / rho_j) P_j gradW_sym   (no self term)
    'symmetric' (standard SPH momentum equation, exposed as an effective
    gradient so VelocitySystem's dv/dt = -grad P / rho stays unchanged):
        grad P_i = rho_i * sum_j m_j (P_i/rho_i^2 + P_j/rho_j^2) gradW_sym

    `src`, if given, is (pos_src, h_src, mass_src, rho_src, prs_src
    [, vel_src]). `vel` (with cfg.av_alpha > 0) fuses the Monaghan AV term
    into the same sweep as an effective-gradient contribution (-rho_i a_AV),
    instead of paying a second all-pairs sweep.

    `energy=True` (cfg.eos_mode='adiabatic') additionally accumulates the
    conjugate specific-internal-energy rate in the SAME sweep and returns
    (grad_p, du_dt):
        du_i/dt = 1/2 sum_j m_j (P_i/rho_i^2 + P_j/rho_j^2) v_ij.gradW_sym
                + 1/2 sum_j m_j Pi_ij v_ij.gradW_sym      (AV heating)
    — the pairwise-antisymmetric partner of the symmetric momentum
    equation, so KE + E_int is conserved pair-by-pair (Monaghan 1992).
    Requires `vel` (and vel_src in `src`); `u`/`u_src` feed the adiabatic
    sound speed of the AV term.

    `cfg.av_balsara` (with AV active): Pi_ij is limited by
    0.5 (f_i + f_j) with f the PREVIOUS step's Balsara factor
    (`fbal`/`fbal_src`, default 1), and the sweep additionally
    accumulates the raw div/curl sums dc[N,4] = (sum m_j v_ij.x_ij g,
    sum m_j (v_ij x x_ij) g) — rho_i * (div v_i, -curl v_i) up to sign —
    returned LAST for the caller to turn into the next factor
    (models.planet.balsara_factor; the shared 1/rho_i cancels there).
    """
    from . import eos as eos_ops

    n, b, nb, n_pad, pos_t, h_t, gidx = _prep_targets(pos, h, cfg, target_offset)
    av = cfg.av_alpha > 0.0 and vel is not None
    balsara = cfg.av_balsara and av
    if energy and vel is None:
        raise ValueError("the energy equation needs velocities; pass vel=")
    if energy and cfg.grad_p_mode == "reference_asymmetric":
        raise ValueError("eos_mode='adiabatic' needs a momentum-conserving "
                         "pressure form (the reference-asymmetric force "
                         "has no conjugate energy equation)")
    need_vel = av or energy
    if src is None:
        src = (pos, h, mass, rho, pressure) + ((vel,) if need_vel else ())
        u_src = u
        matid_src = matid
        fbal_src = fbal
    pos_s, h_s, mass_s, rho_s, prs_s = _prep_sources(src[:5])
    rho_s = jnp.where(rho_s > 0, rho_s, 1.0)
    sidx = jnp.arange(pos_s.shape[0], dtype=jnp.int32)
    src_live = mass_s > 0.0

    rho_t = _pad_to(rho, n_pad, 1.0)
    rho_t = jnp.where(rho_t > 0, rho_t, 1.0)
    prs_t = _pad_to(pressure, n_pad, 0.0)
    if need_vel:
        vel_s = src[5]
        cs_s = eos_ops.sound_speed_cfg(rho_s, cfg, u=u_src, matid=matid_src)
        vel_t = _pad_to(vel, n_pad, 0.0)
    else:
        vel_t = jnp.zeros((n_pad, 3), pos.dtype)
    if energy and cfg.evolves_u:
        u_t = _pad_to(u, n_pad, 0.0)
    else:
        u_t = jnp.zeros((n_pad,), pos.dtype)
    mid_t = _pad_to(matid, n_pad, 0) if matid is not None else None
    if balsara:
        fb_t = _pad_to(fbal if fbal is not None
                       else jnp.ones_like(rho), n_pad, 1.0)
        fb_s = fbal_src if fbal_src is not None else jnp.ones_like(rho_s)
    else:
        fb_t = jnp.ones((n_pad,), pos.dtype)
        fb_s = None

    sign_bug = cfg.kernel_deriv_sign_bug

    def body(args):
        pos_i, h_i, idx_i, rho_i, prs_i, vel_i, u_i, mid_i, fb_i = args
        dx = pos_i[:, None, :] - pos_s[None, :, :]
        r2 = jnp.sum(dx * dx, axis=-1)
        r = jnp.sqrt(r2)
        pair_mask = (idx_i[:, None] != sidx[None, :]) & src_live[None, :]

        gw_i = kernels.dw_dr_over_r(r, h_i[:, None], sign_bug)
        gw_j = kernels.dw_dr_over_r(r, h_s[None, :], sign_bug)
        gsym = 0.5 * (gw_i + gw_j)                    # [b,S] radial factor

        m_eff = jnp.where(pair_mask, mass_s[None, :], 0.0)
        if cfg.grad_p_mode == "reference_asymmetric":
            coef = m_eff * (prs_s / rho_s)[None, :] * gsym
            pcoef = None
        else:
            pcoef = m_eff * (
                (prs_i / (rho_i * rho_i))[:, None]
                + (prs_s / (rho_s * rho_s))[None, :]
            ) * gsym
            coef = pcoef * rho_i[:, None]
        ecoef = pcoef if energy else None
        if need_vel:
            dv = vel_i[:, None, :] - vel_s[None, :, :]
            vdotr = jnp.sum(dv * dx, axis=-1)
        if av:
            # Monaghan AV fused into the same sweep (always the correct
            # kernel derivative — see viscosity_accel); effective gradP
            # contribution is -rho_i * a_AV
            hbar = 0.5 * (h_i[:, None] + h_s[None, :])
            mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
            cs_i = eos_ops.sound_speed_cfg(
                rho_i, cfg, u=u_i, matid=mid_i if matid is not None else None)
            cbar = 0.5 * (cs_i[:, None] + cs_s[None, :])
            rhobar = 0.5 * (rho_i[:, None] + rho_s[None, :])
            pi_ij = jnp.where(
                pair_mask & (vdotr < 0.0),
                (-cfg.av_alpha * cbar * mu + cfg.av_beta * mu * mu) / rhobar,
                0.0)
            if sign_bug:
                gs_av = 0.5 * (kernels.dw_dr_over_r(r, h_i[:, None], False)
                               + kernels.dw_dr_over_r(r, h_s[None, :], False))
            else:
                gs_av = gsym
            if balsara:
                pi_ij = pi_ij * (0.5 * (fb_i[:, None] + fb_s[None, :]))
            coef = coef + m_eff * pi_ij * gs_av * rho_i[:, None]
            if energy:
                ecoef = ecoef + m_eff * pi_ij * gs_av
        gp = jnp.sum(dx * coef[..., None], axis=-2)
        if balsara:
            g_dc = m_eff * gs_av
            div_sum = jnp.sum(g_dc * vdotr, axis=-1)
            curl_sum = jnp.sum(jnp.cross(dv, dx) * g_dc[..., None], axis=-2)
            dc = jnp.concatenate([div_sum[:, None], curl_sum], axis=-1)
        else:
            dc = jnp.zeros((gp.shape[0], 4), gp.dtype)
        if energy:
            return gp, 0.5 * jnp.sum(ecoef * vdotr, axis=-1), dc
        return gp, jnp.zeros_like(rho_i), dc

    out, du, dc = jax.lax.map(
        body,
        (_block(pos_t, nb, b), _block(h_t, nb, b), _block(gidx, nb, b),
         _block(rho_t, nb, b), _block(prs_t, nb, b), _block(vel_t, nb, b),
         _block(u_t, nb, b),
         _block(mid_t if mid_t is not None else gidx, nb, b),
         _block(fb_t, nb, b)),
    )
    grad_p = out.reshape((n_pad, 3))[:n]
    ret = (grad_p,)
    if energy:
        ret += (du.reshape((n_pad,))[:n],)
    if balsara:
        ret += (dc.reshape((n_pad, 4))[:n],)
    return ret if len(ret) > 1 else grad_p

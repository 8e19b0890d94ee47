"""Fused all-pairs Pallas kernels (the hot path of the dense pipeline).

This is the Pallas analog of fusing the reference's whole per-pair chain —
``CalculateInteractionJob`` kernel math (``KernelSystem.cs:235-335``), the
density sum (``DensityFieldSystem.cs:44-55``), the gravity P2P
(``GravityFieldSystem.cs:332-356``) and the pressure-gradient sum
(``PressureFieldSystem.cs:44-70``) — into two sweeps:

- pass 1: density + neighbor count + softened gravity in ONE sweep.
- pass 2: pressure gradient in one sweep.

Design notes (see /opt/skills/guides/pallas_guide.md):

- 2-D grid (i-tiles x j-tiles) with j innermost; the output block for an
  i-tile stays VMEM-resident across the whole j sweep (initialized at j==0,
  accumulated into afterwards) — the canonical pairwise pattern.
- i-side inputs are pre-shaped as [N,1] columns and j-side as [1,N] rows,
  blocked (TI,1) / (1,TJ), so broadcasting to the [TI,TJ] pair tile needs
  zero in-kernel relayouts; the Pallas pipeline handles all slicing and
  alignment (Mosaic cannot prove alignment of hand-rolled dynamic slices).
- Pair masking (self-pairs, padding) is elementwise on index iotas — no
  gathers anywhere. Everything is VPU math on (8,128)-tiled f32.

Falls back to interpret mode off-TPU so the same code path is testable on
CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SimConfig

_TI = 256   # i-tile (sublane-major axis of the pair tile)
_TJ = 512   # j-tile (lane-major axis)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pad1(x, fill):
    pad = (-x.shape[0]) % max(_TI, _TJ)
    return jnp.pad(x, (0, pad), constant_values=fill)


def _spline_w(r2, inv_h):
    """Cubic spline W(r,h) from r^2 and 1/h (SplineKernel.cs:55-89)."""
    r = jnp.sqrt(r2)
    q = r * inv_h
    inv_h3 = inv_h * inv_h * inv_h
    c = (1.0 / jnp.pi) * inv_h3
    q2 = q * q
    inner = (1.0 - 1.5 * q2 + 0.75 * q2 * q) * c
    t = 2.0 - q
    outer = 0.25 * t * t * t * c
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def _spline_dw_over_r(r2, inv_h, sign_bug: bool):
    """(dW/dr)/r from r^2 and 1/h — finite at r=0 (SplineKernel.cs:115-148,
    sign_bug reproduces the +3q error at :135)."""
    r = jnp.sqrt(r2)
    q = r * inv_h
    inv_h4 = inv_h * inv_h * inv_h * inv_h
    c = (1.0 / jnp.pi) * inv_h4
    lin = 3.0 if sign_bug else -3.0
    inner = (lin + 2.25 * q) * c * inv_h
    r_safe = jnp.where(r > 0.0, r, 1.0)
    t = 2.0 - q
    outer = (-0.75 * t * t) * c / r_safe
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def _dyer_ip_tile(dxx, dxy, dxz, r2, m, inv_a):
    """Reciprocal-form Dyer-Ip on a [TI,TJ] tile -> (gx,gy,gz,phi)."""
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    x = r2 * inv_r * inv_a
    x2 = x * x
    x3 = x2 * x
    inv_a3 = inv_a * inv_a * inv_a
    inner_mag = (m * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
    inner_phi = -(m * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3 - 0.4 * x2 * x3)
    outer_mag = m * inv_r * inv_r * inv_r
    outer_phi = -m * inv_r
    near = x < 1.0
    mag = jnp.where(near, inner_mag, outer_mag)
    phi = jnp.where(near, inner_phi, outer_phi)
    return dxx * mag, dxy * mag, dxz * mag, phi


def _pair_geometry(n_ref, xi, yi, zi, xj, yj, zj):
    i0 = pl.program_id(0) * _TI
    j0 = pl.program_id(1) * _TJ
    dxx = xi[:] - xj[:]
    dxy = yi[:] - yj[:]
    dxz = zi[:] - zj[:]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    gi = jax.lax.broadcasted_iota(jnp.int32, (_TI, _TJ), 0) + i0
    gj = jax.lax.broadcasted_iota(jnp.int32, (_TI, _TJ), 1) + j0
    pair = (gi != gj) & (gj < n_ref[0])
    return dxx, dxy, dxz, r2, pair


def _pass1_kernel(n_ref, xi, yi, zi, inv_hi, mi,
                  xj, yj, zj, inv_hj, mj,
                  rho_ref, nn_ref, phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
                  *, do_gravity, receiver_soft, g_const):
    dxx, dxy, dxz, r2, pair = _pair_geometry(n_ref, xi, yi, zi, xj, yj, zj)
    m_eff = jnp.where(pair, mj[:], 0.0)

    w_i = _spline_w(r2, inv_hi[:])
    w_j = _spline_w(r2, inv_hj[:])
    rho_p = jnp.sum(m_eff * 0.5 * (w_i + w_j), axis=1, keepdims=True)
    nn_p = jnp.sum(jnp.where(pair & (w_i > 0.0), 1, 0), axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        # self-density term m_i W(0,h_i) = m_i/(pi h_i^3)
        # (DensityFieldSystem.cs:45)
        ih = inv_hi[:]
        rho_ref[:] = mi[:] * (1.0 / jnp.pi) * ih * ih * ih
        nn_ref[:] = jnp.zeros_like(nn_ref)
        if do_gravity:
            phi_ref[:] = jnp.zeros_like(phi_ref)
            gx_ref[:] = jnp.zeros_like(gx_ref)
            gy_ref[:] = jnp.zeros_like(gy_ref)
            gz_ref[:] = jnp.zeros_like(gz_ref)
            nd_ref[:] = jnp.zeros_like(nd_ref)

    rho_ref[:] += rho_p
    nn_ref[:] += nn_p
    if do_gravity:
        inv_a = inv_hi[:] if receiver_soft else jnp.minimum(inv_hi[:],
                                                            inv_hj[:])
        pgx, pgy, pgz, pphi = _dyer_ip_tile(dxx, dxy, dxz, r2, m_eff, inv_a)
        phi_ref[:] += g_const * jnp.sum(pphi, axis=1, keepdims=True)
        gx_ref[:] += g_const * jnp.sum(pgx, axis=1, keepdims=True)
        gy_ref[:] += g_const * jnp.sum(pgy, axis=1, keepdims=True)
        gz_ref[:] += g_const * jnp.sum(pgz, axis=1, keepdims=True)
        nd_ref[:] += jnp.sum(jnp.where(pair, 1, 0), axis=1, keepdims=True)
    else:
        phi_ref[:] = jnp.zeros_like(phi_ref)
        gx_ref[:] = jnp.zeros_like(gx_ref)
        gy_ref[:] = jnp.zeros_like(gy_ref)
        gz_ref[:] = jnp.zeros_like(gz_ref)
        nd_ref[:] = jnp.zeros_like(nd_ref)


def _pass2_kernel(n_ref, *args, asymmetric, sign_bug, av, balsara,
                  av_alpha, av_beta):
    it = iter(args)
    xi, yi, zi, inv_hi, rho_i, prs_i = (next(it) for _ in range(6))
    if av:
        vxi, vyi, vzi, hi, csi = (next(it) for _ in range(5))
        fbi = next(it) if balsara else None
    xj, yj, zj, inv_hj, mj, rho_j, prs_j = (next(it) for _ in range(7))
    if av:
        vxj, vyj, vzj, hj, csj = (next(it) for _ in range(5))
        fbj = next(it) if balsara else None
    gpx_ref, gpy_ref, gpz_ref = (next(it) for _ in range(3))
    dc_refs = [next(it) for _ in range(4)] if balsara else []

    dxx, dxy, dxz, r2, pair = _pair_geometry(n_ref, xi, yi, zi, xj, yj, zj)
    m_eff = jnp.where(pair, mj[:], 0.0)

    gw_i = _spline_dw_over_r(r2, inv_hi[:], sign_bug)
    gw_j = _spline_dw_over_r(r2, inv_hj[:], sign_bug)
    gw = 0.5 * (gw_i + gw_j)
    if asymmetric:
        coef = m_eff * prs_j[:] / rho_j[:] * gw
    else:
        ri = rho_i[:]
        coef = m_eff * (prs_i[:] / (ri * ri)
                        + prs_j[:] / (rho_j[:] * rho_j[:])) * ri * gw

    if av:
        # Monaghan AV fused into the same sweep (see dense.pass2); always
        # the correct kernel derivative
        dvx = vxi[:] - vxj[:]
        dvy = vyi[:] - vyj[:]
        dvz = vzi[:] - vzj[:]
        vdotr = dvx * dxx + dvy * dxy + dvz * dxz
        hbar = 0.5 * (hi[:] + hj[:])
        mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
        cbar = 0.5 * (csi[:] + csj[:])
        rhobar = 0.5 * (rho_i[:] + rho_j[:])
        pi_ij = jnp.where(pair & (vdotr < 0.0),
                          (-av_alpha * cbar * mu + av_beta * mu * mu)
                          / rhobar, 0.0)
        if balsara:
            pi_ij = pi_ij * (0.5 * (fbi[:] + fbj[:]))
        if sign_bug:
            gs_av = 0.5 * (_spline_dw_over_r(r2, inv_hi[:], False)
                           + _spline_dw_over_r(r2, inv_hj[:], False))
        else:
            gs_av = gw
        coef = coef + m_eff * pi_ij * gs_av * rho_i[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        gpx_ref[:] = jnp.zeros_like(gpx_ref)
        gpy_ref[:] = jnp.zeros_like(gpy_ref)
        gpz_ref[:] = jnp.zeros_like(gpz_ref)
        for ref in dc_refs:
            ref[:] = jnp.zeros_like(ref)

    gpx_ref[:] += jnp.sum(dxx * coef, axis=1, keepdims=True)
    gpy_ref[:] += jnp.sum(dxy * coef, axis=1, keepdims=True)
    gpz_ref[:] += jnp.sum(dxz * coef, axis=1, keepdims=True)
    if balsara:
        # raw div/curl sums for the next step's limiter (dense.pass2)
        g_dc = m_eff * gs_av
        for ref, val in zip(dc_refs,
                            (g_dc * vdotr,
                             g_dc * (dvy * dxz - dvz * dxy),
                             g_dc * (dvz * dxx - dvx * dxz),
                             g_dc * (dvx * dxy - dvy * dxx))):
            ref[:] += jnp.sum(val, axis=1, keepdims=True)


# block specs: i-side [N,1] columns, j-side [1,N] rows, outputs [N,1]
_COL = pl.BlockSpec((_TI, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
_ROW = pl.BlockSpec((1, _TJ), lambda i, j: (0, j), memory_space=pltpu.VMEM)
_SCL = pl.BlockSpec(memory_space=pltpu.SMEM)


def _prep(pos, h, mass):
    px = _pad1(pos[:, 0], 1e15)
    py = _pad1(pos[:, 1], 2e15)
    pz = _pad1(pos[:, 2], 3e15)
    hh = _pad1(h, 1.0)
    hh = jnp.where(hh > 0, hh, 1.0)
    mm = _pad1(mass, 0.0)
    return px, py, pz, hh, 1.0 / hh, mm


def _cols(*xs):
    return [x[:, None] for x in xs]


def _rows(*xs):
    return [x[None, :] for x in xs]


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1(pos, h, mass, cfg: SimConfig):
    """Fused density/neighbors/gravity; returns the dense.Pass1Out tuple."""
    from ..dense import Pass1Out

    n = pos.shape[0]
    px, py, pz, hh, inv_h, mm = _prep(pos, h, mass)
    n_pad = px.shape[0]
    do_gravity = cfg.gravity_solver == "direct"
    kernel = functools.partial(
        _pass1_kernel, do_gravity=do_gravity,
        receiver_soft=cfg.softening_mode == "receiver_h",
        g_const=cfg.g_const)
    f32 = jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // _TI, n_pad // _TJ),
        in_specs=[_SCL] + [_COL] * 5 + [_ROW] * 5,
        out_specs=[_COL] * 7,
        out_shape=[f32, i32, f32, f32, f32, f32, i32],
        interpret=not _on_tpu(),
    )(jnp.asarray([n], jnp.int32),
      *_cols(px, py, pz, inv_h, mm),
      *_rows(px, py, pz, inv_h, mm))
    rho, nn, phi, gx, gy, gz, nd = [o[:n, 0] for o in outs]
    return Pass1Out(rho, nn, phi, jnp.stack([gx, gy, gz], axis=-1), nd)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass2(pos, h, mass, rho, pressure, cfg: SimConfig, vel=None,
          fbal=None):
    """Fused pressure-gradient sweep; returns grad P [N,3].

    With `vel` and cfg.av_alpha > 0, the Monaghan AV term is fused into the
    same sweep (as an effective-gradient contribution -rho_i a_AV).
    Under cfg.av_balsara, `fbal` (the lagged limiter factors) scales
    Pi_ij by 0.5(f_i+f_j) and the raw div/curl sums dc[N,4] are returned
    as a second output (see ops/dense.pass2)."""
    from ...ops import eos as eos_ops

    n = pos.shape[0]
    av = cfg.av_alpha > 0.0 and vel is not None
    balsara = cfg.av_balsara and av
    px, py, pz, hh, inv_h, mm = _prep(pos, h, mass)
    n_pad = px.shape[0]
    rr = _pad1(rho, 1.0)
    rr = jnp.where(rr > 0, rr, 1.0)
    pp = _pad1(pressure, 0.0)
    icols, irows = [px, py, pz, inv_h, rr, pp], \
                   [px, py, pz, inv_h, mm, rr, pp]
    if av:
        cs = eos_ops.sound_speed(rr, cfg.eos_k, cfg.eos_gamma)
        vx = _pad1(vel[:, 0], 0.0)
        vy = _pad1(vel[:, 1], 0.0)
        vz = _pad1(vel[:, 2], 0.0)
        icols += [vx, vy, vz, hh, cs]
        irows += [vx, vy, vz, hh, cs]
        if balsara:
            fb = _pad1(fbal if fbal is not None else jnp.ones_like(rho),
                       1.0)
            icols += [fb]
            irows += [fb]
    kernel = functools.partial(
        _pass2_kernel,
        asymmetric=cfg.grad_p_mode == "reference_asymmetric",
        sign_bug=cfg.kernel_deriv_sign_bug, av=av, balsara=balsara,
        av_alpha=cfg.av_alpha, av_beta=cfg.av_beta)
    f32 = jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
    n_out = 7 if balsara else 3
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // _TI, n_pad // _TJ),
        in_specs=[_SCL] + [_COL] * len(icols) + [_ROW] * len(irows),
        out_specs=[_COL] * n_out,
        out_shape=[f32] * n_out,
        interpret=not _on_tpu(),
    )(jnp.asarray([n], jnp.int32), *_cols(*icols), *_rows(*irows))
    grad_p = jnp.stack([o[:n, 0] for o in outs[:3]], axis=-1)
    if balsara:
        dc = jnp.stack([o[:n, 0] for o in outs[3:7]], axis=-1)
        return grad_p, dc
    return grad_p

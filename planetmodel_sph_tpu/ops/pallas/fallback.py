"""Pure-jnp CPU fallbacks for the windowed Pallas sweeps (groups2).

Off-TPU, pallas runs in interpret mode: the grid loop becomes an XLA
while-loop whose body emulates one [B, CHUNK] tile sweep — measured
~1-2 min per simulated 32k step on the single-core CPU mesh (the
round-5 halo validation's wall bottleneck) and the bulk of the default
test suite's jit time. These fallbacks compute the SAME math as the
kernels (duplicated deliberately — the kernel bodies stay untouched for
TPU) as one masked [G, B, S] broadcast contraction per sweep, which
XLA:CPU fuses and vectorizes directly. Dispatch happens in groups2's
public functions (`_use_jnp()`): TPU behavior is bit-identical to
before; CPU results match the interpret path to accumulation-order
tolerance and are validated by the same dense-oracle cross-check tests
that validate the kernels.

Semantics contract (mirrors groups2):
- `nv[G]` masks VALID source slots; the pallas sweeps evaluate whole
  chunks with an iota<nv mask, so a plain `arange(S) < nv` mask is
  IDENTICAL (masked slots contribute exactly 0 through m_eff=0).
- Targets arrive as [G*B, 1] columns, sources as [G, S] rows; outputs
  are [G*B, 1] columns with the kernels' dtypes.
- Self pairs are included exactly as in the kernels (callers correct).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_PI = 1.0 / 3.14159265358979323846


def _shape(tgt, src):
    g, s = src[0].shape
    b = tgt[0].shape[0] // g
    t3 = [x.reshape(g, b, 1) for x in tgt]
    s3 = [r[:, None, :] for r in src]
    return g, b, s, t3, s3


def _slot_mask(nv, g, s):
    return (jnp.arange(s, dtype=jnp.int32)[None, None, :]
            < nv.reshape(g, 1, 1))


def _col(x, dtype=None):
    v = x.reshape(-1, 1)
    return v.astype(dtype) if dtype is not None else v


def _w_poly(q):
    q2 = q * q
    inner = 1.0 - 1.5 * q2 + 0.75 * q2 * q
    t = 2.0 - q
    outer = 0.25 * t * t * t
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def _gw_from(q, inv_h, inv_h4, inv_r, sign_bug):
    lin = 3.0 if sign_bug else -3.0
    inner = lin + 2.25 * q
    t = 2.0 - q
    outer = -0.75 * t * t
    val = jnp.where(q < 1.0, inner * inv_h,
                    jnp.where(q < 2.0, outer * inv_r, 0.0))
    return _INV_PI * inv_h4 * val


def pass1_gradh(nv, tgt, src):
    g, b, s, (tx, ty, tz, tih), (sx, sy, sz, sm) = _shape(tgt, src)
    valid = _slot_mask(nv, g, s)
    dxx = tx - sx
    dxy = ty - sy
    dxz = tz - sz
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    m_eff = jnp.where(valid, sm, 0.0)
    q = jnp.sqrt(r2) * tih
    q2 = q * q
    q3 = q2 * q
    inner = 1.0 - 1.5 * q2 + 0.75 * q3
    t = 2.0 - q
    tsq = t * t
    wpoly = jnp.where(q < 1.0, inner,
                      jnp.where(q < 2.0, 0.25 * tsq * t, 0.0))
    inner_dh = 3.0 * inner - 3.0 * q2 + 2.25 * q3
    outer_dh = 0.75 * tsq * (t - q)
    dhpoly = jnp.where(q < 1.0, inner_dh,
                       jnp.where(q < 2.0, outer_dh, 0.0))
    s_rho = jnp.sum(m_eff * wpoly, axis=2, keepdims=True)
    s_xi = jnp.sum(m_eff * dhpoly, axis=2, keepdims=True)
    s_nn = jnp.sum(jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0),
                   axis=2, keepdims=True)
    ci3 = _INV_PI * (tih[:, :, 0:1] ** 3)
    return (_col(ci3 * s_rho), _col(s_nn, jnp.int32),
            _col(-(ci3 * tih[:, :, 0:1]) * s_xi))


def pass1_sym(nv, tgt, src):
    g, b, s, (tx, ty, tz, tih), (sx, sy, sz, sih, sm) = _shape(tgt, src)
    valid = _slot_mask(nv, g, s)
    dxx = tx - sx
    dxy = ty - sy
    dxz = tz - sz
    r = jnp.sqrt(dxx * dxx + dxy * dxy + dxz * dxz)
    m_eff = jnp.where(valid, sm, 0.0)
    q = r * tih
    qj = r * sih
    wpoly = _w_poly(q)
    wpolyj = _w_poly(qj)
    cj3 = sih * sih * sih
    s_rho = jnp.sum(m_eff * wpoly, axis=2, keepdims=True)
    s_rhoj = jnp.sum(m_eff * wpolyj * cj3, axis=2, keepdims=True)
    s_nn = jnp.sum(jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0),
                   axis=2, keepdims=True)
    ci3 = tih[:, :, 0:1] ** 3
    rho = (0.5 * _INV_PI) * (ci3 * s_rho + s_rhoj)
    return _col(rho), _col(s_nn, jnp.int32)


def filter_sph(nv, tgt, src):
    g, b, s, (tx, ty, tz, tc, tsk), (sx, sy, sz, sc, ssk, sm) = \
        _shape(tgt, src)
    valid = _slot_mask(nv, g, s)
    dxx = tx - sx
    dxy = ty - sy
    dxz = tz - sz
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    cut = jnp.maximum(tc, sc) + tsk + ssk
    pred = (r2 < cut * cut) & valid & (sm > 0.0)
    return jnp.max(jnp.where(pred, 1.0, 0.0), axis=1)


def _dyer_ip(m_eff, dxx, dxy, dxz, r2, inv_a):
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    x = (r2 * inv_r) * inv_a
    x2 = x * x
    x3 = x2 * x
    inv_a3 = inv_a * inv_a * inv_a
    inner_mag = (m_eff * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
    inner_phi = -(m_eff * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3
                                    - 0.4 * x2 * x3)
    mr = m_eff * inv_r
    near = x < 1.0
    mag = jnp.where(near, inner_mag, mr * inv_r * inv_r)
    phi = jnp.where(near, inner_phi, -mr)
    return phi, dxx * mag, dxy * mag, dxz * mag


def p2p(nv, tgt, src, *, receiver_soft, g_const):
    g, b, s, (tx, ty, tz, tih), s3 = _shape(tgt, src)
    valid = _slot_mask(nv, g, s)
    if receiver_soft:
        sx, sy, sz, sm = s3
        inv_a = tih
    else:
        sx, sy, sz, sih, sm = s3
        inv_a = jnp.minimum(tih, sih)
    dxx = tx - sx
    dxy = ty - sy
    dxz = tz - sz
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    m_eff = jnp.where(valid, sm, 0.0)
    phi, gx, gy, gz = _dyer_ip(m_eff, dxx, dxy, dxz, r2, inv_a)
    red = lambda v: _col(jnp.sum(v, axis=2, keepdims=True))
    # counts involve no target coordinate: the slot sum is per-GROUP —
    # broadcast it across the group's B targets (as the kernel's [B,*]
    # accumulator does implicitly)
    nd = jnp.broadcast_to(
        jnp.sum(jnp.where(m_eff > 0.0, 1.0, 0.0), axis=2, keepdims=True),
        (g, b, 1))
    return (g_const * red(phi), g_const * red(gx), g_const * red(gy),
            g_const * red(gz), _col(nd, jnp.int32))


def pass2(nv, tgt, src, *, mode, av, energy, balsara, sign_bug,
          av_alpha, av_beta, grav, receiver_soft, g_const,
          nv_p2p=None, p2p_rows=None):
    it = iter(tgt)
    tx, ty, tz, tih = (next(it) for _ in range(4))
    tc = next(it) if mode != "reference_asymmetric" else None
    if av:
        tvx, tvy, tvz, th, tcs, trho = (next(it) for _ in range(6))
        tfb = next(it) if balsara else None
    elif energy:
        tvx, tvy, tvz = (next(it) for _ in range(3))
    g, s = src[0].shape
    b = tx.shape[0] // g
    t3 = lambda x: x.reshape(g, b, 1)
    s3 = lambda r: r[:, None, :]
    valid = _slot_mask(nv, g, s)
    sit = iter(src)
    sx, sy, sz, sih, sm, scc = (s3(next(sit)) for _ in range(6))
    tx, ty, tz, tih = t3(tx), t3(ty), t3(tz), t3(tih)
    dxx = tx - sx
    dxy = ty - sy
    dxz = tz - sz
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    m_eff = jnp.where(valid, sm, 0.0)
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    r = r2 * inv_r
    q = r * tih
    qj = r * sih
    tih4 = tih ** 4
    cih4 = sih ** 4
    gw_i = _gw_from(q, tih, tih4, inv_r, sign_bug)
    gw_j = _gw_from(qj, sih, cih4, inv_r, sign_bug)
    if mode == "grad_h":
        coef = m_eff * (t3(tc) * gw_i + scc * gw_j)
    elif mode == "reference_asymmetric":
        coef = m_eff * scc * (0.5 * (gw_i + gw_j))
    else:
        coef = m_eff * (t3(tc) + scc) * (0.5 * (gw_i + gw_j))
    red = lambda v: _col(jnp.sum(v, axis=2, keepdims=True))
    outs = [red(dxx * coef), red(dxy * coef), red(dxz * coef)]
    if av or energy:
        svx, svy, svz = (s3(next(sit)) for _ in range(3))
        dvx = t3(tvx) - svx
        dvy = t3(tvy) - svy
        dvz = t3(tvz) - svz
        vdotr = dvx * dxx + dvy * dxy + dvz * dxz
    if av:
        sh, scs, srho = (s3(next(sit)) for _ in range(3))
        hbar = 0.5 * (t3(th) + sh)
        mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
        cbar = 0.5 * (t3(tcs) + scs)
        rhobar = 0.5 * (t3(trho) + srho)
        pi_ij = jnp.where(vdotr < 0.0,
                          (-av_alpha * cbar * mu + av_beta * mu * mu)
                          / rhobar, 0.0)
        if balsara:
            sfb = s3(next(sit))
            pi_ij = pi_ij * (0.5 * (t3(tfb) + sfb))
        if sign_bug:
            gs_av = 0.5 * (_gw_from(q, tih, tih4, inv_r, False)
                           + _gw_from(qj, sih, cih4, inv_r, False))
        else:
            gs_av = 0.5 * (gw_i + gw_j)
        cav = m_eff * pi_ij * gs_av
        outs += [red(dxx * cav), red(dxy * cav), red(dxz * cav)]
        if balsara:
            g_dc = m_eff * gs_av
            outs += [red(g_dc * vdotr),
                     red(g_dc * (dvy * dxz - dvz * dxy)),
                     red(g_dc * (dvz * dxx - dvx * dxz)),
                     red(g_dc * (dvx * dxy - dvy * dxx))]
    if energy:
        if mode == "grad_h":
            du = t3(tc) * (m_eff * gw_i) * vdotr
        else:
            du = 0.5 * coef * vdotr
        if av:
            du = du + 0.5 * cav * vdotr
        outs += [red(du)]
    if grav:
        inv_a = tih if receiver_soft else jnp.minimum(tih, sih)
        phi, gx, gy, gz = _dyer_ip(m_eff, dxx, dxy, dxz, r2, inv_a)
        cnt = jnp.broadcast_to(jnp.where(m_eff > 0.0, 1.0, 0.0),
                               (g, b, s))
        sums = [jnp.sum(v, axis=2, keepdims=True)
                for v in (phi, gx, gy, gz, cnt)]
        if p2p_rows is not None:
            # residual-P2P merge: second window into the same sums
            s2 = p2p_rows[0].shape[1]
            valid2 = _slot_mask(nv_p2p, g, s2)
            pit = iter(p2p_rows)
            if receiver_soft:
                px, py, pz, pm = (s3(next(pit)) for _ in range(4))
                inv_a2 = tih
            else:
                px, py, pz, pih, pm = (s3(next(pit)) for _ in range(5))
                inv_a2 = jnp.minimum(tih, pih)
            ddx = tx - px
            ddy = ty - py
            ddz = tz - pz
            rr2 = ddx * ddx + ddy * ddy + ddz * ddz
            pm_eff = jnp.where(valid2, pm, 0.0)
            phi2, gx2, gy2, gz2 = _dyer_ip(pm_eff, ddx, ddy, ddz, rr2,
                                           inv_a2)
            cnt2 = jnp.broadcast_to(jnp.where(pm_eff > 0.0, 1.0, 0.0),
                                    (g, b, s2))
            sums = [a + jnp.sum(v, axis=2, keepdims=True)
                    for a, v in zip(sums,
                                    (phi2, gx2, gy2, gz2, cnt2))]
        outs += [_col(g_const * sums[0]), _col(g_const * sums[1]),
                 _col(g_const * sums[2]), _col(g_const * sums[3]),
                 _col(sums[4], jnp.int32)]
    return tuple(outs)


def _mono_quad(m_eff, dxx, dxy, dxz, quad_tiles):
    """Monopole (+ optional traceless quadrupole) contribution of moment
    entries at separations (dx = target - cm). Returns phi, gx, gy, gz."""
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    mag = m_eff * inv_r * inv_r * inv_r
    phi = -m_eff * inv_r
    gx, gy, gz = dxx * mag, dxy * mag, dxz * mag
    if quad_tiles is not None:
        qxx, qxy, qxz, qyy, qyz, qzz = quad_tiles
        live = jnp.where(m_eff > 0.0, 1.0, 0.0)
        qdx = qxx * dxx + qxy * dxy + qxz * dxz
        qdy = qxy * dxx + qyy * dxy + qyz * dxz
        qdz = qxz * dxx + qyz * dxy + qzz * dxz
        dqd = dxx * qdx + dxy * qdy + dxz * qdz
        ir2 = inv_r * inv_r
        ir5 = live * ir2 * ir2 * inv_r
        ir7dqd = 2.5 * dqd * ir5 * ir2
        phi = phi - 0.5 * dqd * ir5
        gx = gx - qdx * ir5 + dxx * ir7dqd
        gy = gy - qdy * ir5 + dxy * ir7dqd
        gz = gz - qdz * ir5 + dxz * ir7dqd
    return phi, gx, gy, gz


def gravity_fused(nv_p2p, nv_ring, tgt, p2p_rows, ring_rows, far_rows,
                  accept, *, receiver_soft, g_const,
                  nv_blk=None, blk_rows=None, has_p2p=True):
    tx, ty, tz, tih = tgt
    nm = len(ring_rows)
    g = ring_rows[0].shape[0]
    b = tx.shape[0] // g
    t3 = lambda x: x.reshape(g, b, 1)
    s3 = lambda r: r[:, None, :]
    tx, ty, tz, tih = t3(tx), t3(ty), t3(tz), t3(tih)
    zero = jnp.zeros((g, b, 1), jnp.float32)
    phi = gx = gy = gz = zero
    nd = zero

    if has_p2p:
        sp = p2p_rows[0].shape[1]
        validp = _slot_mask(nv_p2p, g, sp)
        pit = iter(p2p_rows)
        if receiver_soft:
            px, py, pz, pm = (s3(next(pit)) for _ in range(4))
            inv_a = tih
        else:
            px, py, pz, pih, pm = (s3(next(pit)) for _ in range(5))
            inv_a = jnp.minimum(tih, pih)
        dxx = tx - px
        dxy = ty - py
        dxz = tz - pz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        m_eff = jnp.where(validp, pm, 0.0)
        p_phi, p_gx, p_gy, p_gz = _dyer_ip(m_eff, dxx, dxy, dxz, r2,
                                           inv_a)
        red = lambda v: jnp.sum(v, axis=2, keepdims=True)
        phi, gx, gy, gz = red(p_phi), red(p_gx), red(p_gy), red(p_gz)
        nd = jnp.broadcast_to(
            jnp.sum(jnp.where(m_eff > 0.0, 1.0, 0.0), axis=2,
                    keepdims=True), (g, b, 1))

    na = zero

    def mono_tier(rows, valid):
        cm_, cx, cy, cz = (s3(r) for r in rows[:4])
        m_eff = jnp.where(valid & (cm_ > 0.0), cm_, 0.0)
        quad = tuple(s3(r) for r in rows[4:10]) if nm == 10 else None
        t_phi, t_gx, t_gy, t_gz = _mono_quad(
            m_eff, tx - cx, ty - cy, tz - cz, quad)
        red = lambda v: jnp.sum(v, axis=2, keepdims=True)
        return (red(t_phi), red(t_gx), red(t_gy), red(t_gz),
                jnp.broadcast_to(
                    jnp.sum(jnp.where(m_eff > 0.0, 1.0, 0.0), axis=2,
                            keepdims=True), (g, b, 1)))

    sr = ring_rows[0].shape[1]
    t_phi, t_gx, t_gy, t_gz, t_n = mono_tier(ring_rows,
                                             _slot_mask(nv_ring, g, sr))
    phi, gx, gy, gz, na = (phi + t_phi, gx + t_gx, gy + t_gy,
                           gz + t_gz, na + t_n)
    if blk_rows is not None:
        sb = blk_rows[0].shape[1]
        t_phi, t_gx, t_gy, t_gz, t_n = mono_tier(
            blk_rows, _slot_mask(nv_blk, g, sb))
        phi, gx, gy, gz, na = (phi + t_phi, gx + t_gx, gy + t_gy,
                               gz + t_gz, na + t_n)
    # far tier: [1, NBpad] broadcast moments under the [G, NBpad] accept
    # mask (mass zeroed where not accepted, as in the kernel's far_body)
    far = [jnp.broadcast_to(r, (g, r.shape[1])) for r in far_rows]
    far = [jnp.where(accept > 0.5, far[0], 0.0)] + far[1:]
    t_phi, t_gx, t_gy, t_gz, t_n = mono_tier(
        far, jnp.ones((g, 1, far[0].shape[1]), bool))
    phi, gx, gy, gz, na = (phi + t_phi, gx + t_gx, gy + t_gy,
                           gz + t_gz, na + t_n)
    return (_col(g_const * phi), _col(g_const * gx), _col(g_const * gy),
            _col(g_const * gz), _col(nd, jnp.int32), _col(na, jnp.int32))

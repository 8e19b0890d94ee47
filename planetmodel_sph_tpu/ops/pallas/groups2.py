"""Optimized windowed block-pair kernels — v2 of ops/pallas/groups.py.

Same contracts as groups.py (the reference hot loops they replace are cited
there: ``KernelSystem.cs:235-335``, ``GravityFieldSystem.cs:133-215,332-356``)
with three measured structural changes, worth ~35-45% of kernel time at the
settled 100k operating point (tools/profile_block.py):

1. **Deferred reductions.** A [B,1] row-reduction per chunk costs ~2.7
   elementwise-op equivalents on the VPU (cross-lane tree). v2 accumulates
   into [B, CHUNK] VMEM scratch with plain adds and reduces ONCE per group
   after the window sweep, amortizing the cross-lane cost over all chunks.
2. **5-field source geometry** (x, y, z, inv_h, m). The ``live``/``oid``
   columns are gone: padding/replica slots carry m=0 (zeroed once in
   ``structure._prep_ctx``), and self-pairs are *included* in the math —
   exactly:
     - pass1: W(0, h_i) with the particle's own mass IS the self-density
       term; dW/dh at r=0 is the grad-h self term.
     - pass2: dx = 0 kills every gradient contribution.
     - p2p: the Dyer-Ip inner branch is finite at x=0, dx = 0 kills the
       force, and the constant self-potential -2.4*m_i/a_i is subtracted
       analytically by the caller.
   Each pair loses two compares + a select; each gather loses 2/7 fields.
3. **One rsqrt per pair.** r and 1/r both come from a single
   ``rsqrt(max(r2, eps))`` (r = r2 * inv_r) and are shared by every spline
   evaluation; target-constant prefactors (1/pi h^3, 1/pi h^4, 1/a^3) are
   hoisted out of the chunk loop entirely.

Neighbor counts come back INCLUDING the self pair; callers subtract 1.
All kernels fall back to interpret mode off-TPU (tests/conftest.py pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import _on_tpu

_SCL = pl.BlockSpec(memory_space=pltpu.SMEM)
_INV_PI = 1.0 / 3.14159265358979323846


def _call(kernel, *, out_dtypes, smem, tgt_cols, src_rows, b, chunk,
          n_acc):
    """Assemble a pallas_call for the windowed-pair pattern (1-D grid over
    target groups) with `n_acc` [B, CHUNK] f32 VMEM accumulators."""
    s = src_rows[0].shape[1]
    col = pl.BlockSpec((b, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    g_total = tgt_cols[0].shape[0] // b
    outs = [jax.ShapeDtypeStruct((g_total * b, 1), dt) for dt in out_dtypes]
    rows3 = [r[:, None, :] for r in src_rows]
    return pl.pallas_call(
        kernel,
        grid=(g_total,),
        in_specs=[_SCL] * len(smem) + [col] * len(tgt_cols)
        + [row] * len(src_rows),
        out_specs=[col] * len(out_dtypes),
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((b, chunk), jnp.float32)
                        for _ in range(n_acc)],
        interpret=not _on_tpu(),
    )(*smem, *tgt_cols, *rows3)


def _sweep(nv, rows, chunk, body):
    """fori_loop over [1, CHUNK] tiles of VMEM-resident row refs; `body`
    mutates scratch accumulators (no loop carry). Trip count is
    ceil(nv/chunk) — chunks beyond the group's real window never run."""
    s = rows[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def slice_ref(r, off):
        if len(r.shape) == 3:
            return r[:, 0, pl.ds(off, chunk)]
        return r[:, pl.ds(off, chunk)]

    def step(c, carry):
        off = pl.multiple_of(c * chunk, chunk)
        tiles = [slice_ref(r, off) for r in rows]
        body(tiles, (iota + off) < nv)
        return carry

    trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
    jax.lax.fori_loop(0, trips, step, 0)


def _rsum(acc):
    return jnp.sum(acc[:], axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# pass 1: density + neighbor count (+ grad-h dW/dh sum)
# ---------------------------------------------------------------------------

def _pass1_gradh_kernel(nv_ref, tx, ty, tz, tih, sx, sy, sz, sm,
                        rho_ref, nn_ref, xi_ref, a_rho, a_xi, a_nn,
                        *, chunk):
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
    zero = jnp.zeros(a_rho.shape, jnp.float32)
    a_rho[:] = zero
    a_xi[:] = zero
    a_nn[:] = zero

    def body(tiles, valid):
        cx, cy, cz, cm = tiles
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        m_eff = jnp.where(valid, cm, 0.0)
        q = jnp.sqrt(r2) * tihv
        q2 = q * q
        q3 = q2 * q
        inner = 1.0 - 1.5 * q2 + 0.75 * q3
        t = 2.0 - q
        tsq = t * t
        outer = 0.25 * tsq * t
        wpoly = jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
        # dW/dh = -(1/pi h^4)(3 Wpoly + q dWpoly/dq); reuses inner/tsq
        inner_dh = 3.0 * inner - 3.0 * q2 + 2.25 * q3
        outer_dh = 0.75 * tsq * (t - q)
        dhpoly = jnp.where(q < 1.0, inner_dh,
                           jnp.where(q < 2.0, outer_dh, 0.0))
        a_rho[:] += m_eff * wpoly
        a_xi[:] += m_eff * dhpoly
        a_nn[:] += jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0)

    _sweep(nv, [sx, sy, sz, sm], chunk, body)
    ci3 = _INV_PI * (tihv * tihv * tihv)
    rho_ref[:] = ci3 * _rsum(a_rho)
    xi_ref[:] = -(ci3 * tihv) * _rsum(a_xi)
    nn_ref[:] = _rsum(a_nn).astype(jnp.int32)


def pass1_gradh(nv, tgt, src, *, b, chunk):
    """Grad-h density sweep: tgt = (x,y,z,ih) cols, src = (x,y,z,m) rows.
    Returns (rho, nn, xi) [G*B,1] columns; nn INCLUDES the self pair."""
    kern = functools.partial(_pass1_gradh_kernel, chunk=chunk)
    return _call(kern, out_dtypes=[jnp.float32, jnp.int32, jnp.float32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=3)


def _pass1_sym_kernel(nv_ref, tx, ty, tz, tih, sx, sy, sz, sih, sm,
                      rho_ref, nn_ref, a_rho, a_rhoj, a_nn, *, chunk):
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
    zero = jnp.zeros(a_rho.shape, jnp.float32)
    a_rho[:] = zero
    a_rhoj[:] = zero
    a_nn[:] = zero

    def body(tiles, valid):
        cx, cy, cz, cih, cm = tiles
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        m_eff = jnp.where(valid, cm, 0.0)
        r = jnp.sqrt(r2)
        q = r * tihv
        q2 = q * q
        inner = 1.0 - 1.5 * q2 + 0.75 * q2 * q
        t = 2.0 - q
        outer = 0.25 * t * t * t
        wpoly = jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
        qj = r * cih
        qj2 = qj * qj
        innerj = 1.0 - 1.5 * qj2 + 0.75 * qj2 * qj
        tj = 2.0 - qj
        outerj = 0.25 * tj * tj * tj
        wpolyj = jnp.where(qj < 1.0, innerj,
                           jnp.where(qj < 2.0, outerj, 0.0))
        cj3 = cih * cih * cih       # source prefactor rides per pair
        a_rho[:] += m_eff * wpoly
        a_rhoj[:] += m_eff * wpolyj * cj3
        a_nn[:] += jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0)

    _sweep(nv, [sx, sy, sz, sih, sm], chunk, body)
    ci3 = tihv * tihv * tihv
    rho_ref[:] = (0.5 * _INV_PI) * (ci3 * _rsum(a_rho) + _rsum(a_rhoj))
    nn_ref[:] = _rsum(a_nn).astype(jnp.int32)


def pass1_sym(nv, tgt, src, *, b, chunk):
    """Symmetric-density sweep: tgt = (x,y,z,ih), src = (x,y,z,ih,m).
    rho_i = sum m_j 0.5(W(h_i)+W(h_j)); nn INCLUDES the self pair."""
    kern = functools.partial(_pass1_sym_kernel, chunk=chunk)
    return _call(kern, out_dtypes=[jnp.float32, jnp.int32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=3)


# ---------------------------------------------------------------------------
# rebuild-time candidate filter (exact SPH lists)
# ---------------------------------------------------------------------------

def _filter_kernel(nv_ref, tx, ty, tz, tc, tsk, sx, sy, sz, sc, ssk, sm,
                   keep_ref, *, chunk):
    """keep[j] = any target i in the group truly interacts with candidate j.

    tc/sc carry kappa*(1+h_margin)*h pre-scaled by the caller, so the pair
    cutoff is max(tc_i, sc_j) + tsk_i + ssk_j (per-particle skins)."""
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tcv, tskv = tx[:], ty[:], tz[:], tc[:], tsk[:]
    keep_ref[:] = jnp.zeros(keep_ref.shape, jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    s = sx.shape[-1]

    def step(c, carry):
        off = pl.multiple_of(c * chunk, chunk)
        cx = sx[:, 0, pl.ds(off, chunk)]
        cy = sy[:, 0, pl.ds(off, chunk)]
        cz = sz[:, 0, pl.ds(off, chunk)]
        cc = sc[:, 0, pl.ds(off, chunk)]
        csk = ssk[:, 0, pl.ds(off, chunk)]
        cm = sm[:, 0, pl.ds(off, chunk)]
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        cut = jnp.maximum(tcv, cc) + tskv + csk
        valid = ((iota + off) < nv) & (cm > 0.0)
        pred = (r2 < cut * cut) & valid
        keep_ref[0, :, pl.ds(off, chunk)] = jnp.max(
            jnp.where(pred, 1.0, 0.0), axis=0, keepdims=True)
        return carry

    trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
    jax.lax.fori_loop(0, trips, step, 0)


def filter_sph(nv, tgt, src, *, b, chunk):
    """Per-candidate true-interaction mask over the group's window.

    tgt cols ([G*B,1]): x, y, z, kappa_eff*h, skin. src rows ([G,S]):
    x, y, z, kappa_eff*h, skin, m. Returns f32 [G, S] (1.0 = some target
    interacts). One light sweep (~10 flops/slot) at REBUILD time buys the
    per-step heavy sweeps a ~5x smaller exact candidate window."""
    s = src[0].shape[1]
    col = pl.BlockSpec((b, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    g_total = tgt[0].shape[0] // b
    return pl.pallas_call(
        functools.partial(_filter_kernel, chunk=chunk),
        grid=(g_total,),
        in_specs=[_SCL] + [col] * len(tgt) + [row] * len(src),
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((g_total, 1, s), jnp.float32),
        interpret=not _on_tpu(),
    )(nv, *tgt, *[r[:, None, :] for r in src])[:, 0, :]


# ---------------------------------------------------------------------------
# pass 2: pressure gradient (+ fused artificial viscosity)
# ---------------------------------------------------------------------------

def _gw_polys(q, tsq_out=None, sign_bug=False):
    """(dW/dr)/r polynomial pieces from q (prefactors hoisted):
    inner: (lin + 2.25 q), to be scaled by ih^5/pi
    outer: -0.75 (2-q)^2 * q-free, to be scaled by ih^4/(pi r)"""
    lin = 3.0 if sign_bug else -3.0
    inner = lin + 2.25 * q
    t = 2.0 - q
    outer = -0.75 * t * t
    return inner, outer


def _gw_from(q, inv_h, inv_h4, inv_r, sign_bug):
    """(dW/dr)/r with all prefactors applied; finite at r=0 (the inner
    branch is the one active there and carries no 1/r)."""
    inner, outer = _gw_polys(q, sign_bug=sign_bug)
    val = jnp.where(q < 1.0, inner * inv_h,
                    jnp.where(q < 2.0, outer * inv_r, 0.0))
    return (_INV_PI) * inv_h4 * val


def _pass2_kernel(nv_ref, *args, chunk, mode, av, sign_bug, av_alpha,
                  av_beta):
    it = iter(args)
    tx, ty, tz, tih = (next(it) for _ in range(4))
    tc = next(it) if mode != "reference_asymmetric" else None
    if av:
        tvx, tvy, tvz, th, tcs, trho = (next(it) for _ in range(6))
    sx, sy, sz, sih, sm, scc = (next(it) for _ in range(6))
    s_av = [next(it) for _ in range(6)] if av else []   # vx,vy,vz,h,cs,rho
    gpx_ref, gpy_ref, gpz_ref = (next(it) for _ in range(3))
    if av:
        avx_ref, avy_ref, avz_ref = (next(it) for _ in range(3))
        a_gx, a_gy, a_gz, a_vx, a_vy, a_vz = (next(it) for _ in range(6))
    else:
        a_gx, a_gy, a_gz = (next(it) for _ in range(3))

    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
    tcv = tc[:] if tc is not None else None
    tih4 = tihv * tihv
    tih4 = tih4 * tih4
    zero = jnp.zeros(a_gx.shape, jnp.float32)
    a_gx[:] = zero
    a_gy[:] = zero
    a_gz[:] = zero
    if av:
        a_vx[:] = zero
        a_vy[:] = zero
        a_vz[:] = zero
        tvxv, tvyv, tvzv, thv, tcsv, trhov = (tvx[:], tvy[:], tvz[:],
                                              th[:], tcs[:], trho[:])
    rows = [sx, sy, sz, sih, sm, scc] + s_av

    def body(tiles, valid):
        cx, cy, cz, cih, cm, ccc = tiles[:6]
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        m_eff = jnp.where(valid, cm, 0.0)
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        q = r * tihv
        qj = r * cih
        cih4 = cih * cih
        cih4 = cih4 * cih4
        gw_i = _gw_from(q, tihv, tih4, inv_r, sign_bug)
        gw_j = _gw_from(qj, cih, cih4, inv_r, sign_bug)
        if mode == "grad_h":
            coef = m_eff * (tcv * gw_i + ccc * gw_j)
        elif mode == "reference_asymmetric":
            coef = m_eff * ccc * (0.5 * (gw_i + gw_j))
        else:
            coef = m_eff * (tcv + ccc) * (0.5 * (gw_i + gw_j))
        a_gx[:] += dxx * coef
        a_gy[:] += dxy * coef
        a_gz[:] += dxz * coef
        if av:
            cvx, cvy, cvz, ch, ccs, crho = tiles[6:12]
            dvx = tvxv - cvx
            dvy = tvyv - cvy
            dvz = tvzv - cvz
            vdotr = dvx * dxx + dvy * dxy + dvz * dxz
            hbar = 0.5 * (thv + ch)
            mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
            cbar = 0.5 * (tcsv + ccs)
            rhobar = 0.5 * (trhov + crho)
            pi_ij = jnp.where(vdotr < 0.0,
                              (-av_alpha * cbar * mu + av_beta * mu * mu)
                              / rhobar, 0.0)
            if sign_bug:
                # AV always uses the CORRECT derivative (parity sign bug
                # would inject energy); recompute without the bug
                gs_av = 0.5 * (_gw_from(q, tihv, tih4, inv_r, False)
                               + _gw_from(qj, cih, cih4, inv_r, False))
            else:
                gs_av = 0.5 * (gw_i + gw_j)
            cav = m_eff * pi_ij * gs_av
            a_vx[:] += dxx * cav
            a_vy[:] += dxy * cav
            a_vz[:] += dxz * cav

    _sweep(nv, rows, chunk, body)
    gpx_ref[:] = _rsum(a_gx)
    gpy_ref[:] = _rsum(a_gy)
    gpz_ref[:] = _rsum(a_gz)
    if av:
        avx_ref[:] = _rsum(a_vx)
        avy_ref[:] = _rsum(a_vy)
        avz_ref[:] = _rsum(a_vz)


def pass2(nv, tgt, src, *, b, chunk, mode, av, sign_bug, av_alpha=0.0,
          av_beta=0.0):
    """Pressure-gradient sweep with precomputed per-particle coefficients.

    tgt cols: x,y,z,ih, then tc (absent for reference_asymmetric), then AV
    (vx,vy,vz,h,cs,rho). src rows: x,y,z,ih,m,cc, then AV
    (vx,vy,vz,h,cs,rho). Per-pair math:
      grad_h:  coef = m (tc gw_i + cc gw_j)        tc=cc=P/(Omega rho^2)
      symmetric: coef = m (tc + cc) gsym           tc=cc=P/rho^2
      asym:    coef = m cc gsym                    cc=P/rho
    Returns (gpx,gpy,gpz) — the caller applies the target-side rho scale —
    plus (avx,avy,avz) when av=True (caller scales by trho as well).
    """
    kern = functools.partial(_pass2_kernel, chunk=chunk, mode=mode, av=av,
                             sign_bug=sign_bug, av_alpha=av_alpha,
                             av_beta=av_beta)
    n_out = 6 if av else 3
    return _call(kern, out_dtypes=[jnp.float32] * n_out, smem=[nv],
                 tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=n_out)


# ---------------------------------------------------------------------------
# gravity P2P over MAC-rejected sub-block windows (Dyer-Ip softened)
# ---------------------------------------------------------------------------

def _p2p_kernel(nv_ref, *args, chunk, receiver_soft, g_const, bf16):
    if receiver_soft:
        (tx, ty, tz, tih, sx, sy, sz, sm,
         phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
         a_phi, a_gx, a_gy, a_gz, a_nd) = args
    else:
        (tx, ty, tz, tih, sx, sy, sz, sih, sm,
         phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
         a_phi, a_gx, a_gy, a_gz, a_nd) = args
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
    zero = jnp.zeros(a_phi.shape, jnp.float32)
    a_phi[:] = zero
    a_gx[:] = zero
    a_gy[:] = zero
    a_gz[:] = zero
    a_nd[:] = zero
    rows = [sx, sy, sz, sm] if receiver_soft else [sx, sy, sz, sih, sm]

    def body(tiles, valid):
        if receiver_soft:
            cx, cy, cz, cm = tiles
            inv_a = tihv
        else:
            cx, cy, cz, cih, cm = tiles
            inv_a = jnp.minimum(tihv, cih)
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        m_eff = jnp.where(valid, cm, 0.0)
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        x = (r2 * inv_r) * inv_a
        near = x < 1.0
        if bf16:
            bf = lambda v: v.astype(jnp.bfloat16)
            dxxb, dxyb, dxzb = bf(dxx), bf(dxy), bf(dxz)
            xb, mb = bf(x), bf(m_eff)
            inv_ab = jnp.broadcast_to(bf(inv_a), dxx.shape)
            inv_rb = bf(inv_r)
            x2 = xb * xb
            x3 = x2 * xb
            inv_a3 = inv_ab * inv_ab * inv_ab
            inner_mag = (mb * inv_a3) * (8.0 - 9.0 * xb + 2.0 * x3)
            inner_phi = -(mb * inv_ab) * (2.4 - 4.0 * x2 + 3.0 * x3
                                          - 0.4 * x2 * x3)
            outer_mag = mb * inv_rb * inv_rb * inv_rb
            outer_phi = -mb * inv_rb
            mag = jnp.where(near, inner_mag, outer_mag)
            phi = jnp.where(near, inner_phi, outer_phi)
            f32 = lambda v: v.astype(jnp.float32)
            a_phi[:] += f32(phi)
            a_gx[:] += f32(dxxb * mag)
            a_gy[:] += f32(dxyb * mag)
            a_gz[:] += f32(dxzb * mag)
        else:
            x2 = x * x
            x3 = x2 * x
            # inv_a^3: target-constant under receiver softening but pair-
            # dependent under min(); compute per pair (3 muls) either way
            inv_a3 = inv_a * inv_a * inv_a
            inner_mag = (m_eff * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
            inner_phi = -(m_eff * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3
                                            - 0.4 * x2 * x3)
            mr = m_eff * inv_r
            outer_mag = mr * inv_r * inv_r
            mag = jnp.where(near, inner_mag, outer_mag)
            phi = jnp.where(near, inner_phi, -mr)
            a_phi[:] += phi
            a_gx[:] += dxx * mag
            a_gy[:] += dxy * mag
            a_gz[:] += dxz * mag
        a_nd[:] += jnp.where(m_eff > 0.0, 1.0, 0.0)

    _sweep(nv, rows, chunk, body)
    phi_ref[:] = g_const * _rsum(a_phi)
    gx_ref[:] = g_const * _rsum(a_gx)
    gy_ref[:] = g_const * _rsum(a_gy)
    gz_ref[:] = g_const * _rsum(a_gz)
    nd_ref[:] = _rsum(a_nd).astype(jnp.int32)


def p2p(nv, tgt, src, *, b, chunk, receiver_soft, g_const, bf16=False):
    """Near-field gravity sweep (``GravityFieldSystem.cs:332-356`` analog).

    tgt cols: x,y,z,ih. src rows: x,y,z,m under receiver softening,
    x,y,z,ih,m under min-h softening. Returns (phi, gx, gy, gz, n_direct);
    phi INCLUDES the self term -2.4 m_i / a_i and n_direct INCLUDES the
    self pair — callers correct both analytically.
    """
    kern = functools.partial(_p2p_kernel, chunk=chunk,
                             receiver_soft=receiver_soft, g_const=g_const,
                             bf16=bf16)
    return _call(kern, out_dtypes=[jnp.float32] * 4 + [jnp.int32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=5)

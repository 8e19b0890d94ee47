"""Windowed block-pair Pallas kernels — the grid/tree production hot path.

The reference's per-pair hot loops (``KernelSystem.CalculateInteractionJob``,
``KernelSystem.cs:235-335``; the gravity treewalk + leaf P2P,
``GravityFieldSystem.cs:133-215,332-356``) are Burst-compiled scalar loops
over sorted pair lists. The TPU-native formulation evaluates the same sums as
dense masked tiles over *Morton block windows*:

- Targets are Morton-sorted, cell-bounded blocks of ``B`` particles
  (``ops/grouping.py``). For each target block, a per-block *window list* of
  candidate source blocks (SPH-adjacent blocks, or MAC-rejected blocks for
  gravity P2P) is built every ``rebuild_every`` steps (``ops/structure.py``).
- Source fields are gathered window-wise into ``[G, W*B]`` row arrays by XLA
  (contiguous 2-4KB block rows — full-bandwidth gathers, never per-particle
  row gathers).
- Each kernel instance owns ONE target block: the grid is 1-D over groups,
  the group's full candidate row set stays VMEM-resident, and the pair
  sweep is an in-kernel ``fori_loop`` over [B, CHUNK] tiles with a DYNAMIC
  trip count ``ceil(nv/CHUNK)`` — work tracks the real adjacency, not the
  static window capacity, and there is no per-tile grid-dispatch overhead
  (a 2-D (G, chunks) grid measured ~5x slower at 100k from dispatch alone).
- The far-field M2P kernel needs no gather at all: every target block scans
  the full block-summary table (mass + center of mass per source block, a
  few KB) against a frozen per-(group, block) acceptance mask.

All kernels fall back to interpret mode off-TPU so the same code path is
testable on CPU (tests/conftest.py pattern).

Layout conventions:
  - target fields:  [G*B, 1] f32 columns, BlockSpec (B, 1) indexed by g
  - source fields:  [G, 1, S] f32 rows (S = padded W*B), BlockSpec
    (1, 1, S) indexed by g — the singleton middle axis satisfies Mosaic's
    block-shape rule (second-to-last block dim must divide 8 or equal the
    array's)
  - outputs:        [G*B, 1] columns, written once per group
  - per-group scalars (valid slot counts): int32 [G] in SMEM
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import _on_tpu, _spline_w, _spline_dw_over_r, _dyer_ip_tile

_SCL = pl.BlockSpec(memory_space=pltpu.SMEM)


def _spline_dw_dh(r2, inv_h):
    """dW/dh from r^2 and 1/h (see ops/kernels.dw_dh); NaN-free for r2 >= 0."""
    r = jnp.sqrt(r2)
    q = r * inv_h
    inv_h4 = inv_h * inv_h * inv_h * inv_h
    c = (1.0 / jnp.pi) * inv_h4
    q2 = q * q
    inner = 3.0 * (1.0 - 1.5 * q2 + 0.75 * q2 * q) + (-3.0 * q2 + 2.25 * q2 * q)
    t = 2.0 - q
    outer = 0.75 * t * t * t - 0.75 * q * t * t
    val = jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
    return -val * c


def _dyer_ip_poly(dxx, dxy, dxz, x, m, inv_a, inv_r, near):
    """Dyer-Ip softened gravity from precomputed x = r/a, 1/r, and the
    near mask (any dtype).

    Same math as pairwise._dyer_ip_tile, but rsqrt and the x<1 comparison
    are hoisted out so the polynomial part can run in bf16 (v5e Mosaic
    supports neither bf16 rsqrt nor bf16 compare)."""
    x2 = x * x
    x3 = x2 * x
    inv_a3 = inv_a * inv_a * inv_a
    inner_mag = (m * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
    inner_phi = -(m * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3 - 0.4 * x2 * x3)
    outer_mag = m * inv_r * inv_r * inv_r
    outer_phi = -m * inv_r
    mag = jnp.where(near, inner_mag, outer_mag)
    phi = jnp.where(near, inner_phi, outer_phi)
    return dxx * mag, dxy * mag, dxz * mag, phi


def _sweep(nv, rows, chunk, body, init):
    """fori_loop over [1, CHUNK] tiles of VMEM-resident row refs.

    rows: list of [1, 1, S] (or [1, S]) row REFS — sliced per chunk with
    pl.ds (Mosaic lowers dynamic ref slices but not jnp dynamic_slice on
    values). body(c, carry, tiles, valid) -> carry. Trip count is
    ceil(nv/chunk) — chunks beyond the group's real window count never
    execute."""
    s = rows[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def slice_ref(r, off):
        if len(r.shape) == 3:
            return r[:, 0, pl.ds(off, chunk)]
        return r[:, pl.ds(off, chunk)]

    def step(c, carry):
        off = pl.multiple_of(c * chunk, chunk)
        tiles = [slice_ref(r, off) for r in rows]
        valid = (iota + off) < nv
        return body(c, carry, tiles, valid)

    trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
    return jax.lax.fori_loop(0, trips, step, init)


def _call(kernel, *, n_tgt, n_src, out_dtypes, smem, tgt_cols,
          src_rows, b):
    """Assemble a pallas_call for the windowed-pair pattern (1-D grid)."""
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
        in_specs=[_SCL] * len(smem) + [col] * n_tgt + [row] * n_src,
        out_specs=[col] * len(out_dtypes),
        out_shape=outs,
        interpret=not _on_tpu(),
    )(*smem, *tgt_cols, *rows3)


# ---------------------------------------------------------------------------
# pass 1: density + neighbor count (+ grad-h dW/dh sum)
# ---------------------------------------------------------------------------

def _pass1_kernel(nv_ref, tx, ty, tz, tih, tm, toid,
                  sx, sy, sz, sih, sm, soid, slv,
                  rho_ref, nn_ref, *, chunk, gradh, xi_ref=None):
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv, toidv = tx[:], ty[:], tz[:], tih[:], toid[:]
    rows = [sx, sy, sz, sm, soid, slv] + ([] if gradh else [sih])

    def body(c, carry, tiles, valid):
        cx, cy, cz, cm, coid, clv = tiles[:6]
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        pair = valid & (clv > 0.5) & (toidv != coid)
        m_eff = jnp.where(pair, cm, 0.0)
        w_i = _spline_w(r2, tihv)
        nn_p = jnp.sum(jnp.where(pair & (w_i > 0.0), 1, 0), axis=1,
                       keepdims=True)
        if gradh:
            rho_a, xi_a, nn_a = carry
            rho_a += jnp.sum(m_eff * w_i, axis=1, keepdims=True)
            xi_a += jnp.sum(m_eff * _spline_dw_dh(r2, tihv), axis=1,
                            keepdims=True)
            return rho_a, xi_a, nn_a + nn_p
        rho_a, nn_a = carry
        w_j = _spline_w(r2, tiles[6])
        rho_a += jnp.sum(m_eff * 0.5 * (w_i + w_j), axis=1, keepdims=True)
        return rho_a, nn_a + nn_p

    w0 = (1.0 / jnp.pi) * tihv * tihv * tihv
    self_rho = tm[:] * w0                       # m_i W(0,h_i)
    zf = jnp.zeros_like(self_rho)
    zi = jnp.zeros((self_rho.shape[0], 1), jnp.int32)
    if gradh:
        rho_a, xi_a, nn_a = _sweep(nv, rows, chunk, body, (zf, zf, zi))
        rho_ref[:] = self_rho + rho_a
        xi_ref[:] = -3.0 * self_rho * tihv + xi_a   # self dW/dh term
        nn_ref[:] = nn_a
    else:
        rho_a, nn_a = _sweep(nv, rows, chunk, body, (zf, zi))
        rho_ref[:] = self_rho + rho_a
        nn_ref[:] = nn_a


def pass1(nv, tgt, src, *, b, chunk, gradh=False):
    """Density sweep. tgt = (x,y,z,inv_h,m,oid) cols; src = (x,y,z,inv_h,
    m,oid,live) rows. Returns (rho, nn[, xi]) as [G*B, 1] columns."""
    if gradh:
        def kern(nv_ref, *args):
            *rest, rho_ref, nn_ref, xi_ref = args
            _pass1_kernel(nv_ref, *rest, rho_ref, nn_ref,
                          chunk=chunk, gradh=True, xi_ref=xi_ref)
        out_dtypes = [jnp.float32, jnp.int32, jnp.float32]
    else:
        kern = functools.partial(_pass1_kernel, chunk=chunk, gradh=False)
        out_dtypes = [jnp.float32, jnp.int32]
    return _call(kern, n_tgt=6, n_src=7, out_dtypes=out_dtypes, smem=[nv],
                 tgt_cols=tgt, src_rows=src, b=b)


# ---------------------------------------------------------------------------
# pass 2: pressure gradient (+ fused artificial viscosity)
# ---------------------------------------------------------------------------

def _pass2_kernel(nv_ref, *args, chunk, mode, av, sign_bug,
                  av_alpha, av_beta):
    """mode in {'symmetric', 'reference_asymmetric', 'grad_h'}."""
    it = iter(args)
    tx, ty, tz, tih, toid, trho = (next(it) for _ in range(6))
    tpv = next(it)              # coef (grad_h) or pressure
    if av:
        tvx, tvy, tvz, th, tcs = (next(it) for _ in range(5))
    srcs = [next(it) for _ in range(7)]           # x,y,z,ih,m,oid,live
    if mode == "grad_h":
        s_extra = [next(it)]                      # coef
        if av:
            s_extra.append(next(it))              # rho
    else:
        s_extra = [next(it), next(it)]            # rho, prs
    s_av = [next(it) for _ in range(5)] if av else []   # vx,vy,vz,h,cs
    gpx_ref, gpy_ref, gpz_ref = (next(it) for _ in range(3))

    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv, toidv = tx[:], ty[:], tz[:], tih[:], toid[:]
    trhov, tpvv = trho[:], tpv[:]
    rows = srcs + s_extra + s_av
    n_extra = len(s_extra)

    def body(c, carry, tiles, valid):
        gx_a, gy_a, gz_a = carry
        cx, cy, cz, cih, cm, coid, clv = tiles[:7]
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        pair = valid & (clv > 0.5) & (toidv != coid)
        m_eff = jnp.where(pair, cm, 0.0)
        gw_i = _spline_dw_over_r(r2, tihv, sign_bug)
        gw_j = _spline_dw_over_r(r2, cih, sign_bug)
        if mode == "grad_h":
            ccoef = tiles[7]
            coef = m_eff * (tpvv * gw_i + ccoef * gw_j) * trhov
            crho_av = tiles[8] if av else None
        else:
            crho, cprs = tiles[7], tiles[8]
            gsym = 0.5 * (gw_i + gw_j)
            if mode == "reference_asymmetric":
                coef = m_eff * (cprs / crho) * gsym
            else:
                coef = m_eff * (tpvv / (trhov * trhov)
                                + cprs / (crho * crho)) * trhov * gsym
            crho_av = crho
        if av:
            # Monaghan AV fused into the same sweep; always the CORRECT
            # kernel derivative (the parity sign bug would inject energy)
            cvx, cvy, cvz, ch, ccs = tiles[7 + n_extra:12 + n_extra]
            dvx = tvx[:] - cvx
            dvy = tvy[:] - cvy
            dvz = tvz[:] - cvz
            vdotr = dvx * dxx + dvy * dxy + dvz * dxz
            hbar = 0.5 * (th[:] + ch)
            mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
            cbar = 0.5 * (tcs[:] + ccs)
            rhobar = 0.5 * (trhov + crho_av)
            pi_ij = jnp.where(pair & (vdotr < 0.0),
                              (-av_alpha * cbar * mu + av_beta * mu * mu)
                              / rhobar, 0.0)
            if sign_bug:
                gs_av = 0.5 * (_spline_dw_over_r(r2, tihv, False)
                               + _spline_dw_over_r(r2, cih, False))
            else:
                gs_av = 0.5 * (gw_i + gw_j)
            coef = coef + m_eff * pi_ij * gs_av * trhov
        return (gx_a + jnp.sum(dxx * coef, axis=1, keepdims=True),
                gy_a + jnp.sum(dxy * coef, axis=1, keepdims=True),
                gz_a + jnp.sum(dxz * coef, axis=1, keepdims=True))

    z = jnp.zeros((txv.shape[0], 1), jnp.float32)
    gx_a, gy_a, gz_a = _sweep(nv, rows, chunk, body, (z, z, z))
    gpx_ref[:] = gx_a
    gpy_ref[:] = gy_a
    gpz_ref[:] = gz_a


def pass2(nv, tgt, src, *, b, chunk, mode, av, sign_bug, av_alpha=0.0,
          av_beta=0.0):
    """Pressure-gradient sweep (effective grad P, AV folded in when av=True).

    tgt cols: x,y,z,inv_h,oid,rho, then (coef | prs), then AV (vx,vy,vz,h,cs).
    src rows: x,y,z,inv_h,m,oid,live, then (coef[,rho] | rho,prs), then AV
    (vx,vy,vz,h,cs). Returns (gpx, gpy, gpz) columns.
    """
    kern = functools.partial(_pass2_kernel, chunk=chunk, mode=mode, av=av,
                             sign_bug=sign_bug, av_alpha=av_alpha,
                             av_beta=av_beta)
    return _call(kern, n_tgt=len(tgt), n_src=len(src),
                 out_dtypes=[jnp.float32] * 3, smem=[nv], tgt_cols=tgt,
                 src_rows=src, b=b)


# ---------------------------------------------------------------------------
# gravity P2P over MAC-rejected block windows (Dyer-Ip softened)
# ---------------------------------------------------------------------------

def _p2p_kernel(nv_ref, tx, ty, tz, tih, toid,
                sx, sy, sz, sih, sm, soid, slv,
                phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
                *, chunk, receiver_soft, g_const, bf16=False):
    nv = nv_ref[pl.program_id(0)]
    txv, tyv, tzv, tihv, toidv = tx[:], ty[:], tz[:], tih[:], toid[:]
    rows = [sx, sy, sz, sih, sm, soid, slv]

    def body(c, carry, tiles, valid):
        phi_a, gx_a, gy_a, gz_a, nd_a = carry
        cx, cy, cz, cih, cm, coid, clv = tiles
        dxx = txv - cx                  # separations in f32 (bf16 subtract
        dxy = tyv - cy                  # of ~40-unit coords would lose the
        dxz = tzv - cz                  # near-pair dx entirely)
        pair = valid & (clv > 0.5) & (toidv != coid)
        m_eff = jnp.where(pair, cm, 0.0)
        inv_a = tihv if receiver_soft else jnp.minimum(tihv, cih)
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        if bf16:
            # rsqrt and the x<1 compare stay f32 (v5e Mosaic supports
            # neither in bf16); the polynomial math runs in bf16
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            x = (r2 * inv_r) * inv_a
            bf = lambda v: v.astype(jnp.bfloat16)
            pgx, pgy, pgz, pphi = _dyer_ip_poly(
                bf(dxx), bf(dxy), bf(dxz), bf(x), bf(m_eff),
                jnp.broadcast_to(bf(inv_a), dxx.shape), bf(inv_r),
                x < 1.0)
        else:
            pgx, pgy, pgz, pphi = _dyer_ip_tile(dxx, dxy, dxz, r2, m_eff,
                                                inv_a)
        f32 = lambda x: x.astype(jnp.float32) if bf16 else x
        return (phi_a + jnp.sum(f32(pphi), axis=1, keepdims=True),
                gx_a + jnp.sum(f32(pgx), axis=1, keepdims=True),
                gy_a + jnp.sum(f32(pgy), axis=1, keepdims=True),
                gz_a + jnp.sum(f32(pgz), axis=1, keepdims=True),
                nd_a + jnp.sum(jnp.where(pair & (cm > 0.0), 1, 0),
                               axis=1, keepdims=True))

    z = jnp.zeros((txv.shape[0], 1), jnp.float32)
    zi = jnp.zeros((txv.shape[0], 1), jnp.int32)
    phi_a, gx_a, gy_a, gz_a, nd_a = _sweep(nv, rows, chunk, body,
                                           (z, z, z, z, zi))
    phi_ref[:] = g_const * phi_a
    gx_ref[:] = g_const * gx_a
    gy_ref[:] = g_const * gy_a
    gz_ref[:] = g_const * gz_a
    nd_ref[:] = nd_a


def p2p(nv, tgt, src, *, b, chunk, receiver_soft, g_const, bf16=False):
    """Near-field gravity sweep (``GravityFieldSystem.cs:332-356`` analog).

    tgt cols: x,y,z,inv_h,oid. src rows: x,y,z,inv_h,m,oid,live.
    Returns (phi, gx, gy, gz, n_direct) columns. `bf16` runs the per-pair
    math in bfloat16 (f32 separations and accumulation; see SimConfig.
    grav_pair_dtype).
    """
    kern = functools.partial(_p2p_kernel, chunk=chunk,
                             receiver_soft=receiver_soft, g_const=g_const,
                             bf16=bf16)
    return _call(kern, n_tgt=5, n_src=7,
                 out_dtypes=[jnp.float32] * 4 + [jnp.int32], smem=[nv],
                 tgt_cols=tgt, src_rows=src, b=b)


# ---------------------------------------------------------------------------
# gravity ring: windowed SUB-block monopoles (block-MAC rejected but
# sub-MAC accepted — the middle tier of the three-tier partition)
# ---------------------------------------------------------------------------

def _sweep_k(nv, k, rows, chunk, body, init):
    """Carry-based chunk sweep over group `k`'s row (leading dim of the
    [gb, 1, S] refs) — the gb-batched variant of :func:`_sweep`."""
    s = rows[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def step(c, carry):
        off = pl.multiple_of(c * chunk, chunk)
        tiles = [r[pl.ds(k, 1), 0, pl.ds(off, chunk)] for r in rows]
        valid = (iota + off) < nv
        return body(c, carry, tiles, valid)

    trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
    return jax.lax.fori_loop(0, trips, step, init)


def _m2p_ring_kernel(nv_ref, tx, ty, tz, sm, sx, sy, sz,
                     phi_ref, gx_ref, gy_ref, gz_ref, na_ref,
                     *, chunk, g_const, gb, b):
    rows = [sm, sx, sy, sz]
    pid = pl.program_id(0)

    def per_group(k, carry):
        o = pl.multiple_of(k * b, b)
        sl = pl.ds(o, b)
        nv = nv_ref[pid * gb + k]
        txv, tyv, tzv = tx[sl, :], ty[sl, :], tz[sl, :]

        def body(c, carry, tiles, valid):
            phi_a, gx_a, gy_a, gz_a, na_a = carry
            cm_, cx, cy, cz = tiles
            use = valid & (cm_ > 0.0)
            m_eff = jnp.where(use, cm_, 0.0)
            dxx = txv - cx
            dxy = tyv - cy
            dxz = tzv - cz
            r2 = dxx * dxx + dxy * dxy + dxz * dxz
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            mag = m_eff * inv_r * inv_r * inv_r      # unsoftened monopole
            return (phi_a + jnp.sum(-m_eff * inv_r, axis=1, keepdims=True),
                    gx_a + jnp.sum(dxx * mag, axis=1, keepdims=True),
                    gy_a + jnp.sum(dxy * mag, axis=1, keepdims=True),
                    gz_a + jnp.sum(dxz * mag, axis=1, keepdims=True),
                    na_a + jnp.sum(jnp.where(use, 1, 0), axis=1,
                                   keepdims=True))

        z = jnp.zeros((b, 1), jnp.float32)
        zi = jnp.zeros((b, 1), jnp.int32)
        phi_a, gx_a, gy_a, gz_a, na_a = _sweep_k(nv, k, rows, chunk, body,
                                                 (z, z, z, z, zi))
        phi_ref[sl, :] = g_const * phi_a
        gx_ref[sl, :] = g_const * gx_a
        gy_ref[sl, :] = g_const * gy_a
        gz_ref[sl, :] = g_const * gz_a
        na_ref[sl, :] = na_a
        return carry

    jax.lax.fori_loop(0, gb, per_group, 0)


def m2p_ring(nv, tgt, src, *, b, chunk, g_const, gb=1):
    """Windowed sub-block-monopole sweep: each source lane is one sub-block
    (mass, cm) entry. tgt cols: x,y,z. src rows: mass,cmx,cmy,cmz, each
    [G, Wm_pad]. Returns (phi, gx, gy, gz, n_entries) columns."""
    s = src[0].shape[1]
    g_total = tgt[0].shape[0] // b
    ng = -(-g_total // gb)
    gpad = ng * gb - g_total
    if gpad:
        nv = jnp.pad(nv, (0, gpad))
        tgt = [jnp.pad(x, ((0, gpad * b), (0, 0))) for x in tgt]
        src = [jnp.pad(r, ((0, gpad), (0, 0))) for r in src]
    col = pl.BlockSpec((gb * b, 1), lambda g: (g, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((gb, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((ng * gb * b, 1), jnp.float32)] * 4 + \
           [jax.ShapeDtypeStruct((ng * gb * b, 1), jnp.int32)]
    kern = functools.partial(_m2p_ring_kernel, chunk=chunk,
                             g_const=g_const, gb=gb, b=b)
    res = pl.pallas_call(
        kern,
        grid=(ng,),
        in_specs=[_SCL] + [col] * 3 + [row] * 4,
        out_specs=[col] * 5,
        out_shape=outs,
        interpret=not _on_tpu(),
    )(nv, *tgt, *[r[:, None, :] for r in src])
    if gpad:
        res = tuple(r[:g_total * b] for r in res)
    return res


# ---------------------------------------------------------------------------
# gravity M2P: block-monopole far field, gather-free
# ---------------------------------------------------------------------------

def _m2p_kernel(tx, ty, tz, bm, bx, by, bz, acc,
                phi_ref, gx_ref, gy_ref, gz_ref, na_ref,
                *, chunk, g_const, gb, b, bf16=False):
    nbpad = bm.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def per_group(k, carry):
        o = pl.multiple_of(k * b, b)
        sl = pl.ds(o, b)
        txv, tyv, tzv = tx[sl, :], ty[sl, :], tz[sl, :]

        def step(c, carry):
            phi_a, gx_a, gy_a, gz_a, na_a = carry
            off = pl.multiple_of(c * chunk, chunk)
            cm_ = bm[:, pl.ds(off, chunk)]
            cx = bx[:, pl.ds(off, chunk)]
            cy = by[:, pl.ds(off, chunk)]
            cz = bz[:, pl.ds(off, chunk)]
            cacc = acc[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            use = (cacc > 0.5) & (cm_ > 0.0)
            m_eff = jnp.where(use, cm_, 0.0)
            dxx = txv - cx              # f32 separations (see _p2p_kernel)
            dxy = tyv - cy
            dxz = tzv - cz
            r2 = dxx * dxx + dxy * dxy + dxz * dxz
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))   # f32 rsqrt
            if bf16:                            # (v5e has no bf16 rsqrt)
                dxx = dxx.astype(jnp.bfloat16)
                dxy = dxy.astype(jnp.bfloat16)
                dxz = dxz.astype(jnp.bfloat16)
                m_eff = m_eff.astype(jnp.bfloat16)
                inv_r = inv_r.astype(jnp.bfloat16)
            mag = m_eff * inv_r * inv_r * inv_r  # unsoftened monopole
            f32 = lambda x: x.astype(jnp.float32) if bf16 else x
            return (phi_a + jnp.sum(f32(-m_eff * inv_r), axis=1,
                                    keepdims=True),
                    gx_a + jnp.sum(f32(dxx * mag), axis=1, keepdims=True),
                    gy_a + jnp.sum(f32(dxy * mag), axis=1, keepdims=True),
                    gz_a + jnp.sum(f32(dxz * mag), axis=1, keepdims=True),
                    na_a + jnp.sum(jnp.where(use, 1, 0), axis=1,
                                   keepdims=True))

        z = jnp.zeros((b, 1), jnp.float32)
        zi = jnp.zeros((b, 1), jnp.int32)
        phi_a, gx_a, gy_a, gz_a, na_a = jax.lax.fori_loop(
            0, nbpad // chunk, step, (z, z, z, z, zi))
        phi_ref[sl, :] = g_const * phi_a
        gx_ref[sl, :] = g_const * gx_a
        gy_ref[sl, :] = g_const * gy_a
        gz_ref[sl, :] = g_const * gz_a
        na_ref[sl, :] = na_a
        return carry

    jax.lax.fori_loop(0, gb, per_group, 0)


def m2p(tgt, summaries, accept, *, b, chunk, g_const, bf16=False, gb=1):
    """Far-field sweep over ALL source blocks, masked by the frozen per-
    (group, block) MAC acceptance (``GravityFieldSystem.cs:428-442`` analog,
    at source-block granularity — finer, hence strictly more accurate, than
    the reference's BVH-node monopoles).

    tgt cols: x,y,z ([G*B,1]). summaries: (mass, cmx, cmy, cmz) each
    [1, NBpad] (broadcast to every group — DMA'd once, the index_map is
    grid-constant). accept: [G, NBpad] f32.
    Returns (phi, gx, gy, gz, n_approx) columns.
    """
    g_total = tgt[0].shape[0] // b
    nbpad = summaries[0].shape[1]
    ng = -(-g_total // gb)
    gpad = ng * gb - g_total
    if gpad:
        tgt = [jnp.pad(x, ((0, gpad * b), (0, 0))) for x in tgt]
        accept = jnp.pad(accept, ((0, gpad), (0, 0)))
    col = pl.BlockSpec((gb * b, 1), lambda g_: (g_, 0),
                       memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, nbpad), lambda g_: (0, 0),
                        memory_space=pltpu.VMEM)
    arow = pl.BlockSpec((gb, 1, nbpad), lambda g_: (g_, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((ng * gb * b, 1), jnp.float32)] * 4 + \
           [jax.ShapeDtypeStruct((ng * gb * b, 1), jnp.int32)]
    kern = functools.partial(_m2p_kernel, chunk=chunk, g_const=g_const,
                             bf16=bf16, gb=gb, b=b)
    res = pl.pallas_call(
        kern,
        grid=(ng,),
        in_specs=[col] * 3 + [srow] * 4 + [arow],
        out_specs=[col] * 5,
        out_shape=outs,
        interpret=not _on_tpu(),
    )(*tgt, *summaries, accept[:, None, :])
    if gpad:
        res = tuple(r[:g_total * b] for r in res)
    return res

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
  row gathers), then each kernel sweeps ``[B, CHUNK]`` pair tiles with the
  target block VMEM-resident across the whole sweep.
- Chunks beyond a block's real window count are *skipped* (`nv` scalar per
  group in SMEM), so compute tracks the actual adjacency, not the static
  window capacity.
- The far-field M2P kernel needs no gather at all: every target block scans
  the full block-summary table (mass + center of mass per source block, a
  few KB) against a frozen per-(group, block) acceptance mask.

All kernels fall back to interpret mode off-TPU so the same code path is
testable on CPU (tests/conftest.py pattern).

Layout conventions (matching ops/pallas/pairwise.py):
  - target fields:  [G*B, 1] f32 columns, BlockSpec (B, 1) indexed by g
  - source fields:  [G, NC*CHUNK] f32 rows, BlockSpec (1, CHUNK) by (g, c)
  - outputs:        [G*B, 1] columns, initialized at c == 0, accumulated
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


def _slot_valid(nv_ref, chunk):
    """([1,CHUNK] slot-valid mask, scalar nv) for the current (g, c) tile."""
    g = pl.program_id(0)
    c = pl.program_id(1)
    nv = nv_ref[g]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
    return slot < nv, nv


def _call(kernel, *, grid, n_tgt, n_src, out_dtypes, smem, tgt_cols,
          src_rows, b, chunk, extra_rows=()):
    """Assemble a pallas_call for the windowed-pair pattern.

    Source rows get a singleton middle axis ([G, 1, S], block (1, 1, CHUNK))
    because Mosaic requires the block's second-to-last dim to divide 8 or
    equal the array's — (1, CHUNK) on a [G, S] array is rejected on TPU.
    Kernels read them with ref[0] -> [1, CHUNK]."""
    col = pl.BlockSpec((b, 1), lambda g, c: (g, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, chunk), lambda g, c: (g, 0, c),
                       memory_space=pltpu.VMEM)
    g_total = tgt_cols[0].shape[0] // b
    outs = [jax.ShapeDtypeStruct((g_total * b, 1), dt) for dt in out_dtypes]
    rows3 = [r[:, None, :] for r in src_rows]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_SCL] * len(smem) + [col] * n_tgt + [row] * n_src,
        out_specs=[col] * len(out_dtypes),
        out_shape=outs,
        interpret=not _on_tpu(),
    )(*smem, *tgt_cols, *rows3, *extra_rows)


# ---------------------------------------------------------------------------
# pass 1: density + neighbor count (+ grad-h dW/dh sum)
# ---------------------------------------------------------------------------

def _pass1_kernel(nv_ref, tx, ty, tz, tih, tm, toid,
                  sx, sy, sz, sih, sm, soid, slv,
                  rho_ref, nn_ref, *, chunk, gradh, xi_ref=None):
    valid, _ = _slot_valid(nv_ref, chunk)
    dxx = tx[:] - sx[0]
    dxy = ty[:] - sy[0]
    dxz = tz[:] - sz[0]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    pair = valid & (slv[0] > 0.5) & (toid[:] != soid[0])
    m_eff = jnp.where(pair, sm[0], 0.0)
    w_i = _spline_w(r2, tih[:])

    @pl.when(pl.program_id(1) == 0)
    def _():
        ih = tih[:]
        w0 = (1.0 / jnp.pi) * ih * ih * ih
        rho_ref[:] = tm[:] * w0                     # self term (m_i W(0,h_i))
        nn_ref[:] = jnp.zeros_like(nn_ref)
        if gradh:
            # self term of dW/dh: -3 W(0,h)/h
            xi_ref[:] = -3.0 * tm[:] * w0 * ih

    @pl.when(pl.program_id(1) * chunk < nv_ref[pl.program_id(0)])
    def _():
        if gradh:
            rho_ref[:] += jnp.sum(m_eff * w_i, axis=1, keepdims=True)
            xi_ref[:] += jnp.sum(m_eff * _spline_dw_dh(r2, tih[:]),
                                 axis=1, keepdims=True)
        else:
            w_j = _spline_w(r2, sih[0])
            rho_ref[:] += jnp.sum(m_eff * 0.5 * (w_i + w_j), axis=1,
                                  keepdims=True)
        nn_ref[:] += jnp.sum(jnp.where(pair & (w_i > 0.0), 1, 0),
                             axis=1, keepdims=True)


def pass1(nv, tgt, src, *, b, chunk, gradh=False):
    """Density sweep. tgt = (x,y,z,inv_h,m,oid) cols; src = (x,y,z,inv_h,
    m,oid,live) rows. Returns (rho, nn[, xi]) as [G*B, 1] columns."""
    g = tgt[0].shape[0] // b
    nc = src[0].shape[1] // chunk
    if gradh:
        def kern(nv_ref, *args):
            *rest, rho_ref, nn_ref, xi_ref = args
            _pass1_kernel(nv_ref, *rest, rho_ref, nn_ref,
                          chunk=chunk, gradh=True, xi_ref=xi_ref)
        out_dtypes = [jnp.float32, jnp.int32, jnp.float32]
    else:
        kern = functools.partial(_pass1_kernel, chunk=chunk, gradh=False)
        out_dtypes = [jnp.float32, jnp.int32]
    return _call(kern, grid=(g, nc), n_tgt=6, n_src=7,
                 out_dtypes=out_dtypes, smem=[nv], tgt_cols=tgt,
                 src_rows=src, b=b, chunk=chunk)


# ---------------------------------------------------------------------------
# pass 2: pressure gradient (+ fused artificial viscosity)
# ---------------------------------------------------------------------------

def _pass2_kernel(nv_ref, *args, chunk, mode, av, sign_bug,
                  av_alpha, av_beta):
    """mode in {'symmetric', 'reference_asymmetric', 'grad_h'}."""
    it = iter(args)
    tx, ty, tz, tih, toid, trho = (next(it) for _ in range(6))
    if mode == "grad_h":
        tcoef = next(it)
    else:
        tprs = next(it)
    if av:
        tvx, tvy, tvz, th, tcs = (next(it) for _ in range(5))
    sx, sy, sz, sih, sm, soid, slv = (next(it) for _ in range(7))
    if mode == "grad_h":
        scoef = next(it)
        if av:
            srho = next(it)
    else:
        srho, sprs = next(it), next(it)
    if av:
        svx, svy, svz, sh, scs = (next(it) for _ in range(5))
    gpx_ref, gpy_ref, gpz_ref = (next(it) for _ in range(3))

    valid, _ = _slot_valid(nv_ref, chunk)
    dxx = tx[:] - sx[0]
    dxy = ty[:] - sy[0]
    dxz = tz[:] - sz[0]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    pair = valid & (slv[0] > 0.5) & (toid[:] != soid[0])
    m_eff = jnp.where(pair, sm[0], 0.0)

    gw_i = _spline_dw_over_r(r2, tih[:], sign_bug)
    gw_j = _spline_dw_over_r(r2, sih[0], sign_bug)
    if mode == "grad_h":
        # radial = m (coef_i gw(h_i) + coef_j gw(h_j)); gradP = rho_i sum dx radial
        coef = m_eff * (tcoef[:] * gw_i + scoef[0] * gw_j) * trho[:]
    else:
        gsym = 0.5 * (gw_i + gw_j)
        if mode == "reference_asymmetric":
            coef = m_eff * (sprs[0] / srho[0]) * gsym
        else:
            ri = trho[:]
            coef = m_eff * (tprs[:] / (ri * ri)
                            + sprs[0] / (srho[0] * srho[0])) * ri * gsym

    if av:
        # Monaghan (1992) AV fused into the same sweep; always the CORRECT
        # kernel derivative (with the parity sign bug AV would inject energy)
        dvx = tvx[:] - svx[0]
        dvy = tvy[:] - svy[0]
        dvz = tvz[:] - svz[0]
        vdotr = dvx * dxx + dvy * dxy + dvz * dxz
        hbar = 0.5 * (th[:] + sh[0])
        mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
        cbar = 0.5 * (tcs[:] + scs[0])
        srho_av = srho[0]
        rhobar = 0.5 * (trho[:] + srho_av)
        pi_ij = jnp.where(pair & (vdotr < 0.0),
                          (-av_alpha * cbar * mu + av_beta * mu * mu) / rhobar,
                          0.0)
        if sign_bug:
            gs_av = 0.5 * (_spline_dw_over_r(r2, tih[:], False)
                           + _spline_dw_over_r(r2, sih[0], False))
        else:
            gs_av = 0.5 * (gw_i + gw_j)
        # a_av_i = -sum m pi gsym dx; effective gradP += -rho_i a_av
        coef = coef + m_eff * pi_ij * gs_av * trho[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        gpx_ref[:] = jnp.zeros_like(gpx_ref)
        gpy_ref[:] = jnp.zeros_like(gpy_ref)
        gpz_ref[:] = jnp.zeros_like(gpz_ref)

    @pl.when(pl.program_id(1) * chunk < nv_ref[pl.program_id(0)])
    def _():
        gpx_ref[:] += jnp.sum(dxx * coef, axis=1, keepdims=True)
        gpy_ref[:] += jnp.sum(dxy * coef, axis=1, keepdims=True)
        gpz_ref[:] += jnp.sum(dxz * coef, axis=1, keepdims=True)


def pass2(nv, tgt, src, *, b, chunk, mode, av, sign_bug, av_alpha=0.0,
          av_beta=0.0):
    """Pressure-gradient sweep (effective grad P, AV folded in when av=True).

    tgt cols: x,y,z,inv_h,oid,rho, then (coef | prs), then AV (vx,vy,vz,h,cs).
    src rows: x,y,z,inv_h,m,oid,live, then (coef[,rho] | rho,prs), then AV
    (vx,vy,vz,h,cs). Returns (gpx, gpy, gpz) columns.
    """
    g = tgt[0].shape[0] // b
    nc = src[0].shape[1] // chunk
    kern = functools.partial(_pass2_kernel, chunk=chunk, mode=mode, av=av,
                             sign_bug=sign_bug, av_alpha=av_alpha,
                             av_beta=av_beta)
    return _call(kern, grid=(g, nc), n_tgt=len(tgt), n_src=len(src),
                 out_dtypes=[jnp.float32] * 3, smem=[nv], tgt_cols=tgt,
                 src_rows=src, b=b, chunk=chunk)


# ---------------------------------------------------------------------------
# gravity P2P over MAC-rejected block windows (Dyer-Ip softened)
# ---------------------------------------------------------------------------

def _p2p_kernel(nv_ref, tx, ty, tz, tih, toid,
                sx, sy, sz, sih, sm, soid, slv,
                phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
                *, chunk, receiver_soft, g_const):
    valid, _ = _slot_valid(nv_ref, chunk)
    dxx = tx[:] - sx[0]
    dxy = ty[:] - sy[0]
    dxz = tz[:] - sz[0]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    pair = valid & (slv[0] > 0.5) & (toid[:] != soid[0])
    m_eff = jnp.where(pair, sm[0], 0.0)
    inv_a = tih[:] if receiver_soft else jnp.minimum(tih[:], sih[0])

    @pl.when(pl.program_id(1) == 0)
    def _():
        phi_ref[:] = jnp.zeros_like(phi_ref)
        gx_ref[:] = jnp.zeros_like(gx_ref)
        gy_ref[:] = jnp.zeros_like(gy_ref)
        gz_ref[:] = jnp.zeros_like(gz_ref)
        nd_ref[:] = jnp.zeros_like(nd_ref)

    @pl.when(pl.program_id(1) * chunk < nv_ref[pl.program_id(0)])
    def _():
        pgx, pgy, pgz, pphi = _dyer_ip_tile(dxx, dxy, dxz, r2, m_eff, inv_a)
        phi_ref[:] += g_const * jnp.sum(pphi, axis=1, keepdims=True)
        gx_ref[:] += g_const * jnp.sum(pgx, axis=1, keepdims=True)
        gy_ref[:] += g_const * jnp.sum(pgy, axis=1, keepdims=True)
        gz_ref[:] += g_const * jnp.sum(pgz, axis=1, keepdims=True)
        nd_ref[:] += jnp.sum(jnp.where(pair & (sm[0] > 0.0), 1, 0),
                             axis=1, keepdims=True)


def p2p(nv, tgt, src, *, b, chunk, receiver_soft, g_const):
    """Near-field gravity sweep (``GravityFieldSystem.cs:332-356`` analog).

    tgt cols: x,y,z,inv_h,oid. src rows: x,y,z,inv_h,m,oid,live.
    Returns (phi, gx, gy, gz, n_direct) columns.
    """
    g = tgt[0].shape[0] // b
    nc = src[0].shape[1] // chunk
    kern = functools.partial(_p2p_kernel, chunk=chunk,
                             receiver_soft=receiver_soft, g_const=g_const)
    return _call(kern, grid=(g, nc), n_tgt=5, n_src=7,
                 out_dtypes=[jnp.float32] * 4 + [jnp.int32], smem=[nv],
                 tgt_cols=tgt, src_rows=src, b=b, chunk=chunk)


# ---------------------------------------------------------------------------
# gravity M2P: block-monopole far field, gather-free
# ---------------------------------------------------------------------------

def _m2p_kernel(tx, ty, tz, bm, bx, by, bz, acc,
                phi_ref, gx_ref, gy_ref, gz_ref, na_ref, *, g_const):
    use = (acc[0] > 0.5) & (bm[:] > 0.0)
    m_eff = jnp.where(use, bm[:], 0.0)
    dxx = tx[:] - bx[:]
    dxy = ty[:] - by[:]
    dxz = tz[:] - bz[:]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    mag = m_eff * inv_r * inv_r * inv_r      # unsoftened monopole (M2P)

    @pl.when(pl.program_id(1) == 0)
    def _():
        phi_ref[:] = jnp.zeros_like(phi_ref)
        gx_ref[:] = jnp.zeros_like(gx_ref)
        gy_ref[:] = jnp.zeros_like(gy_ref)
        gz_ref[:] = jnp.zeros_like(gz_ref)
        na_ref[:] = jnp.zeros_like(na_ref)

    phi_ref[:] += g_const * jnp.sum(-m_eff * inv_r, axis=1, keepdims=True)
    gx_ref[:] += g_const * jnp.sum(dxx * mag, axis=1, keepdims=True)
    gy_ref[:] += g_const * jnp.sum(dxy * mag, axis=1, keepdims=True)
    gz_ref[:] += g_const * jnp.sum(dxz * mag, axis=1, keepdims=True)
    na_ref[:] += jnp.sum(jnp.where(use, 1, 0), axis=1, keepdims=True)


def m2p(tgt, summaries, accept, *, b, chunk, g_const):
    """Far-field sweep over ALL source blocks, masked by the frozen per-
    (group, block) MAC acceptance (``GravityFieldSystem.cs:428-442`` analog,
    at source-block granularity — finer, hence strictly more accurate, than
    the reference's BVH-node monopoles).

    tgt cols: x,y,z ([G*B,1]). summaries: (mass, cmx, cmy, cmz) each
    [1, NBpad] (broadcast to every group). accept: [G, NBpad] f32.
    Returns (phi, gx, gy, gz, n_approx) columns.
    """
    g = tgt[0].shape[0] // b
    nbpad = summaries[0].shape[1]
    nc = nbpad // chunk
    col = pl.BlockSpec((b, 1), lambda g_, c: (g_, 0), memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, chunk), lambda g_, c: (0, c),
                        memory_space=pltpu.VMEM)
    # accept rows get the singleton middle axis (see _call)
    arow = pl.BlockSpec((1, 1, chunk), lambda g_, c: (g_, 0, c),
                        memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((g * b, 1), jnp.float32)] * 4 + \
           [jax.ShapeDtypeStruct((g * b, 1), jnp.int32)]
    kern = functools.partial(_m2p_kernel, g_const=g_const)
    return pl.pallas_call(
        kern,
        grid=(g, nc),
        in_specs=[col] * 3 + [srow] * 4 + [arow],
        out_specs=[col] * 5,
        out_shape=outs,
        interpret=not _on_tpu(),
    )(*tgt, *summaries, accept[:, None, :])

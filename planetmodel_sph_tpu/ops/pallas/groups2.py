"""Optimized windowed block-pair kernels (the production Pallas sweeps).

These replace the reference's hot loops — the per-pair kernel math of
``CalculateInteractionJob`` (``KernelSystem.cs:235-335``) and the gravity
treewalk/P2P (``GravityFieldSystem.cs:133-215,332-356``). The shared
contract for every kernel here:

- Targets arrive as [G*B, 1] sorted-layout columns, sources as [G, S]
  window rows (gathered by ``ops/structure.py``); each grid step sweeps
  one target group's dense masked [B, CHUNK] pair tiles.
- `nv` (SMEM) is the per-group count of VALID source slots; chunks beyond
  it never execute, and slots past `nv` within the last chunk are masked
  by an iota compare.
- Outputs are [G*B, 1] per-target accumulations in f32.

Three measured structural changes over the round-1 design, worth ~35-45%
of kernel time at the settled 100k operating point
(tools/profile_block.py):

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

from . import fallback
from .pairwise import _on_tpu

_SCL = pl.BlockSpec(memory_space=pltpu.SMEM)
_INV_PI = 1.0 / 3.14159265358979323846


def _use_jnp() -> bool:
    """Off-TPU, dispatch the windowed sweeps to the pure-jnp fallbacks
    (ops/pallas/fallback.py): pallas interpret mode emulates the grid
    tile-by-tile and measured ~50-100x slower than the equivalent fused
    broadcast contraction on XLA:CPU. Set PSPH_FORCE_INTERPRET=1 to pin
    the interpret path (fallback-vs-interpret debugging)."""
    import os
    if os.environ.get("PSPH_FORCE_INTERPRET") == "1":
        return False
    return not _on_tpu()


def _call(kernel, *, out_dtypes, smem, tgt_cols, src_rows, b, chunk,
          n_acc, gb=1, src_rows2=()):
    """Assemble a pallas_call for the windowed-pair pattern (1-D grid over
    target groups) with `n_acc` [B, CHUNK] f32 VMEM accumulators.

    `gb` batches that many groups into one grid step (an in-kernel
    fori_loop): per-grid-step fixed costs (DMA issue + semaphores,
    measured ~2.5us against <1us of pair math per 64-target group at the
    settled 100k point) amortize gb-fold and the window DMAs get gb x
    larger. The kernel receives [gb*B, 1] target cols / [gb, 1, S] rows
    and must loop k in [0, gb) itself (see _groups helper).

    `src_rows2`: optional SECOND row set with its own width (a different
    window swept in the same launch — the residual-P2P merge of
    SimConfig.fuse_p2p_residual); delivered to the kernel after the
    first row set."""
    s = src_rows[0].shape[1]
    g_total = tgt_cols[0].shape[0] // b
    ng = -(-g_total // gb)
    gpad = ng * gb - g_total
    if gpad:
        smem = [jnp.pad(v, (0, gpad)) for v in smem]
        tgt_cols = [jnp.pad(x, ((0, gpad * b), (0, 0))) for x in tgt_cols]
        src_rows = [jnp.pad(r, ((0, gpad), (0, 0))) for r in src_rows]
        src_rows2 = [jnp.pad(r, ((0, gpad), (0, 0))) for r in src_rows2]
    col = pl.BlockSpec((gb * b, 1), lambda g: (g, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((gb, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((ng * gb * b, 1), dt) for dt in out_dtypes]
    rows3 = [r[:, None, :] for r in src_rows]
    in_specs = [_SCL] * len(smem) + [col] * len(tgt_cols) \
        + [row] * len(src_rows)
    rows3b = []
    if src_rows2:
        s2 = src_rows2[0].shape[1]
        row2 = pl.BlockSpec((gb, 1, s2), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
        rows3b = [r[:, None, :] for r in src_rows2]
        in_specs += [row2] * len(src_rows2)
    res = pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=in_specs,
        out_specs=[col] * len(out_dtypes),
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((b, chunk), jnp.float32)
                        for _ in range(n_acc)],
        interpret=not _on_tpu(),
    )(*smem, *tgt_cols, *rows3, *rows3b)
    if gpad:
        res = tuple(r[:g_total * b] for r in res)
    return res


def _groups(nv_ref, gb, b, per_group):
    """Loop the per-group work over the gb groups of this grid step.

    per_group(k, o, nv): k = group index within the batch, o = its row
    offset into the [gb*B, 1] column refs (pl.ds(o, b) slices it out),
    nv = its valid-slot count. Padded tail groups carry nv=0: their
    sweeps run zero chunks and their outputs are zeroed reductions."""
    pid = pl.program_id(0)

    def step(k, carry):
        o = pl.multiple_of(k * b, b)
        per_group(k, o, nv_ref[pid * gb + k])
        return carry

    jax.lax.fori_loop(0, gb, step, 0)


def _sweep(nv, k, rows, chunk, body):
    """fori_loop over [1, CHUNK] tiles of VMEM-resident row refs; `body`
    mutates scratch accumulators (no loop carry). `k` picks the batch
    group's row (leading dim of the [gb, 1, S] refs). Trip count is
    ceil(nv/chunk) — chunks beyond the group's real window never run."""
    s = rows[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def slice_ref(r, off):
        if len(r.shape) == 3:
            return r[pl.ds(k, 1), 0, pl.ds(off, chunk)]
        return r[:, pl.ds(off, chunk)]

    def step(c, carry):
        off = pl.multiple_of(c * chunk, chunk)
        tiles = [slice_ref(r, off) for r in rows]
        body(tiles, (iota + off) < nv)
        return carry

    trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
    jax.lax.fori_loop(0, trips, step, 0)


def _sweep1(nv, k, rows, chunk, body):
    """Single-trip sweep: the whole window IS one chunk (S == CHUNK).

    `body` returns per-pair contribution tiles; the caller reduces them
    straight into the outputs. Skips the fori_loop, the [B, CHUNK]
    scratch zero-init and the read-modify-write accumulation — those
    fixed costs measure ~60% of kernel time when there is only one chunk
    of real work (pass1 at the settled 100k point: 2.55us/group of which
    ~1us is pair math)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    tiles = [r[pl.ds(k, 1), 0, :] if len(r.shape) == 3 else r[:]
             for r in rows]
    return body(tiles, iota < nv)


def _rsum(acc):
    return jnp.sum(acc[:], axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# pass 1: density + neighbor count (+ grad-h dW/dh sum)
# ---------------------------------------------------------------------------

def _pass1_gradh_kernel(nv_ref, tx, ty, tz, tih, sx, sy, sz, sm,
                        rho_ref, nn_ref, xi_ref, *acc, chunk, gb, b,
                        single):
    rows = [sx, sy, sz, sm]

    def per_group(k, o, nv):
        sl = pl.ds(o, b)
        txv, tyv, tzv, tihv = tx[sl, :], ty[sl, :], tz[sl, :], tih[sl, :]

        def contrib(tiles, valid):
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
            wpoly = jnp.where(q < 1.0, inner,
                              jnp.where(q < 2.0, outer, 0.0))
            # dW/dh = -(1/pi h^4)(3 Wpoly + q dWpoly/dq); reuses inner/tsq
            inner_dh = 3.0 * inner - 3.0 * q2 + 2.25 * q3
            outer_dh = 0.75 * tsq * (t - q)
            dhpoly = jnp.where(q < 1.0, inner_dh,
                               jnp.where(q < 2.0, outer_dh, 0.0))
            return (m_eff * wpoly, m_eff * dhpoly,
                    jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0))

        if single:
            c_rho, c_xi, c_nn = _sweep1(nv, k, rows, chunk, contrib)
            s_rho, s_xi, s_nn = (jnp.sum(c, axis=1, keepdims=True)
                                 for c in (c_rho, c_xi, c_nn))
        else:
            a_rho, a_xi, a_nn = acc
            zero = jnp.zeros(a_rho.shape, jnp.float32)
            a_rho[:] = zero
            a_xi[:] = zero
            a_nn[:] = zero

            def body(tiles, valid):
                c_rho, c_xi, c_nn = contrib(tiles, valid)
                a_rho[:] += c_rho
                a_xi[:] += c_xi
                a_nn[:] += c_nn

            _sweep(nv, k, rows, chunk, body)
            s_rho, s_xi, s_nn = _rsum(a_rho), _rsum(a_xi), _rsum(a_nn)
        ci3 = _INV_PI * (tihv * tihv * tihv)
        rho_ref[sl, :] = ci3 * s_rho
        xi_ref[sl, :] = -(ci3 * tihv) * s_xi
        nn_ref[sl, :] = s_nn.astype(jnp.int32)

    _groups(nv_ref, gb, b, per_group)


def pass1_gradh(nv, tgt, src, *, b, chunk, gb=1):
    """Grad-h density sweep: tgt = (x,y,z,ih) cols, src = (x,y,z,m) rows.
    Returns (rho, nn, xi) [G*B,1] columns; nn INCLUDES the self pair."""
    if _use_jnp():
        return fallback.pass1_gradh(nv, tgt, src)
    single = src[0].shape[1] == chunk
    kern = functools.partial(_pass1_gradh_kernel, chunk=chunk, gb=gb, b=b,
                             single=single)
    return _call(kern, out_dtypes=[jnp.float32, jnp.int32, jnp.float32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=0 if single else 3, gb=gb)


def _pass1_sym_kernel(nv_ref, tx, ty, tz, tih, sx, sy, sz, sih, sm,
                      rho_ref, nn_ref, *acc, chunk, gb, b, single):
    rows = [sx, sy, sz, sih, sm]

    def per_group(k, o, nv):
        sl = pl.ds(o, b)
        txv, tyv, tzv, tihv = tx[sl, :], ty[sl, :], tz[sl, :], tih[sl, :]

        def contrib(tiles, valid):
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
            wpoly = jnp.where(q < 1.0, inner,
                              jnp.where(q < 2.0, outer, 0.0))
            qj = r * cih
            qj2 = qj * qj
            innerj = 1.0 - 1.5 * qj2 + 0.75 * qj2 * qj
            tj = 2.0 - qj
            outerj = 0.25 * tj * tj * tj
            wpolyj = jnp.where(qj < 1.0, innerj,
                               jnp.where(qj < 2.0, outerj, 0.0))
            cj3 = cih * cih * cih       # source prefactor rides per pair
            return (m_eff * wpoly, m_eff * wpolyj * cj3,
                    jnp.where((q < 2.0) & (m_eff > 0.0), 1.0, 0.0))

        if single:
            c_rho, c_rhoj, c_nn = _sweep1(nv, k, rows, chunk, contrib)
            s_rho, s_rhoj, s_nn = (jnp.sum(c, axis=1, keepdims=True)
                                   for c in (c_rho, c_rhoj, c_nn))
        else:
            a_rho, a_rhoj, a_nn = acc
            zero = jnp.zeros(a_rho.shape, jnp.float32)
            a_rho[:] = zero
            a_rhoj[:] = zero
            a_nn[:] = zero

            def body(tiles, valid):
                c_rho, c_rhoj, c_nn = contrib(tiles, valid)
                a_rho[:] += c_rho
                a_rhoj[:] += c_rhoj
                a_nn[:] += c_nn

            _sweep(nv, k, rows, chunk, body)
            s_rho, s_rhoj, s_nn = (_rsum(a_rho), _rsum(a_rhoj),
                                   _rsum(a_nn))
        ci3 = tihv * tihv * tihv
        rho_ref[sl, :] = (0.5 * _INV_PI) * (ci3 * s_rho + s_rhoj)
        nn_ref[sl, :] = s_nn.astype(jnp.int32)

    _groups(nv_ref, gb, b, per_group)


def pass1_sym(nv, tgt, src, *, b, chunk, gb=1):
    """Symmetric-density sweep: tgt = (x,y,z,ih), src = (x,y,z,ih,m).
    rho_i = sum m_j 0.5(W(h_i)+W(h_j)); nn INCLUDES the self pair."""
    if _use_jnp():
        return fallback.pass1_sym(nv, tgt, src)
    single = src[0].shape[1] == chunk
    kern = functools.partial(_pass1_sym_kernel, chunk=chunk, gb=gb, b=b,
                             single=single)
    return _call(kern, out_dtypes=[jnp.float32, jnp.int32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=0 if single else 3, gb=gb)


# ---------------------------------------------------------------------------
# rebuild-time candidate filter (exact SPH lists)
# ---------------------------------------------------------------------------

def _filter_kernel(nv_ref, tx, ty, tz, tc, tsk, sx, sy, sz, sc, ssk, sm,
                   keep_ref, *, chunk, gb, b):
    """keep[j] = any target i in the group truly interacts with candidate j.

    tc/sc carry kappa*(1+h_margin)*h pre-scaled by the caller, so the pair
    cutoff is max(tc_i, sc_j) + tsk_i + ssk_j (per-particle skins)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    s = sx.shape[-1]

    def per_group(k, o, nv):
        sl = pl.ds(o, b)
        txv, tyv, tzv = tx[sl, :], ty[sl, :], tz[sl, :]
        tcv, tskv = tc[sl, :], tsk[sl, :]
        keep_ref[pl.ds(k, 1)] = jnp.zeros((1,) + keep_ref.shape[1:],
                                          jnp.float32)

        def step(c, carry):
            off = pl.multiple_of(c * chunk, chunk)
            cx = sx[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            cy = sy[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            cz = sz[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            cc = sc[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            csk = ssk[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            cm = sm[pl.ds(k, 1), 0, pl.ds(off, chunk)]
            dxx = txv - cx
            dxy = tyv - cy
            dxz = tzv - cz
            r2 = dxx * dxx + dxy * dxy + dxz * dxz
            cut = jnp.maximum(tcv, cc) + tskv + csk
            valid = ((iota + off) < nv) & (cm > 0.0)
            pred = (r2 < cut * cut) & valid
            keep_ref[pl.ds(k, 1), 0, pl.ds(off, chunk)] = jnp.max(
                jnp.where(pred, 1.0, 0.0), axis=0, keepdims=True)
            return carry

        trips = jnp.minimum(pl.cdiv(nv, chunk), s // chunk)
        jax.lax.fori_loop(0, trips, step, 0)

    _groups(nv_ref, gb, b, per_group)


def filter_sph(nv, tgt, src, *, b, chunk, gb=1):
    """Per-candidate true-interaction mask over the group's window.

    tgt cols ([G*B,1]): x, y, z, kappa_eff*h, skin. src rows ([G,S]):
    x, y, z, kappa_eff*h, skin, m. Returns f32 [G, S] (1.0 = some target
    interacts). One light sweep (~10 flops/slot) at REBUILD time buys the
    per-step heavy sweeps a ~5x smaller exact candidate window."""
    if _use_jnp():
        return fallback.filter_sph(nv, tgt, src)
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
    out = pl.BlockSpec((gb, 1, s), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        functools.partial(_filter_kernel, chunk=chunk, gb=gb, b=b),
        grid=(ng,),
        in_specs=[_SCL] + [col] * len(tgt) + [row] * len(src),
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((ng * gb, 1, s), jnp.float32),
        interpret=not _on_tpu(),
    )(nv, *tgt, *[r[:, None, :] for r in src])[:, 0, :]
    return res[:g_total] if gpad else res


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


def _pass2_kernel(nv_ref, *args, chunk, mode, av, energy, balsara,
                  sign_bug, av_alpha, av_beta, gb, b, grav,
                  receiver_soft, g_const, p2p_n=0):
    it = iter(args)
    nv2_ref = next(it) if p2p_n else None
    tx, ty, tz, tih = (next(it) for _ in range(4))
    tc = next(it) if mode != "reference_asymmetric" else None
    if av:
        tvx, tvy, tvz, th, tcs, trho = (next(it) for _ in range(6))
        tfb = next(it) if balsara else None
    elif energy:
        tvx, tvy, tvz = (next(it) for _ in range(3))
    sx, sy, sz, sih, sm, scc = (next(it) for _ in range(6))
    # source velocity (+AV fields [+balsara f]) rows: vx,vy,vz[,h,cs,rho[,f]]
    n_sav = (7 if balsara else 6) if av else (3 if energy else 0)
    s_av = [next(it) for _ in range(n_sav)]
    p2p_rows = [next(it) for _ in range(p2p_n)]
    gpx_ref, gpy_ref, gpz_ref = (next(it) for _ in range(3))
    if av:
        avx_ref, avy_ref, avz_ref = (next(it) for _ in range(3))
    dc_refs = [next(it) for _ in range(4)] if balsara else []
    du_ref = next(it) if energy else None
    g_refs = [next(it) for _ in range(5)] if grav else []
    acc = list(it)      # [] when single-trip; n_out scratch otherwise
    rows = [sx, sy, sz, sih, sm, scc] + s_av
    # program_id must be read OUTSIDE the _groups fori_loop: inside a
    # lax control-flow region the interpret-mode fallback cannot lower it
    pid = pl.program_id(0) if p2p_n else None

    def per_group(k, o, nv):
        sl = pl.ds(o, b)
        txv, tyv, tzv, tihv = tx[sl, :], ty[sl, :], tz[sl, :], tih[sl, :]
        tcv = tc[sl, :] if tc is not None else None
        tih4 = tihv * tihv
        tih4 = tih4 * tih4
        if av or energy:
            tvxv, tvyv, tvzv = tvx[sl, :], tvy[sl, :], tvz[sl, :]
        if av:
            thv, tcsv, trhov = th[sl, :], tcs[sl, :], trho[sl, :]
            tfbv = tfb[sl, :] if balsara else None

        def contrib(tiles, valid):
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
            out = [dxx * coef, dxy * coef, dxz * coef]
            if av or energy:
                cvx, cvy, cvz = tiles[6:9]
                dvx = tvxv - cvx
                dvy = tvyv - cvy
                dvz = tvzv - cvz
                vdotr = dvx * dxx + dvy * dxy + dvz * dxz
            if av:
                ch, ccs, crho = tiles[9:12]
                hbar = 0.5 * (thv + ch)
                mu = hbar * vdotr / (r2 + 0.01 * hbar * hbar)
                cbar = 0.5 * (tcsv + ccs)
                rhobar = 0.5 * (trhov + crho)
                pi_ij = jnp.where(vdotr < 0.0,
                                  (-av_alpha * cbar * mu
                                   + av_beta * mu * mu) / rhobar, 0.0)
                if balsara:
                    pi_ij = pi_ij * (0.5 * (tfbv + tiles[12]))
                if sign_bug:
                    # AV always uses the CORRECT derivative (parity sign
                    # bug would inject energy); recompute without the bug
                    gs_av = 0.5 * (_gw_from(q, tihv, tih4, inv_r, False)
                                   + _gw_from(qj, cih, cih4, inv_r, False))
                else:
                    gs_av = 0.5 * (gw_i + gw_j)
                cav = m_eff * pi_ij * gs_av
                out += [dxx * cav, dxy * cav, dxz * cav]
                if balsara:
                    # raw div/curl sums for the NEXT step's limiter
                    g_dc = m_eff * gs_av
                    out += [g_dc * vdotr,
                            g_dc * (dvy * dxz - dvz * dxy),
                            g_dc * (dvz * dxx - dvx * dxz),
                            g_dc * (dvx * dxy - dvy * dxx)]
            if energy:
                # conjugate energy equation, same per-pair quantities
                # (ops/dense.pass2 docstring): pressure term + AV heating
                if mode == "grad_h":
                    du = tcv * (m_eff * gw_i) * vdotr
                else:
                    du = 0.5 * coef * vdotr
                if av:
                    du = du + 0.5 * cav * vdotr
                out += [du]
            if grav:
                # fused Dyer-Ip near-field gravity on the same pair
                # geometry (SimConfig.fuse_p2p_sph): dx/r2/inv_r are
                # shared with the SPH math above — the marginal cost is
                # the polynomial evaluation only (cf. _p2p_kernel, which
                # pays the full geometry again per slot)
                inv_a = tihv if receiver_soft else jnp.minimum(tihv, cih)
                x = (r2 * inv_r) * inv_a
                x2 = x * x
                x3 = x2 * x
                inv_a3 = inv_a * inv_a * inv_a
                inner_mag = (m_eff * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
                inner_phi = -(m_eff * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3
                                                - 0.4 * x2 * x3)
                mr = m_eff * inv_r
                near_g = x < 1.0
                mag = jnp.where(near_g, inner_mag, mr * inv_r * inv_r)
                out += [jnp.where(near_g, inner_phi, -mr),
                        dxx * mag, dxy * mag, dxz * mag,
                        jnp.where(m_eff > 0.0, 1.0, 0.0)]
            return out

        if acc:
            zero = jnp.zeros(acc[0].shape, jnp.float32)
            for a in acc:
                a[:] = zero

            def body(tiles, valid):
                for a, c in zip(acc, contrib(tiles, valid)):
                    a[:] += c

            _sweep(nv, k, rows, chunk, body)
            if p2p_n:
                # residual-P2P merge (SimConfig.fuse_p2p_residual): sweep
                # the non-SPH near-field window into the SAME gravity
                # accumulators — one launch instead of two, amortizing
                # the per-group fixed costs the separate p2p launch pays
                # (measured ~as much as its pair math at the shrunken
                # round-4 windows). Same math as _p2p_kernel (f32 path).
                a_phi, a_gx, a_gy, a_gz, a_nd = acc[-5:]

                def p2p_body(tiles, valid):
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
                    x2 = x * x
                    x3 = x2 * x
                    inv_a3 = inv_a * inv_a * inv_a
                    inner_mag = (m_eff * inv_a3) * (8.0 - 9.0 * x
                                                    + 2.0 * x3)
                    inner_phi = -(m_eff * inv_a) * (2.4 - 4.0 * x2
                                                    + 3.0 * x3
                                                    - 0.4 * x2 * x3)
                    mr = m_eff * inv_r
                    near_g = x < 1.0
                    mag = jnp.where(near_g, inner_mag, mr * inv_r * inv_r)
                    a_phi[:] += jnp.where(near_g, inner_phi, -mr)
                    a_gx[:] += dxx * mag
                    a_gy[:] += dxy * mag
                    a_gz[:] += dxz * mag
                    a_nd[:] += jnp.where(m_eff > 0.0, 1.0, 0.0)

                _sweep(nv2_ref[pid * gb + k], k, p2p_rows,
                       chunk, p2p_body)
            sums = [_rsum(a) for a in acc]
        else:
            sums = [jnp.sum(c, axis=1, keepdims=True)
                    for c in _sweep1(nv, k, rows, chunk, contrib)]
        gpx_ref[sl, :] = sums[0]
        gpy_ref[sl, :] = sums[1]
        gpz_ref[sl, :] = sums[2]
        if av:
            avx_ref[sl, :] = sums[3]
            avy_ref[sl, :] = sums[4]
            avz_ref[sl, :] = sums[5]
        base = 6 if av else 3
        for ref, val in zip(dc_refs, sums[base:base + 4]):
            ref[sl, :] = val
        if balsara:
            base += 4
        if energy:
            du_ref[sl, :] = sums[base]
            base += 1
        if grav:
            g_refs[0][sl, :] = g_const * sums[base]
            g_refs[1][sl, :] = g_const * sums[base + 1]
            g_refs[2][sl, :] = g_const * sums[base + 2]
            g_refs[3][sl, :] = g_const * sums[base + 3]
            g_refs[4][sl, :] = sums[base + 4].astype(jnp.int32)

    _groups(nv_ref, gb, b, per_group)


def pass2(nv, tgt, src, *, b, chunk, mode, av, sign_bug, av_alpha=0.0,
          av_beta=0.0, gb=1, energy=False, balsara=False, grav=False,
          receiver_soft=False, g_const=1.0, nv_p2p=None, p2p_rows=None):
    """Pressure-gradient sweep with precomputed per-particle coefficients.

    tgt cols: x,y,z,ih, then tc (absent for reference_asymmetric), then AV
    (vx,vy,vz,h,cs,rho) or — energy without AV — just (vx,vy,vz). src
    rows: x,y,z,ih,m,cc, then the matching AV/velocity rows. Per-pair
    math:
      grad_h:  coef = m (tc gw_i + cc gw_j)        tc=cc=P/(Omega rho^2)
      symmetric: coef = m (tc + cc) gsym           tc=cc=P/rho^2
      asym:    coef = m cc gsym                    cc=P/rho
    Returns (gpx,gpy,gpz) — the caller applies the target-side rho scale —
    plus (avx,avy,avz) when av=True (caller scales by trho as well), plus
    the raw div/curl sums (4 outputs) when balsara=True (one extra f col
    on each side limits Pi_ij by 0.5(f_i+f_j) — see ops/dense.pass2),
    plus the FULLY-SCALED specific-internal-energy rate du when
    energy=True (cfg.eos_mode='adiabatic'; no caller scale — the pairwise
    forms in ops/dense.pass2's docstring are complete as accumulated),
    plus (phi, gx, gy, gz, n_direct) when grav=True — fused Dyer-Ip
    near-field gravity over the SAME rows (SimConfig.fuse_p2p_sph; same
    conventions as :func:`p2p`: phi includes the self term, n_direct the
    self pair).

    `nv_p2p`/`p2p_rows` (needs grav=True): ALSO sweep this second
    gravity-geometry window (x,y,z[,ih],m — ih absent under receiver
    softening) into the same gravity accumulators — the residual-P2P
    merge (SimConfig.fuse_p2p_residual). The separate :func:`p2p` launch
    then disappears from the per-step path entirely.
    """
    if _use_jnp():
        return fallback.pass2(
            nv, tgt, src, mode=mode, av=av, energy=energy,
            balsara=balsara, sign_bug=sign_bug, av_alpha=av_alpha,
            av_beta=av_beta, grav=grav, receiver_soft=receiver_soft,
            g_const=g_const, nv_p2p=nv_p2p, p2p_rows=p2p_rows)
    single = src[0].shape[1] == chunk
    merged = p2p_rows is not None
    if merged and not grav:
        raise ValueError("the residual-P2P merge needs grav=True")
    kern = functools.partial(_pass2_kernel, chunk=chunk, mode=mode, av=av,
                             energy=energy, balsara=balsara,
                             sign_bug=sign_bug, grav=grav,
                             receiver_soft=receiver_soft, g_const=g_const,
                             av_alpha=av_alpha, av_beta=av_beta, gb=gb, b=b,
                             p2p_n=len(p2p_rows) if merged else 0)
    n_out = (6 if av else 3) + (4 if balsara else 0) + (1 if energy else 0)
    dts = [jnp.float32] * n_out
    if grav:
        n_out += 5
        dts += [jnp.float32] * 4 + [jnp.int32]
    return _call(kern, out_dtypes=dts,
                 smem=[nv, nv_p2p] if merged else [nv],
                 tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=n_out if (merged or not single) else 0, gb=gb,
                 src_rows2=p2p_rows or ())


# ---------------------------------------------------------------------------
# gravity P2P over MAC-rejected sub-block windows (Dyer-Ip softened)
# ---------------------------------------------------------------------------

def _p2p_kernel(nv_ref, *args, chunk, receiver_soft, g_const, bf16, gb, b):
    if receiver_soft:
        (tx, ty, tz, tih, sx, sy, sz, sm,
         phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
         a_phi, a_gx, a_gy, a_gz, a_nd) = args
    else:
        (tx, ty, tz, tih, sx, sy, sz, sih, sm,
         phi_ref, gx_ref, gy_ref, gz_ref, nd_ref,
         a_phi, a_gx, a_gy, a_gz, a_nd) = args
    rows = [sx, sy, sz, sm] if receiver_soft else [sx, sy, sz, sih, sm]

    def per_group(k, o, nv):
        sl = pl.ds(o, b)
        txv, tyv, tzv, tihv = tx[sl, :], ty[sl, :], tz[sl, :], tih[sl, :]
        zero = jnp.zeros(a_phi.shape, jnp.float32)
        a_phi[:] = zero
        a_gx[:] = zero
        a_gy[:] = zero
        a_gz[:] = zero
        a_nd[:] = zero

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
                # inv_a^3: target-constant under receiver softening but
                # pair-dependent under min(); per pair (3 muls) either way
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

        _sweep(nv, k, rows, chunk, body)
        phi_ref[sl, :] = g_const * _rsum(a_phi)
        gx_ref[sl, :] = g_const * _rsum(a_gx)
        gy_ref[sl, :] = g_const * _rsum(a_gy)
        gz_ref[sl, :] = g_const * _rsum(a_gz)
        nd_ref[sl, :] = _rsum(a_nd).astype(jnp.int32)

    _groups(nv_ref, gb, b, per_group)


def p2p(nv, tgt, src, *, b, chunk, receiver_soft, g_const, bf16=False,
        gb=1):
    """Near-field gravity sweep (``GravityFieldSystem.cs:332-356`` analog).

    tgt cols: x,y,z,ih. src rows: x,y,z,m under receiver softening,
    x,y,z,ih,m under min-h softening. Returns (phi, gx, gy, gz, n_direct);
    phi INCLUDES the self term -2.4 m_i / a_i and n_direct INCLUDES the
    self pair — callers correct both analytically.
    """
    if _use_jnp() and not bf16:
        return fallback.p2p(nv, tgt, src, receiver_soft=receiver_soft,
                            g_const=g_const)
    kern = functools.partial(_p2p_kernel, chunk=chunk,
                             receiver_soft=receiver_soft, g_const=g_const,
                             bf16=bf16, gb=gb, b=b)
    return _call(kern, out_dtypes=[jnp.float32] * 4 + [jnp.int32],
                 smem=[nv], tgt_cols=tgt, src_rows=src, b=b, chunk=chunk,
                 n_acc=5, gb=gb)


# ---------------------------------------------------------------------------
# fused gravity: P2P + ring monopoles + far scan in ONE pallas_call
# ---------------------------------------------------------------------------

def _gravity_fused_kernel(*args, chunk, receiver_soft, g_const, bf16,
                          has_blk, nm, has_p2p=True):
    # nm: moment fields per tier entry — 4 (m,cx,cy,cz) monopole, 10
    # (+Qxx,Qxy,Qxz,Qyy,Qyz,Qzz traceless quadrupole)
    # has_p2p=False: far-only launch (ring + blk + far scan) — the RESPA
    # multirate outer force (SimConfig.respa_every); the near tier then
    # runs per inner step via :func:`p2p`.
    it = iter(args)
    nvp_ref = next(it) if has_p2p else None
    nvr_ref = next(it)
    nvb_ref = next(it) if has_blk else None
    tx, ty, tz, tih = (next(it) for _ in range(4))
    prows = [next(it) for _ in range(4 if receiver_soft else 5)] \
        if has_p2p else None
    rrows = [next(it) for _ in range(nm)]         # ring moments
    brows = [next(it) for _ in range(nm)] if has_blk else None
    frows = [next(it) for _ in range(nm)]         # far moments (2-D)
    acc_r = next(it)                              # accept [1, 1, NBpad]
    phi_ref, gx_ref, gy_ref, gz_ref, nd_ref, na_ref = (next(it)
                                                       for _ in range(6))
    a_phi, a_gx, a_gy, a_gz, a_cnt = (next(it) for _ in range(5))
    pid = pl.program_id(0)
    txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
    zero = jnp.zeros(a_phi.shape, jnp.float32)
    a_phi[:] = zero
    a_gx[:] = zero
    a_gy[:] = zero
    a_gz[:] = zero
    a_cnt[:] = zero

    def p2p_body(tiles, valid):
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
            # compares and the counter stay f32 (v5e Mosaic has no bf16
            # compare); only the pair polynomial drops precision
            bf = lambda v: v.astype(jnp.bfloat16)
            dxx, dxy, dxz = bf(dxx), bf(dxy), bf(dxz)
            x, mb = bf(x), bf(m_eff)
            inv_a = jnp.broadcast_to(bf(inv_a), dxx.shape)
            inv_r = bf(inv_r)
        else:
            mb = m_eff
        x2 = x * x
        x3 = x2 * x
        inv_a3 = inv_a * inv_a * inv_a
        inner_mag = (mb * inv_a3) * (8.0 - 9.0 * x + 2.0 * x3)
        inner_phi = -(mb * inv_a) * (2.4 - 4.0 * x2 + 3.0 * x3
                                     - 0.4 * x2 * x3)
        mr = mb * inv_r
        outer_mag = mr * inv_r * inv_r
        mag = jnp.where(near, inner_mag, outer_mag)
        phi = jnp.where(near, inner_phi, -mr)
        f32 = (lambda v: v.astype(jnp.float32)) if bf16 else (lambda v: v)
        a_phi[:] += f32(phi)
        a_gx[:] += f32(dxx * mag)
        a_gy[:] += f32(dxy * mag)
        a_gz[:] += f32(dxz * mag)
        a_cnt[:] += jnp.where(m_eff > 0.0, 1.0, 0.0)

    def mono_body(tiles, valid):
        cm_, cx, cy, cz = tiles[:4]
        m_eff = jnp.where(valid & (cm_ > 0.0), cm_, 0.0)
        dxx = txv - cx
        dxy = tyv - cy
        dxz = tzv - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        # f32 copies survive the bf16 cast: the counter compare (no bf16
        # compare on v5e Mosaic) and the cancellation-sensitive quad terms
        dx_f, dy_f, dz_f, ir_f = dxx, dxy, dxz, inv_r
        if bf16:
            bf = lambda v: v.astype(jnp.bfloat16)
            dxx, dxy, dxz = bf(dxx), bf(dxy), bf(dxz)
            mb, inv_r = bf(m_eff), bf(inv_r)
        else:
            mb = m_eff
        mag = mb * inv_r * inv_r * inv_r         # unsoftened monopole
        f32 = (lambda v: v.astype(jnp.float32)) if bf16 else (lambda v: v)
        phi_c = f32(-mb * inv_r)
        gx_c = f32(dxx * mag)
        gy_c = f32(dxy * mag)
        gz_c = f32(dxz * mag)
        if nm == 10:
            # traceless quadrupole — always f32 (computed from the
            # pre-cast separations; the correction is small and
            # cancellation-sensitive):
            #   Phi_q = -(d^T Q d) / (2 r^5)
            #   grad Phi_q = -(Q d)/r^5 + (5/2)(d^T Q d) d / r^7
            qxx, qxy, qxz, qyy, qyz, qzz = tiles[4:10]
            live = jnp.where(valid & (cm_ > 0.0), 1.0, 0.0)
            qdx = qxx * dx_f + qxy * dy_f + qxz * dz_f
            qdy = qxy * dx_f + qyy * dy_f + qyz * dz_f
            qdz = qxz * dx_f + qyz * dy_f + qzz * dz_f
            dqd = dx_f * qdx + dy_f * qdy + dz_f * qdz
            ir2 = ir_f * ir_f
            # live multiplies FIRST: masked entries can sit at r ~ 0 where
            # ir2*ir2 overflows to inf and inf*0 = NaN (live entries are
            # MAC-separated, their powers stay finite)
            ir5 = live * ir2 * ir2 * ir_f
            ir7dqd = 2.5 * dqd * ir5 * ir2
            phi_c = phi_c - 0.5 * dqd * ir5
            gx_c = gx_c - qdx * ir5 + dx_f * ir7dqd
            gy_c = gy_c - qdy * ir5 + dy_f * ir7dqd
            gz_c = gz_c - qdz * ir5 + dz_f * ir7dqd
        a_phi[:] += phi_c
        a_gx[:] += gx_c
        a_gy[:] += gy_c
        a_gz[:] += gz_c
        a_cnt[:] += jnp.where(m_eff > 0.0, 1.0, 0.0)

    # near tier first: its count reduces to n_direct, then the counter is
    # reused for the two monopole tiers (n_approx)
    if has_p2p:
        _sweep(nvp_ref[pid], 0, prows, chunk, p2p_body)
    nd_ref[:] = _rsum(a_cnt).astype(jnp.int32)
    a_cnt[:] = zero
    _sweep(nvr_ref[pid], 0, rrows, chunk, mono_body)
    if has_blk:
        _sweep(nvb_ref[pid], 0, brows, chunk, mono_body)

    def far_body(tiles, valid):
        cacc = tiles[nm]
        mono_body([jnp.where(cacc > 0.5, tiles[0], 0.0)] + tiles[1:nm],
                  valid)

    nbpad = frows[0].shape[-1]
    _sweep(jnp.asarray(nbpad, jnp.int32), 0, frows + [acc_r], chunk,
           far_body)
    na_ref[:] = _rsum(a_cnt).astype(jnp.int32)
    phi_ref[:] = g_const * _rsum(a_phi)
    gx_ref[:] = g_const * _rsum(a_gx)
    gy_ref[:] = g_const * _rsum(a_gy)
    gz_ref[:] = g_const * _rsum(a_gz)


def gravity_fused(nv_p2p, nv_ring, tgt, p2p_rows, ring_rows, far_rows,
                  accept, *, b, chunk, receiver_soft, g_const, bf16=False,
                  nv_blk=None, blk_rows=None, has_p2p=True):
    """All gravity tiers in one kernel launch (one grid pass per target
    group; ~0.35 ms/launch grid machinery and the per-tier target loads
    and XLA tier-summing paid once instead of three-to-four times).

    tgt cols: x,y,z,ih. p2p_rows: x,y,z,(ih,)m windows [G, Sp]. ring_rows:
    moment windows [G, Sr] — 4 fields (mass,cmx,cmy,cmz) monopole or 10
    (+ traceless quadrupole Qxx,Qxy,Qxz,Qyy,Qyz,Qzz). far_rows: moment
    summaries [1, NBpad] (broadcast). accept: [G, NBpad] f32 frozen MAC
    mask. nv_blk/blk_rows: optional 4th tier — block-monopole ring
    windows of the supergroup partition (same layout as ring_rows).
    Returns (phi, gx, gy, gz, n_direct, n_approx); the p2p self term is
    INCLUDED (see :func:`p2p`)."""
    if _use_jnp() and not bf16:
        return fallback.gravity_fused(
            nv_p2p, nv_ring, tgt, p2p_rows, ring_rows, far_rows, accept,
            receiver_soft=receiver_soft, g_const=g_const, nv_blk=nv_blk,
            blk_rows=blk_rows, has_p2p=has_p2p)
    has_blk = blk_rows is not None
    nm = len(ring_rows)
    sr = ring_rows[0].shape[1]
    nbpad = far_rows[0].shape[1]
    g_total = tgt[0].shape[0] // b
    col = pl.BlockSpec((b, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    rowr = pl.BlockSpec((1, 1, sr), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    rowf = pl.BlockSpec((1, nbpad), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)
    rowa = pl.BlockSpec((1, 1, nbpad), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((g_total * b, 1), jnp.float32)] * 4 + \
           [jax.ShapeDtypeStruct((g_total * b, 1), jnp.int32)] * 2
    kern = functools.partial(_gravity_fused_kernel, chunk=chunk,
                             receiver_soft=receiver_soft, g_const=g_const,
                             bf16=bf16, has_blk=has_blk, nm=nm,
                             has_p2p=has_p2p)
    p2p_specs, p2p_args = [], []
    smem = [nv_p2p, nv_ring] if has_p2p else [nv_ring]
    if has_p2p:
        sp = p2p_rows[0].shape[1]
        rowp = pl.BlockSpec((1, 1, sp), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
        p2p_specs = [rowp] * len(p2p_rows)
        p2p_args = [r[:, None, :] for r in p2p_rows]
    blk_specs, blk_args = [], []
    if has_blk:
        sb = blk_rows[0].shape[1]
        rowb = pl.BlockSpec((1, 1, sb), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
        smem.append(nv_blk)
        blk_specs = [rowb] * nm
        blk_args = [r[:, None, :] for r in blk_rows]
    return pl.pallas_call(
        kern,
        grid=(g_total,),
        in_specs=[_SCL] * len(smem) + [col] * 4 + p2p_specs
        + [rowr] * nm + blk_specs + [rowf] * nm + [rowa],
        out_specs=[col] * 6,
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((b, chunk), jnp.float32)
                        for _ in range(5)],
        interpret=not _on_tpu(),
    )(*smem, *tgt, *p2p_args,
      *[r[:, None, :] for r in ring_rows], *blk_args, *far_rows,
      accept[:, None, :])

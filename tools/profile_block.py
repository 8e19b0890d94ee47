#!/usr/bin/env python3
"""Component-level timing of the 100k block pipeline on the real TPU.

Times each stage of ops/structure.forces in isolation with the
anti-hoisting pattern from docs/ROUND2.md: every timed region scans the
stage K times with a data dependence threaded through the carry, and the
result is read back as a scalar (block_until_ready is unreliable on the
relay backend). Every device buffer is passed as a jit ARGUMENT — closing
over big arrays bakes them into the HLO as literals, which chokes the
remote compile service (HTTP 413) and inflates every timing.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure, eos as eos_ops
from planetmodel_sph_tpu.ops.pallas import groups2 as gk2


def timed(label, fn, args, k=8):
    f = jax.jit(fn, static_argnames=("k_",))
    # warm with the SAME static k_ — a different k_ compiles a different
    # executable, putting the (remote, slow) compile inside the timed region
    float(jnp.sum(f(*args, k_=k)))
    t0 = time.perf_counter()
    s = float(jnp.sum(f(*args, k_=k)))
    dt = (time.perf_counter() - t0) / k
    print(f"{label:34s} {dt*1e3:9.2f} ms   (checksum {s:.3e})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated stage filter")
    ap.add_argument("--ck", default=None,
                    help="settled checkpoint: profile the production "
                         "operating point instead of the cold IC")
    ap.add_argument("--windows", default=None,
                    help="nbr,p2p,m2p window override")
    ap.add_argument("--xw", type=int, default=0,
                    help="sph_exact_window (particle-granularity lists)")
    ap.add_argument("--gradh", action="store_true",
                    help="profile the grad_h production physics config")
    ap.add_argument("--gb", type=int, default=None,
                    help="kernel_gb override (groups per Pallas grid step)")
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    def on(name):
        return want is None or name in want

    kw = {}
    if args.windows:
        nw, pw, mw = (int(x) for x in args.windows.split(","))
        kw = dict(nbr_window=nw, p2p_window=pw, m2p_window=mw)
    if args.xw:
        kw["sph_exact_window"] = args.xw
    if args.gradh:
        kw.update(grad_p_mode="grad_h", h_mode="newton")
    if args.gb is not None:
        kw["kernel_gb"] = args.gb
    cfg = config_mod.jupiter_100k(n=args.n, **kw)
    if args.ck:
        from planetmodel_sph_tpu.utils import checkpoint
        state, _, _ = checkpoint.load(args.ck)
    else:
        state = ics.jupiter(cfg)
        state = planet.prime(state, cfg.replace(rebuild_every=1))
    pos, h, mass = state.pos, state.h, state.mass
    bsz, chunk = cfg.nbr_group_size, cfg.block_chunk
    print(f"n={cfg.n}  bsz={bsz}  W={cfg.nbr_window} "
          f"Wp={cfg.p2p_window}  chunk={chunk}", flush=True)

    st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, cfg))(pos, h, mass)
    sub = cfg.nbr_sub
    print(f"groups={st.groups.live.shape[0]} "
          f"n_sph avg={float(jnp.mean(st.n_sph)):.1f} "
          f"max={int(jnp.max(st.n_sph))}  "
          f"n_p2p avg={float(jnp.mean(st.n_p2p)):.1f} "
          f"max={int(jnp.max(st.n_p2p))}  "
          f"accept frac={float(jnp.mean(st.accept)):.3f}", flush=True)

    if on("forces"):
        def full(p, hh, m, st_, k_):
            def body(c, _):
                bf = structure.forces(c, hh, m, cfg, st_)
                return c + 1e-9 * bf.grad_p, None
            out, _ = jax.lax.scan(body, p, None, length=k_)
            return out
        timed("forces (full)", full, (pos, h, mass, st), k=args.k)

    if on("build"):
        def build_k(p, hh, m, k_):
            def body(c, _):
                s2 = structure.build(c, hh, m, cfg)
                return c + 1e-12 * jnp.sum(s2.accept), None
            out, _ = jax.lax.scan(body, p, None, length=k_)
            return out
        timed("build", build_k, (pos, h, mass), k=max(2, args.k // 4))

    if on("prep"):
        def prep_k(p, hh, m, st_, k_):
            def body(c, _):
                ctx = structure._prep_ctx(c, hh, m, cfg, st_)
                return c + 1e-12 * ctx.t["x"][0], None
            out, _ = jax.lax.scan(body, p, None, length=k_)
            return out
        timed("prep (sorts)", prep_k, (pos, h, mass, st), k=args.k)

    ctx = jax.jit(lambda p, hh, m, st_: structure._prep_ctx(p, hh, m, cfg,
                                                            st_))(
        pos, h, mass, st)
    scols = structure._geom(ctx.s)          # v2: [x, y, z, ih, m]
    sub = cfg.nbr_sub
    nb = int(ctx.nb)       # jit returned it as a device scalar; later jits
    ctx = ctx._replace(nb=nb, g=int(ctx.g))  # must see a static Python int
    nsub = nb * (bsz // sub)

    if on("gather"):
        def gath_k(cols, st_, k_):
            def body(c, _):
                cols2 = [cols[0] + c] + cols[1:]
                rows = structure._sph_rows(cols2, st_, cfg, ctx.nb)
                return c + 1e-12 * rows[0][0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("sph rows gather (geom x5)", gath_k, (scols, st), k=args.k)

        def gath_p(cols, idx, k_):
            def body(c, _):
                cols2 = [cols[0] + c] + cols[1:]
                rows = structure._window_gather(cols2, idx, nsub, sub,
                                                chunk)
                return c + 1e-12 * rows[0][0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("window gather (p2p geom x5)", gath_p, (scols, st.p2p_idx),
              k=args.k)

    if on("hsolve"):
        def hs_k(p, hh, m, k_):
            def body(c, _):
                h2 = structure.solve_h_newton(c, hh, m, cfg,
                                              planet.h_eta(cfg))
                return c + 1e-9 * h2[:, None], None
            out, _ = jax.lax.scan(body, p, None, length=k_)
            return out
        timed("h-solve (newton, throwaway build)", hs_k, (pos, h, mass),
              k=max(2, args.k // 4))

    geom_rows = jax.jit(
        lambda cols, st_: structure._sph_rows(cols, st_, cfg, ctx.nb))(
        scols, st)
    nv = structure._sph_nv(st, cfg)
    t = ctx.t
    tgt1 = structure._cols(t["x"], t["y"], t["z"], t["ih"])
    gradh = cfg.grad_p_mode == "grad_h"

    if on("pass1"):
        def p1_k(tg, rows, nv_, k_):
            def body(c, _):
                tg2 = [tg[0] + c] + tg[1:]
                if gradh:
                    rho, nn, xi = gk2.pass1_gradh(
                        nv_, tg2, [rows[0], rows[1], rows[2], rows[4]],
                        b=bsz, chunk=chunk, gb=cfg.kernel_gb)
                else:
                    rho, nn = gk2.pass1_sym(nv_, tg2, rows, b=bsz,
                                            chunk=chunk,
                                            gb=cfg.kernel_gb)
                return c + 1e-12 * rho[0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("pass1 kernel", p1_k, (tgt1, geom_rows, nv), k=args.k)

    rho_t, nn_t, omega = jax.jit(
        lambda c_, rows: structure._density_sweep(c_, cfg, st, src1=rows))(
        ctx, geom_rows)
    prs_t = eos_ops.pressure(rho_t, cfg.eos_k, cfg.eos_gamma)
    cc = prs_t / (rho_t * rho_t)
    tgt2 = structure._cols(t["x"], t["y"], t["z"], t["ih"], cc)
    extra_rows = jax.jit(
        lambda cols, idx: structure._window_gather(cols, idx, nsub, sub,
                                                   chunk))(
        [cc], st.sph_idx)

    if on("pass2"):
        def p2_k(tg, rows, nv_, k_):
            def body(c, _):
                tg2 = [tg[0] + c] + tg[1:]
                outs = gk2.pass2(nv_, tg2, rows, b=bsz, chunk=chunk,
                                 mode="grad_h" if gradh else "symmetric",
                                 av=False, sign_bug=False,
                                 gb=cfg.kernel_gb)
                return c + 1e-12 * outs[0][0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("pass2 kernel", p2_k, (tgt2, geom_rows + extra_rows, nv),
              k=args.k)

    if on("p2p"):
        receiver = cfg.softening_mode == "receiver_h"
        p2p_rows = jax.jit(
            lambda cols, idx: structure._window_gather(
                cols, idx, nsub, sub, chunk))(scols, st.p2p_idx)
        if receiver:
            p2p_rows = [p2p_rows[0], p2p_rows[1], p2p_rows[2], p2p_rows[4]]
        nvp = jnp.minimum(st.n_p2p, cfg.p2p_window) * sub
        tgtp = structure._cols(t["x"], t["y"], t["z"], t["ih"])

        def p2p_k(tg, rows, nv_, k_):
            def body(c, _):
                tg2 = [tg[0] + c] + tg[1:]
                phi, gx, gy, gz, nd = gk2.p2p(
                    nv_, tg2, rows, b=bsz, chunk=chunk,
                    receiver_soft=receiver, g_const=cfg.g_const,
                    gb=cfg.kernel_gb)
                return c + 1e-12 * phi[0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("p2p kernel", p2p_k, (tgtp, p2p_rows, nvp), k=args.k)

    if on("unsort"):
        def unsort_k(a, b, nn, st_, k_):
            def body(c, _):
                ra, rb, rn = structure._unsort(st_, [a + c, b, nn])
                return c + 1e-12 * ra[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out
        timed("unsort (inverse-perm gather x3)", unsort_k,
              (rho_t, prs_t, nn_t, st), k=args.k)


if __name__ == "__main__":
    main()

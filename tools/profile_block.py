#!/usr/bin/env python3
"""Component-level timing of the 100k block pipeline on the real TPU.

Times each stage of ops/structure.forces in isolation with the
anti-hoisting pattern from docs/ROUND2.md: every timed region scans the
stage K times with a data dependence threaded through the carry, and the
result is read back as a scalar (block_until_ready is unreliable on the
relay backend).
"""

import argparse
import time

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure, eos as eos_ops
from planetmodel_sph_tpu.ops.pallas import groups as gk


def timed(label, fn, *args, k=8, warmup=True):
    f = jax.jit(fn, static_argnames=("k_",))
    if warmup:
        float(jnp.sum(f(*args, k_=1)))
    t0 = time.perf_counter()
    s = float(jnp.sum(f(*args, k_=k)))
    dt = (time.perf_counter() - t0) / k
    print(f"{label:32s} {dt*1e3:9.2f} ms   (checksum {s:.3e})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    cfg = config_mod.jupiter_100k(n=args.n)
    state = ics.jupiter(cfg)
    # settle h so windows are realistic
    state = planet.prime(state, cfg.replace(rebuild_every=1))
    pos, h, mass = state.pos, state.h, state.mass
    print(f"n={cfg.n}  bsz={cfg.nbr_group_size}  W={cfg.nbr_window} "
          f"Wp={cfg.p2p_window}  chunk={cfg.block_chunk}")

    st = jax.jit(lambda p: structure.build(p, h, mass, cfg))(pos)
    g = st.groups.live.shape[0]
    nb = st.src_groups.live.shape[0]
    import numpy as np
    print(f"groups={g} blocks={nb} "
          f"n_sph avg={float(jnp.mean(st.n_sph)):.1f} "
          f"max={int(jnp.max(st.n_sph))}  "
          f"n_p2p avg={float(jnp.mean(st.n_p2p)):.1f} "
          f"max={int(jnp.max(st.n_p2p))}  "
          f"accept frac={float(jnp.mean(st.accept)):.3f}")

    # ---- full force eval (the per-step cost) ----
    def full(p, k_):
        def body(c, _):
            bf = structure.forces(c, h, mass, cfg, st)
            return c + 1e-9 * bf.grad_p, None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("forces (full)", full, pos, k=args.k)

    # ---- build ----
    def build_k(p, k_):
        def body(c, _):
            s2 = structure.build(c, h, mass, cfg)
            return c + 1e-12 * jnp.sum(s2.accept), None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("build", build_k, pos, k=max(2, args.k // 4))

    # ---- ctx prep (sorts) ----
    def prep_k(p, k_):
        def body(c, _):
            ctx = structure._prep_ctx(c, h, mass, cfg, st)
            return c + 1e-12 * ctx.t["x"][0], None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("prep (sorts)", prep_k, pos, k=args.k)

    ctx = jax.jit(lambda p: structure._prep_ctx(p, h, mass, cfg, st))(pos)
    bsz, chunk = cfg.nbr_group_size, cfg.block_chunk

    # ---- window gathers ----
    def gath_k(p, k_):
        def body(c, _):
            s = dict(ctx.s); s["x"] = s["x"] + c
            rows = structure._window_gather(structure._geom(s), st.sph_idx,
                                            ctx.nb, bsz, chunk)
            return c + 1e-12 * rows[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out
    timed("window gather (sph geom x7)", gath_k, pos, k=args.k)

    def gathp_k(p, k_):
        def body(c, _):
            s = dict(ctx.s); s["x"] = s["x"] + c
            rows = structure._window_gather(structure._geom(s), st.p2p_idx,
                                            ctx.nb, bsz, chunk)
            return c + 1e-12 * rows[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out
    timed("window gather (p2p geom x7)", gathp_k, pos, k=args.k)

    # ---- individual kernels (rows pre-gathered, frozen) ----
    geom_rows = jax.jit(lambda: structure._window_gather(
        structure._geom(ctx.s), st.sph_idx, ctx.nb, bsz, chunk))()
    nv = jnp.minimum(st.n_sph, cfg.nbr_window) * bsz
    t = ctx.t
    tgt1 = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["m"], t["oid"])

    def p1_k(x0, k_):
        def body(c, _):
            tg = [tgt1[0] + c] + tgt1[1:]
            rho, nn = gk.pass1(nv, tg, geom_rows, b=bsz, chunk=chunk)
            return c + 1e-12 * rho[0, 0], None
        out, _ = jax.lax.scan(body, x0, None, length=k_)
        return out
    timed("pass1 kernel", p1_k, jnp.float32(0), k=args.k)

    rho_t, nn_t, _ = jax.jit(lambda: structure._density_sweep(
        ctx, cfg, st, src1=geom_rows))()
    prs_t = eos_ops.pressure(rho_t, cfg.eos_k, cfg.eos_gamma)
    tgt2 = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["oid"],
                           rho_t, prs_t)
    extra_rows = jax.jit(lambda: structure._window_gather(
        [ctx.s["x"] * 0 + rho_t, ctx.s["x"] * 0 + prs_t], st.sph_idx,
        ctx.nb, bsz, chunk))()

    def p2_k(x0, k_):
        def body(c, _):
            tg = [tgt2[0] + c] + tgt2[1:]
            gx, gy, gz = gk.pass2(nv, tg, geom_rows + extra_rows, b=bsz,
                                  chunk=chunk, mode=cfg.grad_p_mode,
                                  av=False, sign_bug=False)
            return c + 1e-12 * gx[0, 0], None
        out, _ = jax.lax.scan(body, x0, None, length=k_)
        return out
    timed("pass2 kernel", p2_k, jnp.float32(0), k=args.k)

    p2p_rows = jax.jit(lambda: structure._window_gather(
        structure._geom(ctx.s), st.p2p_idx, ctx.nb, bsz, chunk))()
    nvp = jnp.minimum(st.n_p2p, cfg.p2p_window) * bsz
    tgtp = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["oid"])

    def p2p_k(x0, k_):
        def body(c, _):
            tg = [tgtp[0] + c] + tgtp[1:]
            phi, gx, gy, gz, nd = gk.p2p(
                nvp, tg, p2p_rows, b=bsz, chunk=chunk,
                receiver_soft=cfg.softening_mode == "receiver_h",
                g_const=cfg.g_const)
            return c + 1e-12 * phi[0, 0], None
        out, _ = jax.lax.scan(body, x0, None, length=k_)
        return out
    timed("p2p kernel", p2p_k, jnp.float32(0), k=args.k)

    def m2p_k(x0, k_):
        def body(c, _):
            phi, gx, gy, gz, na = structure._gravity_sweeps(
                ctx._replace(t={**t, "x": t["x"] + c}), cfg, st)[:1] + (0,)*4 \
                if False else (None,)*5
            return c, None
        return x0
    # m2p via _gravity_sweeps (includes p2p); time the pair to subtract
    def grav_k(x0, k_):
        def body(c, _):
            tt = dict(t); tt["x"] = tt["x"] + c
            phi, gphi, nd, na = structure._gravity_sweeps(
                ctx._replace(t=tt), cfg, st)
            return c + 1e-12 * phi[0], None
        out, _ = jax.lax.scan(body, x0, None, length=k_)
        return out
    timed("gravity sweeps (m2p+p2p+gather)", grav_k, jnp.float32(0),
          k=args.k)

    # ---- unsort scatter ----
    def unsort_k(x0, k_):
        def body(c, _):
            out = structure._unsort(st, cfg.n, jnp.float32,
                                    [rho_t + c, prs_t], [nn_t])
            return c + 1e-12 * out[0, 0], None
        out, _ = jax.lax.scan(body, x0, None, length=k_)
        return out
    timed("unsort scatter (3 cols)", unsort_k, jnp.float32(0), k=args.k)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Micro-profile each stage of the block pipeline eval at 100k.

Times (min over repeats, scalar readback in the timed region):
  - sorted-layout gather
  - SPH window gather (geom / pass2 channels)
  - pass1 / pass2 / m2p / p2p Pallas sweeps (with inputs precomputed)
  - full forces() for comparison
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics
from planetmodel_sph_tpu.ops import structure, eos as eos_ops
from planetmodel_sph_tpu.ops.pallas import groups as gk


def timed(label, fn, *args, repeat=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))   # compile + sync
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn_j(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:8.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cfg = config.jupiter_100k(n=n)
    state = ics.jupiter(cfg)
    pos, h, mass = state.pos, state.h, state.mass
    bsz = cfg.nbr_group_size
    chunk = cfg.block_chunk
    print("platform:", jax.devices()[0].platform, " n:", n)

    st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, cfg, skin=0.1))(
        pos, h, mass)
    timed("build", lambda p, hh, m: structure.build(p, hh, m, cfg, skin=0.1),
          pos, h, mass)

    ctx = structure._prep_ctx(pos, h, mass, cfg, st)
    timed("prep_ctx (sort gather)",
          lambda p, hh, m: structure._prep_ctx(p, hh, m, cfg, st), pos, h,
          mass)

    geom = structure._geom(ctx.s)
    nb = ctx.nb
    timed("window gather sph geom(7)",
          lambda *g: structure._window_gather(list(g), st.sph_idx, nb, bsz,
                                              chunk), *geom)
    timed("window gather p2p geom(7)",
          lambda *g: structure._window_gather(list(g), st.p2p_idx, nb, bsz,
                                              chunk), *geom)

    src1 = structure._window_gather(geom, st.sph_idx, nb, bsz, chunk)
    t = ctx.t
    nv = jnp.minimum(st.n_sph, cfg.nbr_window) * bsz
    tgt1 = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["m"], t["oid"])
    timed("pass1 sweep",
          lambda nv_, tgt_, src_: gk.pass1(nv_, tgt_, src_, b=bsz,
                                           chunk=chunk),
          nv, tgt1, src1)

    rho = jnp.maximum(
        gk.pass1(nv, tgt1, src1, b=bsz, chunk=chunk)[0][:, 0], 1e-30)
    prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
    tgt2 = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["oid"], rho,
                           prs)
    src2 = structure._window_gather(geom + [rho, prs], st.sph_idx, nb, bsz,
                                    chunk)
    timed("window gather pass2(9)",
          lambda *g: structure._window_gather(list(g), st.sph_idx, nb, bsz,
                                              chunk), *(geom + [rho, prs]))
    timed("pass2 sweep",
          lambda nv_, tgt_, src_: gk.pass2(
              nv_, tgt_, src_, b=bsz, chunk=chunk, mode=cfg.grad_p_mode,
              av=False, sign_bug=False),
          nv, tgt2, src2)

    timed("gravity (m2p+p2p sweeps)",
          lambda: structure._gravity_sweeps(ctx, cfg, st))

    srcp = structure._window_gather(geom, st.p2p_idx, nb, bsz, chunk)
    nvp = jnp.minimum(st.n_p2p, cfg.p2p_window) * bsz
    tgtp = structure._cols(t["x"], t["y"], t["z"], t["ih"], t["oid"])
    timed("p2p sweep only",
          lambda nv_, tgt_, src_: gk.p2p(nv_, tgt_, src_, b=bsz, chunk=chunk,
                                         receiver_soft=False, g_const=1.0),
          nvp, tgtp, srcp)

    timed("forces (full)",
          lambda p, hh, m: structure.forces(p, hh, m, cfg, st), pos, h, mass)


if __name__ == "__main__":
    main()

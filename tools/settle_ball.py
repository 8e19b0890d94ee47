#!/usr/bin/env python3
"""Settle the halo-collision driver's n/2 polytrope ball ON THE TPU.

Leg 0 of tools/halo_collision.py is single-device physics (no mesh), so
it can run on the real chip in seconds; the CPU interpret fallback needs
hours for the same 400 damped steps at 16k (measured: the round-4 32k
attempt burned 2h of single-core CPU without finishing leg 0). The
settled ball is saved as a .psph checkpoint that halo_collision.py
--ball-ck loads before its mesh legs.

  python tools/settle_ball.py --n 32768 --out /tmp/ball16k.psph
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["HALO_NO_FORCE_CPU"] = "1"   # before halo_collision's import

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

from halo_collision import build_cfg, settle_cfg
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768,
                    help="COLLISION particle count; the ball is n/2")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="/tmp/halo_ball.psph")
    args = ap.parse_args()

    cfg = build_cfg(args.n)
    scfg = settle_cfg(cfg, args.n // 2)
    ball = jax.jit(lambda s: planet.prime(s, scfg))(ics.polytrope(scfg))
    ball, sinfo = jax.block_until_ready(jax.jit(
        lambda s: planet.run_info(s, scfg, args.steps))(ball))
    sover = (int(sinfo["nbr_overflow"]), int(sinfo["tree_overflow"]))
    finite = all(bool(jax.numpy.all(jax.numpy.isfinite(l)))
                 for l in jax.tree.leaves(ball))
    print(f"settled ball n={scfg.n}: over={sover} finite={finite}",
          flush=True)
    if sum(sover) or not finite:
        print("settle FAILED — not saving", flush=True)
        return 3
    # true occupancy of the settled ball at effectively-unbounded
    # windows: prints the maxima the leg windows must clear, so sizing
    # takes ONE settle iteration instead of a blind widen loop (refine
    # off here — nbr_window must hold the PRE-refine adjacency)
    from planetmodel_sph_tpu.ops import structure
    wcfg = settle_cfg(cfg, args.n // 2, mult=1).replace(
        nbr_window=2048, p2p_window=2048, m2p_window=2048,
        sph_refine_subblock=False)
    st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, wcfg))(
        ball.pos, ball.h, ball.mass)
    import jax.numpy as jnp
    print(f"settled-ball occupancy (x1 cutoffs, unbounded windows): "
          f"sph {float(jnp.mean(st.n_sph)):.0f}/{int(jnp.max(st.n_sph))} "
          f"p2p {float(jnp.mean(st.n_p2p)):.0f}/{int(jnp.max(st.n_p2p))} "
          f"m2p {float(jnp.mean(st.n_m2p)):.0f}/{int(jnp.max(st.n_m2p))}",
          flush=True)

    # probe: the SETTLED ball must fit the production legs' own windows
    # (the x6 settle windows only absorb the raw-IC transient; a ball
    # that still needs them would overflow legs 1-2 downstream)
    pcfg = settle_cfg(cfg, args.n // 2, mult=1)
    ball2, pinfo = jax.block_until_ready(jax.jit(
        lambda s: planet.run_info(s, pcfg, 32))(ball))
    pover = (int(pinfo["nbr_overflow"]), int(pinfo["tree_overflow"]))
    print(f"leg-window probe (32 steps @ x1): over={pover}", flush=True)
    if sum(pover):
        print("probe FAILED: settled ball exceeds production windows — "
              "widen the leg windows in build_cfg, not just the settle",
              flush=True)
        return 3
    checkpoint.save(args.out, jax.device_get(ball), scfg, args.steps)
    print(f"ball -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

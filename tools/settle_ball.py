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

    scfg = settle_cfg(build_cfg(args.n), args.n // 2)
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
    checkpoint.save(args.out, jax.device_get(ball), scfg, args.steps)
    print(f"ball -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

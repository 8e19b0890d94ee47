#!/usr/bin/env python3
"""Scaling sweep: steps/s vs particle count across pipelines.

Prints a table (and optional JSON) of end-to-end step rates for the dense
Pallas pipeline and the grid+tree cached pipeline at increasing N. This is
the scaling evidence behind BASELINE.md's particle-steps/s metric.

Usage: python tools/scaling_bench.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402
import planetmodel_sph_tpu as psph                     # noqa: E402
from planetmodel_sph_tpu.models import ics, planet     # noqa: E402


def rate(cfg, steps):
    st = ics.jupiter(cfg)
    st = jax.jit(lambda s: planet.prime(s, cfg.replace(rebuild_every=1)))(st)
    f = jax.jit(lambda s: planet.run(s, cfg, steps))
    out = f(st)
    float(jnp.sum(out.pos))                 # compile + warm
    t0 = time.perf_counter()
    out = f(st)
    float(jnp.sum(out.pos))
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    rows = []
    scale = lambda n: 5.0 * (3000 / n) ** (1 / 3)

    for n in (1000, 3000, 10000):
        cfg = psph.default(n=n, particle_radius=scale(n),
                           gravity_solver="direct", neighbor_mode="dense")
        r = rate(cfg, args.steps)
        rows.append({"n": n, "pipeline": "dense+direct (pallas)",
                     "steps_per_sec": round(r, 2),
                     "particle_steps_per_sec": round(n * r, 1)})
        print(rows[-1], flush=True)

    for n in (30000, 100000):
        cfg = psph.jupiter_100k(n=n, particle_radius=scale(n))
        r = rate(cfg, max(24, args.steps // 4))
        rows.append({"n": n, "pipeline": "grid+tree (cached K=8)",
                     "steps_per_sec": round(r, 2),
                     "particle_steps_per_sec": round(n * r, 1)})
        print(rows[-1], flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

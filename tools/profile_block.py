#!/usr/bin/env python3
"""Profile the unified block pipeline at the north-star scale (jupiter_100k).

Reports, with honest timing (scalar readback inside the timed region, real
multi-step runs — see docs/ROUND2.md measurement gotchas):
  - structure build time + window statistics (to size nbr_window/p2p_window)
  - single force evaluation time
  - end-to-end cached step rate (the BENCH number)

Usage: python tools/profile_block.py [--n 100000] [--steps 64] [--repeat 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timed(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--rebuild-every", type=int, default=None)
    ap.add_argument("--group-size", type=int, default=None)
    ap.add_argument("--nbr-window", type=int, default=None)
    ap.add_argument("--p2p-window", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=None)
    args = ap.parse_args()

    kw = dict(n=args.n)
    for name, key in [("rebuild_every", "rebuild_every"),
                      ("group_size", "nbr_group_size"),
                      ("nbr_window", "nbr_window"),
                      ("p2p_window", "p2p_window"),
                      ("chunk", "block_chunk")]:
        v = getattr(args, name.replace("-", "_"), None)
        if v is not None:
            kw[key] = v
    cfg = config.jupiter_100k(**kw)
    print(f"cfg: n={cfg.n} B={cfg.nbr_group_size} Ws={cfg.nbr_window} "
          f"Wp={cfg.p2p_window} chunk={cfg.block_chunk} "
          f"K={cfg.rebuild_every} lg={cfg.nbr_group_level}")

    state = ics.jupiter(cfg)
    print("devices:", jax.devices()[0].platform)

    # ---- build ----
    build = jax.jit(lambda p, h, m: structure.build(p, h, m, cfg, skin=0.1))
    t, st = timed(build, state.pos, state.h, state.mass, repeat=args.repeat)
    g = st.groups.live.shape[0]
    print(f"build: {t*1e3:.1f} ms  G={g} "
          f"n_sph max={int(jnp.max(st.n_sph))} avg={float(jnp.mean(jnp.where(st.n_sph>0, st.n_sph, 0))):.1f} "
          f"n_p2p max={int(jnp.max(st.n_p2p))} avg={float(jnp.mean(st.n_p2p)):.1f} "
          f"overflow sph={int(st.sph_overflow)} p2p={int(st.p2p_overflow)} "
          f"accept_avg={float(jnp.mean(jnp.sum(st.accept, axis=1))):.0f}")

    # ---- one force evaluation ----
    forces = jax.jit(lambda p, h, m, s: structure.forces(p, h, m, cfg, s))
    t, bf = timed(forces, state.pos, state.h, state.mass, st,
                  repeat=args.repeat)
    print(f"forces: {t*1e3:.1f} ms  nn_avg={float(jnp.mean(bf.n_neighbors)):.1f} "
          f"nd_avg={float(jnp.mean(bf.n_direct)):.0f} "
          f"na_avg={float(jnp.mean(bf.n_approx)):.0f}")

    # ---- end-to-end cached run ----
    state = planet.prime(state, cfg)
    _ = planet.run(state, cfg, cfg.rebuild_every)      # compile
    sync(_)
    n_steps = args.steps
    t0 = time.perf_counter()
    out, info = planet.run_info(state, cfg, n_steps)
    sync(out)
    dt = time.perf_counter() - t0
    rate = n_steps / dt
    print(f"run: {n_steps} steps in {dt:.2f}s = {rate:.1f} steps/s "
          f"({rate*cfg.n:.3g} particle-steps/s)  "
          f"overflow={ {k: int(v) for k, v in info.items()} }")


if __name__ == "__main__":
    main()

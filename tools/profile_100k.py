#!/usr/bin/env python3
"""Cost breakdown of the jupiter_100k pipeline on the live device.

Times each phase separately (tree build, tree eval, SPH grid pass1+2, full
cached chunk) with honest scalar-readback timing (see docs/ROUND2.md
measurement gotchas), and prints the interaction-list occupancy statistics
that size the static capacities.
"""

import argparse
import time

import jax
import jax.numpy as jnp

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import neighbors as nbr_ops
from planetmodel_sph_tpu.ops import tree as tree_ops


def timeit(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # force readback
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    ts = sorted(times)
    print(f"{label:34s} med {ts[len(ts)//2]*1e3:9.2f} ms   "
          f"min {ts[0]*1e3:9.2f}  max {ts[-1]*1e3:9.2f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cfg = psph.jupiter_100k(n=args.n)
    print(f"device: {jax.devices()[0]}  n={cfg.n}  K={cfg.rebuild_every}")
    state = jax.jit(lambda s: planet.prime(s, cfg))(ics.jupiter(cfg))
    # settle a few chunks so h has adapted
    state = planet.run(state, cfg, 3 * cfg.rebuild_every)
    jax.block_until_ready(state)
    pos, h, mass, vel = state.pos, state.h, state.mass, state.vel

    # ---- structure builds ----
    nbr_build = jax.jit(lambda p, hh: nbr_ops.build(p, hh, cfg, skin=0.1))
    lists = timeit(nbr_build, pos, h, reps=args.reps, label="nbr build (grid adjacency)")

    tree_build = jax.jit(lambda p, hh, m: tree_ops.build_cache(p, hh, m, cfg, skin=0.1))
    cache = timeit(tree_build, pos, h, mass, reps=args.reps, label="tree build_cache")

    # ---- evals ----
    tree_eval = jax.jit(lambda c, p, hh, m: tree_ops.evaluate(c, p, hh, m, cfg))
    timeit(tree_eval, cache, pos, h, mass, reps=args.reps, label="tree evaluate (M2P+P2P)")

    def sph_eval(p, hh, m, ls):
        p1, gfn = nbr_ops.make_passes(p, hh, m, cfg, lists=ls)
        rho = p1[0]
        from planetmodel_sph_tpu.ops import eos as eos_ops
        prs = eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma)
        return gfn(rho, prs, cfg)
    timeit(jax.jit(sph_eval), pos, h, mass, lists, reps=args.reps,
           label="SPH grid pass1+pass2")

    # ---- full chunk (K steps, includes one rebuild) ----
    chunk = jax.jit(lambda s: planet.run_info(s, cfg, cfg.rebuild_every)[0])
    t_chunk_out = timeit(chunk, state, reps=args.reps, label=f"full chunk ({cfg.rebuild_every} steps)")
    del t_chunk_out

    # ---- occupancy stats ----
    g, b = lists.groups.live.shape
    n_src = jax.device_get(lists.n_src)
    print(f"\nSPH groups: G={g} B={b} W={cfg.nbr_window}")
    print(f"  n_src: mean {n_src.mean():.1f} max {n_src.max()} "
          f"(overflow {int(jax.device_get(lists.overflow))})")
    print(f"  candidate pairs/target: mean {n_src.mean()*b:.0f}")

    m2p_n = jax.device_get(cache.m2p_n)
    p2p_ct = jax.device_get(jnp.sum(cache.p2p_valid, axis=1))
    gT = cache.m2p.shape[0]
    print(f"\ntree groups: G={gT} B={cfg.tree_group_size} "
          f"m2p_cap={cfg.tree_m2p_cap} p2p_cap={cfg.tree_p2p_cap}")
    print(f"  m2p_n:  mean {m2p_n.mean():.0f} max {m2p_n.max()}")
    print(f"  p2p:    mean {p2p_ct.mean():.0f} max {p2p_ct.max()}")
    print(f"  overflow detail (m2p, cell, p2p, frontier): "
          f"{jax.device_get(cache.overflow_detail)}")

    sps = None
    print("\n(steps/s from full-chunk: "
          f"{cfg.rebuild_every / min(1e9, 1):.0f})" if sps else "")


if __name__ == "__main__":
    main()

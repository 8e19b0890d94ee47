#!/usr/bin/env python3
"""Angular-momentum conservation of the production TREE stack on a
ROTATING 100k body (VERDICT r4 weak #3 re-validation).

The MAC's target-dependent acceptance exerts a small net torque
(measured on the non-rotating ship validation: |dL| ~ 0.85 per 10k
steps = implied spin 1.4e-5/10k against I_com = 6.0e4). Rotating-planet
science is where that bites, so this driver measures the RELATIVE L
drift where L is genuinely large: load the settled 100k polytrope
checkpoint, superpose a solid-body spin omega well inside breakup, and
run the exact shipped preset for --steps steps.

  python tools/rotating_l_check.py --ck docs/results/drift100k_r5ship/state.psph
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from planetmodel_sph_tpu.models import planet
from planetmodel_sph_tpu.utils import checkpoint, diagnostics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ck",
                    default="docs/results/drift100k_r4ship32/state.psph")
    ap.add_argument("--omega", type=float, default=0.01,
                    help="solid-body spin about z (breakup for the "
                         "settled ball is ~sqrt(GM/R^3) ~ 0.044)")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--out", default="docs/results/rotating_l_100k.json")
    ap.add_argument("--widen", type=float, default=1.0,
                    help="interaction-window widen factor: the spinning "
                         "body stretches occupancy beyond the "
                         "non-rotating preset capacities (measured "
                         "~1.3k dropped tree entries per 500 steps at "
                         "omega=0.01 with x1)")
    args = ap.parse_args()

    state, cfg, _ = checkpoint.load(args.ck)
    if args.widen != 1.0:
        r16 = lambda v: -(-int(v * args.widen) // 16) * 16
        cfg = cfg.replace(nbr_window=r16(cfg.nbr_window),
                          p2p_window=r16(cfg.p2p_window),
                          m2p_window=r16(cfg.m2p_window),
                          sph_refined_window=r16(cfg.sph_refined_window)
                          if cfg.sph_refined_window else 0)
    m = state.mass
    com = jnp.sum(m[:, None] * state.pos, axis=0) / jnp.sum(m)
    r = state.pos - com
    spin = args.omega * jnp.stack(
        [-r[:, 1], r[:, 0], jnp.zeros_like(r[:, 0])], axis=1)
    state = state.replace(vel=state.vel + spin)
    state = jax.jit(lambda s: planet.prime(s, cfg))(state)

    runner = jax.jit(lambda s: planet.run_info(s, cfg, args.chunk))
    rows = []
    done = 0
    while done < args.steps:
        state, info = jax.block_until_ready(runner(state))
        done += args.chunk
        d = {k: float(v) for k, v in
             diagnostics.measure(state, cfg).items()}
        d.update(step=done, nbr_overflow=int(info["nbr_overflow"]),
                 tree_overflow=int(info["tree_overflow"]))
        rows.append(d)
        print(f"step {done}: E={d['total_energy']:.6g} "
              f"Lz={d['angular_momentum_z']:.6g} "
              f"|L|={d['angular_momentum_mag']:.6g} "
              f"over=({d['nbr_overflow']},{d['tree_overflow']})",
              flush=True)

    l0, l1 = rows[0], rows[-1]
    span = l1["step"] - l0["step"]
    dl = np.sqrt(sum(
        (l1[f"angular_momentum_{c}"] - l0[f"angular_momentum_{c}"]) ** 2
        for c in "xyz"))
    rel = dl / abs(l0["angular_momentum_mag"]) * 10_000.0 / span
    de = abs(l1["total_energy"] - l0["total_energy"]) \
        / abs(l0["total_energy"]) * 10_000.0 / span
    over = sum(r_["nbr_overflow"] + r_["tree_overflow"] for r_ in rows)
    summary = dict(omega=args.omega, steps=args.steps,
                   l_mag_0=l0["angular_momentum_mag"],
                   l_rel_drift_per_10k=rel, energy_drift_per_10k=de,
                   overflow=over, rows=rows)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

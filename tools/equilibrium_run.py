#!/usr/bin/env python3
"""Flagship validation run: 3k-particle Jupiter to hydrostatic equilibrium.

Reproduces the reference's headline achieved capability (``README.md:34``:
hydrostatic equilibrium with 3k particles) and measures the BASELINE.json
north-star diagnostic: energy drift over 10k steps. Writes:

  out/equilibrium_diags.npz   stacked diagnostics every `--every` steps
  out/equilibrium_state.psph  final checkpoint
  out/equilibrium.png         final-state render
  out/profile.json            radial density/pressure profile (16 bins)

Usage: python tools/equilibrium_run.py [--steps 10000] [--preset default]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import planetmodel_sph_tpu as psph                     # noqa: E402
from planetmodel_sph_tpu.models import ics, planet     # noqa: E402
from planetmodel_sph_tpu.utils import checkpoint, diagnostics, render  # noqa: E402


def radial_profile(state, nbins=16):
    pos = np.asarray(state.pos)
    m = np.asarray(state.mass)
    com = np.average(pos, axis=0, weights=m)
    r = np.linalg.norm(pos - com, axis=-1)
    edges = np.quantile(r, np.linspace(0, 1, nbins + 1))
    rows = []
    for i in range(nbins):
        sel = (r >= edges[i]) & (r <= edges[i + 1])
        if sel.sum() == 0:
            continue
        rows.append({
            "r_mid": float(0.5 * (edges[i] + edges[i + 1])),
            "rho_avg": float(np.asarray(state.rho)[sel].mean()),
            "pressure_avg": float(np.asarray(state.pressure)[sel].mean()),
            "count": int(sel.sum()),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--every", type=int, default=250)
    ap.add_argument("--preset", default="jupiter_3k",
                    choices=["jupiter_3k", "parity", "default", "gradh",
                             "gradh_100k"])
    ap.add_argument("--restore", default=None,
                    help="continue from a checkpoint (e.g. to measure drift "
                         "in true equilibrium after the collapse transient)")
    ap.add_argument("--out", default="out")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    step0 = 0
    if args.restore:
        state, cfg, step0 = checkpoint.load(args.restore)
        print(f"restored {args.restore} at step {step0}")
    else:
        if args.preset == "gradh":
            # energy-consistent adaptive-h configuration (grad-h + Newton)
            cfg = psph.default(n=3000, grad_p_mode="grad_h", h_mode="newton")
        elif args.preset == "gradh_100k":
            # the BASELINE north-star physics config at the north-star
            # scale: grad-h + bounded Newton h on the grid+tree cached
            # production pipeline (VERDICT round-1 item 5)
            cfg = psph.jupiter_100k(grad_p_mode="grad_h", h_mode="newton")
        elif args.preset == "default":
            cfg = psph.default(n=3000)
        else:
            cfg = getattr(psph, args.preset)()
        import jax
        state = jax.jit(lambda s: planet.prime(s, cfg))(ics.jupiter(cfg))

    every = max(1, min(args.every, args.steps))
    n_chunks = max(1, args.steps // every)
    t0 = time.perf_counter()
    state, diags = planet.run_with_diagnostics(state, cfg, n_chunks, every)
    e = float(np.asarray(diags["total_energy"])[-1])  # forces completion
    wall = time.perf_counter() - t0
    total = n_chunks * every
    print(f"{total} steps in {wall:.1f}s = {total/wall:.1f} steps/s "
          f"({cfg.n*total/wall:.3g} particle-steps/s)")

    drift = np.asarray(diagnostics.energy_drift(diags))
    print(f"energy drift over {total} steps: {drift[-1]:.3e} "
          f"(max {drift.max():.3e})")
    print(f"final neighbors_avg: "
          f"{float(np.asarray(diags['neighbors_avg'])[-1]):.1f}")
    print(f"radius_rms: {np.asarray(diags['radius_rms'])[0]:.2f} -> "
          f"{np.asarray(diags['radius_rms'])[-1]:.2f}")

    np.savez(os.path.join(args.out, "equilibrium_diags.npz"),
             **{k: np.asarray(v) for k, v in diags.items()})
    checkpoint.save(os.path.join(args.out, "equilibrium_state.psph"),
                    state, cfg, step0 + total)
    render.render_png(state, os.path.join(args.out, "equilibrium.png"))
    with open(os.path.join(args.out, "profile.json"), "w") as f:
        json.dump({"preset": args.preset, "steps": step0 + total,
                   "energy_drift": float(drift[-1]),
                   "profile": radial_profile(state)}, f, indent=1)
    print(f"artifacts -> {args.out}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

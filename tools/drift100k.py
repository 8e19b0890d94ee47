#!/usr/bin/env python3
"""Crash-resilient 100k energy-drift measurement (VERDICT round-1 item 5).

The relay TPU worker intermittently crashes minutes into long runs, so
this driver advances in checkpointed chunks: each chunk is saved to a
.psph checkpoint and its diagnostics appended to a JSONL before the next
chunk starts. Re-running resumes from the last checkpoint, so an outer
retry loop (see --help epilog) makes progress monotone through crashes.

  while ! python tools/drift100k.py --target 10000; do sleep 300; done
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import checkpoint, diagnostics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--out", default="docs/results/drift100k")
    ap.add_argument("--preset", default="gradh",
                    choices=["gradh", "default"],
                    help="gradh: grad-h + bounded Newton h (the BASELINE "
                         "energy-consistent config); default: relax h")
    ap.add_argument("--cfl", action="store_true",
                    help="adaptive CFL timestep (survives the collapse "
                         "bounce that a fixed dt=0.02 does not at 100k)")
    ap.add_argument("--h-max", type=float, default=0.0,
                    help="halo smoothing-length cap (see SimConfig.h_max)")
    ap.add_argument("--windows", type=str, default=None,
                    help="nbr,p2p,m2p window override, e.g. 224,256,160")
    ap.add_argument("--av", type=float, default=None,
                    help="Monaghan AV alpha (beta=2*alpha). The cold-"
                         "collapse bounce at 100k is a strong shock; "
                         "settling runs need AV to dissipate it; the "
                         "drift measurement then switches it off.")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    ck = os.path.join(args.out, "state.psph")
    jsonl = os.path.join(args.out, "metrics.jsonl")

    if os.path.exists(ck):
        state, cfg, step0 = checkpoint.load(ck)
        if args.windows:    # capacity overrides apply on resume too
            nw, pw, mw = (int(x) for x in args.windows.split(","))
            cfg = cfg.replace(nbr_window=nw, p2p_window=pw, m2p_window=mw)
        if args.h_max:
            cfg = cfg.replace(h_max=args.h_max)
        if args.av is not None:
            cfg = cfg.replace(av_alpha=args.av, av_beta=2.0 * args.av)
        print(f"resumed {ck} at step {step0}", flush=True)
    else:
        kw = dict(grad_p_mode="grad_h", h_mode="newton") \
            if args.preset == "gradh" else {}
        if args.cfl:
            kw.update(dt_mode="cfl", cfl_number=0.25)
        if args.h_max:
            kw.update(h_max=args.h_max)
        if args.windows:
            nw, pw, mw = (int(x) for x in args.windows.split(","))
            kw.update(nbr_window=nw, p2p_window=pw, m2p_window=mw)
        if args.av is not None:
            kw.update(av_alpha=args.av, av_beta=2.0 * args.av)
        cfg = psph.jupiter_100k(**kw)
        state = jax.jit(lambda s: planet.prime(s, cfg))(ics.jupiter(cfg))
        step0 = 0

    runner = jax.jit(lambda s: planet.run_info(s, cfg, args.chunk))
    step = step0
    while step < args.target:
        state, info = runner(state)
        d = {k: float(v) for k, v in diagnostics.measure(state, cfg).items()}
        d["step"] = step = step + args.chunk
        d["nbr_overflow"] = int(info["nbr_overflow"])
        d["tree_overflow"] = int(info["tree_overflow"])
        with open(jsonl, "a") as f:
            f.write(json.dumps(d) + "\n")
        checkpoint.save(ck, jax.device_get(state), cfg, step)
        print(f"step {step}: E={d['total_energy']:.6g} "
              f"nn={d['neighbors_avg']:.1f} over=({d['nbr_overflow']},"
              f"{d['tree_overflow']})", flush=True)
    print("target reached", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

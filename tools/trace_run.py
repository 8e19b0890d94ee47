#!/usr/bin/env python3
"""Capture an xplane trace of the production 100k pipeline.

Runs a warm multi-step chunk at the settled operating point under
jax.profiler, then prints the top-op summary via tools/trace_summary.py.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ck", default="docs/results/drift100k/state.psph")
    ap.add_argument("--out", default="/tmp/jaxtrace2")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--gradh", action="store_true", default=True)
    ap.add_argument("--preset", default=None,
                    help="extra jupiter_100k overrides, k=v comma list")
    args = ap.parse_args()

    kw = dict(grad_p_mode="grad_h", h_mode="newton")
    if args.preset:
        for item in args.preset.split(","):
            k, v = item.split("=")
            kw[k] = config_mod.parse_override(k, v)
    cfg = config_mod.jupiter_100k(**kw)
    if args.ck and os.path.exists(args.ck):
        from planetmodel_sph_tpu.utils import checkpoint
        state, _, _ = checkpoint.load(args.ck)
    else:
        state = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1))

    r = jax.jit(lambda s: planet.run(s, cfg, args.steps))
    out = r(state); float(jnp.sum(out.pos))          # warm (slow compile)
    t0 = time.perf_counter()
    out = r(state); float(jnp.sum(out.pos))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"warm: {dt*1e3:.1f} ms/step = {1/dt:.1f} steps/s", flush=True)

    jax.profiler.start_trace(args.out)
    out = r(state); float(jnp.sum(out.pos))
    jax.profiler.stop_trace()
    print("trace ->", glob.glob(f"{args.out}/**/*.xplane.pb",
                                recursive=True), flush=True)

    import subprocess
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "trace_summary.py"),
                    args.out, "--top", "40"])


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""A/B energy-drift probes at 100k: isolate WHICH operating-point knob pumps.

The q10 flip (quad theta=1.0 + K=16 + warm-started h) measured 26.7
steps/s but its full drift run shows EXPONENTIAL energy growth (doubling
~1000 steps, the polytrope breathing period) where the K=8 monopole
theta=0.7 baseline was stable at 2.8e-4/10k. This driver settles ONCE
(or reuses a saved settled state), then runs a short drift probe per
variant from the SAME settled state, printing the per-chunk energy-drift
curve — exponential pumping is visible within 3000 steps (the full run's
chunk drift went 0.009/0.017/0.031/0.058/0.100 from step 7500 on).

  python tools/drift_probe.py --probe ctrl --probe q10 --probe q10k8
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import checkpoint, diagnostics

BASE = dict(grad_p_mode="grad_h", h_mode="newton",
            nbr_window=240, p2p_window=384, m2p_window=192)

# Probe ladder between the stable r2 baseline and the unstable q10 point.
PROBES = {
    # r2-baseline physics (monopole theta=0.7, K=8, full Newton h):
    # expect flat drift — the control that nothing else regressed.
    "ctrl": dict(multipole_order=1, theta=0.7, rebuild_every=8,
                 sort_every=64),
    # the committed q10 winner: expect pumping (reproduces the full run)
    "q10": dict(multipole_order=2, theta=1.0, rebuild_every=16,
                sort_every=64, gather_pad_rows=32),
    # q10 minus each ingredient, one at a time:
    "q10k8": dict(multipole_order=2, theta=1.0, rebuild_every=8,
                  sort_every=64, gather_pad_rows=32),
    "q10hw": dict(multipole_order=2, theta=1.0, rebuild_every=16,
                  sort_every=64, gather_pad_rows=32, h_newton_iters=4),
    "q10t07": dict(multipole_order=2, theta=0.7, rebuild_every=16,
                   sort_every=64, gather_pad_rows=32),
    "mono_k16": dict(multipole_order=1, theta=0.7, rebuild_every=16,
                     sort_every=64, gather_pad_rows=32),
    # q10 with BOTH suspects reverted (quad kept):
    "q10k8hw": dict(multipole_order=2, theta=1.0, rebuild_every=8,
                    sort_every=64, gather_pad_rows=32, h_newton_iters=4),
    "q09k8": dict(multipole_order=2, theta=0.9, rebuild_every=8,
                  sort_every=64, gather_pad_rows=32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="append", default=[])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--settle", type=int, default=2000)
    ap.add_argument("--settled", default="/tmp/settled100k.psph",
                    help="settled-state cache (created if absent)")
    ap.add_argument("--out", default="/tmp/drift_probe.jsonl")
    args = ap.parse_args()
    names = args.probe or ["ctrl", "q10"]

    if os.path.exists(args.settled):
        state0, _, _ = checkpoint.load(args.settled)
        print(f"reusing settled state {args.settled}", flush=True)
    else:
        # settle at the stable r2-baseline physics (monopole theta=0.7)
        # regardless of the preset's current defaults, so the shared
        # settled state is never produced by a suspect operating point
        cfg_s = psph.jupiter_100k(**BASE, vel_damping=0.1, av_alpha=0.5,
                                  av_beta=1.0, rebuild_every=8,
                                  sort_every=64, multipole_order=1,
                                  theta=0.7)
        state0 = jax.jit(lambda s: planet.prime(s, cfg_s))(
            ics.polytrope(cfg_s))
        # settle in chunks: one giant dispatch crashed the relay worker;
        # chunking also gives progress visibility
        run = jax.jit(lambda s: planet.run_info(s, cfg_s, args.chunk))
        t0 = time.perf_counter()
        done = 0
        while done < args.settle:
            state0, info = run(state0)
            state0 = jax.block_until_ready(state0)
            done += args.chunk
            print(f"settle {done}/{args.settle} "
                  f"({time.perf_counter()-t0:.0f}s) over="
                  f"({int(info['nbr_overflow'])}, "
                  f"{int(info['tree_overflow'])})", flush=True)
        state0 = jax.device_get(state0)
        checkpoint.save(args.settled, state0,
                        psph.jupiter_100k(**BASE), args.settle)

    n_chunks = args.steps // args.chunk
    for name in names:
        cfg = psph.jupiter_100k(**BASE, **PROBES[name])
        run = jax.jit(lambda s: planet.run_info(s, cfg, args.chunk))
        state = jax.device_put(state0)
        e0, prev = None, None
        t0 = time.perf_counter()
        drifts = []
        for c in range(n_chunks):
            state, info = run(state)
            d = diagnostics.measure(state, cfg)
            e = float(d["total_energy"])
            vmax = float(d["vel_max"])
            over = (int(info["nbr_overflow"]), int(info["tree_overflow"]))
            if e0 is None:
                e0, prev = e, e
            drifts.append(e - prev)
            prev = e
            print(f"{name:8s} step {(c+1)*args.chunk:5d}: E={e:.4f} "
                  f"dE={drifts[-1]:+.4f} vmax={vmax:.3f} over={over}",
                  flush=True)
        dt = time.perf_counter() - t0
        rel = abs(prev - e0) / abs(e0)
        # growth flag: last chunk's |dE| vs the first nonzero chunk's
        row = dict(probe=name, drift_rel=rel,
                   per10k=rel * 10000.0 / max(args.steps - args.chunk, 1),
                   chunk_dE=[round(x, 5) for x in drifts],
                   vmax=vmax, secs=round(dt, 1))
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"{name:8s}: drift {rel:.2e} over {args.steps} steps "
              f"(~{row['per10k']:.1e}/10k) vmax={vmax:.3f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Crash-resilient 100k energy-drift measurement (VERDICT round-1 item 5).

Protocol (two phases, one JSONL trail, phase recorded per row):

1. SETTLE (steps [0, --settle)): damped relaxation (cfg.vel_damping) with
   mild AV from the analytic n=1 polytrope IC (ics.polytrope — the exact
   hydrostatic solution for P=K rho^2, so only sampling noise needs to
   relax out). The earlier cold-collapse protocol is still available
   (--ic cold) but at 100k the collapse bounce is a strong shock that
   overflows any settled-state window sizing (measured: 85M dropped
   interactions/step at the bounce -> momentum blows up); the polytrope
   start avoids the problem instead of fighting it.
2. DRIFT (steps [--settle, --target]): damping and AV OFF — the
   conservative production pipeline. Drift is |E-E0|/|E0| with E0 at the
   first drift-phase row.

The relay TPU worker intermittently crashes minutes into long runs, so
the driver advances in checkpointed chunks: each chunk is saved to a
.psph checkpoint and its diagnostics appended to the JSONL before the
next chunk starts. Re-running resumes from the last checkpoint, so an
outer retry loop makes progress monotone through crashes:

  while ! python tools/drift100k.py; do sleep 120; done
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# share bench.py's persistent XLA compilation cache: the settle/drift
# runners recompile identically on every resume after a relay crash
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import checkpoint, diagnostics


def build_cfg(args, settle: bool, widen: float = 1.0):
    kw = dict(grad_p_mode="grad_h", h_mode="newton") \
        if args.preset == "gradh" else {}
    if args.cfl:
        kw.update(dt_mode="cfl", cfl_number=0.25)
    if args.h_max:
        kw.update(h_max=args.h_max)
    nw, pw, mw = ((int(x) for x in args.windows.split(","))
                  if args.windows else
                  (psph.jupiter_100k().nbr_window,
                   psph.jupiter_100k().p2p_window,
                   psph.jupiter_100k().m2p_window))
    r16 = lambda v: -(-int(v * widen) // 16) * 16
    kw.update(nbr_window=r16(nw), p2p_window=r16(pw), m2p_window=r16(mw))
    if settle:
        kw.update(vel_damping=args.damp,
                  av_alpha=args.av, av_beta=2.0 * args.av,
                  # the settle phase is throwaway quasi-static relaxation
                  # — run it on conservative short full-rate chunks (the
                  # raw IC's noisy accelerations blow up K=32 Verlet
                  # skins and RESPA impulses; measured: 66M dropped tree
                  # interactions -> NaN by step 2000 when the ship
                  # preset's K=32/respa8 ran the settle). The DRIFT
                  # phase is the validation target and runs the preset
                  # exactly as shipped.
                  rebuild_every=8, respa_every=1)
    for item in (args.set or []):
        k, v = item.split("=")
        kw[k] = psph.config.parse_override(k, v)
        if k in ("sph_exact_window", "blk_window") and widen > 1.0:
            kw[k] = r16(kw[k])      # r16 applies the widen factor itself
    return psph.jupiter_100k(**kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=12000,
                    help="total steps INCLUDING the settle phase")
    ap.add_argument("--settle", type=int, default=2000,
                    help="damped settling steps before the measurement")
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--out", default="docs/results/drift100k")
    ap.add_argument("--ic", default="polytrope", choices=["polytrope", "cold"])
    ap.add_argument("--preset", default="gradh", choices=["gradh", "default"],
                    help="gradh: grad-h + bounded Newton h (the BASELINE "
                         "energy-consistent config); default: relax h")
    ap.add_argument("--cfl", action="store_true",
                    help="adaptive CFL timestep (not needed from the "
                         "polytrope IC; required to survive a cold collapse)")
    ap.add_argument("--h-max", type=float, default=5.0,
                    help="halo smoothing-length cap (see SimConfig.h_max)")
    ap.add_argument("--windows", type=str, default=None,
                    help="nbr,p2p,m2p window override, e.g. 224,256,160")
    ap.add_argument("--damp", type=float, default=0.1,
                    help="settle-phase velocity damping rate")
    ap.add_argument("--settle-widen", type=float, default=2.0,
                    help="initial window widen factor for the SETTLE "
                         "phase only (the raw polytrope IC overflows "
                         "settled-state window sizing by >100M pairs)")
    ap.add_argument("--av", type=float, default=0.5,
                    help="settle-phase Monaghan AV alpha (beta=2*alpha)")
    ap.add_argument("--set", action="append", default=[],
                    help="extra jupiter_100k override k=v (repeatable); "
                         "sph_exact_window/blk_window also scale with the "
                         "overflow-retry widen factor")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    ck = os.path.join(args.out, "state.psph")
    jsonl = os.path.join(args.out, "metrics.jsonl")

    if os.path.exists(ck):
        state, _, step0 = checkpoint.load(ck)   # cfg rebuilt from args
        print(f"resumed {ck} at step {step0}", flush=True)
    else:
        cfg0 = build_cfg(args, settle=args.settle > 0,
                         widen=args.settle_widen if args.settle else 1.0)
        ic = ics.polytrope if args.ic == "polytrope" else ics.jupiter
        state = jax.jit(lambda s: planet.prime(s, cfg0),
                        static_argnums=())(ic(cfg0))
        step0 = 0

    runners = {}

    def advance(state, k, settle, widen):
        key = (k, settle, widen)
        if key not in runners:
            cfg = build_cfg(args, settle, widen)
            runners[key] = (jax.jit(lambda s: planet.run_info(s, cfg, k)), cfg)
        fn, cfg = runners[key]
        return fn(state), cfg

    step = step0
    # widen is tracked PER PHASE: the raw IC needs wider windows than the
    # settled state (first-chunk h not yet adapted), and a settle-phase
    # widen must NOT leak into the drift phase — the drift phase is the
    # production operating point, and the final checkpoint's cfg (which
    # bench.py loads) must carry the preset's own windows unless the
    # drift phase itself overflowed.
    widens = {True: args.settle_widen, False: 1.0}
    while step < args.target:
        settle = step < args.settle
        widen = widens[settle]
        k = min(args.chunk,
                (args.settle if settle else args.target) - step)
        (state2, info), cfg = advance(state, k, settle, widen)
        over = (int(info["nbr_overflow"]), int(info["tree_overflow"]))
        if sum(over) > 0 and widen < 2.5:
            # overflow corrupts the chunk's physics (dropped interactions
            # break force symmetry): discard it, widen every window 25%,
            # and retry the same span from the pre-chunk state
            widens[settle] = round(widen * 1.25, 4)
            print(f"step {step}: overflow {over} -> windows "
                  f"x{widens[settle]} ({'settle' if settle else 'drift'} "
                  f"phase), chunk retried", flush=True)
            continue
        state = state2
        if not settle and widen > 1.0:
            # the drift-phase widen is TRANSIENT: a one-off overflow (r4
            # saw 6 dropped tree entries in one chunk at step 4000) must
            # not pin the rest of the run — and the final checkpoint's
            # cfg, which bench.py loads as the operating point — at
            # widened capacities. Retry the preset on the next chunk; a
            # persistent overflow costs at most 2x per chunk and stays
            # loud in the log.
            widens[False] = 1.0
            print(f"step {step + k}: widened chunk clean -> windows back "
                  f"to preset for the next chunk", flush=True)
        d = {k2: float(v) for k2, v in diagnostics.measure(state, cfg).items()}
        d["step"] = step = step + k
        d["phase"] = "settle" if settle else "drift"
        d["nbr_overflow"], d["tree_overflow"] = over
        d["window_widen"] = widen
        with open(jsonl, "a") as f:
            f.write(json.dumps(d) + "\n")
        checkpoint.save(ck, jax.device_get(state), cfg, step)
        print(f"step {step} [{d['phase']}]: E={d['total_energy']:.6g} "
              f"|p|={d['momentum_mag']:.3g} "
              f"vmax={d['vel_max']:.3f} nn={d['neighbors_avg']:.1f} "
              f"over={over}", flush=True)
    print("target reached", flush=True)
    return ship_gate(jsonl)


def ship_gate(jsonl: str, drift_budget: float = 1e-3,
              mom_budget: float = 1e-3,
              spin_budget: float = 5e-5) -> int:
    """Ship gate over the drift-phase rows: energy drift per 10k steps,
    momentum growth (VERDICT r3 weak #5 — |p| grew to 2.9e-2 over the
    r3 validation with grav_com_correction off), AND angular-momentum
    drift (VERDICT r4 weak #3: the MAC's target-dependent acceptance
    exerts a net torque the COM correction cannot see; judge-read
    dL_z ~ -0.35 per 10k steps at the r4 ship point). L is gated as the
    IMPLIED SOLID-BODY SPIN RATE d(omega) = |dL| / I_com per 10k steps —
    the frame-meaningful scale for a body whose true L is ~0 (a relative
    |dL|/|L| gate would be 0/0). Measured at the r4 ship point
    (drift100k_r4ship32, I_com = 5.99e4): |dL| ~ 0.85/10k steps =
    dω 1.4e-5/10k, i.e. 0.03% of the settled polytrope's dynamical
    frequency sqrt(GM/R_max^3) ~ 0.044 per 10k-step campaign — the
    default budget 5e-5 gives ~3.5x headroom over that while still
    catching an order-of-magnitude regression. Returns a process exit
    code (0 = pass)."""
    rows = [json.loads(ln) for ln in open(jsonl)]
    drift = [r for r in rows if r.get("phase") == "drift"]
    if len(drift) < 2:
        print("ship gate: not enough drift rows", flush=True)
        return 1
    e0, e1 = drift[0]["total_energy"], drift[-1]["total_energy"]
    span = drift[-1]["step"] - drift[0]["step"]
    per10k = 10_000.0 / max(span, 1)
    de = abs(e1 - e0) / abs(e0) * per10k
    pmax = max(r["momentum_mag"] for r in drift)
    over = sum(r["nbr_overflow"] + r["tree_overflow"] for r in drift)
    if "angular_momentum_x" in drift[0]:
        dl = sum((drift[-1][f"angular_momentum_{c}"]
                  - drift[0][f"angular_momentum_{c}"]) ** 2
                 for c in "xyz") ** 0.5
        domega = dl / drift[-1]["inertia_com"] * per10k
        spin_ok = domega <= spin_budget
        spin_msg = (f", implied spin dL/I = {domega:.3g} per 10k steps "
                    f"(budget {spin_budget:g})")
    else:   # pre-round-5 JSONL without the L columns
        spin_ok, spin_msg = True, ", L columns absent (pre-r5 metrics)"
    ok = de <= drift_budget and pmax <= mom_budget and over == 0 \
        and spin_ok
    print(f"SHIP GATE [{'PASS' if ok else 'FAIL'}]: |dE|/|E| = {de:.3g} "
          f"per 10k steps (budget {drift_budget:g}), max |p| = {pmax:.3g} "
          f"(budget {mom_budget:g}), overflow = {over}{spin_msg}",
          flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())

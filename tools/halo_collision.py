#!/usr/bin/env python3
"""32k two-cluster collision on the 8-device virtual mesh, halo layout.

VERDICT r3 next-round #3 done-criterion: "a 32k+ two-cluster collision on
the 8-CPU mesh runs 2k steps with violations handled automatically and
matches replicated dp". A two-planet collision migrates particles across
Morton bricks BY CONSTRUCTION (the approach compresses the two bricks
into one), so it exercises exactly the failure mode the automatic
re-sharding loop (halo.run_resharded) exists for.

Protocol:
0. SETTLE one n/2 polytrope ball (damped, mild AV, conservative
   cadence — the production stack straight from a raw IC blows up
   Verlet skins and RESPA impulses; drift100k.py learned the same
   lesson, and the first cut of this driver re-learned it as NaNs).
   The two bodies are copies of the settled ball.
1. 64-step replicated-vs-halo cross-check from the primed two-body
   state (pre-collision, ring-coherent; fields must agree to MAC
   accuracy) — the "matches replicated dp" leg.
2. 2000 steps through approach + impact under halo.run_resharded with
   per-segment conservation rows appended to a JSONL — the
   "violations handled automatically" leg. Re-shards and accepted
   violations are counted loudly in the artifact.

Runs on the forced-CPU 8-device mesh (same recipe as
__graft_entry__.dryrun_multichip); nothing here touches the TPU, so it
can run alongside chip-bound measurement campaigns.

  python tools/halo_collision.py --out docs/results/halo32k
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HALO_NO_FORCE_CPU=1 lets tools/settle_ball.py import build_cfg/settle
# and run leg 0 on the real TPU chip (the 400-step 16k settle takes
# seconds there vs HOURS in the single-core CPU interpret fallback —
# measured: the round-4 32k attempt burned 2h of CPU without finishing
# leg 0). The mesh legs themselves still need the forced 8-device CPU.
# CRITICAL: env vars alone do NOT force CPU here — the session's TPU
# plugin sitecustomize overrides them via jax.config, after which
# make_mesh(8) used to silently truncate to the ONE tpu device and the
# ±R ring ppermute handed every shard R copies of ITSELF (duplicated
# sources, ~Rx densities, NaN). jax.config.update must run too (the
# tests/conftest.py recipe); make_mesh now raises on the truncation.
if os.environ.get("HALO_NO_FORCE_CPU") != "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

if os.environ.get("HALO_NO_FORCE_CPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) >= 8, jax.devices()

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.parallel import dp, halo, mesh as mesh_mod
from planetmodel_sph_tpu.utils import diagnostics


def build_cfg(n):
    # production formulation (jupiter_100k's stack) at 32k scale on the
    # halo layout; ring radius 3 (see the halo_ring_radius note below)
    # keeps the PRE-collision state ring-coherent. Post-merger the 8
    # octants of one ball exceed ANY 1-D ring — the driver counts those
    # violations loudly instead of hiding them.
    # radius ~ n^(1/3) keeps spacing/h/window occupancy n-invariant, so
    # a small-n smoke validates the 32k window sizing.
    return psph.default(
        n=n, radius=16.0 * (n / 32768) ** (1.0 / 3.0),
        particle_radius=3.2, block_n=128,
        neighbor_mode="grid", gravity_solver="tree",
        nbr_group_size=64, nbr_group_level=4,
        grad_p_mode="grad_h", h_mode="newton", h_track_margin=0.04,
        # refined_window=0 = refine WITHOUT truncation: the refine prune
        # cannot overflow ("occupancy can only shrink"), while a
        # truncation sized for 100k spilled 120k entries at the 16k
        # ball's resolved core (this cfg also runs nbr_sub=16, whose
        # window units are HALF the 100k preset's sub=32 rows). This is
        # a correctness-first validation driver — the capacity-shaped
        # gather win truncation buys is a perf knob, not physics.
        sph_refine_subblock=True, sph_refined_window=0,
        rebuild_every=8, sort_every=16, respa_every=4,
        multipole_order=2, theta=1.0, grav_com_correction=True,
        # sized ~2.4x the settled 16k ball measured single-chip maxima (the
        # first 32k leg-1 attempt at 512/320/320 dropped (105,388) entries
        # on the REPLICATED side too — dp per-shard groupings pad beyond
        # the single-chip maxima, the round-4 bisect note at scale):
        # occupancy (settle_ball.py unbounded-window probe: sph avg/max
        # 124/326, p2p 71/204, m2p 79/199 in sub=16 rows) — margin for
        # Verlet skins, per-shard box quantization and the merger
        # compression. (Earlier this round the same driver measured
        # occupancy up to 1198 rows and NaN'd: that was the degenerate
        # 1-device "mesh" duplicating ring sources — see the CPU-forcing
        # note above — not real demand.) halo_debug.py prints the REAL
        # halo-layout stats; leg overflow stays loudly counted.
        nbr_window=768, p2p_window=512, m2p_window=512,
        av_alpha=1.0, av_beta=2.0,
        # ring radius 3 of 8 shards: each 4-shard ball's own bricks meet
        # at its core (max intra-ball shard distance 3), so 3 is the
        # smallest ring that makes the PRE-collision state ring-coherent.
        # The merger still exceeds it (one ball over 8 shards needs the
        # full mesh) — that is the part the auto re-shard + loud
        # accept-and-count path is exercised by.
        dp_mode="halo", halo_ring_radius=3, halo_chunk=16)


def settle_cfg(cfg, nb, mult=3):
    """Leg-0 settle config for one n/2 ball (shared with settle_ball.py).

    `mult` widens every interaction window: the RAW polytrope IC's
    early transient (jittered unconverged h) needs wider windows than
    the settled state, and settle_ball.py PROBES the settled ball at
    the production legs' own (x1) windows before saving it."""
    bcfg = cfg.replace(n=nb, total_mass=cfg.total_mass / 2)
    # (build_cfg runs refine without truncation — sph_refined_window=0 —
    # after the x3/x6 settle attempts dropped an IDENTICAL 120,638
    # entries at 16k: every drop came from the then-unscaled truncation,
    # not the main windows)
    return bcfg.replace(vel_damping=0.1, av_alpha=0.5, av_beta=1.0,
                        respa_every=1, rebuild_every=4,
                        nbr_window=bcfg.nbr_window * mult,
                        p2p_window=bcfg.p2p_window * mult,
                        m2p_window=bcfg.m2p_window * mult)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--segment", type=int, default=100)
    ap.add_argument("--out", default="docs/results/halo32k")
    ap.add_argument("--separation", type=float, default=60.0)
    ap.add_argument("--approach-speed", type=float, default=0.6)
    ap.add_argument("--ball-ck", default=None,
                    help="pre-settled n/2 ball checkpoint from "
                         "tools/settle_ball.py (leg 0 on the TPU chip; "
                         "the CPU interpret fallback needs hours for it)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    jsonl = os.path.join(args.out, "metrics.jsonl")
    open(jsonl, "w").close()

    cfg = build_cfg(args.n)
    mesh = mesh_mod.make_mesh(8)

    # ---- leg 0: settle one n/2 polytrope ball, then collide copies ----
    nb = args.n // 2
    if args.ball_ck:
        from planetmodel_sph_tpu.utils import checkpoint as ck_mod
        ball, _, _ = ck_mod.load(args.ball_ck)
        if ball.n != nb:
            print(f"ball checkpoint has n={ball.n}, need {nb}", flush=True)
            return 4
        print(f"leg0 ball loaded from {args.ball_ck}", flush=True)
    else:
        scfg = settle_cfg(cfg, nb)
        ball = planet.prime(ics.polytrope(scfg), scfg)
        ball, sinfo = jax.block_until_ready(jax.jit(
            lambda s: planet.run_info(s, scfg, 400))(ball))
        sover = (int(sinfo["nbr_overflow"]), int(sinfo["tree_overflow"]))
        print(f"leg0 settled ball: over={sover}", flush=True)
        if sum(sover):
            print("leg0 OVERFLOW: settle windows too small for this n — "
                  "aborting rather than validating from a corrupted ball",
                  flush=True)
            return 3

    dx = np.array([args.separation / 2, 4.0, 0.0], np.float32)
    dv = np.array([args.approach_speed / 2, 0.0, 0.0], np.float32)
    a = ball.replace(pos=ball.pos - dx, vel=ball.vel + dv)
    b = ball.replace(pos=ball.pos + dx, vel=ball.vel - dv)
    st = jax.tree.map(lambda x, y: jax.numpy.concatenate([x, y], axis=0),
                      a, b)
    st = planet.prime(st, cfg)

    # ---- leg 1: halo matches replicated dp over a 64-step span ----
    # advanced in 8-step sub-segments with per-segment counters: a
    # failure (overflow climbing, non-finite state) then pinpoints its
    # onset instead of surfacing 64 steps later as a KD-tree crash
    rep_cfg = cfg.replace(dp_mode="replicated")
    rep_out = mesh_mod.shard_state(st, mesh)
    hal = halo.morton_shard_state(st, mesh)
    hal_out = hal
    rrun = dp.make_run_info(rep_cfg, mesh)
    hrun = halo.make_run(cfg, mesh)
    hal_info = None
    finite = lambda s: all(bool(jax.numpy.all(jax.numpy.isfinite(l)))
                           for l in jax.tree.leaves(s))
    for seg in range(8):
        rep_out, rep_info = jax.block_until_ready(rrun(rep_out, 8))
        hal_out, hal_info = jax.block_until_ready(hrun(hal_out, 8))
        rf, hf = finite(rep_out), finite(hal_out)
        print(f"leg1 seg {seg}: rep finite={rf} "
              f"over=({int(rep_info['nbr_overflow'])},"
              f"{int(rep_info['tree_overflow'])})  halo finite={hf} "
              f"over=({int(hal_info['nbr_overflow'])},"
              f"{int(hal_info['tree_overflow'])}) "
              f"viol={int(hal_info['halo_violations'])}", flush=True)
        if not (rf and hf):
            print("leg1 NON-FINITE — aborting before pairing", flush=True)
            return 5
    # same particles, different order (the halo layout Morton-sorts and
    # the state carries no id field): pair each replicated particle with
    # its nearest halo particle via a KD-tree. Unlike an independent
    # lexsort on float positions, nearest-neighbor pairing cannot swap
    # two near-equal coordinates that sorted differently between runs.
    from scipy.spatial import cKDTree
    rp, hp = (np.asarray(s.pos) for s in (rep_out, hal_out))
    rv, hv = (np.asarray(s.vel) for s in (rep_out, hal_out))
    dist, hi = cKDTree(hp).query(rp, k=1)
    scale = float(np.max(np.abs(rp)))
    # Error is LOCALIZED by construction: the counted violations are
    # Morton strays (z-order over a two-cluster domain sorts a few
    # ball-A rim particles into ball-B bricks) whose near field the
    # non-ring monopole path approximates — at D=8 no ring below the
    # full mesh can cover them (2R < D bounds R at 3), which is the
    # regime bytes_per_step already concedes (ring ~ all_gather). The
    # bulk must still track replicated tightly: gate on the 99th
    # percentile, REPORT the max + affected-particle fraction.
    dpos_p99 = float(np.percentile(dist, 99))
    dpos_max = float(np.max(dist))
    dvel = np.abs(rv - hv[hi]).max(axis=1)
    dvel_p99, dvel_max = float(np.percentile(dvel, 99)), float(dvel.max())
    frac_off = float(np.mean(dist > 1e-3 * scale))
    match = dpos_p99 <= 1e-3 * scale and dvel_p99 <= 1e-2
    print(f"leg1 match-vs-replicated: |dpos| p99={dpos_p99:.3g} "
          f"max={dpos_max:.3g} (scale {scale:.3g}) "
          f"|dvel| p99={dvel_p99:.3g} max={dvel_max:.3g} "
          f"frac>1e-3scale={frac_off:.4f} "
          f"halo_viol={int(hal_info['halo_violations'])} "
          f"[{'PASS' if match else 'FAIL'}]", flush=True)

    # ---- leg 2: 2k steps through the impact, auto re-sharding ----
    t0 = time.time()

    def on_segment(state, done, info):
        d = {k2: float(v) for k2, v in
             diagnostics.measure(jax.device_get(state), cfg).items()}
        d.update(step=done,
                 halo_violations=int(info["halo_violations"]),
                 nbr_overflow=int(info["nbr_overflow"]),
                 tree_overflow=int(info["tree_overflow"]),
                 wall_s=round(time.time() - t0, 1))
        with open(jsonl, "a") as f:
            f.write(json.dumps(d) + "\n")
        print(f"step {done}: E={d['total_energy']:.6g} "
              f"|p|={d['momentum_mag']:.3g} "
              f"viol={d['halo_violations']} "
              f"over=({d['nbr_overflow']},{d['tree_overflow']})",
              flush=True)

    state, total, reshards = halo.run_resharded(
        hal, cfg, mesh, args.steps, span=args.segment,
        log=lambda m: print(f"  {m}", flush=True),
        on_segment=on_segment)

    rows = [json.loads(ln) for ln in open(jsonl)]
    e0, e1 = rows[0]["total_energy"], rows[-1]["total_energy"]
    summary = dict(
        n=args.n, steps=args.steps, match_vs_replicated=match,
        dpos_p99=dpos_p99, dpos_max=dpos_max, dvel_p99=dvel_p99,
        dvel_max=dvel_max, frac_off=frac_off, reshards=reshards,
        halo_violations=int(total["halo_violations"]),
        energy_rel_change=abs(e1 - e0) / abs(e0),
        momentum_max=max(r["momentum_mag"] for r in rows),
        wall_s=rows[-1]["wall_s"])
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0 if match else 2


if __name__ == "__main__":
    sys.exit(main())

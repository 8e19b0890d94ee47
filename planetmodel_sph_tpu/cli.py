"""Command-line harness: `run` and `bench`.

The reference's only entry point is pressing Play on SimScene.unity in the
Unity editor (SURVEY.md §1); a standalone build was on its roadmap but
unfinished. This CLI is that missing harness: deterministic runs, metrics
logging every N steps (the analog of ``KernelSystem.cs:59-74``'s every-100-
updates stats dump), checkpoint/resume, and PNG rendering.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

from . import config as config_mod
from .models import ics, planet
from .utils import checkpoint, diagnostics, render


_PRESETS = {
    "default": config_mod.default,
    "auto": config_mod.auto,
    "parity": config_mod.parity,
    "jupiter_3k": config_mod.jupiter_3k,
    "jupiter_100k": config_mod.jupiter_100k,
    "basalt_impact": config_mod.basalt_impact,
}

_ICS = {
    "jupiter": ics.jupiter,
    "two_planet_collision": ics.two_planet_collision,
    "rotating_planet": ics.rotating_planet,
    "differentiated_planet": ics.differentiated_planet,
}


def _make_ic(args, cfg):
    if args.ic == "rotating_planet":
        return ics.rotating_planet(cfg, omega=args.omega)
    if args.ic == "two_planet_collision":
        mats = None
        if getattr(args, "materials", None):
            mats = tuple(args.materials.split(","))
            if len(mats) != 2:
                raise SystemExit("--materials wants two comma-separated "
                                 "names, e.g. basalt,ice")
        return ics.two_planet_collision(
            cfg, separation=args.separation,
            approach_speed=args.approach_speed,
            impact_parameter=args.impact_parameter,
            materials=mats)
    if args.ic == "differentiated_planet":
        kw = {}
        if getattr(args, "materials", None):
            core, mantle = args.materials.split(",")
            kw = {"core_material": core, "mantle_material": mantle}
        return ics.differentiated_planet(cfg, **kw)
    return _ICS[args.ic](cfg)


def _build_cfg(args) -> config_mod.SimConfig:
    kw = {}
    for name in ("n", "seed", "dt"):
        v = getattr(args, name, None)
        if v is not None:
            kw[name] = v
    if getattr(args, "integrator", None):
        kw["integrator"] = args.integrator
    if getattr(args, "gravity", None):
        kw["gravity_solver"] = args.gravity
    if getattr(args, "neighbor", None):
        kw["neighbor_mode"] = args.neighbor
    if getattr(args, "freeze_velocity", False):
        kw["freeze_velocity"] = True
    if getattr(args, "av", None):
        kw["av_alpha"] = args.av
        kw["av_beta"] = 2.0 * args.av
    if getattr(args, "balsara", False):
        kw["av_balsara"] = True
    if getattr(args, "eos", None):
        kw["eos_mode"] = args.eos
    for item in (getattr(args, "set", None) or []):
        k, v = item.split("=", 1)
        kw[k] = config_mod.parse_override(k, v)
    return _PRESETS[args.preset](**kw)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def cmd_run(args) -> int:
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    if args.restore:
        state, cfg, start_step = checkpoint.load(args.restore)
        _log(f"restored {args.restore} at step {start_step} (n={cfg.n})")
    else:
        cfg = _build_cfg(args)
        state = _make_ic(args, cfg)
        start_step = 0

    if args.metrics_jsonl and not args.restore:
        # fresh run: truncate — appending across unrelated runs silently
        # mixes experiments (resume keeps appending to its own trail)
        open(args.metrics_jsonl, "w").close()

    if args.devices and args.devices > 1:
        return _run_dp(args, cfg, state, start_step)
    if not args.restore:
        # jit: the eager per-op path materializes unfused broadcast tiles
        # (OOM at 100k)
        state = jax.jit(lambda s: planet.prime(s, cfg))(state)

    viewer = None
    if getattr(args, "serve", None) is not None:
        from .utils.liveview import LiveViewer
        viewer = LiveViewer(args.serve)
        _log(f"live view -> http://127.0.0.1:{viewer.port}")

    # run exactly --steps: full diag chunks plus a DIAGNOSED remainder chunk
    t0 = time.perf_counter()
    diags_list = []
    step_nos = []
    cur = start_step
    if args.render_every or viewer is not None:
        # frame-by-frame mode: chunked from Python so intermediate states
        # can be rendered (the analog of watching the editor viewport)
        write_frames = bool(args.render_every)
        if write_frames:
            os.makedirs(args.render_every_dir, exist_ok=True)
        r_every = max(1, min(args.render_every or args.diag_every,
                             args.steps))
        n_frames = args.steps // r_every
        rem = args.steps - n_frames * r_every
        for fi in range(n_frames + (1 if rem else 0)):
            k = r_every if fi < n_frames else rem
            state, d = planet.run_with_diagnostics(state, cfg, 1, k)
            cur += k
            diags_list.append(d)
            step_nos.append(cur)
            if write_frames:
                render.render_png(
                    state, os.path.join(args.render_every_dir,
                                        f"frame_{fi:05d}.png"),
                    color_by=args.render_color_by, quiver=args.render_quiver,
                    extent=args.render_extent)
            if viewer is not None:
                row = {k2: float(v[-1]) for k2, v in d.items()}
                row["step"] = cur
                row["steps_per_sec"] = (
                    (cur - start_step) / max(time.perf_counter() - t0, 1e-9))
                viewer.update(state, row, color_by=args.render_color_by,
                              quiver=args.render_quiver,
                              extent=args.render_extent)
                cfg = _viewer_control(viewer, cfg)
        if args.animate:
            out = render.assemble_gif(args.render_every_dir, args.animate,
                                      fps=args.animate_fps)
            _log(f"animation -> {out}")
    else:
        every = max(1, min(args.diag_every, args.steps))
        n_chunks = args.steps // every
        rem = args.steps - n_chunks * every
        if n_chunks:
            state, d = planet.run_with_diagnostics(state, cfg, n_chunks,
                                                   every)
            diags_list.append(d)
            step_nos.extend(start_step + (i + 1) * every
                            for i in range(n_chunks))
            cur = start_step + n_chunks * every
        if rem:
            state, d = planet.run_with_diagnostics(state, cfg, 1, rem)
            cur += rem
            diags_list.append(d)
            step_nos.append(cur)
    diags = {k: jax.numpy.concatenate([d[k] for d in diags_list])
             for k in diags_list[0]}
    # scalar readback: block_until_ready can return early on relay-backed
    # remote devices, silently under-reporting wall time
    float(jax.numpy.sum(state.pos))
    dt_wall = time.perf_counter() - t0
    total = cur - start_step
    _log(f"{total} steps in {dt_wall:.2f}s = {total/dt_wall:.1f} steps/s "
         f"({cfg.n*total/dt_wall:.3g} particle-steps/s)")

    for i, step_no in enumerate(step_nos):
        row = {k: float(v[i]) for k, v in sorted(diags.items())}
        keys = ("total_energy", "kinetic_energy", "rho_avg", "rho_max",
                "neighbors_avg", "radius_rms", "momentum_mag")
        brief = " ".join(f"{k}={row[k]:.5g}" for k in keys if k in row)
        _log(f"step {step_no}: {brief}")
        if args.metrics_jsonl:
            with open(args.metrics_jsonl, "a") as f:
                f.write(json.dumps({"step": step_no, **row}) + "\n")

    if args.checkpoint:
        checkpoint.save(args.checkpoint, state, cfg, start_step + total)
        _log(f"checkpoint -> {args.checkpoint}")
    if args.render:
        blocks = cfg if (args.render_blocks
                         and cfg.neighbor_mode == "grid") else None
        if args.render_blocks and blocks is None:
            _log("--render-blocks needs the grid pipeline; overlay skipped")
        out = render.render_png(state, args.render,
                                color_by=args.render_color_by,
                                quiver=args.render_quiver,
                                extent=args.render_extent, blocks=blocks)
        _log(f"render -> {out}")
    for key in ("nbr_overflow", "tree_overflow"):
        if key in diags and float(jax.numpy.sum(diags[key])) > 0:
            _log(f"WARNING: {key}={int(jax.numpy.sum(diags[key]))} "
                 f"interactions dropped — raise the corresponding capacity")
    drift = diagnostics.energy_drift(diags)
    _log(f"energy drift: {float(drift[-1]):.3e}")
    return 0


def _viewer_control(viewer, cfg):
    """Apply the live viewer's steering between chunks: hold while
    paused (frames keep serving), fold whitelisted knob overrides into
    the config (the next chunk recompiles once). The editor-Play-mode
    steering loop the reference gets from Unity for free."""

    def fold(c):
        paused, overrides, dirty = viewer.control()
        if dirty and overrides:
            c = c.replace(**overrides)
            _log(f"live knobs applied: {overrides} "
                 f"(next chunk recompiles)")
        return c, paused

    cfg, paused = fold(cfg)
    if paused:
        _log("paused from the live viewer")
        while paused:
            time.sleep(0.25)
            cfg, paused = fold(cfg)
        _log("resumed")
    return cfg


def _run_dp(args, cfg, state, start_step) -> int:
    """Data-parallel run over a device mesh (shard_map + ICI collectives)."""
    import jax.numpy as jnp
    from .parallel import dp, mesh as mesh_mod

    n_dev = min(args.devices, len(jax.devices()))
    if cfg.n % n_dev:
        _log(f"error: n={cfg.n} not divisible by {n_dev} devices")
        return 2
    mesh = mesh_mod.make_mesh(n_dev)
    _log(f"dp mesh over {n_dev} device(s): {mesh}")
    if cfg.dp_mode == "halo":
        # sharded sources: Morton-range bricks + ring halo exchange +
        # all_gathered far-chunk moments (parallel/halo.py)
        from .parallel import halo
        halo.check_config(cfg)
        state = halo.morton_shard_state(state, mesh)
        state = halo.make_prime(cfg, mesh)(state)
        runner = halo.make_run_diag(cfg, mesh)
    else:
        state = mesh_mod.shard_state(state, mesh)
        state = dp.make_prime(cfg, mesh)(state)
        runner = dp.make_run_diag(cfg, mesh)

    # mirror cmd_run: clamp the chunk to the request, run the remainder too
    every = max(1, min(args.diag_every, args.steps))
    n_chunks = args.steps // every
    rem = args.steps - n_chunks * every
    t0 = time.perf_counter()
    rows = []
    step_nos = []
    cur = start_step
    if n_chunks:
        state, d = runner(state, n_chunks, every)
        rows += [{k2: float(v[i]) for k2, v in d.items()}
                 for i in range(n_chunks)]
        step_nos += [cur + (i + 1) * every for i in range(n_chunks)]
        cur += n_chunks * every
    if rem:
        state, d = runner(state, 1, rem)
        rows.append({k2: float(v[0]) for k2, v in d.items()})
        cur += rem
        step_nos.append(cur)
    float(jax.numpy.sum(state.pos))       # honest sync (see cmd_run)
    dt_wall = time.perf_counter() - t0
    total = cur - start_step
    _log(f"{total} steps in {dt_wall:.2f}s = {total/dt_wall:.1f} steps/s "
         f"(dp x{n_dev})")
    for step_no, row in zip(step_nos, rows):
        _log(f"step {step_no}: total_energy={row['total_energy']:.5g} "
             f"neighbors_avg={row['neighbors_avg']:.4g}")
        if args.metrics_jsonl:
            with open(args.metrics_jsonl, "a") as f:
                f.write(json.dumps({"step": step_no, **row}) + "\n")
    if args.checkpoint:
        checkpoint.save(args.checkpoint, jax.device_get(state), cfg,
                        start_step + total)
        _log(f"checkpoint -> {args.checkpoint}")
    # every dp path surfaces real counters (dp.surfaces_overflow is always
    # True: cached paths account per rebuild, per-step paths thread them
    # through Forces.overflow)
    for key in ("nbr_overflow", "tree_overflow", "halo_violations"):
        tot = sum(int(r.get(key, 0)) for r in rows)
        if tot > 0:
            hint = ("re-shard with halo.morton_shard_state (particles "
                    "migrated bricks) or raise halo_ring_radius"
                    if key == "halo_violations"
                    else "raise the corresponding capacity")
            _log(f"WARNING: {key}={tot} — {hint}")
    e = [r["total_energy"] for r in rows]
    _log(f"energy drift: {abs(e[-1]-e[0])/abs(e[0]):.3e}")
    return 0


def cmd_bench(args) -> int:
    from . import bench as bench_mod
    result = bench_mod.run_bench(n=args.n, steps=args.steps,
                                 preset=args.preset)
    print(json.dumps(result), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="planetmodel_sph_tpu")
    p.add_argument("--platform", choices=("cpu", "tpu"), default=None,
                   help="force a JAX backend before any device initializes "
                        "(e.g. --platform cpu to run while the TPU relay is "
                        "down; beats JAX_PLATFORMS, which a site-registered "
                        "PJRT plugin can override)")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a simulation")
    pr.add_argument("--preset", choices=sorted(_PRESETS), default="jupiter_3k")
    pr.add_argument("--ic", choices=sorted(_ICS), default="jupiter")
    pr.add_argument("--n", type=int, default=None)
    pr.add_argument("--seed", type=int, default=None)
    pr.add_argument("--dt", type=float, default=None)
    pr.add_argument("--steps", type=int, default=500)
    pr.add_argument("--diag-every", type=int, default=100)
    pr.add_argument("--integrator",
                    choices=("staggered_euler", "leapfrog_kdk"), default=None)
    pr.add_argument("--gravity", choices=("direct", "tree", "none"),
                    default=None)
    pr.add_argument("--neighbor", choices=("dense", "grid"), default=None)
    pr.add_argument("--checkpoint", default=None,
                    help="save state (.psph = native async binary, else npz)")
    pr.add_argument("--restore", default=None,
                    help="resume from a checkpoint (auto-detects format)")
    pr.add_argument("--render", default=None, help="write final-state PNG")
    pr.add_argument("--render-every", type=int, default=None,
                    help="write a PNG frame every N steps (animation mode)")
    pr.add_argument("--render-every-dir", default="frames")
    pr.add_argument("--render-color-by", default="rho",
                    help="field to color particles by, or 'id' for stable "
                         "per-particle random colors (the reference's "
                         "ParticleAuthoring random base colors)")
    pr.add_argument("--render-quiver", action="store_true",
                    help="overlay velocity arrows on a particle subsample")
    pr.add_argument("--render-extent", type=float, default=None,
                    help="fixed half-width of the view (stable framing "
                         "across animation frames)")
    pr.add_argument("--render-blocks", action="store_true",
                    help="overlay Morton-block AABB wireframes (the "
                         "DisplayBroadphaseSystem debug-draw analog)")
    pr.add_argument("--animate", default=None, metavar="GIF",
                    help="assemble --render-every frames into a GIF after "
                         "the run (the live-viewport stand-in)")
    pr.add_argument("--animate-fps", type=float, default=10.0)
    pr.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="live browser viewer: serve the evolving state at "
                         "http://localhost:PORT (0 = pick a free port); "
                         "frames refresh every --render-every (or "
                         "--diag-every) steps. The Unity live-viewport "
                         "analog (ParticleAuthoring.cs:53-79)")
    pr.add_argument("--metrics-jsonl", default=None)
    pr.add_argument("--devices", type=int, default=None,
                    help="shard particles over this many devices "
                         "(shard_map data parallelism)")
    pr.add_argument("--debug-nans", action="store_true",
                    help="enable jax debug_nans (the purity-era analog of "
                         "the reference's collections safety checks)")
    pr.add_argument("--omega", type=float, default=0.05,
                    help="solid-body angular velocity for rotating_planet")
    pr.add_argument("--separation", type=float, default=150.0,
                    help="two_planet_collision: initial center separation")
    pr.add_argument("--approach-speed", type=float, default=0.5,
                    help="two_planet_collision: closing bulk speed")
    pr.add_argument("--impact-parameter", type=float, default=0.0,
                    help="two_planet_collision: transverse offset "
                         "(off-axis impacts)")
    pr.add_argument("--eos", choices=("polytropic", "adiabatic", "tillotson"),
                    default=None,
                    help="EOS: the reference's barotropic P=K rho^gamma, "
                         "ideal-gas P=(gamma-1) rho u with the internal "
                         "energy evolved (shock heating), or the Tillotson "
                         "material EOS (planetary impacts; new capability)")
    pr.add_argument("--materials", default=None, metavar="A,B",
                    help="tillotson material pair: two_planet_collision "
                         "body materials, or differentiated_planet "
                         "core,mantle (e.g. iron,basalt)")
    pr.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="generic SimConfig override (repeatable), e.g. "
                         "--set theta=0.9 --set multipole_order=2")
    pr.add_argument("--av", type=float, default=None, metavar="ALPHA",
                    help="enable Monaghan artificial viscosity with this "
                         "alpha (beta=2*alpha); fused into pass 2 on every "
                         "pipeline (dense, grid, Pallas, dp)")
    pr.add_argument("--balsara", action="store_true",
                    help="Balsara (1995) AV limiter: suppresses spurious "
                         "shear dissipation (rotating flows, oblique "
                         "impacts) while keeping AV in compressive shocks")
    pr.add_argument("--freeze-velocity", action="store_true",
                    help="parity with DISABLE_VELOCITY_SYSTEM: compute "
                         "fields but never apply accelerations")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="benchmark steps/sec")
    pb.add_argument("--n", type=int, default=3000)
    pb.add_argument("--steps", type=int, default=100)
    pb.add_argument("--preset", choices=sorted(_PRESETS), default="jupiter_3k")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

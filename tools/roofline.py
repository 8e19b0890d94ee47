#!/usr/bin/env python3
"""Roofline for the 100k block pipeline: hardware ceilings vs modeled floor.

Measures primitive rates on the live backend (VPU elementwise, HBM
read+write stream, Pallas launch fixed cost, jit dispatch latency), then
loads the production operating point (settled checkpoint), counts the
pair-slot and gather work one step actually issues, and prints the
modeled per-step floor next to the measured step time.

This is the BASELINE.json north-star accounting demanded by the round-1
verdict: either the pipeline reaches 60 steps/s at 100k on one chip, or
this table shows which hardware ceiling is binding and at what distance.

Honest-timing rules (docs/ROUND2.md): scalar readback, data dependence
threaded through every scan, warmup with identical static args, k >= 32
so the ~28 ms dispatch latency cannot skew per-iter numbers.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure
from planetmodel_sph_tpu.ops.pallas.pairwise import _on_tpu


def timed(fn, args, k, static=("k_",)):
    f = jax.jit(fn, static_argnames=static)
    float(jnp.sum(f(*args, k_=k)))          # warm, SAME static args
    t0 = time.perf_counter()
    float(jnp.sum(f(*args, k_=k)))
    return (time.perf_counter() - t0) / k


# --------------------------------------------------------------------------
# primitive ceilings
# --------------------------------------------------------------------------

def measure_dispatch(k=64):
    """Fixed per-jitted-call latency via an empty-scan baseline."""
    def empty(x, k_):
        def body(c, _):
            return c * 1.0000001, None
        out, _ = jax.lax.scan(body, x, None, length=k_)
        return out
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(empty, static_argnames=("k_",))
    float(jnp.sum(f(x, k_=k)))
    t0 = time.perf_counter()
    for _ in range(8):
        float(jnp.sum(f(x, k_=k)))
    return (time.perf_counter() - t0) / 8


def measure_hbm(k=32, mb=512):
    b = jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32)
    def ew(b_, k_):
        def body(c, _):
            return c * 1.0000001 + 1e-9, None
        out, _ = jax.lax.scan(body, b_, None, length=k_)
        return out
    dt = timed(ew, (b,), k)
    return 2 * b.size * 4 / dt              # read + write bytes/s


def _vpu_kernel(x_ref, o_ref, *, reps):
    v = x_ref[:]
    acc = v
    def body(i, a):
        # 8 VPU f32 ops per rep (mul/add chains, no memory traffic)
        a = a * v + v
        a = a * v + v
        a = a * v + v
        a = a * v + v
        return a
    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[:] = acc


def measure_vpu(k=16, reps=512, b=256, lanes=512):
    """Pure-arithmetic Pallas kernel: f32 FMA-chain ops/s on one core."""
    x = jnp.full((b, lanes), 1.0000001, jnp.float32)
    kern = functools.partial(_vpu_kernel, reps=reps)
    def one(x_):
        return pl.pallas_call(
            kern, grid=(1,),
            in_specs=[pl.BlockSpec((b, lanes), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((b, lanes), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lanes), jnp.float32),
            interpret=not _on_tpu())(x_)
    def chain(x_, k_):
        def body(c, _):
            return one(c), None
        out, _ = jax.lax.scan(body, x_, None, length=k_)
        return out
    dt = timed(chain, (x,), k)
    return 8 * reps * b * lanes / dt        # f32 ops/s


def measure_launch(k=256):
    def trivial_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.000001
    def one(x_):
        return pl.pallas_call(
            trivial_kernel, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=not _on_tpu())(x_)
    def chain(x_, k_):
        def body(c, _):
            return one(c), None
        out, _ = jax.lax.scan(body, x_, None, length=k_)
        return out
    x = jnp.ones((8, 128), jnp.float32)
    return timed(chain, (x,), k)


# --------------------------------------------------------------------------
# per-step work accounting at the operating point
# --------------------------------------------------------------------------

def count_work(cfg, st):
    """Slot and byte counts one force evaluation actually issues."""
    bsz, sub, chunk = cfg.nbr_group_size, cfg.nbr_sub, cfg.block_chunk
    ceil_c = lambda nv: jnp.ceil(nv / chunk) * chunk
    g = st.groups.live.shape[0]

    nv_sph = structure._sph_nv(st, cfg)
    sph_slots = float(jnp.sum(ceil_c(nv_sph))) * bsz
    nv_p2p = jnp.minimum(st.n_p2p, cfg.p2p_window) * sub
    p2p_slots = float(jnp.sum(ceil_c(nv_p2p))) * bsz
    nv_ring = jnp.minimum(st.n_m2p, cfg.m2p_window)
    ring_slots = float(jnp.sum(ceil_c(nv_ring))) * bsz
    npad = st.accept.shape[1]
    far_slots = float(g * npad) * bsz
    blk_slots = 0.0
    if cfg.sg_blocks > 1:
        nv_blk = jnp.minimum(st.n_blk, cfg.blk_window)
        blk_slots = float(jnp.sum(ceil_c(nv_blk))) * bsz

    # window gathers: write [G, S] once + kernel reads it once; the packed
    # source read is ~S_window rows of 128 B slabs (counted as its bytes)
    sph_fields = 4 if cfg.grad_p_mode == "grad_h" else 5
    sph_w = (float(jnp.sum(ceil_c(nv_sph)))
             if cfg.sph_exact_window else g * structure._nbpad(
                 cfg.nbr_window * sub, chunk))
    p2p_w = g * structure._nbpad(cfg.p2p_window * sub, chunk)
    p2p_fields = 4 if cfg.softening_mode == "receiver_h" else 5
    gather_bytes = 4 * (
        sph_w * (sph_fields + 2)            # geom (+cc extra row, ~2 rw)
        + p2p_w * p2p_fields) * 2           # write + read back
    return {
        "groups": int(g),
        "sph_slots": sph_slots, "p2p_slots": p2p_slots,
        "ring_slots": ring_slots, "far_slots": far_slots,
        "blk_slots": blk_slots,
        "gather_bytes": gather_bytes,
    }


# per-pair-slot f32 VPU op counts (hand-counted from the kernel bodies in
# ops/pallas/groups2.py; where/select/compare = 1 op, accumulator adds
# included). pass1: symmetric evaluates W at both h (38) vs grad-h one W
# + dW/dh (26). p2p: Dyer-Ip inner+outer, sym-max softening. mono: +28
# for the quadrupole correction.
OPS = {"pass1_sym": 38, "pass1_gradh": 26, "pass2": 40, "p2p": 38,
       "mono": 12, "quad_extra": 28}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ck", default="docs/results/drift100k/state.psph")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-n CPU smoke test of the accounting")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--json", default=None)
    ap.add_argument("--preset", default=None,
                    help="extra jupiter_100k overrides, k=v comma list")
    args = ap.parse_args()

    kw = dict(grad_p_mode="grad_h", h_mode="newton")
    if args.preset:
        for item in args.preset.split(","):
            k, v = item.split("=")
            kw[k] = config_mod.parse_override(k, v)

    if args.smoke:
        cfg = config_mod.SimConfig(
            n=2048, neighbor_mode="grid", gravity_solver="tree",
            nbr_group_level=3, nbr_window=128, p2p_window=128,
            m2p_window=128, rebuild_every=4, **kw)
        state = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1))
    else:
        cfg = config_mod.jupiter_100k(n=args.n, **kw)
        from planetmodel_sph_tpu.utils import checkpoint
        state, _, _ = checkpoint.load(args.ck)

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # --- primitive ceilings ---
    disp = measure_dispatch()
    hbm = measure_hbm(mb=64 if args.smoke else 512)
    vpu = measure_vpu(reps=64 if args.smoke else 512)
    launch = measure_launch(k=32 if args.smoke else 256)
    print(f"dispatch latency      {disp*1e3:8.2f} ms/call")
    print(f"HBM stream (r+w)      {hbm/1e9:8.1f} GB/s")
    print(f"VPU f32 FMA-chain     {vpu/1e12:8.2f} Top/s")
    print(f"pallas launch fixed   {launch*1e6:8.1f} us", flush=True)

    # --- operating-point work ---
    st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, cfg))(
        state.pos, state.h, state.mass)
    w = count_work(cfg, st)
    n = cfg.n
    print(f"\nwork per force eval at n={n} (slots include chunk padding):")
    for key in ("sph_slots", "p2p_slots", "ring_slots", "far_slots",
                "blk_slots"):
        print(f"  {key:12s} {w[key]/1e6:10.1f} M   "
              f"({w[key]/n:7.0f} per particle)")
    print(f"  gather bytes {w['gather_bytes']/1e6:10.1f} MB")

    # modeled floor: VPU time for every sweep + HBM time for gathers +
    # launches; pass1+pass2 sweep sph_slots each
    p1 = OPS["pass1_gradh" if cfg.grad_p_mode == "grad_h"
              else "pass1_sym"]
    mono = OPS["mono"] + (OPS["quad_extra"]
                          if cfg.multipole_order >= 2 else 0)
    ops = (w["sph_slots"] * (p1 + OPS["pass2"])
           + w["p2p_slots"] * OPS["p2p"]
           + (w["ring_slots"] + w["far_slots"] + w["blk_slots"]) * mono)
    t_vpu = ops / vpu
    t_hbm = w["gather_bytes"] / hbm
    t_launch = 3 * launch
    # h-solve + rebuild amortized: h_newton_iters sph sweeps + one build
    t_amort = (cfg.h_newton_iters * w["sph_slots"] * p1 / vpu
               ) / max(1, cfg.rebuild_every)
    floor = t_vpu + t_hbm + t_launch + t_amort
    print(f"\nmodeled per-step floor:")
    print(f"  VPU sweeps        {t_vpu*1e3:8.2f} ms")
    print(f"  gather HBM        {t_hbm*1e3:8.2f} ms")
    print(f"  launches          {t_launch*1e3:8.2f} ms")
    print(f"  h-solve amortized {t_amort*1e3:8.2f} ms")
    print(f"  TOTAL             {floor*1e3:8.2f} ms "
          f"= {1/floor:.1f} steps/s ceiling", flush=True)

    # --- measured step time on the same config ---
    r = jax.jit(lambda s: planet.run(s, cfg, args.steps))
    out = r(state); float(jnp.sum(out.pos))
    t0 = time.perf_counter()
    out = r(state); float(jnp.sum(out.pos))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"\nmeasured          {dt*1e3:8.2f} ms/step = {1/dt:.1f} steps/s "
          f"({n/dt/1e6:.2f} M particle-steps/s)")
    print(f"efficiency vs modeled floor: {floor/dt*100:.0f}%")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"dispatch_s": disp, "hbm_Bps": hbm, "vpu_ops": vpu,
                       "launch_s": launch, "work": w,
                       "floor_s": floor, "measured_s": dt}, f, indent=1)
        print(f"json -> {args.json}")


if __name__ == "__main__":
    main()

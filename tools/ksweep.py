#!/usr/bin/env python3
"""100k window/K sweep: steps/s + window stats per config (run on TPU)."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import structure

base = config_mod.jupiter_100k()
state0 = planet.prime(ics.jupiter(base), base.replace(rebuild_every=1))
state0 = planet.run(state0, base, 32)
float(jnp.sum(state0.pos))

for sub, nw, pw, mw in ((16, 288, 384, 416), (32, 160, 208, 224)):
    for K in (8, 16, 32):
        cfg = config_mod.jupiter_100k(nbr_sub=sub, nbr_window=nw,
                                      p2p_window=pw, m2p_window=mw,
                                      rebuild_every=K, sort_every=8*K)
        try:
            r = jax.jit(lambda s: planet.run(s, cfg, 64))
            out = r(state0); float(jnp.sum(out.pos))
            t0 = time.perf_counter(); out = r(state0); float(jnp.sum(out.pos))
            dt = (time.perf_counter() - t0) / 64
            skin = planet._skin(cfg, state0.vel, state0.accel)
            st = jax.jit(lambda p, h, m, s: structure.build(p, h, m, cfg, skin=s))(
                state0.pos, state0.h, state0.mass, skin)
            print(f"sub={sub} K={K:2d}: {dt*1e3:5.1f} ms/step = {1/dt:5.1f} steps/s "
                  f"(sph {float(jnp.mean(st.n_sph))*sub:.0f} p2p {float(jnp.mean(st.n_p2p))*sub:.0f} "
                  f"ring {float(jnp.mean(st.n_m2p)):.0f} slots/tgt, "
                  f"over=({int(st.sph_overflow)},{int(st.p2p_overflow)},{int(st.m2p_overflow)}))",
                  flush=True)
        except Exception as e:
            print(f"sub={sub} K={K}: FAILED {str(e)[:120]}", flush=True)

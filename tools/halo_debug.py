#!/usr/bin/env python3
"""Isolate the leg-1 NaN in tools/halo_collision.py at smoke scale.

Runs the same settle + prime, then advances the replicated and halo legs
in 8-step segments, printing finiteness + diagnostics after each.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

# env vars alone lose to the session's TPU-plugin sitecustomize (see the
# note in halo_collision.py) — force through jax.config like conftest
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.parallel import dp, halo, mesh as mesh_mod
from halo_collision import build_cfg


def finite(state):
    return all(bool(jax.numpy.all(jax.numpy.isfinite(l)))
               for l in jax.tree.leaves(state))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ball_ck = sys.argv[2] if len(sys.argv) > 2 else None
    cfg = build_cfg(n)
    mesh = mesh_mod.make_mesh(8)
    nb = n // 2
    if ball_ck:
        from planetmodel_sph_tpu.utils import checkpoint as ck_mod
        ball, _, _ = ck_mod.load(ball_ck)
        assert ball.n == nb, (ball.n, nb)
        print("ball loaded:", ball_ck, "finite:", finite(ball), flush=True)
    else:
        from halo_collision import settle_cfg
        scfg = settle_cfg(cfg, nb)
        ball = planet.prime(ics.polytrope(scfg), scfg)
        ball, sinfo = jax.block_until_ready(jax.jit(
            lambda s: planet.run_info(s, scfg, 400))(ball))
        print("settle over:", int(sinfo["nbr_overflow"]),
              int(sinfo["tree_overflow"]), "finite:", finite(ball),
              flush=True)

    dx = np.array([30.0, 4.0, 0.0], np.float32)
    dv = np.array([0.3, 0.0, 0.0], np.float32)
    a = ball.replace(pos=ball.pos - dx, vel=ball.vel + dv)
    b = ball.replace(pos=ball.pos + dx, vel=ball.vel - dv)
    st = jax.tree.map(lambda x, y: jax.numpy.concatenate([x, y], axis=0),
                      a, b)
    st = planet.prime(st, cfg)
    print("primed finite:", finite(st), flush=True)

    rep_cfg = cfg.replace(dp_mode="replicated")
    rep = mesh_mod.shard_state(st, mesh)
    rrun = dp.make_run_info(rep_cfg, mesh)
    hal = halo.morton_shard_state(st, mesh)
    hrun = halo.make_run(cfg, mesh)

    # halo-layout structure occupancy at unbounded windows: what the
    # capacities must actually clear (per-shard grouping + [local|ring]
    # source set fragment blocks very differently from single-chip)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from planetmodel_sph_tpu.ops import structure as structure_mod
    wcfg = cfg.replace(nbr_window=4096, p2p_window=4096, m2p_window=4096,
                       sph_refine_subblock=False)

    def stats(s):
        r = wcfg.halo_ring_radius
        collect = lambda x: halo._ring_collect(x, "dp", r)
        src3 = (collect(s.pos), collect(s.h), collect(s.mass))
        st_ = structure_mod.build(s.pos, s.h, s.mass, wcfg, src=src3,
                                  target_offset=0)
        mx = lambda v: jax.lax.pmax(jnp.max(v), "dp")
        av = lambda v: jax.lax.pmean(jnp.mean(v.astype(jnp.float32)),
                                     "dp")
        return (av(st_.n_sph), mx(st_.n_sph), av(st_.n_p2p),
                mx(st_.n_p2p), av(st_.n_m2p), mx(st_.n_m2p))

    out = jax.jit(shard_map(stats, mesh=mesh, in_specs=P("dp"),
                            out_specs=P(), check_vma=False))(hal)
    print("halo-layout occupancy (unbounded): "
          f"sph {float(out[0]):.0f}/{int(out[1])} "
          f"p2p {float(out[2]):.0f}/{int(out[3])} "
          f"m2p {float(out[4]):.0f}/{int(out[5])}", flush=True)
    for seg in range(8):
        rep, rinfo = jax.block_until_ready(rrun(rep, 8))
        hal, hinfo = jax.block_until_ready(hrun(hal, 8))
        print(f"seg {seg}: rep finite={finite(rep)} "
              f"over=({int(rinfo['nbr_overflow'])},"
              f"{int(rinfo['tree_overflow'])})  "
              f"halo finite={finite(hal)} "
              f"over=({int(hinfo['nbr_overflow'])},"
              f"{int(hinfo['tree_overflow'])}) "
              f"viol={int(hinfo['halo_violations'])}", flush=True)
        if not (finite(rep) and finite(hal)):
            break


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Decompose the 5.3s structure.build at 100k into stages."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import grouping, morton, structure


def timed(label, fn, args, k=4):
    f = jax.jit(fn, static_argnames=("k_",))
    # warm with the SAME static k_ — a different k_ compiles a different
    # executable, putting the (remote, slow) compile inside the timed region
    float(jnp.sum(f(*args, k_=k)))
    t0 = time.perf_counter()
    s = float(jnp.sum(f(*args, k_=k)))
    dt = (time.perf_counter() - t0) / k
    print(f"{label:40s} {dt*1e3:9.2f} ms   ({s:.3e})", flush=True)
    return dt


def main():
    cfg = config_mod.jupiter_100k()
    state = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1))
    pos, h, mass = state.pos, state.h, state.mass
    bsz, lg = cfg.nbr_group_size, cfg.nbr_group_level
    k = 4

    def full(p, hh, m, k_):
        def body(c, _):
            s2 = structure.build(c, hh, m, cfg)
            return c + 1e-12 * jnp.sum(s2.accept), None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("build (full)", full, (pos, h, mass), k=k)

    def sort_only(p, k_):
        def body(c, _):
            lo = jnp.min(c, axis=0)
            hi = jnp.max(c, axis=0)
            code = morton.encode(c, lo, hi)
            order = jnp.argsort(code)
            return c + 1e-12 * order[0], None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("morton encode+argsort", sort_only, (pos,), k=k)

    def groups_only(p, k_):
        def body(c, _):
            lo = jnp.min(c, axis=0)
            hi = jnp.max(c, axis=0)
            grp = grouping.cell_groups(c, lo, hi, bsz, lg)
            return c + 1e-12 * grp.tgt_idx[0], None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("cell_groups (incl sort)", groups_only, (pos,), k=k)

    # geometry pass + compaction on a frozen grouping
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    grp = jax.jit(lambda p: grouping.cell_groups(p, lo, hi, bsz, lg))(pos)
    g = grp.live.shape[0]

    def geom_pass(p, hh, m, tgt_idx, live, k_):
        def body(c, _):
            pos_t = c[tgt_idx].reshape(g, bsz, 3)
            h_t = hh[tgt_idx].reshape(g, bsz)
            m_t = m[tgt_idx].reshape(g, bsz)
            tlo = jnp.min(pos_t, axis=1)
            thi = jnp.max(pos_t, axis=1)
            t_hmax = jnp.max(jnp.where(live, h_t, 0.0), axis=1)
            s_mass, s_cm, s_amin, s_amax, s_bmax2, s_hmax = \
                structure._block_stats(pos_t, h_t, m_t, live)
            gap = jnp.maximum(
                jnp.maximum(tlo[:, None, :] - s_amax[None, :, :],
                            s_amin[None, :, :] - thi[:, None, :]), 0.0)
            gap2 = jnp.sum(gap * gap, axis=-1)
            cut = cfg.kappa * jnp.maximum(t_hmax[:, None], s_hmax[None, :])
            adj = gap2 < cut * cut
            return c + 1e-12 * jnp.sum(adj), None
        out, _ = jax.lax.scan(body, p, None, length=k_)
        return out
    timed("block stats + [G,NB] geometry", geom_pass,
          (pos, h, mass, grp.tgt_idx, grp.live), k=k)

    adj = jax.jit(
        lambda p: (lambda pt: (
            jnp.sum((jnp.maximum(
                jnp.maximum(jnp.min(pt, 1)[:, None, :]
                            - jnp.max(pt, 1)[None, :, :],
                            jnp.min(pt, 1)[None, :, :]
                            - jnp.max(pt, 1)[:, None, :]), 0.0) ** 2),
                axis=-1) < 4.0))(p[grp.tgt_idx].reshape(g, bsz, 3)))(pos)

    def compact(a, k_):
        def body(c, _):
            idx, n, overflow = structure._compact_rows(a != c, cfg.nbr_window)
            return c + (1e-12 * idx[0, 0]).astype(jnp.bool_) * False, None
        out, _ = jax.lax.scan(body, jnp.bool_(False), None, length=k_)
        return jnp.float32(0)

    def compact2(a, k_):
        def body(c, _):
            idx, n, overflow = structure._compact_rows(
                jnp.logical_xor(a, c), cfg.nbr_window)
            return jnp.logical_xor(c, idx[0, 0] > 100), None
        out, _ = jax.lax.scan(body, jnp.bool_(False), None, length=k_)
        return out
    timed("_compact_rows [G,NB]->[G,96]", compact2, (adj,), k=k)


if __name__ == "__main__":
    main()

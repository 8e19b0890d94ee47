#!/usr/bin/env python3
"""Morton-span statistics of the interaction windows at a checkpoint.

If each group's SPH candidates / P2P sub-blocks sit inside a short
CONTIGUOUS range of the Morton-sorted source layout, the per-step window
gathers (measured 11.6 ms/step at the settled 100k point) can be replaced
by one scalar-prefetched contiguous slab DMA per group — full HBM
bandwidth, no gather op at all — at the cost of sweeping span/window
extra (masked) pair slots. This prints the span distribution so that
trade can be sized before building the kernel.

  python tools/span_stats.py --ck docs/results/drift100k/state.psph
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import planet
from planetmodel_sph_tpu.ops import structure
from planetmodel_sph_tpu.utils import checkpoint


def pct(v, q):
    return float(np.percentile(v, q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ck", default="docs/results/drift100k/state.psph")
    ap.add_argument("--xw", type=int, default=512)
    args = ap.parse_args()
    state, _, step0 = checkpoint.load(args.ck)
    cfg = config_mod.jupiter_100k(grad_p_mode="grad_h", h_mode="newton",
                                  rebuild_every=16, sort_every=64,
                                  sph_exact_window=args.xw)
    skin = planet._skin(cfg, state.vel, state.accel)
    st = jax.jit(lambda p, hh, m, s: structure.build(
        p, hh, m, cfg, skin=s))(state.pos, state.h, state.mass, skin)

    def spans(idx, n, unit):
        idx = np.asarray(idx)
        n = np.asarray(n)
        valid = idx >= 0
        big = idx.max() + 1
        lo = np.where(valid, idx, big).min(axis=1)
        hi = np.where(valid, idx, -1).max(axis=1)
        sp = np.maximum(hi - lo + 1, 0)
        print(f"  {unit}: count avg={n.mean():.0f} max={n.max()}  "
              f"span avg={sp.mean():.0f} p50={pct(sp,50):.0f} "
              f"p90={pct(sp,90):.0f} p99={pct(sp,99):.0f} max={sp.max()}",
              flush=True)
        return sp

    g = st.groups.live.shape[0]
    print(f"groups={g} (64 targets each); source units: "
          f"particles={g*64} sub-blocks={g*64//cfg.nbr_sub}")
    print("SPH exact window (particle ids):")
    spans(st.sph_idx, st.n_sph, "particles")
    print("P2P window (sub-block ids):")
    spans(st.p2p_idx, st.n_p2p, "sub-blocks")
    print("M2P ring window (sub-block ids):")
    spans(st.m2p_idx, st.n_m2p, "sub-blocks")


if __name__ == "__main__":
    main()

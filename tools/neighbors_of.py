#!/usr/bin/env python3
"""Per-particle neighbor introspection: dump particle i's neighbor set.

The reference materializes every particle's neighbor list in a
``DynamicBuffer<ParticleInteraction>`` (``Assets/Scripts/Components/
Kernel.cs:5-16``) and can log/debug individual interactions
(``KernelSystem.cs:59-74``). Our fused window sweeps recompute pairs
in-register by design, so this tool recovers the same debugging
affordance offline: it evaluates particle i's neighbors from BOTH the
dense O(N^2) oracle and the block/window pipeline's candidate lists and
diffs them. A true neighbor missing from the window candidates is a
structure bug (or an overflowed window) — the invariant the window
contract guarantees (tests/test_structure.py "oracle cross-checks").

  python tools/neighbors_of.py --n 2048 --particle 17
  python tools/neighbors_of.py --restore ck.psph --preset jupiter_100k \
      --particle 12345 --max-print 20
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu import config as config_mod
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.ops import grouping, kernels, structure
from planetmodel_sph_tpu.utils import checkpoint


def dense_oracle(pos, h, i, kappa):
    """Neighbor ids/r/W of particle i by brute force (the oracle)."""
    d = pos - pos[i]
    r = np.sqrt(np.sum(d * d, axis=-1))
    support = kappa * np.maximum(h[i], h)            # SplineKernel.Interacts
    ids = np.where((r < support) & (np.arange(len(h)) != i))[0]
    w_i = np.asarray(kernels.w(jnp.asarray(r[ids]),
                                    jnp.asarray(np.full(len(ids), h[i]))))
    w_sym = 0.5 * (w_i + np.asarray(kernels.w(jnp.asarray(r[ids]),
                                                   jnp.asarray(h[ids]))))
    order = np.argsort(r[ids])
    return ids[order], r[ids][order], w_i[order], w_sym[order]


def window_candidates(pos, h, mass, cfg, i):
    """Particle ids in i's group's SPH candidate window (the superset the
    fused sweeps actually evaluate)."""
    st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, cfg))(
        pos, h, mass)
    grp = st.groups
    bsz = cfg.nbr_group_size
    sub = cfg.nbr_sub
    slot = int(grp.unsort_idx[i])
    g = slot // bsz
    n_row = int(st.n_sph[g])
    row = np.asarray(st.sph_idx[g][:n_row])
    tgt = np.asarray(grp.tgt_idx)
    live = np.asarray(grp.live).reshape(-1)
    if cfg.sph_exact_window > 0:
        # exact mode: row holds sorted-layout PARTICLE ids
        slots = row
    else:
        # row holds source SUB-BLOCK ids; expand to their member slots
        slots = (row[:, None] * sub + np.arange(sub)[None, :]).reshape(-1)
    slots = slots[(slots >= 0) & (slots < len(tgt))]
    slots = slots[live[slots]]
    ids = np.unique(tgt[slots])
    over = int(st.sph_overflow)
    return ids[ids != i], over, g, n_row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particle", type=int, default=0)
    ap.add_argument("--preset", default="default")
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--restore", default=None,
                    help="checkpoint to load the state from")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="config overrides")
    ap.add_argument("--max-print", type=int, default=30)
    args = ap.parse_args()

    kw = {}
    if args.n:
        kw["n"] = args.n
    for s in args.set:
        k, v = s.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        kw[k] = v
    if args.restore:
        state, cfg, step0 = checkpoint.load(args.restore)
        if kw:
            cfg = cfg.replace(**kw)
        print(f"state from {args.restore} (step {step0})")
    else:
        cfg = getattr(config_mod, args.preset)(**kw) \
            if args.preset != "default" else psph.default(**kw)
        state = jax.jit(lambda s: planet.prime(s, cfg))(ics.jupiter(cfg))
        print(f"fresh {args.preset} IC, n={cfg.n}")

    i = args.particle
    pos = np.asarray(state.pos)
    h = np.asarray(state.h)
    mass = np.asarray(state.mass)
    print(f"particle {i}: pos={pos[i].round(3)} h={h[i]:.4f} "
          f"support={cfg.kappa * h[i]:.4f}")

    ids, r, w_i, w_sym = dense_oracle(pos, h, i, cfg.kappa)
    print(f"\ndense oracle: {len(ids)} neighbors "
          f"(W(r,h_i), W_sym as in ParticleInteraction — Kernel.cs:8-15)")
    for j in range(min(len(ids), args.max_print)):
        print(f"  j={ids[j]:7d} r={r[j]:9.4f} W_i={w_i[j]:.5e} "
              f"W_sym={w_sym[j]:.5e}")
    if len(ids) > args.max_print:
        print(f"  ... {len(ids) - args.max_print} more")

    if cfg.neighbor_mode != "grid":
        print("\nneighbor_mode is dense — the sweeps evaluate all pairs; "
              "no window to diff. Pass --set neighbor_mode=grid to "
              "inspect the block pipeline.")
        return 0

    cand, over, g, n_row = window_candidates(state.pos, state.h,
                                             state.mass, cfg, i)
    print(f"\nwindow pipeline: group {g}, window row {n_row} "
          f"{'particles' if cfg.sph_exact_window else 'sub-blocks'}, "
          f"{len(cand)} candidate particles, sph_overflow={over}")
    missing = np.setdiff1d(ids, cand)
    extra = len(cand) - (len(ids) - len(missing))
    print(f"coverage: {len(ids) - len(missing)}/{len(ids)} true neighbors "
          f"in the candidate set; {extra} extra candidates (pre-filter "
          f"slack the sweeps mask out)")
    if len(missing):
        print(f"MISSING from window: {missing[:50]}")
        if over == 0:
            print("ERROR: true neighbors missing WITHOUT overflow — "
                  "structure bug")
            return 1
        print("note: window overflowed — widen nbr_window "
              "(dropped AND counted, never silent)")
        return 1
    print("OK: window candidates cover the oracle exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main())

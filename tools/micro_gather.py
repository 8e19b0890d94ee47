#!/usr/bin/env python3
"""Microbench: per-particle packed-row gathers vs in-row take_along_axis.

Decides the exact-SPH-candidate-list design (docs/ROUND2.md): can we
afford a [G, Wx] particle-id gather per field set per step, or must the
compaction happen inside the row layout?

  G=2067 groups, Wx=512 exact window, N=132288 sorted source slots.
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(label, fn, args, k=16):
    r = jax.jit(fn, static_argnums=(len(args),))
    out = r(*args, k)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = r(*args, k)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / k
    print(f"{label:44s} {dt*1e3:7.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=2067)
    ap.add_argument("--wx", type=int, default=512)
    ap.add_argument("--wc", type=int, default=5120)
    ap.add_argument("--n", type=int, default=132288)
    ap.add_argument("--c", type=int, default=6)
    args = ap.parse_args()
    g, wx, wc, n, c = args.g, args.wx, args.wc, args.n, args.c
    key = jax.random.PRNGKey(0)
    cols = [jax.random.normal(jax.random.PRNGKey(i), (n,)) for i in range(c)]
    idx = jax.random.randint(key, (g, wx), 0, n, jnp.int32)
    # Morton-local variant: ids clustered near the group's own range
    base = (jnp.arange(g, dtype=jnp.int32) * (n // g))[:, None]
    idx_loc = jnp.clip(base + jax.random.randint(key, (g, wx), -4096, 4096),
                       0, n - 1)
    rowidx = jax.random.randint(key, (g, wx), 0, wc, jnp.int32)
    rows = [jax.random.normal(jax.random.PRNGKey(10 + i), (g, wc))
            for i in range(c)]

    def packed_gather(cols_, idx_, k_):
        packed = jnp.stack(cols_, axis=-1)
        def body(carry, _):
            gat = packed[jnp.clip(idx_ + carry, 0, n - 1)]   # [G, Wx, c]
            return carry + 1 - 1, jnp.float32(0)
        # vary the index each iter so XLA can't hoist; sum all fields
        def body2(carry, _):
            gat = packed[jnp.clip(idx_ + carry, 0, n - 1)]
            return carry + (gat[0, 0, 0] * 1e-30).astype(jnp.int32), None
        out, _ = jax.lax.scan(body2, jnp.int32(0), None, length=k_)
        return out

    def per_take(rows_, ridx_, k_):
        def body(carry, _):
            ri = jnp.clip(ridx_ + carry, 0, wc - 1)
            acc = jnp.float32(0)
            for r in rows_:
                acc += jnp.take_along_axis(r, ri, axis=1)[0, 0]
            return carry + (acc * 1e-30).astype(jnp.int32), None
        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=k_)
        return out

    timed(f"packed [{n},{c}] row-gather -> [{g},{wx}]",
          packed_gather, (cols, idx))
    timed("  same, Morton-local ids", packed_gather, (cols, idx_loc))
    timed(f"take_along_axis [{g},{wc}]->[,{wx}] x{c}",
          per_take, (rows, rowidx))

    # row-size curve for the moment-entry gather (ring/blk tiers):
    # a [NSUB, 4] table gathered through [G, W] ids measures ~3 ms/step
    # (tiny 16 B rows); padding the table rows may trade bytes for row
    # rate. Decides _entry_gather's pad width.
    nsub, w = 4134, 128
    eidx = jax.random.randint(key, (g, w), 0, nsub, jnp.int32)

    def entry_gather(table_, idx_, k_):
        def body(carry, _):
            gat = table_[jnp.clip(idx_ + carry, 0, nsub - 1)]
            s = sum(gat[:, :, kk].sum() for kk in range(4))
            return carry + (s * 1e-30).astype(jnp.int32), None
        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=k_)
        return out

    for padw in (4, 8, 32, 64, 160):
        table = jax.random.normal(jax.random.PRNGKey(99), (nsub, padw))
        timed(f"entry-gather [{nsub},{padw}] ({padw*4}B rows) -> "
              f"[{g},{w}]", entry_gather, (table, eidx))


if __name__ == "__main__":
    main()

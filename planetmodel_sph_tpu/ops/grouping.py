"""Cell-bounded Morton target grouping, shared by the tree and neighbor ops.

Splitting a Morton-sorted particle list into fixed-stride blocks creates
"seam groups" that straddle octant boundaries: their AABBs span the whole
domain, so any AABB-conservative acceptance test (the tree MAC, the neighbor
adjacency cutoff) degenerates for them. Instead, groups here are runs of
<= bsz consecutive sorted particles that never cross a level-lg octree cell
boundary — group AABBs are bounded by the cell size. Cells whose population
is not a multiple of bsz pad their last group with duplicates of their last
particle, masked by `live` (duplicates must never be counted as sources) and
routed out-of-bounds by `scatter_to` (so duplicate target rows drop on the
unsort scatter; they compute identical values anyway).

The cell level adapts downward so the static group cap stays <= 2x the
minimum (padding waste <= one group per occupied cell).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import morton


class Groups(NamedTuple):
    tgt_idx: jax.Array      # [G*B] original particle index per slot
    live: jax.Array         # [G,B] slot validity (False: duplicate/padding)
    scatter_to: jax.Array   # [G*B] original index, or n for dead slots
    order: jax.Array        # [N]   the Morton sort used (original indices)
    unsort_idx: jax.Array   # [N]   the live slot holding each original
                            #       particle (inverse of scatter_to) — lets
                            #       sorted->original be a GATHER (TPU
                            #       scatters of packed columns measured 10x
                            #       slower, tools/profile_block.py)


def n_groups_static(n: int, bsz: int, lg_max: int) -> int:
    """Static group count for (n, bsz, lg) — must match cell_groups."""
    lg = effective_level(n, bsz, lg_max)
    tcell_cap = min(n, 8 ** lg)
    return (n + (bsz - 1) * tcell_cap) // bsz + 1


def effective_level(n: int, bsz: int, lg_max: int) -> int:
    lg = lg_max
    while lg > 0 and 8 ** lg > max(1, n // bsz):
        lg -= 1
    return lg


def cell_groups(pos, lo, hi, bsz: int, lg_max: int) -> Groups:
    """Group particles; `lo`/`hi` is the Morton bounding box."""
    n = pos.shape[0]
    lg = effective_level(n, bsz, lg_max)
    tcell_cap = min(n, 8 ** lg)
    n_groups = (n + (bsz - 1) * tcell_cap) // bsz + 1

    code = morton.encode(pos, lo, hi)
    order = jnp.argsort(code).astype(jnp.int32)
    cid = morton.cell_of(code[order], lg)
    boundary = jnp.concatenate([jnp.ones((1,), bool), cid[1:] != cid[:-1]])
    seg = jnp.cumsum(boundary) - 1
    tstart = jax.ops.segment_min(jnp.arange(n, dtype=jnp.int32), seg,
                                 num_segments=tcell_cap)
    tcount = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), seg,
                                 num_segments=tcell_cap)

    groups_per_cell = -(-tcount // bsz)          # 0 for empty padded cells
    total_groups = jnp.sum(groups_per_cell)
    cum_g = jnp.cumsum(groups_per_cell) - groups_per_cell
    slots_g = jnp.arange(n_groups, dtype=jnp.int32)
    gcell = jnp.clip(jnp.searchsorted(cum_g, slots_g, side="right")
                     .astype(jnp.int32) - 1, 0, tcell_cap - 1)
    ginner = slots_g - cum_g[gcell]
    gvalid = (slots_g < total_groups) & (ginner < groups_per_cell[gcell])

    member = jnp.arange(bsz, dtype=jnp.int32)[None, :]          # [1,B]
    g_start = (tstart[gcell] + ginner * bsz)[:, None]           # [G,1]
    cell_end = (tstart[gcell] + tcount[gcell])[:, None]
    raw_slot = g_start + member                                  # [G,B]
    live = gvalid[:, None] & (raw_slot < cell_end)
    slot = jnp.clip(jnp.where(live, raw_slot, cell_end - 1), 0, n - 1)

    tgt_idx = order[slot.reshape(-1)]                            # [G*B]
    scatter_to = jnp.where(live.reshape(-1), tgt_idx,
                           jnp.asarray(n, jnp.int32))
    unsort_idx = jnp.zeros((n,), jnp.int32).at[scatter_to].set(
        jnp.arange(scatter_to.shape[0], dtype=jnp.int32), mode="drop")
    return Groups(tgt_idx, live, scatter_to, order, unsort_idx)

"""Barnes-Hut monopole gravity over a Morton-implicit octree (TPU-native).

This replaces the reference's tree path (``GravityFieldSystem.cs:75-220``):
there, monopole moments are accumulated bottom-up over the physics engine's
broadphase BVH by a single-threaded stack walk (``GenerateMomentsSTJob``,
:454-555), and every particle then does its own depth-first ``stackalloc``
treewalk (:151-209) accepting nodes by the Salmon & Warren (1993) bmax MAC
with theta=0.7 (:229-247), evaluating unsoftened monopoles far (M2P,
:428-442) and Dyer-Ip-softened P2P at leaves (:332-356).

Per-particle recursive stack walks don't vectorize on TPU. The TPU-native
formulation here:

1. **Implicit octree from Morton codes.** Sources are sorted by 30-bit
   Morton code; the level-ℓ cells are 3ℓ-bit code prefixes, so every
   occupied cell is a contiguous run of the sorted arrays. Per-level cell
   moments (mass, center of mass — the P2M/M2M of the reference) and tight
   AABBs are segmented reductions; parent→child links are two
   ``searchsorted`` calls per level. Everything is static-shaped; only
   occupied cells exist (capacity min(S, 8^ℓ) per level). All per-cell
   fields are packed into one row of a single f32 array so the traversal
   does ONE gather per frontier per level (gathers, not flops, dominate the
   walk on TPU).

2. **Group-based dual traversal.** Targets are Morton-sorted and split into
   contiguous groups of ``tree_group_size``. Each group walks the tree once
   (vmapped, level-synchronous frontier instead of a stack), applying the
   bmax MAC *conservatively for the whole group*: a node is accepted only if
   it passes from the nearest point of the group's AABB, so every per-
   particle acceptance the reference would have rejected is also rejected
   here (the approximation error is strictly <= the reference's). Accepted
   nodes append to a fixed-capacity M2P list; rejected nodes descend;
   rejected nodes at the last level (or with <= tree_leaf_count bodies — the
   generalization of the BVH's 4-body leaves) append to a P2P cell list
   that is then expanded to source-particle indices.

3. **Dense batched evaluation.** Per group, M2P is a (B x F) monopole tile
   and P2P a (B x P) Dyer-Ip tile — contiguous VPU math in reciprocal form.
   List overflows are *dropped and counted* (returned as a diagnostic),
   never silently wrapped.

Supports the target/source split used by shard_map data parallelism (targets
= local shard, sources = all-gathered global set).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import gravity as grav_ops
from . import grouping
from . import morton

_INT_MAX = jnp.iinfo(jnp.int32).max

# packed per-cell row layout (single f32 gather per traversal step);
# integer fields are exact in f32 below 2^24 (particle/cell counts and
# indices are far below that at supported scales)
_CM0, _CM1, _CM2, _BMAX2, _MASS, _COUNT, _START, _CSTART, _CCOUNT = range(9)


class _Level(NamedTuple):
    packed: jax.Array       # [C,9] packed cell row (see layout above)
    code: jax.Array         # [C]   cell Morton prefix (INT_MAX padded)
    n_cells: jax.Array      # []    occupied cell count (dynamic)


def _build_levels(code_s, pos_s, mass_s, n_levels: int):
    """Per-level compacted cell arrays from Morton-sorted sources."""
    s = code_s.shape[0]
    live = mass_s > 0.0
    big = jnp.asarray(3e30, pos_s.dtype)
    pos_live_min = jnp.where(live[:, None], pos_s, big)
    pos_live_max = jnp.where(live[:, None], pos_s, -big)
    idx = jnp.arange(s, dtype=jnp.int32)

    raw = []
    for lv in range(1, n_levels + 1):
        cap = min(s, 8 ** lv)
        cid = morton.cell_of(code_s, lv)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), cid[1:] != cid[:-1]])
        seg = jnp.cumsum(boundary) - 1          # [S] in [0, n_cells)
        n_cells = seg[-1] + 1

        cell_code = jax.ops.segment_max(cid, seg, num_segments=cap)
        m = jax.ops.segment_sum(mass_s, seg, num_segments=cap)
        mpos = jax.ops.segment_sum(mass_s[:, None] * pos_s, seg,
                                   num_segments=cap)
        cm = mpos / jnp.maximum(m, 1e-30)[:, None]
        amin = jax.ops.segment_min(pos_live_min, seg, num_segments=cap)
        amax = jax.ops.segment_max(pos_live_max, seg, num_segments=cap)
        # bmax: CM to farthest corner of the tight AABB
        # (GravityFieldSystem.cs:236-243). Empty/dead cells get bmax2=0.
        b = jnp.maximum(jnp.maximum(amax - cm, cm - amin), 0.0)
        bmax2 = jnp.where(m > 0, jnp.sum(b * b, axis=-1), 0.0)
        start = jax.ops.segment_min(idx, seg, num_segments=cap)
        count = jax.ops.segment_sum(jnp.ones_like(idx), seg, num_segments=cap)

        pad = jnp.arange(cap) >= n_cells
        cell_code = jnp.where(pad, _INT_MAX, cell_code)
        raw.append(dict(code=cell_code, cm=cm, mass=m, bmax2=bmax2,
                        start=start, count=count, n_cells=n_cells))

    # parent -> children links (children of prefix p are prefixes p*8+0..7,
    # contiguous in the child level's sorted code array)
    out = []
    for lv in range(n_levels):
        cur = raw[lv]
        cap = cur["code"].shape[0]
        if lv + 1 < n_levels:
            child_code = raw[lv + 1]["code"]
            lo = jnp.searchsorted(child_code, cur["code"] << 3).astype(jnp.int32)
            hi = jnp.searchsorted(child_code, (cur["code"] + 1) << 3).astype(jnp.int32)
            # padded parents (code INT_MAX) overflow the shift; force 0 children
            valid = cur["code"] != _INT_MAX
            cs = jnp.where(valid, lo, 0)
            cc = jnp.where(valid, hi - lo, 0)
        else:
            cs = jnp.zeros((cap,), jnp.int32)
            cc = jnp.zeros((cap,), jnp.int32)
        f32 = lambda x: x.astype(jnp.float32)
        packed = jnp.stack(
            [cur["cm"][:, 0], cur["cm"][:, 1], cur["cm"][:, 2],
             cur["bmax2"], cur["mass"], f32(cur["count"]),
             f32(cur["start"]), f32(cs), f32(cc)], axis=-1)
        out.append(_Level(packed, cur["code"], cur["n_cells"]))
    return out


def _append(count, mask, cap):
    """Scatter positions for appending masked rows at running `count`.

    Returns (positions [len(mask)], new_count). Masked-off rows get position
    `cap`, so a subsequent ``.at[positions].set(..., mode='drop')`` drops
    them; rows past the cap also land >= cap and drop. `new_count` may exceed
    `cap` — the excess is the overflow diagnostic.
    """
    inc = jnp.cumsum(mask) - mask               # exclusive prefix count
    pos = jnp.where(mask, count + inc, cap)
    return pos.astype(jnp.int32), count + jnp.sum(mask, dtype=jnp.int32)


def _expand_ragged(starts, counts, total, cap):
    """Flatten per-cell (start, count) runs into a particle index list [cap].

    slot k holds starts[c] + (k - cum[c]) where c is the cell covering k.
    Returns (indices [cap], valid [cap]).
    """
    cum = jnp.cumsum(counts) - counts           # exclusive
    slots = jnp.arange(cap, dtype=jnp.int32)
    cell = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32) - 1
    cell = jnp.clip(cell, 0, starts.shape[0] - 1)
    inner = slots - cum[cell]
    valid = (slots < jnp.minimum(total, cap)) & (inner < counts[cell])
    return starts[cell] + inner, valid


class TreeOut(NamedTuple):
    phi: jax.Array
    grad_phi: jax.Array
    n_direct: jax.Array
    n_approx: jax.Array
    m2p_overflow: jax.Array  # [] dropped M2P list entries (should be 0)
    p2p_overflow: jax.Array  # [] dropped P2P cells/particles (should be 0)


class TreeCache(NamedTuple):
    """Frozen interaction lists (the Verlet-list analog for gravity).

    Built by :func:`build_cache` with a skin margin and re-evaluated against
    *current* positions for up to `rebuild_every` steps — the same
    amortization the reference applies within one step when the broadphase
    expands AABBs by v*dt (``Broadphase.cs:743-761``), stretched across
    steps. M2P entries freeze node moments at build time (staleness error
    ~ v*K*dt/r, well under the theta=0.7 MAC error for sane skins); P2P
    entries are indices into the frozen source sort, so P2P forces are
    always exact for current positions.
    """
    order_s: jax.Array      # [S]      frozen source Morton sort
    tgt_idx: jax.Array      # [G*B]    original target index per group slot
    scatter_to: jax.Array   # [G*B]    tgt_idx, or n for dead/duplicate slots
    gidx_t: jax.Array       # [G,B]    global target ids (offset folded in)
    m2p: jax.Array          # [G,cap,4] frozen accepted (cm, mass)
    m2p_n: jax.Array        # [G]
    p2p_idx: jax.Array      # [G,P]    indices into the frozen source sort
    p2p_valid: jax.Array    # [G,P]
    m2p_overflow: jax.Array
    p2p_overflow: jax.Array
    overflow_detail: jax.Array  # [4]: m2p, cell-list, p2p-expand, frontier


def build_cache(pos, h, mass, cfg: SimConfig, src=None,
                target_offset=0, skin=0.0) -> TreeCache:
    """Traverse once and freeze the per-group interaction lists.

    `skin`: group AABBs are inflated by 2*skin before the MAC, so the lists
    stay conservative while every particle moves less than `skin` (targets
    and sources each contribute up to one skin of approach).
    """
    if src is None:
        src = (pos, h, mass)
    pos_s, h_s, mass_s = src
    n = pos.shape[0]
    s = pos_s.shape[0]
    n_levels = min(cfg.tree_levels, morton.MAX_LEVEL)
    m2p_cap = cfg.tree_m2p_cap
    cell_cap = cfg.tree_p2p_cell_cap
    p2p_cap = cfg.tree_p2p_cap
    bsz = cfg.tree_group_size
    leaf_n = cfg.tree_leaf_count

    # ---- source bbox + Morton sort ----
    live = mass_s > 0.0
    big = jnp.asarray(3e30, pos_s.dtype)
    lo = jnp.min(jnp.where(live[:, None], pos_s, big), axis=0)
    hi = jnp.max(jnp.where(live[:, None], pos_s, -big), axis=0)
    code = morton.encode(pos_s, lo, hi)
    code = jnp.where(live, code, (1 << 30) - 1)  # dead sources cluster last
    order_s = jnp.argsort(code)
    code_s = code[order_s]
    pos_ss = pos_s[order_s]
    h_ss = h_s[order_s]
    mass_ss = mass_s[order_s]
    orig_s = order_s.astype(jnp.int32)          # sorted pos -> source index

    levels = _build_levels(code_s, pos_ss, mass_ss, n_levels)

    # ---- target Morton sort + cell-bounded grouping ----
    # Cell-bounded groups (see ops/grouping.py) keep every group's AABB
    # within one level-lg octree cell; a plain fixed-stride split would
    # create "seam groups" straddling octant boundaries whose AABBs span the
    # whole domain — the MAC then accepts nothing and their P2P explodes.
    grp = grouping.cell_groups(pos, lo, hi, bsz, cfg.tree_group_level)
    n_groups = grp.live.shape[0]
    tgt_idx = grp.tgt_idx
    gvalid = jnp.any(grp.live, axis=1)
    scatter_to = grp.scatter_to
    pos_t = pos[tgt_idx].reshape(n_groups, bsz, 3)
    gidx_t = (tgt_idx + jnp.asarray(target_offset, jnp.int32)
              ).reshape(n_groups, bsz)

    # Conservative skin accounting: targets approach by <= skin, sources by
    # <= skin (rmin shrinks by 2*skin), and node bmax can grow by <= skin;
    # folding the bmax growth into rmin needs skin/theta more. 2 + 1/theta
    # <= 3.5 for theta >= 0.66; use 3.5*skin for simplicity.
    pad_sk = 3.5 * skin
    g_lo = jnp.min(pos_t, axis=1) - pad_sk      # [G,3]
    g_hi = jnp.max(pos_t, axis=1) + pad_sk

    # per-level frontier capacity: the frontier can never exceed the number
    # of cells at that level, nor 8x the previous frontier
    fcaps = []
    prev = 8
    for lv in range(1, n_levels + 1):
        prev = min(prev * 8, 8 ** lv, cfg.tree_frontier, s)
        fcaps.append(max(prev, 8))

    def walk(glo, ghi):
        """One group's traversal -> (m2p list, p2p particle list, overflow).

        Scatter-free except two end-of-walk compactions: per-level accept /
        leaf decisions are collected as masked values and compacted ONCE,
        and the frontier expansion is a ragged-range computation (children
        of the code-ordered frontier are ascending disjoint ranges in the
        next level's cell array). Generic scatters run at only ~40M rows/s
        on this hardware, so they are the build's budget.
        """
        front_overflow = jnp.asarray(0, jnp.int32)
        m2p_masks, m2p_vals = [], []     # per level: [F_l], [F_l,4]
        cell_masks, cell_vals = [], []   # per level: [F_l], [F_l,2]

        frontier = jnp.where(
            jnp.arange(fcaps[0], dtype=jnp.int32) < levels[0].n_cells,
            jnp.arange(fcaps[0], dtype=jnp.int32), -1)

        for li, lv in enumerate(levels):
            fvalid = frontier >= 0
            fi = jnp.clip(frontier, 0, lv.packed.shape[0] - 1)
            row = lv.packed[fi]                          # ONE gather [F,9]
            cm = row[:, _CM0:_CM2 + 1]
            bmax2 = row[:, _BMAX2]
            cmass = row[:, _MASS]
            ccount = row[:, _COUNT].astype(jnp.int32)
            cstart = row[:, _START].astype(jnp.int32)

            # conservative group MAC: distance from node CM to the nearest
            # point of the group AABB (0 if CM inside the box)
            d = jnp.maximum(jnp.maximum(glo - cm, cm - ghi), 0.0)
            rmin2 = jnp.sum(d * d, axis=-1)
            accept = fvalid & (
                grav_ops.accept_bmax(rmin2, bmax2, cfg.theta) | (cmass <= 0.0))

            m2p_masks.append(accept & (cmass > 0.0))
            m2p_vals.append(jnp.concatenate([cm, cmass[:, None]], axis=-1))

            reject = fvalid & ~accept
            is_leaf = (li == len(levels) - 1) | (ccount <= leaf_n)
            to_p2p = reject & is_leaf
            cell_masks.append(to_p2p)
            cell_vals.append(jnp.stack([cstart, ccount], axis=-1))

            if li == len(levels) - 1:
                break
            descend = reject & ~is_leaf
            child_start = row[:, _CSTART].astype(jnp.int32)
            child_count = row[:, _CCOUNT].astype(jnp.int32)
            cc_masked = jnp.where(descend, child_count, 0)
            total_c = jnp.sum(cc_masked)
            nf = fcaps[li + 1]
            new_front, fvalid_n = _expand_ragged(child_start, cc_masked,
                                                 total_c, nf)
            frontier = jnp.where(fvalid_n, new_front, -1)
            front_overflow = front_overflow + jnp.maximum(total_c - nf, 0)

        # single compaction per output list across all levels
        am = jnp.concatenate(m2p_masks)
        av = jnp.concatenate(m2p_vals, axis=0)
        posns, m2p_n = _append(jnp.asarray(0, jnp.int32), am, m2p_cap)
        m2p = jnp.zeros((m2p_cap, 4), jnp.float32).at[posns].set(
            av, mode="drop")

        km = jnp.concatenate(cell_masks)
        kv = jnp.concatenate(cell_vals, axis=0)
        posns, cell_n = _append(jnp.asarray(0, jnp.int32), km, cell_cap)
        cells = jnp.zeros((cell_cap, 2), jnp.int32).at[posns].set(
            kv, mode="drop")

        cvalid = jnp.arange(cell_cap) < jnp.minimum(cell_n, cell_cap)
        counts = jnp.where(cvalid, cells[:, 1], 0)
        total = jnp.sum(counts)
        p2p_idx, p2p_valid = _expand_ragged(cells[:, 0], counts,
                                            total, p2p_cap)
        m2p_over = jnp.maximum(m2p_n - m2p_cap, 0)
        cell_over = jnp.maximum(cell_n - cell_cap, 0)
        pexp_over = jnp.maximum(total - p2p_cap, 0)
        detail = jnp.stack([m2p_over, cell_over, pexp_over, front_overflow])
        return (m2p, jnp.minimum(m2p_n, m2p_cap), p2p_idx, p2p_valid, detail)

    m2p, m2p_n, p2p_idx, p2p_valid, detail = jax.vmap(walk)(g_lo, g_hi)
    # zero out the lists of invalid (padding) groups so they cost nothing
    # in overflow accounting
    detail = jnp.sum(jnp.where(gvalid[:, None], detail, 0), axis=0)
    return TreeCache(orig_s, tgt_idx, scatter_to, gidx_t, m2p, m2p_n,
                     p2p_idx, p2p_valid, detail[0], jnp.sum(detail[1:]),
                     detail)


def evaluate(cache: TreeCache, pos, h, mass, cfg: SimConfig,
             src=None) -> TreeOut:
    """Evaluate frozen lists against CURRENT positions/h/masses."""
    if src is None:
        src = (pos, h, mass)
    pos_s, h_s, mass_s = src
    n = pos.shape[0]
    s = pos_s.shape[0]
    bsz = cfg.tree_group_size
    n_pad = cache.tgt_idx.shape[0]
    n_groups = n_pad // bsz

    orig_s = cache.order_s
    # pack all per-source fields into one row so the per-group P2P lookup is
    # ONE row gather instead of four element gathers (gathers dominate the
    # eval cost on TPU): [S, 8] = x, y, z, mass, 1/h, gid, pad, pad
    h_ss = h_s[orig_s]
    inv_h_ss = 1.0 / jnp.where(h_ss > 0, h_ss, 1.0)
    src_packed = jnp.concatenate([
        pos_s[orig_s],
        mass_s[orig_s][:, None],
        inv_h_ss[:, None],
        orig_s.astype(pos.dtype)[:, None],
        jnp.zeros((s, 2), pos.dtype),
    ], axis=-1)
    pos_t = pos[cache.tgt_idx].reshape(n_groups, bsz, 3)
    h_t = h[cache.tgt_idx].reshape(n_groups, bsz)

    def eval_group(pos_g, h_g, gid_g, m2p_g, nm2p, pidx, pvalid):
        # M2P: zero-mass padded slots contribute nothing (monopole ~ m)
        cm_g = m2p_g[:, :3]
        m_g = m2p_g[:, 3]
        dx = pos_g[:, None, :] - cm_g[None, :, :]           # [B,F,3]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        gp, ph = grav_ops.monopole(dx, r, m_g[None, :], cfg.g_const)
        phi = jnp.sum(ph, axis=-1)
        grad = jnp.sum(gp, axis=-2)

        # P2P (reciprocal-form Dyer-Ip); single packed-row gather. The pair
        # tile is accumulated in chunks over the list axis so [B,chunk,3]
        # intermediates stay on-chip instead of spilling [B,P,3] to HBM.
        srow = src_packed[jnp.clip(pidx, 0, s - 1)]          # [P,8]
        p_cap = srow.shape[0]
        chunk = min(1024, p_cap)
        n_chunks = -(-p_cap // chunk)
        pad = n_chunks * chunk - p_cap
        srow_c = jnp.pad(srow, ((0, pad), (0, 0))).reshape(
            n_chunks, chunk, 8)
        pvalid_c = jnp.pad(pvalid, (0, pad)).reshape(n_chunks, chunk)
        inv_h_g = 1.0 / h_g

        def p2p_chunk(carry, inp):
            phi_a, grad_a, nd_a = carry
            srw, pv = inp
            sp = srw[:, :3]
            sm = srw[:, 3]
            s_inv_h = srw[:, 4]
            sgid = srw[:, 5].astype(jnp.int32)
            dx2 = pos_g[:, None, :] - sp[None, :, :]         # [B,chunk,3]
            r2 = jnp.sum(dx2 * dx2, axis=-1)
            mask = pv[None, :] & (gid_g[:, None] != sgid[None, :])
            m_eff = jnp.where(mask, sm[None, :], 0.0)
            if cfg.softening_mode == "receiver_h":
                inv_a = jnp.broadcast_to(inv_h_g[:, None], r2.shape)
            else:
                # a = max(h_i, h_j)  <=>  1/a = min(1/h_i, 1/h_j)
                inv_a = jnp.minimum(inv_h_g[:, None], s_inv_h[None, :])
            gp2, ph2 = grav_ops.dyer_ip_fast(dx2, r2, m_eff, inv_a,
                                             cfg.g_const)
            nd = jnp.sum(mask & (sm[None, :] > 0), axis=-1)
            return (phi_a + jnp.sum(ph2, axis=-1),
                    grad_a + jnp.sum(gp2, axis=-2),
                    nd_a + nd.astype(jnp.int32)), None

        # nd init derives from gid_g so its sharding axes match the body's
        # output under shard_map
        (phi2, grad2, n_direct), _ = jax.lax.scan(
            p2p_chunk,
            (jnp.zeros_like(phi), jnp.zeros_like(grad),
             jnp.zeros_like(gid_g, dtype=jnp.int32)),
            (srow_c, pvalid_c))
        phi = phi + phi2
        grad = grad + grad2
        n_approx = jnp.broadcast_to(nm2p, n_direct.shape)
        return phi, grad, n_direct, n_approx

    phi_g, grad_g, nd_g, na_g = jax.vmap(eval_group)(
        pos_t, h_t, cache.gidx_t, cache.m2p, cache.m2p_n,
        cache.p2p_idx, cache.p2p_valid)

    # ---- unsort back to original target order ----
    # duplicate slots write identical values; dead slots scatter to n (drop)
    flat = lambda x: x.reshape((n_pad,) + x.shape[2:])
    scatter_to = cache.scatter_to
    phi = jnp.zeros((n,), pos.dtype).at[scatter_to].set(
        flat(phi_g), mode="drop")
    grad_phi = jnp.zeros((n, 3), pos.dtype).at[scatter_to].set(
        flat(grad_g), mode="drop")
    n_direct = jnp.zeros((n,), jnp.int32).at[scatter_to].set(
        flat(nd_g), mode="drop")
    n_approx = jnp.zeros((n,), jnp.int32).at[scatter_to].set(
        flat(na_g), mode="drop")
    return TreeOut(phi, grad_phi, n_direct, n_approx,
                   cache.m2p_overflow, cache.p2p_overflow)


def gravity_full(pos, h, mass, cfg: SimConfig, src=None,
                 target_offset=0) -> TreeOut:
    """Build + evaluate in one shot (fresh lists, zero skin)."""
    cache = build_cache(pos, h, mass, cfg, src=src,
                        target_offset=target_offset)
    return evaluate(cache, pos, h, mass, cfg, src=src)


def gravity(pos, h, mass, cfg: SimConfig, src=None, target_offset=0):
    """(phi, grad_phi, n_direct, n_approx) — interface used by the model."""
    out = gravity_full(pos, h, mass, cfg, src=src, target_offset=target_offset)
    return out.phi, out.grad_phi, out.n_direct, out.n_approx

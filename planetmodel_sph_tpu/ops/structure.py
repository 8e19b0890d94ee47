"""Unified Morton-block structure: neighbor windows + block-level Barnes-Hut.

One build serves both short-range SPH and long-range gravity, replacing the
reference's per-step broadphase BVH double duty (neighbor pair stream via
``KernelSystem.cs:97-229`` + gravity tree skeleton via
``GravityFieldSystem.cs:75-220``) with a single TPU-native structure:

1. Particles are Morton-sorted into cell-bounded blocks of ``B``
   (``ops/grouping.py``). The block partition is shared: blocks are the SPH
   target/source groups AND the gravity tree's leaves.
2. One [G, NB] block-pair geometry pass computes BOTH decisions:
   - SPH adjacency: AABB gap < kappa*max(h) + 2*skin (the
     ``SplineKernel.Interacts`` predicate lifted conservatively to blocks);
   - the Salmon-Warren bmax MAC (theta, ``GravityFieldSystem.cs:229-247``)
     from the target-block AABB (inflated by the Verlet skin) to each source
     block's center of mass: accepted blocks are far-field (M2P, evaluated
     against *current* block monopoles — fresher and finer-grained than the
     reference's frozen BVH-node moments), rejected live blocks are
     near-field (P2P with Dyer-Ip softening).
   There is no explicit octree walk at all: at the production scale
   (N ~ 1e5, NB ~ 1e3) the flat [G, NB] MAC matrix costs ~1e6 VPU ops —
   cheaper than any level-synchronous traversal — and the per-group
   acceptance mask makes the far field completely gather-free.
3. Adjacency rows are compacted to fixed windows (overflow counted, never
   silent). Evaluation gathers whole contiguous block rows (2-4 KB) —
   full-bandwidth gathers — and sweeps dense masked [B, CHUNK] pair tiles
   in Pallas (``ops/pallas/groups2.py``).

The structure is rebuilt every ``rebuild_every`` steps with a skin margin
(the Verlet-list amortization of the reference's per-step AABB + v*dt
expansion, ``Broadphase.cs:743-761``) and re-evaluated against current
positions in between. P2P and SPH sums are always exact for current
positions; only the M2P/P2P *split* is frozen (the skin keeps it
conservative: a block can only become "more far-field" than its frozen
classification assumed).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import eos as eos_ops
from . import grouping
from .gravity import accept_bmax
from .pallas import groups2 as gk2


class BlockStructure(NamedTuple):
    """Frozen interaction structure.

    Source windows are at SUB-block granularity (cfg.nbr_sub particles,
    tighter AABBs -> fewer candidate pair-slots); gravity is a three-tier
    partition per (target block, source): block-MAC-accepted blocks feed
    the dense block-monopole scan (`accept`), the in-between ring
    (block-rejected, sub-accepted) feeds windowed sub-block monopoles
    (`m2p_idx`), near sub-blocks feed windowed P2P (`p2p_idx`)."""
    groups: grouping.Groups      # target grouping (frozen Morton sort)
    src_groups: grouping.Groups  # source grouping (same object single-set)
    sph_idx: jax.Array           # [G, Ws] adjacent source sub-block ids,
                                 # or [G, Wx] sorted-layout PARTICLE ids
                                 # when cfg.sph_exact_window > 0
    n_sph: jax.Array             # [G]    true adjacency row sizes (sub-
                                 # blocks, or particles when exact)
    p2p_idx: jax.Array           # [G, Wp] near-field sub-block ids
    n_p2p: jax.Array             # [G]
    m2p_idx: jax.Array           # [G, Wm] ring sub-block ids (monopoles)
    n_m2p: jax.Array             # [G]
    accept: jax.Array            # f32 frozen dense far-scan mask:
                                 # [G, NBpad] block-M2P (sg_blocks off) or
                                 # [G, NSGpad] supergroup-M2P (sg_blocks on)
    blk_idx: jax.Array           # [G, Wb] block-monopole tier ids (blocks
                                 # whose supergroup failed the MAC but that
                                 # pass it themselves; empty when sg off)
    n_blk: jax.Array             # [G]
    sph_overflow: jax.Array      # [] dropped SPH window entries
    p2p_overflow: jax.Array      # [] dropped P2P window entries
    m2p_overflow: jax.Array      # [] dropped ring window entries
    blk_overflow: jax.Array      # [] dropped block-tier window entries


def _nbpad(nb: int, chunk: int) -> int:
    return -(-nb // chunk) * chunk


def fuse_active(cfg: SimConfig) -> bool:
    """Whether the pass-2 P2P fusion (cfg.fuse_p2p_sph) is in effect.

    The fusion rides the sub-granular SPH window rows of the grid
    pipeline's pass-2 sweep, so it is undefined for dense-SPH configs,
    particle-exact SPH lists, and the supergroup far tier (whose
    block-monopole bookkeeping cannot exclude individual sub-blocks)."""
    if not cfg.fuse_p2p_sph:
        if cfg.fuse_p2p_residual:
            raise ValueError("fuse_p2p_residual extends fuse_p2p_sph — "
                             "enable both")
        return False
    if (cfg.neighbor_mode != "grid" or cfg.sph_exact_window > 0
            or cfg.sg_blocks > 1):
        raise ValueError(
            "fuse_p2p_sph needs the grid pipeline with sub-granular SPH "
            "windows and no supergroup tier (got neighbor_mode=%r "
            "sph_exact_window=%r sg_blocks=%r)" % (
                cfg.neighbor_mode, cfg.sph_exact_window, cfg.sg_blocks))
    return True


def packed_permute(arrays, idx, pad_to=0):
    """Gather/permute a list of [N] / [N, k] arrays by `idx` (any integer
    shape) via ONE packed row gather.

    THE repo-wide idiom for reordering multiple fields: per-field element
    gathers cost ~4x a single packed row gather on this TPU, and tiny
    (<=16 B) rows gather at a pathological row rate (docs/ROUND2.md
    gotchas 6) — `pad_to` zero-pads the packed row to that many floats
    (e.g. 32 = 128 B rows).

    Integer fields round-trip through the float dtype: THE shared
    contract is values < 2^24 (counts/ids at the supported scales).
    Returns outputs with shape idx.shape (+ (k,) for 2-D inputs) and the
    original dtypes.
    """
    fdt = None
    for a in arrays:
        if jnp.issubdtype(a.dtype, jnp.floating):
            fdt = a.dtype
            break
    fdt = fdt or jnp.float32
    cols, spans, dtypes = [], [], []
    for a in arrays:
        dtypes.append(a.dtype)
        if a.ndim == 1:
            cols.append(a.astype(fdt)[:, None])
            spans.append(0)          # 0 marks "squeeze back to 1-D"
        else:
            cols.append(a.astype(fdt))
            spans.append(a.shape[1])
    packed = jnp.concatenate(cols, axis=1)
    if pad_to > packed.shape[1]:
        packed = jnp.pad(packed, ((0, 0), (0, pad_to - packed.shape[1])))
    gat = packed[idx]
    out, off = [], 0
    for s, dt in zip(spans, dtypes):
        w = max(s, 1)
        v = gat[..., off:off + w]
        out.append((v[..., 0] if s == 0 else v).astype(dt))
        off += w
    return out


def _compact_rows(adj, w):
    """Compact boolean rows [G, NB] to index windows [G, w] (+counts, drop).

    Sort-based: set columns keep their index as the sort key, clear ones
    get NB, so a row sort moves the set columns to the front in order.
    5x faster than the equivalent scatter on TPU (105ms -> 20ms for a
    [2067, 8268] -> [., 448] compaction)."""
    g, nb = adj.shape
    keys = jnp.where(adj, jnp.arange(nb, dtype=jnp.int32)[None, :], nb)
    if nb < w:      # window capacity can exceed the source-unit count
        keys = jnp.pad(keys, ((0, 0), (0, w - nb)), constant_values=nb)
    idx = jax.lax.sort(keys, dimension=1)[:, :w]
    n = jnp.sum(adj, axis=1).astype(jnp.int32)
    idx = jnp.where(jnp.arange(w, dtype=jnp.int32)[None, :] < n[:, None],
                    idx, -1)
    overflow = jnp.sum(jnp.maximum(n - w, 0))
    return idx, n, overflow


def _refine_exact(sph_idx, n_sph, sph_over, pos_sb, h_sb, m_sb, sk_sb,
                  live_sb, pos_t, h_t, sk_t, cfg, h_margin, nsub, sub,
                  chunk):
    """Refine sub-block SPH windows to PARTICLE-granularity candidate lists.

    The sub-block window is conservative at sub-AABB granularity; most of
    its pair slots are geometric padding (measured 2560 slots/target for
    ~55 real neighbors at the settled 100k point, and a group-AABB-vs-
    max-h refinement still keeps 770 — halo particles inflate the group's
    h max). This REBUILD-time pass instead evaluates the TRUE pair
    predicate: one light Pallas sweep over the gathered candidates marks
    every candidate that interacts with at least one target in the group
    under the per-particle (skin- and h-margin-inflated) cutoff
    r < kappa*(1+margin)*max(h_i, h_j) + skin_i + skin_j — the same
    conservative bound the sub-block criterion lifts to AABBs — then the
    :func:`_compact_rows` sort trick compacts the survivors into a
    [G, Wx] window of sorted-layout particle ids. Per-step sweeps then
    run the exact neighbor-set union of the group.
    """
    g, w = sph_idx.shape
    wx = cfg.sph_exact_window
    keff = cfg.kappa * (1.0 + h_margin)
    xs = pos_sb[..., 0].reshape(-1)
    ys = pos_sb[..., 1].reshape(-1)
    zs = pos_sb[..., 2].reshape(-1)
    cs = keff * h_sb.reshape(-1)
    ms = jnp.where(live_sb, m_sb, 0.0).reshape(-1)
    sks = sk_sb.reshape(-1)
    cand = _window_gather([xs, ys, zs, cs, sks, ms], sph_idx, nsub, sub,
                          chunk)
    tgt = _cols(pos_t[..., 0].reshape(-1), pos_t[..., 1].reshape(-1),
                pos_t[..., 2].reshape(-1), keff * h_t.reshape(-1),
                sk_t.reshape(-1))
    nv = jnp.minimum(n_sph, w) * sub
    keep = gk2.filter_sph(nv, tgt, cand, b=cfg.nbr_group_size, chunk=chunk,
                          gb=cfg.kernel_gb)
    wc = w * sub
    mask = keep[:, :wc] > 0.0
    cid = (jnp.clip(sph_idx, 0, nsub - 1)[:, :, None] * sub
           + jnp.arange(sub, dtype=jnp.int32)[None, None, :]).reshape(g, wc)
    big = jnp.int32(nsub * sub)
    keys = jnp.where(mask, cid, big)
    if wc < wx:
        keys = jnp.pad(keys, ((0, 0), (0, wx - wc)), constant_values=big)
    srt = jax.lax.sort(keys, dimension=1)[:, :wx]
    n_x = jnp.sum(mask, axis=1).astype(jnp.int32)
    idx = jnp.where(jnp.arange(wx, dtype=jnp.int32)[None, :] < n_x[:, None],
                    srt, -1)
    over = sph_over + jnp.sum(jnp.maximum(n_x - wx, 0))
    return idx, n_x, over


def _refine_subblock(sph_idx, n_sph, sph_over, pos_sb, h_sb, m_sb, sk_sb,
                     live_sb, pos_t, h_t, sk_t, cfg, h_margin, nsub, sub,
                     chunk):
    """Refine the sub-block SPH window with the TRUE pair predicate, at
    sub-block granularity (cfg.sph_refine='subblock').

    Same rebuild-time :func:`gk2.filter_sph` sweep as :func:`_refine_exact`
    (per-candidate mask under the skin- and margin-inflated cutoff), but
    instead of compacting survivors to particle ids — which trades the
    contiguous 32-wide sub-block tile gathers for per-particle gathers
    and measured NET SLOWER at 100k (ksweep3 xw rows: 21.0 vs 25.2
    steps/s despite ~7x fewer pair slots) — the mask is reduced to "does
    this sub-block contain ANY survivor" and the ORIGINAL [G, W] window
    is recompacted. Per-step sweeps keep the exact tile layout and
    per-row gather structure they were tuned for; only the valid-row
    count drops (measured at the settled 100k point: AABB windows carry
    ~2560 candidate slots per target for ~52 true neighbors, the true
    union spans ~350 particles, so surviving sub-blocks ~= 3-4x fewer
    rows). Occupancy can only shrink, so no new overflow is possible."""
    g, w = sph_idx.shape
    keff = cfg.kappa * (1.0 + h_margin)
    xs = pos_sb[..., 0].reshape(-1)
    ys = pos_sb[..., 1].reshape(-1)
    zs = pos_sb[..., 2].reshape(-1)
    cs = keff * h_sb.reshape(-1)
    ms = jnp.where(live_sb, m_sb, 0.0).reshape(-1)
    sks = sk_sb.reshape(-1)
    cand = _window_gather([xs, ys, zs, cs, sks, ms], sph_idx, nsub, sub,
                          chunk)
    tgt = _cols(pos_t[..., 0].reshape(-1), pos_t[..., 1].reshape(-1),
                pos_t[..., 2].reshape(-1), keff * h_t.reshape(-1),
                sk_t.reshape(-1))
    nv = jnp.minimum(n_sph, w) * sub
    keep = gk2.filter_sph(nv, tgt, cand, b=cfg.nbr_group_size, chunk=chunk,
                          gb=cfg.kernel_gb)
    hit = jnp.max(keep[:, :w * sub].reshape(g, w, sub), axis=2) > 0.0
    hit &= jnp.arange(w, dtype=jnp.int32)[None, :] \
        < jnp.minimum(n_sph, w)[:, None]
    # recompact the surviving sub-block ids: survivors keep their id as
    # the sort key (window rows are already id-sorted), dead rows sink
    keys = jnp.where(hit, jnp.clip(sph_idx, 0, nsub - 1), nsub)
    srt = jax.lax.sort(keys, dimension=1)
    n2 = jnp.sum(hit, axis=1).astype(jnp.int32)
    # optional post-refine truncation: the per-step row gathers are
    # CAPACITY-shaped ([G, W] regardless of occupancy), so narrowing the
    # refined window to cfg.sph_refined_window directly cuts per-step
    # gather traffic (measured refine keeps max 64 of a 240 AABB window
    # at the settled 100k point). Truncation drops counted interactions —
    # same loud-overflow contract as every other capacity.
    w2 = cfg.sph_refined_window or w
    w2 = min(w2, w)
    srt = srt[:, :w2]
    idx = jnp.where(jnp.arange(w2, dtype=jnp.int32)[None, :]
                    < jnp.minimum(n2, w2)[:, None], srt, -1)
    over = sph_over + jnp.sum(jnp.maximum(n2 - w2, 0))
    return idx, jnp.minimum(n2, w2), over


def _block_stats(pos_b, h_b, m_b, live):
    """Per-block summaries from sorted [NB, B] fields (live-masked)."""
    big = jnp.asarray(3e30, pos_b.dtype)
    m_live = jnp.where(live, m_b, 0.0)
    mass = jnp.sum(m_live, axis=1)                                   # [NB]
    mpos = jnp.sum(m_live[..., None] * pos_b, axis=1)                # [NB,3]
    cm = mpos / jnp.maximum(mass, 1e-30)[:, None]
    lv3 = live[..., None]
    amin = jnp.min(jnp.where(lv3, pos_b, big), axis=1)
    amax = jnp.max(jnp.where(lv3, pos_b, -big), axis=1)
    # bmax: CM to farthest corner of the tight AABB (the Salmon-Warren bmax,
    # GravityFieldSystem.cs:236-243); 0 for empty blocks
    b = jnp.maximum(jnp.maximum(amax - cm, cm - amin), 0.0)
    bmax2 = jnp.where(mass > 0, jnp.sum(b * b, axis=-1), 0.0)
    hmax = jnp.max(jnp.where(live, h_b, 0.0), axis=1)
    return mass, cm, amin, amax, bmax2, hmax


def build(pos, h, mass, cfg: SimConfig, skin=0.0,
          src=None, target_offset: int = 0,
          h_margin: float = 0.0, groups=None,
          sph_only: bool = False, skin_src=None) -> BlockStructure:
    """Build windows + MAC mask for the current positions/smoothing lengths.

    `skin`: Verlet margin — a PER-PARTICLE motion bound [N] (original
    order; a scalar broadcasts) reduced to per-block/sub/supergroup
    maxima. Adjacency cutoffs widen by delta_target + delta_source; the
    MAC stays conservative via d_eff = d - delta_t - delta_s against
    bmax_eff = bmax + 2*delta_s (source internal motion). Per-block skins
    keep one fast or noisy particle from widening every window (the
    measured global-skin runaway at 100k; see models.planet._skin).
    `src`: optional (pos, h, mass) global source set (dp: targets = local
    shard, sources = all-gathered global set).
    `h_margin`: cutoffs additionally widened by (1+h_margin) on h — room for
    a bounded Newton h-solve between rebuilds.
    `groups`: frozen grouping(s) to reuse instead of re-sorting
    (cfg.sort_every amortization): a single ``grouping.Groups`` for
    single-set builds, or a ``(target_groups, source_groups)`` pair under
    dp (`src=`). Every AABB/centroid/window is still recomputed from the
    CURRENT positions, so the structure stays exactly conservative —
    staleness only loosens block tightness.
    `sph_only`: skip the gravity partition (MAC + tier sorts) — for
    throwaway structures that only feed density sweeps (the Newton
    h-solve), worth ~half the build cost.
    """
    single = src is None
    pos_s, h_s, mass_s = (pos, h, mass) if single else src
    bsz = cfg.nbr_group_size
    lg = cfg.nbr_group_level
    chunk = cfg.block_chunk
    do_grav = cfg.gravity_solver == "tree" and not sph_only

    if groups is not None:
        if isinstance(groups, grouping.Groups):
            if not single:
                raise ValueError("dp builds need a (target, source) "
                                 "groups pair")
            tgrp = sgrp = groups
        else:
            if single:
                raise ValueError("single-set builds take one Groups")
            tgrp, sgrp = groups
    else:
        # shared Morton bounding box (targets are a subset of sources under
        # dp, but take the union to be safe)
        live_s = mass_s > 0.0
        big = jnp.asarray(3e30, pos.dtype)
        lo = jnp.minimum(
            jnp.min(jnp.where(live_s[:, None], pos_s, big), axis=0),
            jnp.min(pos, axis=0))
        hi = jnp.maximum(
            jnp.max(jnp.where(live_s[:, None], pos_s, -big), axis=0),
            jnp.max(pos, axis=0))
        tgrp = grouping.cell_groups(pos, lo, hi, bsz, lg)
        sgrp = tgrp if single else grouping.cell_groups(pos_s, lo, hi, bsz,
                                                        lg)
    g = tgrp.live.shape[0]
    nb = sgrp.live.shape[0]

    sub = cfg.nbr_sub
    if bsz % sub:
        raise ValueError("nbr_sub must divide nbr_group_size")
    spb = bsz // sub
    nsub = nb * spb

    # per-particle motion bound -> per-block/sub maxima (scalar broadcasts)
    skin = jnp.asarray(skin, pos.dtype)
    if skin.ndim == 0:
        skin_t = jnp.broadcast_to(skin, (pos.shape[0],))
        skin_s = jnp.broadcast_to(skin, (pos_s.shape[0],))
    else:
        skin_t = skin
        if single:
            skin_s = skin
        elif skin_src is not None:
            skin_s = skin_src           # dp cached: all-gathered source skins
        else:
            skin_s = jnp.zeros((pos_s.shape[0],), pos.dtype)

    # target-block AABBs + max h (duplicate slots replicate real members, so
    # plain min/max give the true bbox)
    pos_t = pos[tgrp.tgt_idx].reshape(g, bsz, 3)
    h_t = h[tgrp.tgt_idx].reshape(g, bsz)
    tlo = jnp.min(pos_t, axis=1)
    thi = jnp.max(pos_t, axis=1)
    t_hmax = jnp.max(jnp.where(tgrp.live, h_t, 0.0), axis=1)
    tvalid = jnp.any(tgrp.live, axis=1)
    d_t = jnp.max(jnp.where(tgrp.live,
                            skin_t[tgrp.tgt_idx].reshape(g, bsz), 0.0),
                  axis=1)                                            # [G]

    # source summaries at both granularities: whole blocks (far-field MAC)
    # and sub-blocks (adjacency + near-field MAC)
    pos_sb = pos_s[sgrp.tgt_idx].reshape(nb, bsz, 3)
    h_sb = h_s[sgrp.tgt_idx].reshape(nb, bsz)
    m_sb = mass_s[sgrp.tgt_idx].reshape(nb, bsz)
    b_mass, b_cm, b_amin, b_amax, b_bmax2, _ = _block_stats(pos_sb, h_sb,
                                                            m_sb, sgrp.live)
    bvalid = b_mass > 0.0
    s_mass, s_cm, s_amin, s_amax, s_bmax2, s_hmax = _block_stats(
        pos_sb.reshape(nsub, sub, 3), h_sb.reshape(nsub, sub),
        m_sb.reshape(nsub, sub), sgrp.live.reshape(nsub, sub))
    svalid = s_mass > 0.0
    sk_sb = jnp.where(sgrp.live, skin_s[sgrp.tgt_idx].reshape(nb, bsz), 0.0)
    d_b = jnp.max(sk_sb, axis=1)                                    # [NB]
    d_s = jnp.max(sk_sb.reshape(nsub, sub), axis=1)                 # [NSUB]

    # ---- [G, NSUB] geometry pass: SPH adjacency ----
    gap = jnp.maximum(
        jnp.maximum(tlo[:, None, :] - s_amax[None, :, :],
                    s_amin[None, :, :] - thi[:, None, :]), 0.0)
    gap2 = jnp.sum(gap * gap, axis=-1)
    cut = (cfg.kappa * (1.0 + h_margin)
           * jnp.maximum(t_hmax[:, None], s_hmax[None, :])
           + d_t[:, None] + d_s[None, :])
    sph_adj = (gap2 < cut * cut) & tvalid[:, None] & svalid[None, :]
    sph_idx, n_sph, sph_over = _compact_rows(sph_adj, cfg.nbr_window)
    if cfg.sph_exact_window > 0:
        sk_t = skin_t[tgrp.tgt_idx].reshape(g, bsz)
        sph_idx, n_sph, sph_over = _refine_exact(
            sph_idx, n_sph, sph_over, pos_sb, h_sb, m_sb, sk_sb,
            sgrp.live, pos_t, h_t, sk_t, cfg, h_margin, nsub, sub, chunk)
    elif cfg.sph_refine_subblock:
        sk_t = skin_t[tgrp.tgt_idx].reshape(g, bsz)
        sph_idx, n_sph, sph_over = _refine_subblock(
            sph_idx, n_sph, sph_over, pos_sb, h_sb, m_sb, sk_sb,
            sgrp.live, pos_t, h_t, sk_t, cfg, h_margin, nsub, sub, chunk)

    if do_grav:
        tlo_p = tlo[:, None, :] - d_t[:, None, None]
        thi_p = thi[:, None, :] + d_t[:, None, None]

        def mac(cm, bmax2, d_src):
            """Motion-conservative MAC: the frozen acceptance must hold for
            the whole rebuild period, so the box-to-CM distance is reduced
            by the source bound and bmax grown by twice it (internal
            motion can both shrink d and widen the source extent)."""
            dd = jnp.maximum(jnp.maximum(tlo_p - cm[None, :, :],
                                         cm[None, :, :] - thi_p), 0.0)
            d_eff = jnp.maximum(
                jnp.sqrt(jnp.sum(dd * dd, axis=-1)) - d_src[None, :], 0.0)
            b_eff = jnp.sqrt(jnp.maximum(bmax2, 0.0))[None, :] \
                + 2.0 * d_src[None, :]
            return accept_bmax(d_eff * d_eff, b_eff * b_eff, cfg.theta)

        # block-level MAC -> dense block-monopole scan
        mac_blk = mac(b_cm, b_bmax2, d_b)
        # sub-level MAC on the block-rejected remainder
        mac_sub = mac(s_cm, s_bmax2, d_s)
        covered = mac_blk & bvalid[None, :]
        if cfg.sg_blocks > 1:
            # ---- supergroup far tier ----
            sgf = cfg.sg_blocks
            nsg = -(-nb // sgf)
            padb = nsg * sgf - nb
            bm_p = jnp.pad(b_mass, (0, padb)).reshape(nsg, sgf)
            cm_p = jnp.pad(b_cm, ((0, padb), (0, 0))).reshape(nsg, sgf, 3)
            sg_mass = jnp.sum(bm_p, axis=1)
            sg_cm = (jnp.sum(bm_p[..., None] * cm_p, axis=1)
                     / jnp.maximum(sg_mass, 1e-30)[:, None])
            # tight bmax: max over members of |cm_b - cm_sg| + bmax_b
            # (the union-AABB farthest-corner bound measured 2.4x larger
            # on Morton-consecutive rim blocks, flooding the blk tier)
            bb_p = jnp.pad(b_bmax2, (0, padb)).reshape(nsg, sgf)
            dc = cm_p - sg_cm[:, None, :]
            dcm = jnp.sqrt(jnp.sum(dc * dc, axis=-1))
            memb_b = bm_p > 0.0
            reach = jnp.where(memb_b,
                              dcm + jnp.sqrt(jnp.maximum(bb_p, 0.0)), 0.0)
            sg_bmax = jnp.max(reach, axis=1)
            sg_bmax2 = sg_bmax * sg_bmax
            d_sg = jnp.max(jnp.pad(d_b, (0, padb)).reshape(nsg, sgf), axis=1)
            mac_sg = mac(sg_cm, sg_bmax2, d_sg) & (sg_mass > 0.0)[None, :]
            sg_cover = jnp.repeat(mac_sg, sgf, axis=1)[:, :nb]
            # block-monopole tier: block passes the MAC, its supergroup
            # does not — windowed entries instead of a dense scan
            blk_far = covered & (~sg_cover)
            blk_idx, n_blk, blk_over = _compact_rows(blk_far, cfg.blk_window)
            covered = (sg_cover & bvalid[None, :]) | blk_far
            nsgp = _nbpad(nsg, chunk)
            accept_sg = jnp.pad(mac_sg.astype(jnp.float32),
                                ((0, 0), (0, nsgp - nsg)))
        fused = fuse_active(cfg)
        if fused:
            # pass-2 P2P fusion (cfg.fuse_p2p_sph): SPH-window sub-blocks
            # get their near-field gravity inside the pass-2 sweep, so
            # they are excluded from EVERY windowed/dense tier here.
            # Blocks containing any leave the dense far scan first, so
            # their remaining sub-blocks re-partition at sub granularity
            # (each sub-block is covered exactly once).
            gcol = jnp.arange(g, dtype=jnp.int32)[:, None]
            hits = jnp.zeros((g, nsub), jnp.int32).at[
                gcol, jnp.clip(sph_idx, 0, nsub - 1)].max(
                (sph_idx >= 0).astype(jnp.int32))
            in_sph = hits > 0
            covered = covered & ~jnp.any(in_sph.reshape(g, nb, spb),
                                         axis=2)
        blk_exp = jnp.repeat(covered, spb, axis=1)
        rest = (~blk_exp) & tvalid[:, None] & svalid[None, :]
        ring = rest & mac_sub          # sub-block monopole tier
        near = rest & (~mac_sub)       # P2P tier
        if fused:
            ring = ring & ~in_sph
            near = near & ~in_sph
        # ONE sort compacts both tiers: near keys sort first (their sub
        # id), ring keys next (id + NSUB), everything else last. The ring
        # window is then a per-row slice starting at n_near.
        col = jnp.arange(nsub, dtype=jnp.int32)[None, :]
        keys = jnp.where(near, col,
                         jnp.where(ring, col + nsub, 2 * nsub))
        srt = jax.lax.sort(keys, dimension=1)
        n_p2p = jnp.sum(near, axis=1).astype(jnp.int32)
        n_m2p = jnp.sum(ring, axis=1).astype(jnp.int32)
        wp, wm = cfg.p2p_window, cfg.m2p_window
        jp = jnp.arange(wp, dtype=jnp.int32)[None, :]
        p2p_idx = jnp.where(jp < n_p2p[:, None],
                            srt[:, :wp] if nsub >= wp else
                            jnp.pad(srt, ((0, 0), (0, wp - nsub)),
                                    constant_values=2 * nsub)[:, :wp], -1)
        jm = jnp.arange(wm, dtype=jnp.int32)[None, :]
        pos = jnp.clip(n_p2p[:, None] + jm, 0, srt.shape[1] - 1)
        ring_vals = jnp.take_along_axis(srt, pos, axis=1) - nsub
        m2p_idx = jnp.where(jm < n_m2p[:, None], ring_vals, -1)
        p2p_over = jnp.sum(jnp.maximum(n_p2p - wp, 0))
        m2p_over = jnp.sum(jnp.maximum(n_m2p - wm, 0))
        if cfg.sg_blocks > 1:
            accept = accept_sg
        else:
            accept = covered.astype(jnp.float32)
            nbp = _nbpad(nb, chunk)
            accept = jnp.pad(accept, ((0, 0), (0, nbp - nb)))
            blk_idx = jnp.full((g, 1), -1, jnp.int32)
            n_blk = jnp.zeros((g,), jnp.int32)
            blk_over = jnp.asarray(0, jnp.int32)
    else:
        p2p_idx = jnp.full((g, cfg.p2p_window), -1, jnp.int32)
        n_p2p = jnp.zeros((g,), jnp.int32)
        p2p_over = jnp.asarray(0, jnp.int32)
        m2p_idx = jnp.full((g, cfg.m2p_window), -1, jnp.int32)
        n_m2p = jnp.zeros((g,), jnp.int32)
        m2p_over = jnp.asarray(0, jnp.int32)
        accept = jnp.zeros((g, _nbpad(nb, chunk)), jnp.float32)
        blk_idx = jnp.full((g, 1), -1, jnp.int32)
        n_blk = jnp.zeros((g,), jnp.int32)
        blk_over = jnp.asarray(0, jnp.int32)

    return BlockStructure(tgrp, sgrp, sph_idx, n_sph, p2p_idx, n_p2p,
                          m2p_idx, n_m2p, accept, blk_idx, n_blk,
                          sph_over, p2p_over, m2p_over, blk_over)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

class BlockForces(NamedTuple):
    rho: jax.Array
    pressure: jax.Array
    grad_p: jax.Array        # effective grad P (AV folded in when enabled)
    phi: jax.Array
    grad_phi: jax.Array
    n_neighbors: jax.Array
    n_direct: jax.Array
    n_approx: jax.Array
    du_dt: jax.Array         # specific-internal-energy rate (zeros unless
                             # cfg.eos_mode='adiabatic'; AV heating folded in)
    balsara: jax.Array = None  # next-step Balsara limiter factor (None
                               # unless cfg.av_balsara with AV enabled)


class _Ctx(NamedTuple):
    """Sorted-layout fields shared by the sweeps of one evaluation.

    Under data parallelism the target set is the local shard and the source
    set is the all-gathered global set (each with its own Morton grouping);
    single-set evaluation aliases the two (no duplicate gathers)."""
    t: dict                  # target-sorted fields [Gt*B]
    s: dict                  # source-sorted fields [NB*B]
    single: bool
    g: int
    nb: int


def _sort_set(grp, arrs):
    """Gather a list of [N] fields into the sorted [G*B] layout (see
    :func:`packed_permute` for why one packed gather)."""
    return packed_permute(arrs, grp.tgt_idx)


def _prep_ctx(pos, h, mass, cfg: SimConfig, st: BlockStructure,
              vel=None, src=None, target_offset=0,
              sorted_io=False, u=None, matid=None, fbal=None) -> _Ctx:
    single = src is None
    need_vel = vel is not None
    tgrp = st.groups
    g = tgrp.live.shape[0]

    # optional per-particle target channels, sorted alongside the geometry
    opt = [(k, v) for k, v in (("mid", matid), ("u", u), ("fb", fbal))
           if v is not None]
    if sorted_io:
        # inputs are already in the padded sorted [G*B] layout (the cached
        # runner keeps the state Morton-sorted between rebuilds)
        t = dict(x=pos[:, 0], y=pos[:, 1], z=pos[:, 2], h=h, m=mass)
        if need_vel:
            t.update(vx=vel[:, 0], vy=vel[:, 1], vz=vel[:, 2])
        for k, v in opt:
            t[k] = v
    else:
        tf = [pos[:, 0], pos[:, 1], pos[:, 2], h, mass]
        if need_vel:
            tf += [vel[:, 0], vel[:, 1], vel[:, 2]]
        tf += [v for _, v in opt]
        tcols = _sort_set(tgrp, tf)
        t = dict(x=tcols[0], y=tcols[1], z=tcols[2], h=tcols[3], m=tcols[4])
        if need_vel:
            t.update(vx=tcols[5], vy=tcols[6], vz=tcols[7])
        base = 8 if need_vel else 5
        for i, (k, _) in enumerate(opt):
            t[k] = tcols[base + i]
    t["ih"] = 1.0 / jnp.where(t["h"] > 0, t["h"], 1.0)

    if single:
        s = dict(t)
        s["live"] = tgrp.live.reshape(-1).astype(pos.dtype)
        nb = g
    else:
        pos_s, h_s, mass_s = src[:3]
        vel_s = src[3] if len(src) > 3 else None
        sgrp = st.src_groups
        nb = sgrp.live.shape[0]
        sf = [pos_s[:, 0], pos_s[:, 1], pos_s[:, 2], h_s, mass_s]
        if vel_s is not None:
            sf += [vel_s[:, 0], vel_s[:, 1], vel_s[:, 2]]
        scols = _sort_set(sgrp, sf)
        s = dict(x=scols[0], y=scols[1], z=scols[2], h=scols[3], m=scols[4])
        if vel_s is not None:
            s.update(vx=scols[5], vy=scols[6], vz=scols[7])
        s["ih"] = 1.0 / jnp.where(s["h"] > 0, s["h"], 1.0)
        s["live"] = sgrp.live.reshape(-1).astype(pos.dtype)
    # replica/padding slots carry zero SOURCE mass: the v2 kernels have no
    # live/oid columns — a dead slot contributes 0 to every sum and self-
    # pairs are included exactly (see ops/pallas/groups2.py). The TARGET
    # mass t["m"] keeps the real value (h-solve and self-phi correction).
    s["m"] = s["m"] * s["live"]
    return _Ctx(t, s, single, g, nb)


def _to_source_layout(x, st: BlockStructure, gather_fn):
    """Target-sorted [Gt*B] -> source-sorted [NB*B] per-particle field.

    Single set: identity. Under dp: unsort to the local original order,
    all_gather over the mesh axis (`gather_fn`), re-sort by the source
    grouping."""
    if gather_fn is None:
        return x
    local = x[st.groups.unsort_idx]
    return gather_fn(local)[st.src_groups.tgt_idx]


def _window_gather(sorted_cols, idx, nb, bsz, chunk):
    """Gather per-field [G, NCHUNK*CHUNK] rows through block-id windows.

    sorted_cols: list of [NB*B] field vectors (sorted source layout).
    idx: [G, W] block ids (-1 padding). Returns one row array per field.
    One packed gather of contiguous [B*C]-float rows (2-4 KB each), then
    per-field slices — never per-particle row gathers.
    """
    c = len(sorted_cols)
    w = idx.shape[1]
    g = idx.shape[0]
    # block-major packing [NB, c*B]: fields stay lane-contiguous per block.
    # Interleaved packing (stack axis=-1) puts c in the lane dimension and
    # costs 40x in relayouts (356MB gather: 3.9s vs 90ms, microbench.py).
    packed = jnp.concatenate([x.reshape(nb, bsz) for x in sorted_cols],
                             axis=1)
    safe = jnp.clip(idx, 0, nb - 1)
    gat = packed[safe]                                  # [G, W, c*B]
    pad = _nbpad(w * bsz, chunk) - w * bsz
    return [jnp.pad(gat[:, :, k * bsz:(k + 1) * bsz].reshape(g, w * bsz),
                    ((0, 0), (0, pad)))
            for k in range(c)]


def _cols(*xs):
    return [x[:, None] for x in xs]


def _sph_nv(st: BlockStructure, cfg: SimConfig):
    """Valid pair-slot count per target group for the SPH window."""
    if cfg.sph_exact_window > 0:
        return jnp.minimum(st.n_sph, cfg.sph_exact_window)
    # capacity from the window's actual shape — the sub-block refine may
    # have truncated it below cfg.nbr_window (sph_refined_window)
    return jnp.minimum(st.n_sph, st.sph_idx.shape[1]) * cfg.nbr_sub


def _sph_rows(cols, st: BlockStructure, cfg: SimConfig, nb):
    """Gather SPH source rows through the window: contiguous sub-block
    rows (sub-granularity windows) or one packed per-particle row gather
    (exact candidate lists; measured 2.9ms for [2067,512]x6 fields —
    tools/micro_gather.py)."""
    if cfg.sph_exact_window > 0:
        return _entry_gather(cols, st.sph_idx, cfg.block_chunk,
                             pad_rows=cfg.gather_pad_rows)
    sub = cfg.nbr_sub
    return _window_gather(cols, st.sph_idx,
                          nb * (cfg.nbr_group_size // sub), sub,
                          cfg.block_chunk)


def _geom(s):
    return [s["x"], s["y"], s["z"], s["ih"], s["m"]]


def _density_sweep(ctx: _Ctx, cfg: SimConfig, st: BlockStructure,
                   t_ih=None, t_h=None, src1=None):
    """pass1 against current fields; (rho, nn[, omega]) target-sorted.

    `t_ih`/`t_h` override the target smoothing length (the Newton h-solve
    iterates h with the windows frozen — sound because the build widened
    the cutoffs by its h_margin). `src1` reuses pre-gathered geometry rows.
    """
    bsz = cfg.nbr_group_size
    chunk = cfg.block_chunk
    gradh = cfg.grad_p_mode == "grad_h"
    t, s = ctx.t, ctx.s
    tih = t["ih"] if t_ih is None else t_ih
    th = t["h"] if t_h is None else t_h
    nv = _sph_nv(st, cfg)
    if src1 is None:
        src1 = _sph_rows(_geom(s), st, cfg, ctx.nb)
    tgt1 = _cols(t["x"], t["y"], t["z"], tih)
    if gradh:
        # grad-h pass needs no source h: rows = (x, y, z, m)
        rho_c, nn_c, xi_c = gk2.pass1_gradh(
            nv, tgt1, [src1[0], src1[1], src1[2], src1[4]], b=bsz,
            chunk=chunk, gb=cfg.kernel_gb)
        rho = jnp.maximum(rho_c[:, 0], 1e-30)
        omega = 1.0 + th * xi_c[:, 0] / (3.0 * rho)
        return rho, nn_c[:, 0] - 1, omega
    rho_c, nn_c = gk2.pass1_sym(nv, tgt1, src1, b=bsz, chunk=chunk,
                                gb=cfg.kernel_gb)
    return jnp.maximum(rho_c[:, 0], 1e-30), nn_c[:, 0] - 1, None


def _entry_gather(cols, idx, chunk, pad_rows=0):
    """Per-entry (one value per window slot) gathers, padded to chunk.

    One packed [N, c] row gather — c separate element-gathers through the
    same index cost 4x more on this TPU (12.3ms vs ~3ms per step at 100k,
    xplane trace). `pad_rows`: zero-pad the packed table rows to this many
    floats before gathering — tiny rows (<=16 B) gather at a pathological
    ~30-150 M rows/s while >=128 B rows stream at HBM rate (ROUND2.md
    gotcha 6); trading bytes for row rate can win by several ms/step."""
    g, w = idx.shape
    safe = jnp.clip(idx, 0, cols[0].shape[0] - 1)
    gat = packed_permute(cols, safe, pad_to=pad_rows)   # c x [G, W]
    pad = _nbpad(w, chunk) - w
    return [jnp.pad(v, ((0, 0), (0, pad))) for v in gat]


def _gravity_sweeps(ctx: _Ctx, cfg: SimConfig, st: BlockStructure,
                    tiers: str = "all"):
    """Three-tier gravity: dense block-monopole scan (M2P, gather-free,
    current moments) + windowed sub-block-monopole ring + sub-granular P2P.

    `tiers`: 'all' (one fused launch), 'near' (P2P only — the RESPA
    inner force, skips the moment reductions and ring/far gathers
    entirely), 'far' (ring + blk + dense far scan — the RESPA outer
    force, evaluated every cfg.respa_every steps).
    """
    bsz = cfg.nbr_group_size
    sub = cfg.nbr_sub
    chunk = cfg.block_chunk
    t, s = ctx.t, ctx.s
    nb = ctx.nb
    nsub = nb * (bsz // sub)
    sgrp = st.src_groups if not ctx.single else st.groups

    if tiers == "near":
        receiver = cfg.softening_mode == "receiver_h"
        self_phi = 2.4 * cfg.g_const * t["m"] * t["ih"]
        nv_p2p = jnp.minimum(st.n_p2p, cfg.p2p_window) * sub
        srcp = _window_gather(_geom(s), st.p2p_idx, nsub, sub, chunk)
        if receiver:
            srcp = [srcp[0], srcp[1], srcp[2], srcp[4]]
        phi_c, gx, gy, gz, nd_c = gk2.p2p(
            nv_p2p, _cols(t["x"], t["y"], t["z"], t["ih"]), srcp, b=bsz,
            chunk=chunk, receiver_soft=receiver, g_const=cfg.g_const,
            bf16=cfg.grav_pair_dtype == "bfloat16", gb=cfg.kernel_gb)
        phi = phi_c[:, 0] + self_phi
        grad_phi = jnp.concatenate([gx, gy, gz], axis=-1)
        return phi, grad_phi, nd_c[:, 0] - 1, jnp.zeros_like(nd_c[:, 0])

    quad = cfg.multipole_order >= 2

    def moments(n_units, usz):
        live2 = sgrp.live.reshape(n_units, usz)
        m_live = jnp.where(live2, s["m"].reshape(n_units, usz), 0.0)
        um = jnp.sum(m_live, axis=1)                    # current moments
        inv = 1.0 / jnp.maximum(um, 1e-30)
        xs = s["x"].reshape(n_units, usz)
        ys = s["y"].reshape(n_units, usz)
        zs = s["z"].reshape(n_units, usz)
        cx = jnp.sum(m_live * xs, axis=1) * inv
        cy = jnp.sum(m_live * ys, axis=1) * inv
        cz = jnp.sum(m_live * zs, axis=1) * inv
        out = [um, cx, cy, cz]
        if quad:
            # traceless quadrupole Q_ab = sum m (3 x_a x_b - |x|^2 d_ab)
            # about the unit's own CM (GravityFieldSystem is monopole-only
            # — GenerateMomentsSTJob:489-522; this is the parity-plus tier)
            dx = xs - cx[:, None]
            dy = ys - cy[:, None]
            dz = zs - cz[:, None]
            r2 = dx * dx + dy * dy + dz * dz
            q = lambda a, b, diag: jnp.sum(
                m_live * (3.0 * a * b - (r2 if diag else 0.0)), axis=1)
            out += [q(dx, dx, True), q(dx, dy, False), q(dx, dz, False),
                    q(dy, dy, True), q(dy, dz, False), q(dz, dz, True)]
        return out

    bf16 = cfg.grav_pair_dtype == "bfloat16"
    receiver = cfg.softening_mode == "receiver_h"
    self_phi = 2.4 * cfg.g_const * t["m"] * t["ih"]

    bmom = moments(nb, bsz)
    bmass, cmx, cmy, cmz = bmom[:4]
    npad = st.accept.shape[1]

    # ---- ONE fused launch: P2P + ring (+ blk ring) + dense far scan ----
    # far tier: dense scan over block (or supergroup) moments under the
    # frozen mask; with sg_blocks on, blocks whose supergroup failed the
    # MAC but that pass it themselves come in as windowed blk entries
    nv_blk = blk_rows = None
    if cfg.sg_blocks > 1:
        sgf = cfg.sg_blocks
        nsg = -(-nb // sgf)
        padb = nsg * sgf - nb
        p1 = lambda v: jnp.pad(v, (0, padb)).reshape(nsg, sgf)
        bm_p = p1(bmass)
        sgm = jnp.sum(bm_p, axis=1)
        inv = 1.0 / jnp.maximum(sgm, 1e-30)
        wsum = lambda v: jnp.sum(bm_p * p1(v), axis=1) * inv
        far = [sgm, wsum(cmx), wsum(cmy), wsum(cmz)]
        if quad:
            # parallel-axis aggregation: Q_sg = sum_b [Q_b
            #   + m_b (3 y y^T - |y|^2 I)], y = cm_b - cm_sg
            yx = p1(cmx) - far[1][:, None]
            yy = p1(cmy) - far[2][:, None]
            yz = p1(cmz) - far[3][:, None]
            y2 = yx * yx + yy * yy + yz * yz
            pq = lambda qb, a, b2, diag: jnp.sum(
                p1(qb) + bm_p * (3.0 * a * b2 - (y2 if diag else 0.0)),
                axis=1)
            far += [pq(bmom[4], yx, yx, True), pq(bmom[5], yx, yy, False),
                    pq(bmom[6], yx, yz, False), pq(bmom[7], yy, yy, True),
                    pq(bmom[8], yy, yz, False), pq(bmom[9], yz, yz, True)]
        nfar = nsg
        blk_rows = _entry_gather(bmom, st.blk_idx,
                                 chunk, pad_rows=cfg.gather_pad_rows)
        nv_blk = jnp.minimum(st.n_blk, cfg.blk_window)
    else:
        far = bmom
        nfar = nb
    far_rows = [jnp.pad(v, (0, npad - nfar))[None, :] for v in far]

    # ring tier: windowed sub-block moments (current moments).
    ring_rows = _entry_gather(moments(nsub, sub), st.m2p_idx,
                              chunk, pad_rows=cfg.gather_pad_rows)
    nv_ring = jnp.minimum(st.n_m2p, cfg.m2p_window)

    if tiers == "far":
        phi_c, gx, gy, gz, _, na_c = gk2.gravity_fused(
            None, nv_ring, _cols(t["x"], t["y"], t["z"], t["ih"]),
            None, ring_rows, far_rows, st.accept, b=bsz, chunk=chunk,
            receiver_soft=receiver, g_const=cfg.g_const, bf16=bf16,
            nv_blk=nv_blk, blk_rows=blk_rows, has_p2p=False)
        grad_phi = jnp.concatenate([gx, gy, gz], axis=-1)
        return (phi_c[:, 0], grad_phi,
                jnp.zeros_like(na_c[:, 0]), na_c[:, 0])

    # near tier: particle-particle over sub-block windows. The kernel
    # includes the self pair (dx=0 kills the force; the Dyer-Ip inner
    # branch adds the finite self potential -2.4 m_i/a_i at x=0, and the
    # self pair lands in n_direct) — both corrected analytically here.
    nv_p2p = jnp.minimum(st.n_p2p, cfg.p2p_window) * sub
    srcp = _window_gather(_geom(s), st.p2p_idx, nsub, sub, chunk)
    if receiver:
        srcp = [srcp[0], srcp[1], srcp[2], srcp[4]]

    phi_c, gx, gy, gz, nd_c, na_c = gk2.gravity_fused(
        nv_p2p, nv_ring, _cols(t["x"], t["y"], t["z"], t["ih"]),
        srcp, ring_rows, far_rows, st.accept, b=bsz, chunk=chunk,
        receiver_soft=receiver, g_const=cfg.g_const, bf16=bf16,
        nv_blk=nv_blk, blk_rows=blk_rows)
    phi = phi_c[:, 0] + self_phi
    grad_phi = jnp.concatenate([gx, gy, gz], axis=-1)
    return phi, grad_phi, nd_c[:, 0] - 1, na_c[:, 0]


def _unsort(st: BlockStructure, fields):
    """Sorted [G*B] fields back to original order, as a list.

    One packed row gather through the grouping's inverse permutation
    (:func:`packed_permute`; a packed-column scatter costs ~10x more).
    Vector fields ([G*B, k]) come back as [N, k]; int fields round-trip
    through f32 (the < 2^24 contract)."""
    return packed_permute(fields, st.groups.unsort_idx)


def forces(pos, h, mass, cfg: SimConfig, st: BlockStructure, vel=None,
           u=None, src=None, target_offset=0, gather_fn=None,
           sorted_io=False, matid=None, fbal=None,
           grav_tiers: str = "all") -> BlockForces:
    """Full field evaluation against current fields.

    The reference's whole system chain (density -> EOS -> grad P [-> AV]
    + tree gravity) in four Pallas sweeps: pass1 (+grad-h), pass2 (AV
    fused), M2P (gather-free), P2P.

    `src`/`target_offset`/`gather_fn`: data-parallel mode — targets are the
    local shard, `src` = (pos, h, mass[, vel]) is the all-gathered global
    set, and `gather_fn` all-gathers a local per-particle field to the
    global set (needed to feed source densities/pressures to pass 2).

    `u` (cfg.eos_mode='adiabatic'): specific internal energy of the TARGET
    set — feeds the ideal-gas pressure and the AV sound speed, and turns
    on the conjugate energy-equation accumulator in the pass-2 sweep
    (du_dt in the result; see ops/dense.pass2 for the pairwise forms).

    `sorted_io`: inputs are already in the padded sorted [G*B] layout and
    outputs are returned in it (the cached runner keeps the whole state
    Morton-sorted between rebuilds so no per-step sort/unsort is paid).
    """
    n = pos.shape[0]
    bsz = cfg.nbr_group_size
    chunk = cfg.block_chunk
    do_grav = cfg.gravity_solver == "tree"
    gradh = cfg.grad_p_mode == "grad_h"
    av = cfg.av_alpha > 0.0
    balsara = cfg.av_balsara and av
    energy = cfg.evolves_u
    if av and vel is None:
        raise ValueError("artificial viscosity needs velocities; pass vel=")
    if energy and (u is None or vel is None):
        raise ValueError("the adiabatic energy equation needs u and vel")
    if energy and cfg.grad_p_mode == "reference_asymmetric":
        raise ValueError("eos_mode='adiabatic' needs a momentum-conserving "
                         "pressure form (see ops/dense.pass2)")
    # sorted_io composes with src=: targets arrive (and outputs stay) in
    # the target-sorted padded layout while sources are still gathered and
    # sorted by the source grouping each call (the dp sorted-chunk path —
    # parallel/dp.py keeps the LOCAL shard sorted between rebuilds).

    ctx = _prep_ctx(pos, h, mass, cfg, st, vel=vel if av or energy else None,
                    src=src, target_offset=target_offset,
                    sorted_io=sorted_io, u=u, matid=matid,
                    fbal=fbal if balsara else None)
    t, s = ctx.t, ctx.s

    # gather the geometry channels ONCE; pass 1 and pass 2 reuse the same
    # row arrays (the P2P sweep gathers via its own windows)
    geom_rows = _sph_rows(_geom(s), st, cfg, ctx.nb)

    # ---- pass 1: density (+ grad-h Omega) ----
    rho_t, nn_t, omega = _density_sweep(ctx, cfg, st, src1=geom_rows)
    prs_t = eos_ops.pressure_cfg(rho_t, cfg, u=t.get("u"), matid=t.get("mid"))

    # ---- pass 2: pressure gradient (+ fused AV) ----
    # Per-particle coefficients are precomputed so the kernel sees ONE
    # extra field per side; the target-side rho scale is applied after the
    # sweep (self-pairs contribute 0 to every gradient sum: dx = 0).
    to_src = lambda x: _to_source_layout(x, st, gather_fn)
    nv = _sph_nv(st, cfg)
    tgt2 = _cols(t["x"], t["y"], t["z"], t["ih"])
    # Fully-dead groups (empty Morton cells) sit at the rho floor, where
    # rho^2 underflows f32 and P/rho^2 is 0/0 = NaN. The sub-window sweep
    # never evaluates those rows (0 trips at nv=0), but the exact-list
    # single-trip sweep always does, and 0-mass x NaN-coef = NaN poisons
    # the whole state on the next step. Zero the coefficient there.
    rho_ok = rho_t > 1e-20
    if gradh:
        om_safe = jnp.maximum(omega, 0.1)   # robustness floor (see dense.py)
        coef_t = jnp.where(rho_ok, prs_t / (om_safe * rho_t * rho_t), 0.0)
        tgt2 += _cols(coef_t)
        cc = coef_t
        p_scale = rho_t
    elif cfg.grad_p_mode == "reference_asymmetric":
        cc = prs_t / rho_t
        p_scale = None
    else:
        coef_t = jnp.where(rho_ok, prs_t / (rho_t * rho_t), 0.0)
        tgt2 += _cols(coef_t)
        cc = coef_t
        p_scale = rho_t
    s_extra = [to_src(cc)]
    if av:
        cs_t = eos_ops.sound_speed_cfg(rho_t, cfg, u=t.get("u"),
                                       matid=t.get("mid"))
        tgt2 += _cols(t["vx"], t["vy"], t["vz"], t["h"], cs_t, rho_t)
        s_extra += [s["vx"], s["vy"], s["vz"], s["h"], to_src(cs_t),
                    to_src(rho_t)]
        if balsara:
            fb_t = t.get("fb")
            if fb_t is None:
                fb_t = jnp.ones_like(rho_t)
            tgt2 += _cols(fb_t)
            s_extra += [to_src(fb_t)]
    elif energy:
        # energy equation without AV still needs pairwise velocities
        tgt2 += _cols(t["vx"], t["vy"], t["vz"])
        s_extra += [s["vx"], s["vy"], s["vz"]]
    extra_rows = _sph_rows(s_extra, st, cfg, ctx.nb)
    fused = do_grav and grav_tiers != "far" and fuse_active(cfg)
    receiver = cfg.softening_mode == "receiver_h"
    # residual-P2P merge (cfg.fuse_p2p_residual): the non-SPH near
    # window is swept inside THIS launch too — one launch fewer on the
    # per-step path (see the SimConfig field doc for the measured
    # fixed-cost rationale)
    merged = fused and cfg.fuse_p2p_residual
    p2p_kw = {}
    if merged:
        sub = cfg.nbr_sub
        nsub = ctx.nb * (bsz // sub)
        srcp = _window_gather(_geom(ctx.s), st.p2p_idx, nsub, sub, chunk)
        if receiver:
            srcp = [srcp[0], srcp[1], srcp[2], srcp[4]]
        p2p_kw = dict(nv_p2p=jnp.minimum(st.n_p2p, cfg.p2p_window) * sub,
                      p2p_rows=srcp)
    outs = gk2.pass2(
        nv, tgt2, geom_rows + extra_rows, b=bsz, chunk=chunk,
        mode=cfg.grad_p_mode, av=av, energy=energy, balsara=balsara,
        sign_bug=cfg.kernel_deriv_sign_bug, av_alpha=cfg.av_alpha,
        av_beta=cfg.av_beta, gb=cfg.kernel_gb, grav=fused,
        receiver_soft=receiver, g_const=cfg.g_const, **p2p_kw)
    grad_p_t = jnp.concatenate(outs[:3], axis=-1)           # [Gt*B, 3]
    if p_scale is not None:
        grad_p_t = grad_p_t * p_scale[:, None]
    if av:
        # the AV term always carries the target rho scale (all modes)
        grad_p_t = grad_p_t + jnp.concatenate(outs[3:6], axis=-1) \
            * rho_t[:, None]
    fb_next_t = None
    if balsara:
        from . import dense as dense_ops
        dc_t = jnp.concatenate(outs[6:10], axis=-1)          # [Gt*B, 4]
        fb_next_t = dense_ops.balsara_factor(dc_t, cs_t, rho_t, t["h"])
    n_base = (3 + (3 if av else 0) + (4 if balsara else 0)
              + (1 if energy else 0))
    du_t = outs[n_base - 1][:, 0] if energy else jnp.zeros_like(rho_t)

    # ---- gravity ----
    if do_grav:
        if merged:
            # the pass-2 launch already swept BOTH near windows (SPH +
            # residual p2p); only the far tiers (ring + dense scan) come
            # from _gravity_sweeps, and only on far-cadence steps
            self_phi = 2.4 * cfg.g_const * t["m"] * t["ih"]
            if grav_tiers == "near":
                phi_t = self_phi
                grad_phi_t = jnp.zeros_like(grad_p_t)
                na_t = jnp.zeros_like(nn_t)
            else:
                phi_f, grad_f, _, na_t = _gravity_sweeps(ctx, cfg, st,
                                                         tiers="far")
                phi_t = phi_f + self_phi
                grad_phi_t = grad_f
            # self corrections as in the unmerged fused path: +self_phi
            # offsets the Dyer-Ip self potential the SPH rows include,
            # -1 the self pair in n_direct
            nd_t = -jnp.ones_like(nn_t)
        else:
            phi_t, grad_phi_t, nd_t, na_t = _gravity_sweeps(
                ctx, cfg, st, tiers=grav_tiers)
        if fused:
            # fused near-field part from the pass-2 sweep: the tier
            # sweep's +2.4 G m/h self correction exactly offsets the
            # Dyer-Ip self potential included here, and its nd - 1
            # offsets the included self pair — no further correction
            phi_t = phi_t + outs[n_base][:, 0]
            grad_phi_t = grad_phi_t + jnp.concatenate(
                outs[n_base + 1:n_base + 4], axis=-1)
            nd_t = nd_t + outs[n_base + 4][:, 0]
    else:
        phi_t = jnp.zeros_like(rho_t)
        grad_phi_t = jnp.zeros_like(grad_p_t)
        nd_t = jnp.zeros_like(nn_t)
        na_t = jnp.zeros_like(nn_t)

    if sorted_io:
        return BlockForces(
            rho=rho_t, pressure=prs_t, grad_p=grad_p_t, phi=phi_t,
            grad_phi=grad_phi_t, n_neighbors=nn_t, n_direct=nd_t,
            n_approx=na_t, du_dt=du_t, balsara=fb_next_t)
    fields = [rho_t, prs_t, grad_p_t, phi_t, grad_phi_t, nn_t, nd_t,
              na_t, du_t] + ([fb_next_t] if fb_next_t is not None else [])
    out = _unsort(st, fields)
    (rho_o, prs_o, gp_o, phi_o, gphi_o, nn_o, nd_o, na_o, du_o) = out[:9]
    return BlockForces(
        rho=rho_o, pressure=prs_o, grad_p=gp_o, phi=phi_o, grad_phi=gphi_o,
        n_neighbors=nn_o, n_direct=nd_o, n_approx=na_o, du_dt=du_o,
        balsara=out[9] if fb_next_t is not None else None)


def gravity(pos, h, mass, cfg: SimConfig, st: BlockStructure,
            src=None, target_offset=0):
    """Tree gravity only: (phi, grad_phi, n_direct, n_approx) in original
    order — the ``GravityFieldSystem`` stand-alone path (used when SPH runs
    on the dense pipeline but gravity uses the block tree, e.g. the parity
    preset)."""
    n = pos.shape[0]
    ctx = _prep_ctx(pos, h, mass, cfg, st, src=src,
                    target_offset=target_offset)
    phi_t, grad_phi_t, nd_t, na_t = _gravity_sweeps(ctx, cfg, st)
    return tuple(_unsort(st, [phi_t, grad_phi_t, nd_t, na_t]))


def gravity_far(pos, h, mass, cfg: SimConfig, st: BlockStructure,
                sorted_io=False, src=None, target_offset=0):
    """Far-tier tree gravity only (ring sub-block monopoles + dense
    block/supergroup scan): (phi_far, grad_phi_far, n_approx).

    The RESPA outer force (SimConfig.respa_every): evaluated once per
    outer period from CURRENT positions (fresh moments — the
    GenerateMomentsSTJob parity property holds at the outer cadence),
    applied as half-period velocity impulses around the inner near-field
    steps. `sorted_io`: inputs/outputs stay in the padded sorted layout
    (the cached runner's chunk format). `src`: dp mode — targets are the
    local shard, `src` = (pos, h, mass) the all-gathered global set (the
    moments then sum over the GLOBAL source blocks)."""
    ctx = _prep_ctx(pos, h, mass, cfg, st, sorted_io=sorted_io, src=src,
                    target_offset=target_offset)
    phi_t, grad_phi_t, _, na_t = _gravity_sweeps(ctx, cfg, st, tiers="far")
    if sorted_io:
        return phi_t, grad_phi_t, na_t
    return tuple(_unsort(st, [phi_t, grad_phi_t, na_t]))


def solve_h_newton(pos, h, mass, cfg: SimConfig, eta: float,
                   src=None, target_offset=0, groups=None, rho0=None):
    """Fixed-point solve of h = eta (m/rho(h))^(1/3) on the block pipeline.

    Builds a throwaway structure whose cutoffs are widened by the clamp
    margin, then iterates the gather-form density with h clamped to
    [h/(1+c), h*(1+c)] (c = cfg.h_newton_clamp) so the smoothing length can
    never outgrow the widened windows. Returns the new h in original order.

    Window capacities are scaled by the margin's volume factor (1+c)^3 so
    the widened adjacency never silently outgrows them, and when the main
    pipeline runs exact candidate lists the solve refines its own margin-
    valid exact lists too: the h_newton_iters density sweeps then run
    ~3x fewer pair slots each, amortizing the one extra filter pass
    (measured ~38 ms -> ~20 ms per rebuild at the settled 100k point).
    """
    c = cfg.h_newton_clamp
    if cfg.h_max > 0.0:
        h = jnp.minimum(h, cfg.h_max)   # halo cap (see SimConfig.h_max)
    if rho0 is not None:
        # Warm start from the state's density (up to rebuild_every steps
        # stale): one fixed-point iteration BEFORE the throwaway build, so
        # the build sees tighter cutoffs, and one fewer in-solve sweep
        # (`iters` below). NOTE the bound change: the warm step moves h by
        # up to (1+c) and the solve clamp re-anchors at the warm h, so one
        # call can move h by up to (1+c)^2 of the incoming value. Window
        # validity is unaffected (the build runs on the warm h with
        # h_margin=c); callers needing the single-(1+c) bound per rebuild
        # should pass rho0=None.
        hw = eta * jnp.cbrt(mass / jnp.maximum(rho0, 1e-30))
        h = jnp.clip(hw, h / (1.0 + c), h * (1.0 + c))
        if cfg.h_max > 0.0:
            h = jnp.minimum(h, cfg.h_max)
    factor = (1.0 + c) ** 3
    scale = lambda w, q: int(-(-int(w * factor) // q) * q)
    wx = 0
    if cfg.sph_exact_window > 0:
        wx = cfg.h_solve_window or scale(cfg.sph_exact_window,
                                         cfg.block_chunk)
    # throwaway structure: skip the gravity partition; margin-scaled
    # capacities keep the widened adjacency overflow-free
    cfg = cfg.replace(sph_exact_window=wx,
                      nbr_window=scale(cfg.nbr_window, 16),
                      sph_refined_window=(scale(cfg.sph_refined_window, 16)
                                          if cfg.sph_refined_window else 0))
    st = build(pos, h, mass, cfg, src=src, target_offset=target_offset,
               h_margin=c, groups=groups, sph_only=True)
    ctx = _prep_ctx(pos, h, mass, cfg, st, src=src,
                    target_offset=target_offset)
    h0 = ctx.t["h"]
    lo, hi = h0 / (1.0 + c), h0 * (1.0 + c)
    if cfg.h_max > 0.0:
        hi = jnp.minimum(hi, cfg.h_max)
    h_t = h0
    m_t = ctx.t["m"]
    rows = _sph_rows(_geom(ctx.s), st, cfg, ctx.nb)
    # the warm start IS one fixed-point iteration: keep the total count
    iters = max(1, cfg.h_newton_iters - (1 if rho0 is not None else 0))
    for _ in range(iters):
        ih = 1.0 / jnp.where(h_t > 0, h_t, 1.0)
        rho_t, _, _ = _density_sweep(ctx, cfg, st, t_ih=ih, t_h=h_t,
                                     src1=rows)
        h_t = jnp.clip(eta * jnp.cbrt(m_t / rho_t), lo, hi)
    # every original particle has exactly one live slot, so the inverse-
    # permutation gather covers all of them
    return _unsort(st, [h_t])[0]


def overflow_info(st: BlockStructure):
    """Structure overflow counters (the 'dropped AND counted' contract)."""
    return {"nbr_overflow": st.sph_overflow,
            "tree_overflow": (st.p2p_overflow + st.m2p_overflow
                              + st.blk_overflow)}

"""Morton-group neighbor search for SPH (the broadphase replacement at scale).

The reference finds SPH pairs by hijacking Unity.Physics' broadphase: every
particle is a trigger sphere collider of radius kappa*h, the engine builds a
4-wide BVH over the AABBs each step, and a PostBroadphase callback filters
the overlap stream through ``SplineKernel.Interacts``
(``KernelSystem.cs:97-229``, ``Broadphase.cs:743-761``).

TPU-native replacement — **group adjacency over cell-bounded Morton blocks**:

1. Sort particles by Morton code and split into blocks of ``nbr_group_size``
   that never cross a level-lg octree cell (ops/grouping.py — this bounds
   every block's AABB, which a plain fixed-stride split would not).
2. Compute the [G, G] group-AABB adjacency under the pair cutoff
   kappa*max(h_i, h_j) (+ 2*skin when Verlet-cached) — the
   ``SplineKernel.Interacts`` predicate lifted conservatively to groups.
3. Compact each adjacency row to a fixed window of source-group indices
   ([G, W], overflow counted). Candidate gathering is then *contiguous
   block* gathers (whole groups), which TPUs do at full HBM bandwidth —
   never per-element index gathers.
4. Evaluate SPH sums on dense [B, W*B] tiles with exact per-pair masking
   (W(r,h) = 0 outside support does the fine filtering, like the
   reference's ``CalculateInteractionJob`` kernel evaluation). Self pairs
   are excluded by original-index comparison; duplicate padding slots are
   masked as sources via the grouping's `live` mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import grouping, kernels
from .dense import Pass1Out


class GroupLists(NamedTuple):
    groups: grouping.Groups  # cell-bounded grouping (frozen at build)
    src_idx: jax.Array       # [G,W]  adjacent source-group ids (-1 padded)
    n_src: jax.Array         # [G]    adjacency row sizes (may exceed W)
    overflow: jax.Array      # []     total adjacency entries dropped


def build(pos, h, cfg: SimConfig, skin=0.0) -> GroupLists:
    """Adjacency structure for the current positions/smoothing lengths.

    `skin`: the cutoff is widened by 2*skin so the lists stay valid while
    every particle moves less than `skin` (Verlet-list margin; smoothing
    lengths must be frozen between rebuilds, which the model guarantees
    when rebuild caching is on).
    """
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    grp = grouping.cell_groups(pos, lo, hi, cfg.nbr_group_size,
                               cfg.nbr_group_level)
    g, b = grp.live.shape
    w = cfg.nbr_window

    pos_s = pos[grp.tgt_idx].reshape(g, b, 3)
    h_s = h[grp.tgt_idx].reshape(g, b)
    # duplicates replicate real members, so min/max over the block is the
    # true bbox; fully-dead groups get a degenerate box at some particle
    glo = jnp.min(pos_s, axis=1)                 # [G,3]
    ghi = jnp.max(pos_s, axis=1)
    ghmax = jnp.max(jnp.where(grp.live, h_s, 0.0), axis=1)

    # box-to-box gap per group pair, cutoff = kappa * max(h) over both groups
    gap = jnp.maximum(
        jnp.maximum(glo[:, None, :] - ghi[None, :, :],
                    glo[None, :, :] - ghi[:, None, :]), 0.0)  # [G,G,3]
    dist2 = jnp.sum(gap * gap, axis=-1)
    cut = (cfg.kappa * jnp.maximum(ghmax[:, None], ghmax[None, :])
           + 2.0 * skin)
    gvalid = jnp.any(grp.live, axis=1)
    adj = (dist2 < cut * cut) & gvalid[:, None] & gvalid[None, :]

    # compact each row to [W] source-group ids
    inc = jnp.cumsum(adj, axis=1) - adj
    posns = jnp.where(adj, inc, w).astype(jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None, :], (g, g))
    src_idx = jax.vmap(
        lambda p, c: jnp.full((w,), -1, jnp.int32).at[p].set(
            c, mode="drop")
    )(posns, cols)
    n_src = jnp.sum(adj, axis=1).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(n_src - w, 0))
    return GroupLists(grp, src_idx, n_src, overflow)


def _gather_blocks(x_sorted_groups, src_idx):
    """x [G,B,...] gathered by [G,W] group ids -> [G,W,B,...] (block rows)."""
    safe = jnp.clip(src_idx, 0, x_sorted_groups.shape[0] - 1)
    return x_sorted_groups[safe]


def make_passes(pos, h, mass, cfg: SimConfig, lists: GroupLists = None):
    """Grid-mode pass1/pass2 with the dense-pass interface.

    Returns (Pass1Out, grad_p_fn) where Pass1Out carries zero gravity fields
    (long-range gravity is the tree's job at grid scales — enforced in
    config) and grad_p_fn(rho, pressure, cfg) -> [N,3].

    `lists`: optionally a prebuilt (possibly skin-cached) GroupLists; the
    frozen grouping inside it is used, so it stays valid as particles move
    within the skin.
    """
    if cfg.gravity_solver == "direct":
        raise ValueError(
            "neighbor_mode='grid' computes short-range pairs only; use "
            "gravity_solver='tree' (or 'none') at grid scales.")

    n = pos.shape[0]
    if lists is None:
        lists = build(pos, h, cfg)
    grp = lists.groups
    g, b = grp.live.shape
    w = cfg.nbr_window
    gb = g * b

    oid = grp.tgt_idx.reshape(g, b)              # original index per slot
    live = grp.live
    pos_s = pos[grp.tgt_idx].reshape(g, b, 3)
    h_s = h[grp.tgt_idx].reshape(g, b)
    mass_s = mass[grp.tgt_idx].reshape(g, b)

    # pack per-particle fields into one block row so candidate gathering is
    # a single contiguous block gather: [G,B,8] = x,y,z,h,mass,oid,live,pad
    fdt = pos.dtype
    packed = jnp.concatenate([
        pos_s, h_s[..., None], mass_s[..., None],
        oid.astype(fdt)[..., None], live.astype(fdt)[..., None],
        jnp.zeros((g, b, 1), fdt),
    ], axis=-1)
    src = _gather_blocks(packed, lists.src_idx).reshape(g, w * b, 8)
    src_pos = src[:, :, :3]
    src_h = src[:, :, 3]
    src_mass = src[:, :, 4]
    src_oid = src[:, :, 5].astype(jnp.int32)
    src_live = src[:, :, 6] > 0.5
    src_ok = src_live & ((lists.src_idx >= 0)[:, :, None]
                         & jnp.ones((1, 1, b), bool)).reshape(g, w * b)

    def pass1():
        def per_group(p_t, h_t, m_t, oid_t, p_s, h_sv, m_s, oid_s, ok_s):
            dx = p_t[:, None, :] - p_s[None, :, :]       # [B, W*B, 3]
            r2 = jnp.sum(dx * dx, axis=-1)
            r = jnp.sqrt(r2)
            pair = ok_s[None, :] & (oid_t[:, None] != oid_s[None, :])
            w_i = kernels.w(r, h_t[:, None])
            w_j = kernels.w(r, h_sv[None, :])
            w_sym = 0.5 * (w_i + w_j)
            m_eff = jnp.where(pair, m_s[None, :], 0.0)
            rho = m_t * kernels.w0(h_t) + jnp.sum(m_eff * w_sym, axis=-1)
            nn = jnp.sum((w_i > 0.0) & pair, axis=-1).astype(jnp.int32)
            return rho, nn

        rho_g, nn_g = jax.vmap(per_group)(
            pos_s, h_s, mass_s, oid, src_pos, src_h, src_mass,
            src_oid, src_ok)
        # unsort; duplicate target slots write identical values, dead slots
        # scatter out of bounds and drop
        rho = jnp.zeros((n,), pos.dtype).at[grp.scatter_to].set(
            rho_g.reshape(gb), mode="drop")
        nn = jnp.zeros((n,), jnp.int32).at[grp.scatter_to].set(
            nn_g.reshape(gb), mode="drop")
        z1 = jnp.zeros((n,), pos.dtype)
        z3 = jnp.zeros((n, 3), pos.dtype)
        zi = jnp.zeros((n,), jnp.int32)
        return Pass1Out(rho, nn, z1, z3, zi)

    def pass1_gradh():
        """Gather-form density + grad-h Omega factor (see dense.density_gradh)."""
        def per_group(p_t, h_t, m_t, oid_t, p_s, h_sv, m_s, oid_s, ok_s):
            dx = p_t[:, None, :] - p_s[None, :, :]
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            pair = ok_s[None, :] & (oid_t[:, None] != oid_s[None, :])
            m_eff = jnp.where(pair, m_s[None, :], 0.0)
            w_i = kernels.w(r, h_t[:, None])
            rho = m_t * kernels.w0(h_t) + jnp.sum(m_eff * w_i, axis=-1)
            xi = (-3.0 * m_t * kernels.w0(h_t) / h_t
                  + jnp.sum(m_eff * kernels.dw_dh(r, h_t[:, None]), axis=-1))
            omega = 1.0 + h_t * xi / (3.0 * rho)
            nn = jnp.sum((w_i > 0.0) & pair, axis=-1).astype(jnp.int32)
            return rho, omega, nn

        rho_g, om_g, nn_g = jax.vmap(per_group)(
            pos_s, h_s, mass_s, oid, src_pos, src_h, src_mass,
            src_oid, src_ok)
        rho = jnp.zeros((n,), pos.dtype).at[grp.scatter_to].set(
            rho_g.reshape(gb), mode="drop")
        omega = jnp.ones((n,), pos.dtype).at[grp.scatter_to].set(
            om_g.reshape(gb), mode="drop")
        nn = jnp.zeros((n,), jnp.int32).at[grp.scatter_to].set(
            nn_g.reshape(gb), mode="drop")
        return rho, omega, nn

    def grad_p_fn_gradh(rho, omega, pressure, cfg2: SimConfig):
        """Grad-h pairwise force (see dense.pass2_gradh); effective grad P."""
        om_safe = jnp.maximum(omega, 0.1)
        coef = pressure / (om_safe * rho * rho)    # P/(Omega rho^2), [N]
        rho_s = rho[grp.tgt_idx].reshape(g, b)
        coef_s = coef[grp.tgt_idx].reshape(g, b)
        src_coef = _gather_blocks(coef_s, lists.src_idx).reshape(g, w * b)
        sign_bug = cfg2.kernel_deriv_sign_bug

        def per_group(p_t, h_t, oid_t, rho_t, coef_t,
                      p_s, h_sv, m_s, oid_s, ok_s, coef_sv):
            dx = p_t[:, None, :] - p_s[None, :, :]
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            pair = ok_s[None, :] & (oid_t[:, None] != oid_s[None, :])
            m_eff = jnp.where(pair, m_s[None, :], 0.0)
            gw_i = kernels.dw_dr_over_r(r, h_t[:, None], sign_bug)
            gw_j = kernels.dw_dr_over_r(r, h_sv[None, :], sign_bug)
            radial = m_eff * (coef_t[:, None] * gw_i
                              + coef_sv[None, :] * gw_j)
            accel = -jnp.sum(dx * radial[..., None], axis=-2)
            return -rho_t[:, None] * accel         # effective grad P

        gp_g = jax.vmap(per_group)(
            pos_s, h_s, oid, rho_s, coef_s,
            src_pos, src_h, src_mass, src_oid, src_ok, src_coef)
        return jnp.zeros((n, 3), pos.dtype).at[grp.scatter_to].set(
            gp_g.reshape(gb, 3), mode="drop")

    def grad_p_fn(rho, pressure, cfg2: SimConfig):
        rho_s = rho[grp.tgt_idx].reshape(g, b)
        prs_s = pressure[grp.tgt_idx].reshape(g, b)
        packed2 = jnp.stack([rho_s, prs_s], axis=-1)        # [G,B,2]
        src2 = _gather_blocks(packed2, lists.src_idx).reshape(g, w * b, 2)
        src_rho = src2[:, :, 0]
        src_prs = src2[:, :, 1]
        sign_bug = cfg2.kernel_deriv_sign_bug

        def per_group(p_t, h_t, oid_t, rho_t, prs_t,
                      p_s, h_sv, m_s, oid_s, ok_s, rho_sv, prs_sv):
            dx = p_t[:, None, :] - p_s[None, :, :]
            r2 = jnp.sum(dx * dx, axis=-1)
            r = jnp.sqrt(r2)
            pair = ok_s[None, :] & (oid_t[:, None] != oid_s[None, :])
            gw_i = kernels.dw_dr_over_r(r, h_t[:, None], sign_bug)
            gw_j = kernels.dw_dr_over_r(r, h_sv[None, :], sign_bug)
            gsym = 0.5 * (gw_i + gw_j)
            m_eff = jnp.where(pair, m_s[None, :], 0.0)
            rho_sv_safe = jnp.where(rho_sv > 0, rho_sv, 1.0)
            if cfg2.grad_p_mode == "reference_asymmetric":
                coef = m_eff * (prs_sv / rho_sv_safe)[None, :]
            else:
                coef = m_eff * (
                    (prs_t / (rho_t * rho_t))[:, None]
                    + (prs_sv / (rho_sv_safe * rho_sv_safe))[None, :]
                ) * rho_t[:, None]
            return jnp.sum(dx * (gsym * coef)[..., None], axis=-2)

        gp_g = jax.vmap(per_group)(
            pos_s, h_s, oid, rho_s, prs_s,
            src_pos, src_h, src_mass, src_oid, src_ok, src_rho, src_prs)
        return jnp.zeros((n, 3), pos.dtype).at[grp.scatter_to].set(
            gp_g.reshape(gb, 3), mode="drop")

    if cfg.grad_p_mode == "grad_h":
        return pass1_gradh(), grad_p_fn_gradh
    return pass1(), grad_p_fn

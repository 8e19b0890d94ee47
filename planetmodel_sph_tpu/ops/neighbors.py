"""Morton-group neighbor search for SPH (the broadphase replacement at scale).

The reference finds SPH pairs by hijacking Unity.Physics' broadphase: every
particle is a trigger sphere collider of radius kappa*h, the engine builds a
4-wide BVH over the AABBs each step, and a PostBroadphase callback filters
the overlap stream through ``SplineKernel.Interacts``
(``KernelSystem.cs:97-229``, ``Broadphase.cs:743-761``).

TPU-native replacement — **group adjacency over Morton-sorted blocks**:

1. Sort particles by Morton code; split the sorted order into contiguous
   groups of ``nbr_group_size`` (B). Morton order makes groups spatially
   compact, so a group AABB is tight (this is exactly what the reference's
   BVH leaves achieve, without pointers).
2. Compute the [G, G] group-AABB adjacency under the pair cutoff
   2*max(h_i, h_j) (the ``SplineKernel.Interacts`` predicate lifted to
   groups, conservatively: box distance < 2*max over both groups' h).
3. Compact each adjacency row to a fixed window of source-group indices
   ([G, W], overflow counted). Candidate gathering is then *contiguous
   block* gathers (whole 32-particle groups), which TPUs do at full HBM
   bandwidth — never per-element index gathers.
4. Evaluate SPH sums on dense [B, W*B] tiles with exact per-pair masking
   (W(r,h) = 0 outside support does the fine filtering, like the
   reference's ``CalculateInteractionJob`` kernel evaluation).

Self-pairs are excluded by sorted-index comparison; padded slots carry
mass 0 and are additionally masked. Everything is static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import kernels, morton
from .dense import Pass1Out


class GroupLists(NamedTuple):
    order: jax.Array      # [Np]   sorted-particle -> original index (padded)
    src_idx: jax.Array    # [G,W]  adjacent source-group ids (-1 padded)
    n_src: jax.Array      # [G]    adjacency row sizes (may exceed W)
    overflow: jax.Array   # []     total adjacency entries dropped


def _sort_pad(pos, h, cfg: SimConfig):
    n = pos.shape[0]
    b = cfg.nbr_group_size
    g = -(-n // b)
    n_pad = g * b
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    code = morton.encode(pos, lo, hi)
    order = jnp.argsort(code).astype(jnp.int32)
    order_pad = jnp.pad(order, (0, n_pad - n), mode="edge")
    return order_pad, g, b, n_pad


def build(pos, h, cfg: SimConfig) -> GroupLists:
    """Adjacency structure for the current positions/smoothing lengths."""
    n = pos.shape[0]
    order_pad, g, b, n_pad = _sort_pad(pos, h, cfg)
    w = cfg.nbr_window

    pos_s = pos[order_pad].reshape(g, b, 3)
    h_s = h[order_pad].reshape(g, b)
    glo = jnp.min(pos_s, axis=1)                 # [G,3]
    ghi = jnp.max(pos_s, axis=1)
    ghmax = jnp.max(h_s, axis=1)                 # [G]

    # box-to-box gap per group pair, cutoff = kappa * max(h) over both groups
    gap = jnp.maximum(
        jnp.maximum(glo[:, None, :] - ghi[None, :, :],
                    glo[None, :, :] - ghi[:, None, :]), 0.0)  # [G,G,3]
    dist2 = jnp.sum(gap * gap, axis=-1)
    cut = cfg.kappa * jnp.maximum(ghmax[:, None], ghmax[None, :])
    adj = dist2 < cut * cut                      # [G,G] (includes self)

    # compact each row to [W] source-group ids
    inc = jnp.cumsum(adj, axis=1) - adj
    posns = jnp.where(adj, inc, w).astype(jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None, :], (g, g))
    src_idx = jnp.full((g, w), -1, jnp.int32)
    src_idx = jax.vmap(
        lambda p, c: jnp.full((w,), -1, jnp.int32).at[p].set(
            c, mode="drop", indices_are_sorted=True, unique_indices=True)
    )(posns, cols)
    n_src = jnp.sum(adj, axis=1).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(n_src - w, 0))
    return GroupLists(order_pad, src_idx, n_src, overflow)


def _gather_blocks(x_sorted_groups, src_idx):
    """x [G,B,...] gathered by [G,W] group ids -> [G,W,B,...] (block rows)."""
    safe = jnp.clip(src_idx, 0, x_sorted_groups.shape[0] - 1)
    return x_sorted_groups[safe]


def make_passes(pos, h, mass, cfg: SimConfig):
    """Grid-mode pass1/pass2 with the dense-pass interface.

    Returns (Pass1Out, grad_p_fn) where Pass1Out carries zero gravity fields
    (long-range gravity is the tree's job at grid scales — enforced in
    config) and grad_p_fn(rho, pressure, cfg) -> [N,3].
    """
    if cfg.gravity_solver == "direct":
        raise ValueError(
            "neighbor_mode='grid' computes short-range pairs only; use "
            "gravity_solver='tree' (or 'none') at grid scales.")

    n = pos.shape[0]
    lists = build(pos, h, cfg)
    order = lists.order
    g = lists.src_idx.shape[0]
    b = cfg.nbr_group_size
    w = cfg.nbr_window
    n_pad = g * b

    pos_s = pos[order].reshape(g, b, 3)
    h_s = h[order].reshape(g, b)
    mass_s = mass[order].reshape(g, b)
    # global sorted slot id; padded tail slots replicate real particles, so
    # mask them out as sources via slot >= n and as self via slot equality
    slot = jnp.arange(n_pad, dtype=jnp.int32).reshape(g, b)
    live = (slot < n)
    # scatter target: original index for real rows, out-of-bounds for pads
    _scatter_idx = jnp.where(slot.reshape(n_pad) < n,
                             order.astype(jnp.int32), n)

    src_pos = _gather_blocks(pos_s, lists.src_idx).reshape(g, w * b, 3)
    src_h = _gather_blocks(h_s, lists.src_idx).reshape(g, w * b)
    src_mass = _gather_blocks(mass_s, lists.src_idx).reshape(g, w * b)
    src_slot = (lists.src_idx[:, :, None] * b
                + jnp.arange(b, dtype=jnp.int32)[None, None, :]
                ).reshape(g, w * b)
    src_ok = ((lists.src_idx >= 0)[:, :, None]
              & jnp.ones((1, 1, b), bool)).reshape(g, w * b)
    src_ok = src_ok & (src_slot < n) & (src_slot >= 0)

    # original (unsorted) index of every source slot, for buffer parity
    def pass1():
        def per_group(p_t, h_t, m_t, slot_t, live_t, p_s, h_sv, m_s,
                      slot_s, ok_s):
            dx = p_t[:, None, :] - p_s[None, :, :]       # [B, W*B, 3]
            r2 = jnp.sum(dx * dx, axis=-1)
            r = jnp.sqrt(r2)
            pair = ok_s[None, :] & (slot_t[:, None] != slot_s[None, :])
            w_i = kernels.w(r, h_t[:, None])
            w_j = kernels.w(r, h_sv[None, :])
            w_sym = 0.5 * (w_i + w_j)
            m_eff = jnp.where(pair, m_s[None, :], 0.0)
            rho = m_t * kernels.w0(h_t) + jnp.sum(m_eff * w_sym, axis=-1)
            nn = jnp.sum((w_i > 0.0) & pair, axis=-1).astype(jnp.int32)
            return rho, nn

        rho_g, nn_g = jax.vmap(per_group)(
            pos_s, h_s, mass_s, slot, live, src_pos, src_h, src_mass,
            src_slot, src_ok)
        # unsort; padded duplicate targets (their results include a spurious
        # self-pair) are routed out of bounds and dropped
        rho = jnp.zeros((n,), pos.dtype).at[_scatter_idx].set(
            rho_g.reshape(n_pad), mode="drop")
        nn = jnp.zeros((n,), jnp.int32).at[_scatter_idx].set(
            nn_g.reshape(n_pad), mode="drop")
        z1 = jnp.zeros((n,), pos.dtype)
        z3 = jnp.zeros((n, 3), pos.dtype)
        zi = jnp.zeros((n,), jnp.int32)
        return Pass1Out(rho, nn, z1, z3, zi)

    def grad_p_fn(rho, pressure, cfg2: SimConfig):
        rho_s = rho[order].reshape(g, b)
        prs_s = pressure[order].reshape(g, b)
        src_rho = _gather_blocks(rho_s, lists.src_idx).reshape(g, w * b)
        src_prs = _gather_blocks(prs_s, lists.src_idx).reshape(g, w * b)
        sign_bug = cfg2.kernel_deriv_sign_bug

        def per_group(p_t, h_t, slot_t, rho_t, prs_t,
                      p_s, h_sv, m_s, slot_s, ok_s, rho_sv, prs_sv):
            dx = p_t[:, None, :] - p_s[None, :, :]
            r2 = jnp.sum(dx * dx, axis=-1)
            r = jnp.sqrt(r2)
            pair = ok_s[None, :] & (slot_t[:, None] != slot_s[None, :])
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
            pos_s, h_s, slot, rho_s, prs_s,
            src_pos, src_h, src_mass, src_slot, src_ok, src_rho, src_prs)
        return jnp.zeros((n, 3), pos.dtype).at[_scatter_idx].set(
            gp_g.reshape(n_pad, 3), mode="drop")

    return pass1(), grad_p_fn

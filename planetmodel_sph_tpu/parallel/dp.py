"""Data-parallel simulation step over a device mesh (shard_map + collectives).

Design (SURVEY.md §2c "TPU-native equivalent"): particles are sharded over a
1-D ``dp`` mesh axis. Each step:

1. every shard ``all_gather``s the source fields it needs (positions,
   smoothing lengths, masses — and densities/pressures for pass 2) over ICI;
2. each device runs the *same* blocked pairwise passes as the single-chip
   path (``ops.dense``) with its local shard as targets and the gathered
   global set as sources (``target_offset`` keeps self-pair masking correct);
3. integration and the adaptive-h update are purely local (elementwise).

At the target scale (100k particles, f32) a full gather is ~1.2 MB/field —
negligible against ICI bandwidth — so this "replicated sources, sharded
targets" layout beats any halo-exchange scheme until the particle count is
orders of magnitude larger. Gravity needs globally gathered sources anyway.

The same function compiles single-chip (mesh of 1) and multi-chip; the
driver validates it on a virtual 8-device CPU mesh (see
``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import SimConfig
from ..models import planet
from ..ops import dense, eos as eos_ops
from .mesh import DP_AXIS


def _dp_forces(cfg: SimConfig, axis: str, st=None):
    """Forces closure running inside shard_map: local targets, global sources.

    Covers the full feature matrix: symmetric / reference-asymmetric /
    grad-h pressure, fused artificial viscosity, and direct or block-tree
    gravity — on either the dense target/source passes (small N) or the
    block pipeline (neighbor_mode='grid': sharded target groups over
    all-gathered global source blocks, no dense fallback in the traced
    program). `st`: grid mode only — evaluate against this FROZEN
    structure instead of building one per step (the Verlet-cached dp
    span; sources are still re-gathered and re-sorted by the frozen
    grouping every step).
    """
    if st is not None and cfg.neighbor_mode != "grid":
        raise ValueError("frozen structures are a grid-mode optimization")

    def forces(pos, h, mass, vel=None, u=None, matid=None, fbal=None):
        local_n = pos.shape[0]
        off = jax.lax.axis_index(axis) * local_n
        gather = lambda x: jax.lax.all_gather(x, axis, tiled=True)
        av = cfg.av_alpha > 0.0
        balsara = cfg.av_balsara and av and vel is not None
        energy = cfg.evolves_u
        pos_g, h_g, mass_g = gather(pos), gather(h), gather(mass)
        src3 = (pos_g, h_g, mass_g)

        if cfg.neighbor_mode == "grid":
            from ..ops import structure
            need_vel = (av or energy) and vel is not None
            src = src3 + ((gather(vel),) if need_vel else ())
            st_ = st if st is not None else structure.build(
                pos, h, mass, cfg, src=src3, target_offset=off)
            bf = structure.forces(pos, h, mass, cfg, st_,
                                  vel=vel if need_vel else None, u=u,
                                  matid=matid, fbal=fbal,
                                  src=src, target_offset=off,
                                  gather_fn=gather)
            grad_phi = planet.com_correct(bf.grad_phi, mass, cfg, axis=axis)
            bf = bf._replace(grad_phi=grad_phi)
            accel = -bf.grad_p / bf.rho[:, None] - bf.grad_phi
            # surface the per-build counters only when the structure was
            # built HERE (per-step path); a frozen cached structure is
            # accounted once at its rebuild by _local_run_cached
            ov = structure.overflow_info(st_) if st is None else None
            return planet.Forces(bf.rho, bf.pressure, bf.grad_p, bf.phi,
                                 bf.grad_phi, bf.n_neighbors, bf.n_direct,
                                 bf.n_approx, accel, h, bf.du_dt,
                                 bf.balsara, ov)

        av_extra = None
        du_dt = None
        f_next = None
        mkw = {} if matid is None else \
            {"matid": matid, "matid_src": gather(matid)}
        if balsara:
            fb = fbal if fbal is not None else jnp.ones_like(h)
            mkw.update(fbal=fb, fbal_src=gather(fb))
        if cfg.grad_p_mode == "grad_h":
            rho, omega, nn = dense.density_gradh(pos, h, mass, cfg,
                                                 src=src3, target_offset=off)
            prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
            om_safe = jnp.maximum(omega, 0.1)
            coef = prs / (om_safe * jnp.where(rho > 0, rho, 1.0) ** 2)
            p2 = dense.pass2_gradh(
                pos, h, mass, rho, omega, prs, cfg,
                src=src3 + (gather(coef),), target_offset=off,
                energy=energy, vel=vel,
                vel_src=gather(vel) if energy else None)
            grad_p, du_dt = p2 if energy else (p2, None)
            if av:
                va = dense.viscosity_accel(
                    pos, vel, h, mass, rho, cfg,
                    src=(pos_g, gather(vel), h_g, mass_g, gather(rho)),
                    target_offset=off, energy=energy, u=u,
                    u_src=gather(u) if energy else None, **mkw)
                if not isinstance(va, tuple):
                    va = (va,)
                av_extra = va[0]
                if energy:
                    du_dt = du_dt + va[1]
                if balsara:
                    cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
                    f_next = dense.balsara_factor(va[-1], cs, rho, h)
        else:
            p1 = dense.pass1(pos, h, mass, cfg, src=src3, target_offset=off)
            rho, nn = p1.rho, p1.n_neighbors
            prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
            src5 = src3 + (gather(rho), gather(prs))
            if (av or energy) and vel is not None:
                src5 = src5 + (gather(vel),)
            p2 = dense.pass2(pos, h, mass, rho, prs, cfg, src=src5,
                             target_offset=off, vel=vel, energy=energy,
                             u=u, u_src=gather(u) if energy else None,
                             **mkw)
            if not isinstance(p2, tuple):
                p2 = (p2,)
            grad_p = p2[0]
            du_dt = p2[1] if energy else None
            if balsara:
                cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
                f_next = dense.balsara_factor(p2[-1], cs, rho, h)

        ov = None
        if cfg.gravity_solver == "tree":
            from ..ops import structure
            st_g = structure.build(pos, h, mass, cfg, src=src3,
                                   target_offset=off)
            ov = structure.overflow_info(st_g)
            phi, grad_phi, n_direct, n_approx = structure.gravity(
                pos, h, mass, cfg, st_g, src=src3, target_offset=off)
        elif cfg.gravity_solver == "direct" and cfg.grad_p_mode != "grad_h":
            phi, grad_phi, n_direct = p1.phi, p1.grad_phi, p1.n_direct
            n_approx = jnp.zeros_like(n_direct)
        elif cfg.gravity_solver == "direct":
            g1 = dense.pass1(pos, h, mass, cfg, src=src3, target_offset=off,
                             sph=False)
            phi, grad_phi, n_direct = g1.phi, g1.grad_phi, g1.n_direct
            n_approx = jnp.zeros_like(n_direct)
        else:
            phi = jnp.zeros_like(rho)
            grad_phi = jnp.zeros_like(pos)
            n_direct = jnp.zeros_like(nn)
            n_approx = jnp.zeros_like(nn)

        grad_phi = planet.com_correct(grad_phi, mass, cfg, axis=axis)
        accel = -grad_p / rho[:, None] - grad_phi
        if av_extra is not None:
            accel = accel + av_extra
        if du_dt is None:
            du_dt = jnp.zeros_like(rho)
        return planet.Forces(rho, prs, grad_p, phi, grad_phi, nn,
                             n_direct, n_approx, accel, h, du_dt, f_next,
                             ov)

    return forces


def make_step(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted sharded step: ParticleState (axis-0 sharded) -> ParticleState."""

    def local_step(state):
        return planet.step(state, cfg, forces_fn=_dp_forces(cfg, axis),
                           axis=axis)

    # check_vma=False: Pallas kernels (the block pipeline) don't annotate
    # varying-mesh-axes on their outputs yet
    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=P(axis), out_specs=P(axis),
                        check_vma=False)
    return jax.jit(sharded)


def make_run(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted n-step scan of the sharded step (n_steps static)."""

    def run(state, n_steps):
        f = shard_map(partial(local_run_steps, cfg=cfg, axis=axis,
                              n_steps=n_steps), mesh=mesh,
                      in_specs=P(axis), out_specs=P(axis), check_vma=False)
        return f(state)

    return jax.jit(run, static_argnames=("n_steps",))


def make_run_diag(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted (state, n_chunks, chunk) -> (state, stacked diagnostics).

    The whole dp run is ONE dispatch: an outer in-graph scan alternates
    shard_map'd step chunks with global diagnostics reductions (GSPMD
    partitions the reductions; no per-chunk Python re-dispatch — the
    in-graph analog of ``planet.run_with_diagnostics`` for the dp path)."""
    from ..utils import diagnostics

    def run(state, n_chunks, chunk):
        zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
                "tree_overflow": jnp.asarray(0, jnp.int32)}
        inner = shard_map(partial(local_run_steps_info, cfg=cfg, axis=axis,
                                  n_steps=chunk), mesh=mesh,
                          in_specs=P(axis),
                          out_specs=(P(axis), jax.tree.map(lambda _: P(),
                                                           zero)),
                          check_vma=False)

        def outer(s, _):
            s, info = inner(s)
            d = diagnostics.measure(s, cfg)
            d.update(info)
            return s, d

        return jax.lax.scan(outer, state, None, length=n_chunks)

    return jax.jit(run, static_argnames=("n_chunks", "chunk"))


def local_run_steps(state, *, cfg, axis, n_steps):
    if cfg.rebuild_every > 1 and cfg.neighbor_mode == "grid":
        return _local_run_cached(state, cfg=cfg, axis=axis,
                                 n_steps=n_steps)[0]

    def body(s, _):
        return planet.step(s, cfg, forces_fn=_dp_forces(cfg, axis),
                           axis=axis), None
    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def surfaces_overflow(cfg: SimConfig) -> bool:
    """Whether the dp runner reports real overflow counters.

    True for EVERY path that builds capacity-bounded structures: the
    Verlet-cached grid path accounts per rebuild, and the per-step paths
    thread the counters out of the forces closure via ``Forces.overflow``
    (psum'd over the mesh axis). Dense-neighbor + direct-gravity configs
    build no bounded structure — nothing can be dropped, so their zeros
    are genuinely exhaustive. There is no silent path left."""
    return True


def local_run_steps_info(state, *, cfg, axis, n_steps):
    """(state, overflow info) — info is psum'd over the mesh axis so the
    'dropped AND counted, never silent' contract holds on every dp path:
    the cached path sums per-rebuild counters, the per-step path sums the
    counters threaded through Forces.overflow each step."""
    zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}
    if cfg.rebuild_every > 1 and cfg.neighbor_mode == "grid":
        out, info = _local_run_cached(state, cfg=cfg, axis=axis,
                                      n_steps=n_steps)
        info = {k: jax.lax.psum(v, axis) for k, v in info.items()}
        return out, info

    def body(carry, _):
        s, acc = carry
        s, i = planet.step(s, cfg, forces_fn=_dp_forces(cfg, axis),
                           axis=axis, return_info=True)
        return (s, jax.tree.map(jnp.add, acc, i)), None
    (out, info), _ = jax.lax.scan(body, (state, zero), None,
                                  length=n_steps)
    info = {k: jax.lax.psum(v, axis) for k, v in info.items()}
    return out, info


def _local_run_cached(state, *, cfg, axis, n_steps):
    """Verlet-cached dp span: rebuild windows every cfg.rebuild_every
    steps (h update + skinned structure over all-gathered sources), run
    the steps in between against the frozen structure — the dp analog of
    planet.run_chunk_cached. Source motion is covered by all-gathering
    the per-particle skins into the build (skin_src)."""
    from ..ops import structure

    k = max(1, cfg.rebuild_every)
    n_chunks, rem = divmod(n_steps, k)

    def run_chunk(s, kk):
        local_n = s.pos.shape[0]
        off = jax.lax.axis_index(axis) * local_n
        gather = lambda x: jax.lax.all_gather(x, axis, tiled=True)
        if cfg.adaptive_h:
            if cfg.h_mode == "newton" and cfg.grad_p_mode == "grad_h":
                src3 = (gather(s.pos), gather(s.h), gather(s.mass))
                h = structure.solve_h_newton(s.pos, s.h, s.mass, cfg,
                                             planet.h_eta(cfg), src=src3,
                                             target_offset=off, rho0=s.rho)
            else:
                h = planet.update_h(s.h, s.n_neighbors, cfg)
            s = s.replace(h=h)
        skin = planet._skin(cfg, s.vel, s.accel)
        skin = jnp.broadcast_to(jnp.asarray(skin, s.pos.dtype),
                                (local_n,))
        src3 = (gather(s.pos), gather(s.h), gather(s.mass))
        st = structure.build(s.pos, s.h, s.mass, cfg, skin=skin,
                             src=src3, target_offset=off,
                             skin_src=gather(skin),
                             h_margin=cfg.h_track_margin)
        forces_fn = _dp_forces(cfg, axis, st=st)
        # per-step h tracking through the chunk (see SimConfig.
        # h_track_margin and planet.run_chunk_cached) — same clamp
        # around the chunk-boundary Newton solution
        if planet._h_tracking(cfg):
            eta = planet.h_eta(cfg)
            t_lo = s.h / (1.0 + cfg.h_track_margin)
            t_hi = s.h * (1.0 + cfg.h_track_margin)
            if cfg.h_max > 0.0:
                t_hi = jnp.minimum(t_hi, cfg.h_max)
            tracked = lambda s2: s2.replace(h=jnp.clip(
                eta * jnp.cbrt(s2.mass / jnp.maximum(s2.rho, 1e-30)),
                t_lo, t_hi))
        else:
            tracked = lambda s2: s2
        if cfg.integrator == "staggered_euler":
            one = lambda s2: planet.step_staggered(s2, cfg, forces_fn,
                                                   update_smoothing=False,
                                                   axis=axis)
        else:
            one = lambda s2: planet.step_kdk(s2, cfg, forces_fn,
                                             update_smoothing=False,
                                             axis=axis)

        def body(s2, _):
            return one(tracked(s2)), None

        out, _ = jax.lax.scan(body, s, None, length=kk)
        return out, structure.overflow_info(st)

    add = lambda a, b: jax.tree.map(jnp.add, a, b)
    info = {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}
    out = state
    if n_chunks:
        def outer(carry, _):
            s, acc = carry
            s, i = run_chunk(s, k)
            return (s, add(acc, i)), None
        (out, info), _ = jax.lax.scan(outer, (out, info), None,
                                      length=n_chunks)
    if rem:
        out, i = run_chunk(out, rem)
        info = add(info, i)
    return out, info


def make_prime(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    def local_prime(state):
        return planet.prime(state, cfg, forces_fn=_dp_forces(cfg, axis))
    return jax.jit(shard_map(local_prime, mesh=mesh,
                             in_specs=P(axis), out_specs=P(axis),
                             check_vma=False))

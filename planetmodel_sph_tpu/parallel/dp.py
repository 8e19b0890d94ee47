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


def _dp_forces(cfg: SimConfig, axis: str):
    """Forces closure running inside shard_map: local targets, global sources.

    Covers the full feature matrix: symmetric / reference-asymmetric /
    grad-h pressure, fused artificial viscosity, and direct or block-tree
    gravity — on either the dense target/source passes (small N) or the
    block pipeline (neighbor_mode='grid': sharded target groups over
    all-gathered global source blocks, no dense fallback in the traced
    program). This is the PER-STEP path (fresh structure each step); the
    Verlet-cached production path lives in :func:`run_chunk_cached`.
    """

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
            st_ = structure.build(pos, h, mass, cfg, src=src3,
                                  target_offset=off)
            bf = structure.forces(pos, h, mass, cfg, st_,
                                  vel=vel if need_vel else None, u=u,
                                  matid=matid, fbal=fbal,
                                  src=src, target_offset=off,
                                  gather_fn=gather)
            grad_phi = planet.com_correct(bf.grad_phi, mass, cfg, axis=axis)
            bf = bf._replace(grad_phi=grad_phi)
            accel = -bf.grad_p / bf.rho[:, None] - bf.grad_phi
            ov = structure.overflow_info(st_)
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


def make_run_info(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    """Jitted n-step scan returning (state, overflow info) — the dp
    mirror of ``planet.run_info`` (same loud-overflow contract)."""
    zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}

    def run(state, n_steps):
        f = shard_map(partial(local_run_steps_info, cfg=cfg, axis=axis,
                              n_steps=n_steps), mesh=mesh,
                      in_specs=P(axis),
                      out_specs=(P(axis),
                                 jax.tree.map(lambda _: P(), zero)),
                      check_vma=False)
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


def _unsort_geom(grp, pos, h, vel=None):
    """Sorted-layout local (pos, h[, vel]) back to original shard order
    (one packed row gather) — the per-step source fields the other shards
    need are all_gathered in ORIGINAL order so the frozen source grouping's
    global indexing stays valid."""
    from ..ops.structure import packed_permute
    arrs = [pos, h] + ([vel] if vel is not None else [])
    out = packed_permute(arrs, grp.unsort_idx, pad_to=32)
    return (out[0], out[1], out[2] if vel is not None else None)


def run_chunk_cached(s, cfg: SimConfig, axis: str, kk: int,
                     groups=None, return_groups=False,
                     collect=None, far_hook=None, target_offset=None):
    """One Verlet-cached dp chunk with the FULL production stack — the dp
    mirror of ``planet.run_chunk_cached`` (VERDICT r3 weak #3: the dp
    runner used to step at full force rate in unsorted layout, so a
    second chip ran a ~30% slower formulation than the single-chip
    42 steps/s stack):

    - chunk-boundary Newton h-solve (grad-h) or relaxation over
      all-gathered sources, warm-started from the state's density;
    - ONE skinned structure build per chunk (``skin_src`` covers source
      motion; ``sort_every`` reuses the frozen (target, source) Morton
      groupings across chunks via `groups`);
    - ``cfg.sorted_chunks``: the LOCAL shard state stays in the padded
      target-sorted layout for the whole chunk (one 13-field permute in,
      one out; per-step target sorts/unsorts eliminated). Sources are
      still re-gathered from current positions every step — they are
      unsorted back to shard order first so the all_gather matches the
      source grouping's global indexing;
    - per-step h tracking between rebuilds (``h_track_margin``);
    - impulse-RESPA multirate far field (``respa_every``): ring + dense
      far tiers evaluated once per period from current (gathered)
      positions, applied as half-period kicks around near-field-only
      (SPH + P2P) inner KDK steps.

    `collect`/`far_hook`/`target_offset` adapt the same chunk runner to
    the halo layout (parallel/halo.py): `collect` replaces the full
    all_gather with the ring ppermute collection, `target_offset` is 0
    (targets lead the collected set), and `far_hook(pos_t, h_t, pos_o,
    h_o) -> (phi, grad_phi, n_far)` adds the non-ring chunked-moment far
    field — folded into every full force evaluation, and under RESPA
    into the outer far force only (so the moment all_gather also drops
    to the outer cadence).
    """
    from ..ops import structure

    local_n = s.pos.shape[0]
    gather = lambda x: jax.lax.all_gather(x, axis, tiled=True)
    if collect is None:
        collect = gather
    off = (jax.lax.axis_index(axis) * local_n
           if target_offset is None else target_offset)
    av = cfg.av_alpha > 0.0
    energy = cfg.evolves_u
    need_vel = av or energy

    # ---- chunk boundary: h update ----
    if cfg.adaptive_h:
        if cfg.h_mode == "newton" and cfg.grad_p_mode == "grad_h":
            src3 = (collect(s.pos), collect(s.h), collect(s.mass))
            h = structure.solve_h_newton(s.pos, s.h, s.mass, cfg,
                                         planet.h_eta(cfg), src=src3,
                                         target_offset=off, rho0=s.rho,
                                         groups=groups)
        else:
            h = planet.update_h(s.h, s.n_neighbors, cfg)
        s = s.replace(h=h)

    # ---- one skinned build per chunk ----
    skin = planet._skin(cfg, s.vel, s.accel)
    skin = jnp.broadcast_to(jnp.asarray(skin, s.pos.dtype), (local_n,))
    mass_c = collect(s.mass)         # static through the chunk
    src3 = (collect(s.pos), collect(s.h), mass_c)
    st = structure.build(s.pos, s.h, s.mass, cfg, skin=skin,
                         src=src3, target_offset=off,
                         skin_src=collect(skin),
                         h_margin=cfg.h_track_margin, groups=groups)
    info = structure.overflow_info(st)

    sorted_chunk = cfg.sorted_chunks and cfg.neighbor_mode == "grid"
    if sorted_chunk:
        grp = st.groups
        run_state = planet._permute_state(s, grp.tgt_idx)
        live_w = grp.live.reshape(-1).astype(s.pos.dtype)
    else:
        run_state = s
        live_w = 1.0

    def current_orig(pos, hh, vel):
        """Current (pos, h[, vel]) back in original shard order."""
        if sorted_chunk:
            return _unsort_geom(grp, pos, hh, vel if need_vel else None)
        return pos, hh, vel if need_vel else None

    def current_src(pos_o, h_o, vel_o):
        """Collected (pos, h, mass[, vel]) of the CURRENT step."""
        base = (collect(pos_o), collect(h_o), mass_c)
        if need_vel and vel_o is not None:
            return base + (collect(vel_o),)
        return base

    def make_forces(tiers):
        def forces_fn(pos, hh, mm, vel=None, u=None, matid=None,
                      fbal=None):
            pos_o, h_o, vel_o = current_orig(pos, hh, vel)
            src = current_src(pos_o, h_o, vel_o)
            bf = structure.forces(pos, hh, mm, cfg, st,
                                  vel=vel if need_vel else None, u=u,
                                  matid=matid, fbal=fbal, src=src,
                                  target_offset=off, gather_fn=collect,
                                  sorted_io=sorted_chunk,
                                  grav_tiers=tiers)
            phi, grad_phi, n_approx = bf.phi, bf.grad_phi, bf.n_approx
            if far_hook is not None and tiers == "all":
                phi_f, gphi_f, n_far = far_hook(pos, hh, pos_o, h_o)
                phi = phi + phi_f
                grad_phi = grad_phi + gphi_f
                n_approx = n_approx + n_far
            grad_phi = planet.com_correct(grad_phi, mm * live_w, cfg,
                                          axis=axis)
            accel = -bf.grad_p / bf.rho[:, None] - grad_phi
            return planet.Forces(bf.rho, bf.pressure, bf.grad_p, phi,
                                 grad_phi, bf.n_neighbors, bf.n_direct,
                                 n_approx, accel, hh, bf.du_dt,
                                 bf.balsara, None)
        return forces_fn

    forces_fn = make_forces("all")

    # ---- per-step h tracking (see SimConfig.h_track_margin) ----
    if planet._h_tracking(cfg):
        eta = planet.h_eta(cfg)
        h_rb = run_state.h
        t_lo = h_rb / (1.0 + cfg.h_track_margin)
        t_hi = h_rb * (1.0 + cfg.h_track_margin)
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

    respa = (cfg.respa_every > 1 and cfg.gravity_solver == "tree"
             and cfg.neighbor_mode == "grid"
             and cfg.integrator != "staggered_euler"
             and cfg.dt_mode == "fixed" and not cfg.freeze_velocity)
    if cfg.respa_every > 1 and not respa:
        raise ValueError(
            "respa_every > 1 needs the cached grid+tree KDK pipeline "
            "with fixed dt (got neighbor_mode=%r gravity_solver=%r "
            "integrator=%r dt_mode=%r)" % (
                cfg.neighbor_mode, cfg.gravity_solver, cfg.integrator,
                cfg.dt_mode))
    respa = respa and kk % cfg.respa_every == 0
    if respa:
        m = cfg.respa_every
        dt = cfg.dt
        mass_r = run_state.mass

        def far_eval(s2):
            pos_o, h_o, _ = current_orig(s2.pos, s2.h, None)
            src3f = current_src(pos_o, h_o, None)[:3]
            phi_f, gphi_f, na_f = structure.gravity_far(
                s2.pos, s2.h, mass_r, cfg, st, sorted_io=sorted_chunk,
                src=src3f, target_offset=off)
            if far_hook is not None:
                p2, g2, n2 = far_hook(s2.pos, s2.h, pos_o, h_o)
                phi_f = phi_f + p2
                gphi_f = gphi_f + g2
                na_f = na_f + n2
            gphi_f = planet.com_correct(gphi_f, mass_r * live_w, cfg,
                                        axis=axis)
            return phi_f, gphi_f, na_f

        one_near = lambda s2: planet.step_kdk(s2, cfg,
                                              make_forces("near"),
                                              update_smoothing=False,
                                              axis=axis)

        phi0, gphi0, na0 = far_eval(run_state)
        run2 = run_state.replace(accel=run_state.accel + gphi0)

        def inner(s2, _):
            return one_near(tracked(s2)), None

        def outer(carry, _):
            s2, gphi_f, _, _ = carry
            s2 = s2.replace(vel=s2.vel - (0.5 * m * dt) * gphi_f)
            s2, _ = jax.lax.scan(inner, s2, None, length=m)
            phi_f, gphi2, na_f = far_eval(s2)
            s2 = s2.replace(vel=s2.vel - (0.5 * m * dt) * gphi2)
            return (s2, gphi2, phi_f, na_f), None

        (out, gphi_l, phi_l, na_l), _ = jax.lax.scan(
            outer, (run2, gphi0, phi0, na0), None, length=kk // m)
        out = out.replace(accel=out.accel - gphi_l,
                          grad_phi=out.grad_phi + gphi_l,
                          phi=out.phi + phi_l,
                          n_approx=na_l)
    else:
        def body(s2, _):
            return one(tracked(s2)), None

        out, _ = jax.lax.scan(body, run_state, None, length=kk)
    if sorted_chunk:
        out = planet._permute_state(out, grp.unsort_idx)
    if return_groups:
        return out, info, (st.groups, st.src_groups)
    return out, info


def _local_run_cached(state, *, cfg, axis, n_steps,
                      chunk_fn=None, zero=None):
    """Verlet-cached dp span with static control flow: windows rebuilt
    every rebuild_every steps, the Morton sort/groupings (target AND
    all-gathered source) redone only every sort_every steps — the dp
    mirror of ``planet._run_cached_span``. Returns (state, summed info).

    `chunk_fn`/`zero` let the halo runner reuse the same span scaffolding
    with its own chunk function and info keys."""
    add = lambda a, b: jax.tree.map(jnp.add, a, b)
    run_chunk = chunk_fn or run_chunk_cached
    zero = zero or {"nbr_overflow": jnp.asarray(0, jnp.int32),
                    "tree_overflow": jnp.asarray(0, jnp.int32)}
    k = max(1, cfg.rebuild_every)
    n_outer, rem = divmod(n_steps, k)
    s_chunks = 1
    if cfg.sort_every:
        s_chunks = max(1, cfg.sort_every // k)
    n_per, rem_chunks = divmod(n_outer, s_chunks)

    def period(carry, _):
        s, acc = carry
        s, i, grps = run_chunk(s, cfg, axis, k, return_groups=True)
        acc = add(acc, i)
        if s_chunks > 1:
            def cb(c2, _):
                s2, a2 = c2
                s2, i2 = run_chunk(s2, cfg, axis, k, groups=grps)
                return (s2, add(a2, i2)), None
            (s, acc), _ = jax.lax.scan(cb, (s, acc), None,
                                       length=s_chunks - 1)
        return (s, acc), None

    info = zero
    out = state
    if n_per:
        (out, info), _ = jax.lax.scan(period, (out, zero), None,
                                      length=n_per)
    if rem_chunks:
        def body_c(carry, _):
            s, acc = carry
            s2, i2 = run_chunk(s, cfg, axis, k)
            return (s2, add(acc, i2)), None
        (out, info), _ = jax.lax.scan(body_c, (out, info), None,
                                      length=rem_chunks)
    if rem:
        out, i = run_chunk(out, cfg, axis, rem)
        info = add(info, i)
    return out, info


def make_prime(cfg: SimConfig, mesh: Mesh, axis: str = DP_AXIS):
    def local_prime(state):
        return planet.prime(state, cfg, forces_fn=_dp_forces(cfg, axis))
    return jax.jit(shard_map(local_prime, mesh=mesh,
                             in_specs=P(axis), out_specs=P(axis),
                             check_vma=False))

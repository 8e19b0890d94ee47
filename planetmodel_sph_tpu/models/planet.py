"""The flagship model: a self-gravitating gas planet stepped under lax.scan.

One :func:`step` here is the TPU-native equivalent of the reference's entire
``FixedStepSimulationSystemGroup`` pass (SURVEY.md §3.2): smoothing update →
neighbor kernels → gravity → position integration → density → EOS → pressure
gradient → velocity update. The ECS job DAG collapses into a single jitted
function; XLA's dataflow replaces every ``JobHandle``/``IPhysicsSystem``
handshake (``IPhysicsSystem.cs:6-11``).

Two integrators:

- ``staggered_euler`` — behavioral parity with the reference: forces are
  evaluated at x_n, then x_{n+1} = x_n + v_n dt (``Integrator.cs:98-101``),
  then v_{n+1} = v_n + a(x_n) dt (``VelocitySystem.cs:28-34``).
- ``leapfrog_kdk`` — second-order kick-drift-kick with one force evaluation
  per step (the BASELINE.json north-star default).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState
from ..ops import dense, eos as eos_ops


class Forces(NamedTuple):
    rho: jax.Array
    pressure: jax.Array
    grad_p: jax.Array
    phi: jax.Array
    grad_phi: jax.Array
    n_neighbors: jax.Array
    n_direct: jax.Array
    n_approx: jax.Array
    accel: jax.Array
    h: jax.Array      # smoothing length actually used (the Newton h-solve
                      # refines it inside the force evaluation)
    du_dt: jax.Array  # specific-internal-energy rate (zeros unless
                      # cfg.eos_mode='adiabatic')
    balsara: jax.Array = None   # next-step Balsara AV-limiter factor
                                # (None unless cfg.av_balsara with AV on)
    overflow: dict = None       # structure overflow counters from any
                                # structure built INSIDE the force
                                # evaluation (grid mode / tree gravity),
                                # so per-step paths can surface them
                                # ('dropped AND counted, never silent');
                                # None when no capacity-bounded structure
                                # was built (dense + direct cannot drop)


def update_h(h, n_neighbors, cfg: SimConfig):
    """Adaptive smoothing-length relaxation (``ParticleSmoothingSystem.cs:46-59``).

    h <- h * 0.5 * (1 + (target/N)^(1/3)); unchanged when N = 0.
    Uses the neighbor count recorded during the *previous* step's kernel
    evaluation, exactly as the reference reads last frame's buffers.
    """
    if not cfg.adaptive_h:
        return h
    nn = n_neighbors.astype(h.dtype)
    ratio = jnp.cbrt(cfg.target_neighbors / jnp.where(nn > 0, nn, 1.0))
    h_next = h * 0.5 * (1.0 + ratio)
    h_next = jnp.where(n_neighbors > 0, h_next, h)
    if cfg.h_max > 0.0:
        h_next = jnp.minimum(h_next, cfg.h_max)
    return h_next


def current_dt(state: ParticleState, cfg: SimConfig, axis=None):
    """The timestep the next step will take (traced scalar).

    dt_mode='fixed': cfg.dt (the reference's constant 50 Hz step).
    dt_mode='cfl'  : Courant + force criteria from the state's last-step
    fields — dt = C * min_i( h_i/(c_i+|v_i|), sqrt(h_i/|a_i|) ), clipped to
    [cfg.dt_min, cfg.dt]. Dead/padded particles (rho=0) are excluded.

    `axis`: mesh axis name when called inside shard_map (dp) — the min is
    then pmin-reduced so every shard integrates with the SAME global dt
    (a per-shard local min would silently desynchronize the shards).
    """
    if cfg.dt_mode == "fixed":
        return jnp.asarray(cfg.dt, state.pos.dtype)
    live = state.mass > 0.0
    cs = eos_ops.sound_speed_cfg(
        jnp.maximum(state.rho, 1e-30), cfg,
        u=state.u if cfg.evolves_u else None,
        matid=state.matid if cfg.eos_mode == "tillotson" else None)
    v = jnp.sqrt(jnp.sum(state.vel * state.vel, axis=-1))
    a = jnp.sqrt(jnp.sum(state.accel * state.accel, axis=-1))
    big = jnp.asarray(3e30, state.pos.dtype)
    dt_c = jnp.where(live, state.h / (cs + v + 1e-30), big)
    dt_f = jnp.where(live, jnp.sqrt(state.h / jnp.maximum(a, 1e-30)), big)
    local_min = jnp.minimum(jnp.min(dt_c), jnp.min(dt_f))
    if axis is not None:
        local_min = jax.lax.pmin(local_min, axis)
    dt = cfg.cfl_number * local_min
    return jnp.clip(dt, cfg.dt_min, cfg.dt).astype(state.pos.dtype)


def h_eta(cfg: SimConfig) -> float:
    """eta in h = eta (m/rho)^(1/3) giving target_neighbors in radius kappa*h."""
    return float((3.0 * cfg.target_neighbors
                  / (4.0 * jnp.pi)) ** (1.0 / 3.0)) / cfg.kappa


balsara_factor = dense.balsara_factor


def compute_forces(pos, h, mass, cfg: SimConfig, vel=None, u=None,
                   matid=None, fbal=None) -> Forces:
    """Full field evaluation at the given positions/smoothing lengths.

    `vel` is required only when artificial viscosity or the adiabatic
    energy equation is enabled; `u` (specific internal energy) only under
    an evolved-u EOS; `matid` (per-particle material ids) only under
    cfg.eos_mode='tillotson' with multi-material bodies; `fbal` (the
    previous step's Balsara limiter factors, state.balsara) only under
    cfg.av_balsara. Grid mode routes
    everything — sym/asym/grad-h pressure, fused AV, block-tree gravity —
    through the unified block pipeline (ops/structure.py); this is the
    uncached path (structures built fresh, zero skin).
    """
    energy = cfg.evolves_u
    if energy and u is None:
        raise ValueError("eos_mode='adiabatic' needs the internal energy; "
                         "pass u= to compute_forces")
    if cfg.neighbor_mode == "grid":
        from ..ops import structure
        st = structure.build(pos, h, mass, cfg)
        return _forces_block(pos, h, mass, cfg, st, vel=vel, u=u,
                             matid=matid, fbal=fbal)
    if cfg.grad_p_mode == "grad_h":
        return _compute_forces_gradh(pos, h, mass, cfg, vel=vel, u=u,
                                     matid=matid, fbal=fbal)

    balsara = cfg.av_balsara and cfg.av_alpha > 0.0 and vel is not None
    from ..ops.pallas import pairwise
    use_pallas = cfg.use_pallas and pairwise._on_tpu() and not energy
    if use_pallas:
        p1 = pairwise.pass1(pos, h, mass, cfg)
        grad_p_fn = partial(pairwise.pass2, pos, h, mass)
    else:
        p1 = dense.pass1(pos, h, mass, cfg)
        grad_p_fn = partial(dense.pass2, pos, h, mass)

    rho, nn, phi, grad_phi, n_direct = p1
    n_approx = jnp.zeros_like(n_direct)

    ov = None
    if cfg.gravity_solver == "tree":
        phi, grad_phi, n_direct, n_approx, ov = _block_gravity(pos, h,
                                                               mass, cfg)

    prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
    # AV (when enabled) is fused into pass 2 on both dense backends; the
    # adiabatic energy equation rides the same sweep (dense backend)
    mkw = {"matid": matid} if matid is not None else {}
    if balsara:
        mkw["fbal"] = fbal
    if energy:
        out = grad_p_fn(rho, prs, cfg, vel=vel, energy=True, u=u, **mkw)
        grad_p, du_dt = out[:2]
    else:
        out = grad_p_fn(rho, prs, cfg, vel=vel, **mkw)
        grad_p = out[0] if isinstance(out, tuple) else out
        du_dt = jnp.zeros_like(rho)
    f_next = None
    if balsara:
        cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
        f_next = balsara_factor(out[-1], cs, rho, h)

    # dv/dt = -grad P / rho - grad Phi  (VelocitySystem.cs:28-32)
    grad_phi = com_correct(grad_phi, mass, cfg)
    accel = -grad_p / rho[:, None] - grad_phi
    return Forces(rho, prs, grad_p, phi, grad_phi, nn, n_direct, n_approx,
                  accel, h, du_dt, f_next, ov)


def com_correct(grad_phi, mass, cfg: SimConfig, axis=None):
    """Opt-in exact momentum conservation for tree gravity
    (cfg.grav_com_correction): subtract the mass-weighted mean potential
    gradient so sum(m_i a_grav,i) = 0 — a uniform frame acceleration that
    cancels the MAC's target-dependent force asymmetry (the reference's
    open TODO, ``GravityFieldSystem.cs:277-283``). One reduction; psum'd
    over `axis` under dp."""
    if not (cfg.grav_com_correction and cfg.gravity_solver == "tree"):
        return grad_phi
    f = jnp.sum(mass[:, None] * grad_phi, axis=0)
    m = jnp.sum(mass)
    if axis is not None:
        f = jax.lax.psum(f, axis)
        m = jax.lax.psum(m, axis)
    return grad_phi - f[None, :] / m


def _block_gravity(pos, h, mass, cfg: SimConfig, st=None):
    """Block-tree gravity (fresh structure unless one is supplied).

    Returns (phi, grad_phi, n_direct, n_approx, overflow) where overflow
    is the fresh structure's counter dict (None when the caller supplied
    a structure it already accounts for)."""
    from ..ops import structure
    ov = None
    if st is None:
        st = structure.build(pos, h, mass, cfg)
        ov = structure.overflow_info(st)
    return structure.gravity(pos, h, mass, cfg, st) + (ov,)


def _forces_block(pos, h, mass, cfg: SimConfig, st, vel=None, u=None,
                  matid=None, fbal=None, solve_h=True,
                  sorted_io=False, grav_tiers="all") -> Forces:
    """Grid-mode force evaluation on the unified block pipeline.

    `solve_h`: run the bounded Newton h-solve (h_mode='newton') before the
    sweeps. The cached runner passes False inside chunks (h must stay frozen
    between structure rebuilds) and solves at chunk boundaries instead.
    `sorted_io`: state is already in the padded sorted layout (see
    SimConfig.sorted_chunks); outputs stay sorted.
    """
    from ..ops import structure
    if (solve_h and cfg.adaptive_h and cfg.h_mode == "newton"
            and cfg.grad_p_mode == "grad_h"):
        h = structure.solve_h_newton(pos, h, mass, cfg, h_eta(cfg))
        st = structure.build(pos, h, mass, cfg)
    bf = structure.forces(pos, h, mass, cfg, st, vel=vel, u=u,
                          matid=matid, fbal=fbal, sorted_io=sorted_io,
                          grav_tiers=grav_tiers)
    # sorted_io: padding slots duplicate real particles — weight the COM
    # reduction by the live mask so duplicates don't bias the net force
    m_eff = mass * st.groups.live.reshape(-1) if sorted_io else mass
    grad_phi = com_correct(bf.grad_phi, m_eff, cfg)
    accel = -bf.grad_p / bf.rho[:, None] - grad_phi
    bf = bf._replace(grad_phi=grad_phi)
    return Forces(bf.rho, bf.pressure, bf.grad_p, bf.phi, bf.grad_phi,
                  bf.n_neighbors, bf.n_direct, bf.n_approx, accel, h,
                  bf.du_dt, bf.balsara, structure.overflow_info(st))


def _viscosity(pos, vel, h, mass, rho, cfg: SimConfig):
    """Monaghan AV for the dense XLA path (flag-gated).

    The grid/block and Pallas paths fuse AV into their pass-2 sweeps; this
    standalone sweep serves the plain dense pipeline and the tests' oracle.
    """
    if cfg.av_alpha <= 0.0:
        return jnp.zeros_like(pos)
    if vel is None:
        raise ValueError("artificial viscosity needs velocities; pass "
                         "vel= to compute_forces")
    return dense.viscosity_accel(pos, vel, h, mass, rho, cfg)


def _compute_forces_gradh(pos, h, mass, cfg: SimConfig, vel=None,
                          u=None, matid=None, fbal=None) -> Forces:
    """Grad-h SPH (Springel & Hernquist 2002) on the dense pipeline.

    Gather-form density with Omega correction factors; optional fixed-point
    solve of the smoothing-length consistency relation h = eta (m/rho)^(1/3)
    (BASELINE 'adaptive-h Newton iteration' config). Grid mode is handled by
    the block pipeline (see compute_forces).
    """
    if cfg.adaptive_h and cfg.h_mode == "newton":
        eta = h_eta(cfg)
        for _ in range(cfg.h_newton_iters):
            rho, _, _ = dense.density_gradh(pos, h, mass, cfg)
            h = eta * jnp.cbrt(mass / rho)
            if cfg.h_max > 0.0:
                h = jnp.minimum(h, cfg.h_max)

    energy = cfg.evolves_u
    rho, omega, nn = dense.density_gradh(pos, h, mass, cfg)
    prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
    if energy:
        grad_p, du_dt = dense.pass2_gradh(pos, h, mass, rho, omega, prs,
                                          cfg, energy=True, vel=vel)
    else:
        grad_p = dense.pass2_gradh(pos, h, mass, rho, omega, prs, cfg)
        du_dt = jnp.zeros_like(rho)

    ov = None
    if cfg.gravity_solver == "direct":
        # gravity-only dense sweep (the SPH kernel math is skipped, fixing
        # the round-1 waste of a full discarded pass-1)
        g1 = dense.pass1(pos, h, mass, cfg, sph=False)
        phi, grad_phi, n_direct = g1.phi, g1.grad_phi, g1.n_direct
        n_approx = jnp.zeros_like(n_direct)
    elif cfg.gravity_solver == "tree":
        phi, grad_phi, n_direct, n_approx, ov = _block_gravity(pos, h,
                                                               mass, cfg)
    else:
        phi = jnp.zeros_like(rho)
        grad_phi = jnp.zeros_like(pos)
        n_direct = jnp.zeros_like(nn)
        n_approx = jnp.zeros_like(n_direct)

    accel = -grad_p / rho[:, None] - grad_phi
    f_next = None
    if cfg.av_alpha > 0.0:
        if vel is None:
            raise ValueError("artificial viscosity needs velocities; pass "
                             "vel= to compute_forces")
        balsara = cfg.av_balsara
        bkw = {"fbal": fbal} if balsara else {}
        va = dense.viscosity_accel(pos, vel, h, mass, rho, cfg,
                                   energy=energy, u=u, matid=matid, **bkw)
        if not isinstance(va, tuple):
            va = (va,)
        accel = accel + va[0]
        if energy:
            du_dt = du_dt + va[1]
        if balsara:
            cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
            f_next = balsara_factor(va[-1], cs, rho, h)
    return Forces(rho, prs, grad_p, phi, grad_phi, nn, n_direct, n_approx,
                  accel, h, du_dt, f_next, ov)


def _damp(vel, dt, cfg: SimConfig):
    """Settling-run velocity damping (cfg.vel_damping; no-op by default)."""
    if cfg.vel_damping <= 0.0 or cfg.freeze_velocity:
        return vel
    return vel * jnp.exp(-cfg.vel_damping * dt)


def _apply_forces(state: ParticleState, f: Forces) -> ParticleState:
    out = state.replace(
        rho=f.rho, pressure=f.pressure, grad_p=f.grad_p, phi=f.phi,
        grad_phi=f.grad_phi, n_neighbors=f.n_neighbors,
        n_direct=f.n_direct, n_approx=f.n_approx, accel=f.accel, h=f.h,
        du_dt=f.du_dt,
    )
    if f.balsara is not None:
        out = out.replace(balsara=f.balsara)
    return out


def _default_forces(cfg: SimConfig):
    def fn(pos, h, mass, vel=None, u=None, matid=None, fbal=None):
        return compute_forces(pos, h, mass, cfg, vel=vel, u=u, matid=matid,
                              fbal=fbal)
    return fn


def _forces_kw(cfg: SimConfig, u, matid=None, fbal=None):
    """Thread u (matid under tillotson, fbal under av_balsara) into a
    forces_fn only when the configuration consumes them, so custom
    closures that predate the energy equation keep working unchanged."""
    kw = {"u": u} if cfg.evolves_u else {}
    if cfg.eos_mode == "tillotson" and matid is not None:
        kw["matid"] = matid
    if cfg.av_balsara and fbal is not None:
        kw["fbal"] = fbal
    return kw


def prime(state: ParticleState, cfg: SimConfig, forces_fn=None) -> ParticleState:
    """Evaluate forces once at the initial state (fills accel for KDK)."""
    forces_fn = forces_fn or _default_forces(cfg)
    return _apply_forces(state, forces_fn(
        state.pos, state.h, state.mass, vel=state.vel,
        **_forces_kw(cfg, state.u, state.matid, state.balsara)))


def overflow_zero():
    """The all-zero structure-overflow counter dict."""
    return {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}


def step_staggered(state: ParticleState, cfg: SimConfig,
                   forces_fn=None, update_smoothing=True,
                   axis=None, return_info=False):
    """Reference-ordered step (SURVEY.md §3.2).

    `return_info=True` additionally returns the overflow counters of any
    structure built inside the force evaluation (zeros when none was)."""
    forces_fn = forces_fn or _default_forces(cfg)
    dt = current_dt(state, cfg, axis=axis)
    h = update_h(state.h, state.n_neighbors, cfg) if update_smoothing \
        else state.h
    f = forces_fn(state.pos, h, state.mass, vel=state.vel,
                  **_forces_kw(cfg, state.u, state.matid, state.balsara))
    pos = state.pos + state.vel * dt          # Integrator.cs:98-101 (old v!)
    vel = state.vel if cfg.freeze_velocity \
        else state.vel + f.accel * dt         # VelocitySystem.cs:34
    out = _apply_forces(state, f).replace(pos=pos, vel=_damp(vel, dt, cfg))
    if cfg.evolves_u:
        # forward-Euler u update matching the staggered v update
        out = out.replace(u=state.u + dt * f.du_dt)
    if return_info:
        return out, (f.overflow if f.overflow is not None
                     else overflow_zero())
    return out


def step_kdk(state: ParticleState, cfg: SimConfig,
             forces_fn=None, update_smoothing=True,
             axis=None, return_info=False):
    """Leapfrog kick-drift-kick; state.accel carries a(x_n) from last step.

    Under an evolved-u EOS the internal energy gets the same half-kick
    treatment as the velocity (state.du_dt carries du/dt(x_n)): the force
    evaluation at x_{n+1} sees u at the half step, mirroring v_half.

    u is deliberately NOT floored at 0: the Tillotson cold-pressure term
    keeps doing expansion work as u -> 0, so a floor would inject energy
    every clamp event (measured +15% through a basalt impact, dt-
    independent). Instead u may run a small negative "energy debt" — the
    EOS functions clamp u >= 0 internally for evaluation, so pressure
    stays physical while the conserved ledger sum(m u) stays exact (the
    standard Tillotson treatment, cf. Benz & Asphaug 1999)."""
    forces_fn = forces_fn or _default_forces(cfg)
    adiabatic = cfg.evolves_u
    dt = current_dt(state, cfg, axis=axis)
    v_half = state.vel if cfg.freeze_velocity \
        else state.vel + 0.5 * dt * state.accel
    pos = state.pos + dt * v_half
    h = update_h(state.h, state.n_neighbors, cfg) if update_smoothing \
        else state.h
    u_half = state.u + 0.5 * dt * state.du_dt if adiabatic else state.u
    f = forces_fn(pos, h, state.mass, vel=v_half,
                  **_forces_kw(cfg, u_half, state.matid, state.balsara))
    vel = v_half if cfg.freeze_velocity else v_half + 0.5 * dt * f.accel
    out = _apply_forces(state, f).replace(pos=pos, vel=_damp(vel, dt, cfg))
    if adiabatic:
        out = out.replace(u=u_half + 0.5 * dt * f.du_dt)
    if return_info:
        return out, (f.overflow if f.overflow is not None
                     else overflow_zero())
    return out


def step(state: ParticleState, cfg: SimConfig, forces_fn=None,
         axis=None, return_info=False):
    if cfg.integrator == "staggered_euler":
        return step_staggered(state, cfg, forces_fn, axis=axis,
                              return_info=return_info)
    return step_kdk(state, cfg, forces_fn, axis=axis,
                    return_info=return_info)


# ---------------------------------------------------------------------------
# Verlet-skin cached stepping (cfg.rebuild_every): the neighbor adjacency and
# the gravity tree's interaction lists are rebuilt every K steps with a skin
# margin and re-evaluated against current positions in between.
# ---------------------------------------------------------------------------

class Carry(NamedTuple):
    state: ParticleState
    tick: jax.Array   # int32 step counter
    st: object        # BlockStructure when the block pipeline is cached
                      # (grid mode, or dense SPH + tree gravity), else int32 0


def _skin(cfg: SimConfig, vel, accel):
    """PER-PARTICLE bound on motion over a rebuild period ([N] array).

    delta_i = safety * (|v_i| T + 0.5 |a_i| T^2), T = rebuild_every*dt
    (a cold start still gets a margin from the acceleration field). The
    structure build reduces this to per-block maxima, so one fast or
    noisy-acceleration particle widens only ITS block's cutoffs — a
    global max was measured to runaway at 100k: a single tight IC pair
    (|a| ~ 37) inflated every window by ~1, overflowing the capacities,
    and the dropped interactions fed back into larger accelerations.
    """
    if cfg.rebuild_every <= 1:
        return jnp.zeros(vel.shape[:1], vel.dtype)
    t = cfg.rebuild_every * cfg.dt
    v = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    a = jnp.sqrt(jnp.sum(accel * accel, axis=-1))
    return cfg.skin_safety * (t * v + 0.5 * t * t * a)


def _uses_block_cache(cfg: SimConfig) -> bool:
    return cfg.neighbor_mode == "grid" or cfg.gravity_solver == "tree"


def _h_tracking(cfg: SimConfig) -> bool:
    """Per-step h tracking is defined for the Newton/grad-h block
    pipeline only (eta is the consistency-relation constant there)."""
    return (cfg.h_track_margin > 0.0 and cfg.adaptive_h
            and cfg.h_mode == "newton" and cfg.grad_p_mode == "grad_h"
            and cfg.neighbor_mode == "grid")


def _build_caches(pos, h, mass, vel, cfg: SimConfig, accel=None,
                  groups=None):
    if not _uses_block_cache(cfg):
        return jnp.asarray(0, jnp.int32)
    from ..ops import structure
    if accel is None:
        accel = jnp.zeros_like(vel)
    skin = _skin(cfg, vel, accel)
    return structure.build(pos, h, mass, cfg, skin=skin, groups=groups,
                           h_margin=cfg.h_track_margin)


def _forces_cached(pos, h, mass, cfg: SimConfig, st, vel=None,
                   u=None, matid=None, fbal=None) -> Forces:
    if cfg.neighbor_mode == "grid":
        return _forces_block(pos, h, mass, cfg, st, vel=vel, u=u,
                             matid=matid, fbal=fbal, solve_h=False)
    energy = cfg.evolves_u
    balsara = cfg.av_balsara and cfg.av_alpha > 0.0 and vel is not None
    mkw = {"matid": matid} if matid is not None else {}
    av_extra = None
    du_dt = None
    f_next = None
    if cfg.grad_p_mode == "grad_h":
        rho, omega, nn = dense.density_gradh(pos, h, mass, cfg)
        prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
        bkw = {"fbal": fbal} if balsara else {}
        if energy:
            grad_p, du_dt = dense.pass2_gradh(pos, h, mass, rho, omega,
                                              prs, cfg, energy=True, vel=vel)
        else:
            grad_p = dense.pass2_gradh(pos, h, mass, rho, omega, prs, cfg)
        if cfg.av_alpha > 0.0:
            va = dense.viscosity_accel(pos, vel, h, mass, rho, cfg,
                                       energy=energy, u=u, **mkw, **bkw)
            if not isinstance(va, tuple):
                va = (va,)
            av_extra = va[0]
            if energy:
                du_dt = du_dt + va[1]
            if balsara:
                cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
                f_next = balsara_factor(va[-1], cs, rho, h)
    else:
        from ..ops.pallas import pairwise
        if cfg.use_pallas and pairwise._on_tpu() and not energy:
            p1 = pairwise.pass1(pos, h, mass, cfg)
            grad_p_fn = partial(pairwise.pass2, pos, h, mass)
        else:
            p1 = dense.pass1(pos, h, mass, cfg)
            grad_p_fn = partial(dense.pass2, pos, h, mass)
        rho, nn = p1.rho, p1.n_neighbors
        prs = eos_ops.pressure_cfg(rho, cfg, u=u, matid=matid)
        if balsara:
            mkw["fbal"] = fbal
        if energy:
            out = grad_p_fn(rho, prs, cfg, vel=vel, energy=True, u=u, **mkw)
            grad_p, du_dt = out[:2]
        else:
            out = grad_p_fn(rho, prs, cfg, vel=vel,
                            **mkw)  # AV fused if enabled
            grad_p = out[0] if isinstance(out, tuple) else out
        if balsara:
            cs = eos_ops.sound_speed_cfg(rho, cfg, u=u, matid=matid)
            f_next = balsara_factor(out[-1], cs, rho, h)

    if cfg.gravity_solver == "tree":
        from ..ops import structure
        phi, grad_phi, n_direct, n_approx = structure.gravity(
            pos, h, mass, cfg, st)
    elif cfg.gravity_solver == "direct" and cfg.grad_p_mode != "grad_h":
        phi, grad_phi, n_direct = p1.phi, p1.grad_phi, p1.n_direct
        n_approx = jnp.zeros_like(n_direct)
    elif cfg.gravity_solver == "direct":
        g1 = dense.pass1(pos, h, mass, cfg, sph=False)
        phi, grad_phi, n_direct = g1.phi, g1.grad_phi, g1.n_direct
        n_approx = jnp.zeros_like(n_direct)
    else:
        phi = jnp.zeros_like(rho)
        grad_phi = jnp.zeros_like(pos)
        n_direct = jnp.zeros_like(nn)
        n_approx = jnp.zeros_like(nn)

    grad_phi = com_correct(grad_phi, mass, cfg)
    accel = -grad_p / rho[:, None] - grad_phi
    if av_extra is not None:
        accel = accel + av_extra
    if du_dt is None:
        du_dt = jnp.zeros_like(rho)
    return Forces(rho, prs, grad_p, phi, grad_phi, nn, n_direct, n_approx,
                  accel, h, du_dt, f_next)


def init_carry(state: ParticleState, cfg: SimConfig) -> Carry:
    """Prime forces and build initial caches (the cached-run analog of
    :func:`prime`)."""
    st = _build_caches(state.pos, state.h, state.mass, state.vel,
                       cfg, accel=state.accel)
    f = _forces_cached(state.pos, state.h, state.mass, cfg, st,
                       vel=state.vel, u=state.u, matid=state.matid,
                       fbal=state.balsara)
    return Carry(_apply_forces(state, f), jnp.asarray(0, jnp.int32), st)


def step_carry(carry: Carry, cfg: SimConfig) -> Carry:
    """One cached step (either integrator).

    NOTE: inside lax.scan XLA may execute the rebuild branch of the cond
    every step (conditional-to-select conversion), so the scan runners below
    use :func:`run_chunk_cached` (rebuild hoisted out of the inner scan —
    deterministic control flow) instead. step_carry remains the incremental
    API for driving single steps from Python.
    """
    state, tick = carry.state, carry.tick
    k = max(1, cfg.rebuild_every)
    rebuild = (tick % k) == 0
    dt = current_dt(state, cfg)

    if cfg.integrator == "staggered_euler":
        eval_pos, v_half = state.pos, None
    else:
        v_half = state.vel if cfg.freeze_velocity \
            else state.vel + 0.5 * dt * state.accel
        eval_pos = state.pos + dt * v_half

    # adaptive h only at rebuild steps (support must not outgrow the lists)
    h_new = update_h(state.h, state.n_neighbors, cfg)
    h = jnp.where(rebuild, h_new, state.h) if cfg.adaptive_h else state.h

    def do_build(_):
        return _build_caches(eval_pos, h, state.mass, state.vel, cfg,
                             accel=state.accel)

    def keep(_):
        return carry.st

    st = jax.lax.cond(rebuild, do_build, keep, None)
    adiabatic = cfg.evolves_u
    u_half = state.u
    if adiabatic and cfg.integrator != "staggered_euler":
        u_half = state.u + 0.5 * dt * state.du_dt
    # KDK evaluates forces at the post-drift position with the half-step
    # velocity (matching step_kdk); staggered uses the pre-step velocity
    f = _forces_cached(eval_pos, h, state.mass, cfg, st,
                       vel=state.vel if v_half is None else v_half,
                       u=u_half, matid=state.matid, fbal=state.balsara)

    if cfg.integrator == "staggered_euler":
        pos = state.pos + state.vel * dt
        vel = state.vel if cfg.freeze_velocity else state.vel + f.accel * dt
        u_new = state.u + dt * f.du_dt if adiabatic else state.u
    else:
        pos = eval_pos
        vel = v_half if cfg.freeze_velocity else v_half + 0.5 * dt * f.accel
        u_new = u_half + 0.5 * dt * f.du_dt if adiabatic else state.u
    new_state = _apply_forces(state, f).replace(pos=pos,
                                                vel=_damp(vel, dt, cfg), h=h,
                                                u=u_new)
    return Carry(new_state, tick + 1, st)


def _permute_state(state: ParticleState, idx):
    """Reorder every state leaf by `idx` via ONE padded packed row gather
    (ops.structure.packed_permute; 13 per-leaf element gathers run in the
    slow tiny-row gather class — docs/ROUND2.md gotcha 6)."""
    import dataclasses
    from ..ops.structure import packed_permute
    names = [f.name for f in dataclasses.fields(state)]
    vals = packed_permute([getattr(state, n) for n in names], idx,
                          pad_to=32)
    return ParticleState(**dict(zip(names, vals)))


def run_chunk_cached(state: ParticleState, cfg: SimConfig, k: int,
                     groups=None, return_groups=False):
    """Rebuild structures once, then advance k fixed-structure steps.

    Returns (state, info) — or (state, info, groups) with
    `return_groups=True` — where info carries the structure overflow
    counters from the rebuild and groups is the Morton grouping used
    (for cfg.sort_every reuse by subsequent chunks).

    The adaptive-h update is applied once at the chunk boundary so support
    radii cannot outgrow the cached cutoffs: the relaxation step
    (h_mode='relax'), or the bounded Newton solve of the consistency
    relation (h_mode='newton' + grad_h on the block pipeline). The skin
    margin covers k steps of motion (built conservatively from pre-drift
    positions with skin_safety >= 2).
    """
    if cfg.adaptive_h:
        if (cfg.h_mode == "newton" and cfg.grad_p_mode == "grad_h"
                and cfg.neighbor_mode == "grid"):
            from ..ops import structure
            state = state.replace(h=structure.solve_h_newton(
                state.pos, state.h, state.mass, cfg, h_eta(cfg),
                groups=groups, rho0=state.rho))
        else:
            state = state.replace(h=update_h(state.h, state.n_neighbors,
                                             cfg))
    st = _build_caches(state.pos, state.h, state.mass, state.vel,
                       cfg, accel=state.accel, groups=groups)
    sorted_chunk = cfg.neighbor_mode == "grid" and cfg.sorted_chunks
    if sorted_chunk:
        # keep the whole chunk in the padded Morton-sorted layout: one
        # 13-field sort gather here, one unsort gather at the end, zero
        # per-step layout moves (cfg.sorted_chunks)
        grp = st.groups
        run_state = _permute_state(state, grp.tgt_idx)
        forces_fn = lambda p, hh, m, vel=None, u=None, matid=None, \
            fbal=None: \
            _forces_block(p, hh, m, cfg, st, vel=vel, u=u, matid=matid,
                          fbal=fbal, solve_h=False, sorted_io=True)
    else:
        run_state = state
        forces_fn = lambda p, hh, m, vel=None, u=None, matid=None, \
            fbal=None: \
            _forces_cached(p, hh, m, cfg, st, vel=vel, u=u, matid=matid,
                           fbal=fbal)
    if _uses_block_cache(cfg):
        from ..ops import structure
        info = structure.overflow_info(st)
    else:
        info = {"nbr_overflow": jnp.asarray(0, jnp.int32),
                "tree_overflow": jnp.asarray(0, jnp.int32)}

    if cfg.integrator == "staggered_euler":
        one = lambda s: step_staggered(s, cfg, forces_fn,
                                       update_smoothing=False)
    else:
        one = lambda s: step_kdk(s, cfg, forces_fn, update_smoothing=False)

    # per-step h tracking (cfg.h_track_margin): hold the grad-h
    # consistency relation h = eta (m/rho)^(1/3) through the chunk from
    # the previous step's density, clamped around the chunk-boundary
    # Newton solution so the frozen windows (built with
    # h_margin=h_track_margin) stay valid. Frozen h over a 16-step chunk
    # measurably pumps energy at 100k — see SimConfig.h_track_margin.
    if _h_tracking(cfg):
        eta = h_eta(cfg)
        h_rb = run_state.h
        t_lo = h_rb / (1.0 + cfg.h_track_margin)
        t_hi = h_rb * (1.0 + cfg.h_track_margin)
        if cfg.h_max > 0.0:
            t_hi = jnp.minimum(t_hi, cfg.h_max)

        def _tracked(s):
            h_t = jnp.clip(eta * jnp.cbrt(s.mass
                                          / jnp.maximum(s.rho, 1e-30)),
                           t_lo, t_hi)
            return s.replace(h=h_t)
    else:
        _tracked = lambda s: s

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
    # a remainder chunk (k < rebuild_every, e.g. a 500-step diag cadence
    # over K=32 chunks leaves k=20) that respa_every can't divide runs
    # full-rate — identical physics, just without the multirate saving
    respa = respa and k % cfg.respa_every == 0
    if respa:
        # impulse-RESPA multirate gravity (SimConfig.respa_every): the
        # far tiers become half-period velocity kicks around m inner
        # near-field (SPH + P2P) steps; far moments/fields re-evaluated
        # from CURRENT positions once per period instead of every step.
        from ..ops import structure
        m = cfg.respa_every
        dt = cfg.dt
        mass_r = run_state.mass
        live_w = (st.groups.live.reshape(-1).astype(run_state.pos.dtype)
                  if sorted_chunk else 1.0)

        def far_eval(s):
            phi_f, gphi_f, na_f = structure.gravity_far(
                s.pos, s.h, mass_r, cfg, st, sorted_io=sorted_chunk)
            gphi_f = com_correct(gphi_f, mass_r * live_w, cfg)
            return phi_f, gphi_f, na_f

        if sorted_chunk:
            near_fn = lambda p, hh, mm, vel=None, u=None, matid=None, \
                fbal=None: \
                _forces_block(p, hh, mm, cfg, st, vel=vel, u=u,
                              matid=matid, fbal=fbal, solve_h=False,
                              sorted_io=True, grav_tiers="near")
        else:
            near_fn = lambda p, hh, mm, vel=None, u=None, matid=None, \
                fbal=None: \
                _forces_block(p, hh, mm, cfg, st, vel=vel, u=u,
                              matid=matid, fbal=fbal, solve_h=False,
                              grav_tiers="near")
        one_near = lambda s: step_kdk(s, cfg, near_fn,
                                      update_smoothing=False)

        # seed the carried accel with the near-only part: state.accel is
        # full (near+far) at the current positions, the fresh far field
        # is evaluated at the same positions on the just-rebuilt structure
        phi0, gphi0, na0 = far_eval(run_state)
        run2 = run_state.replace(accel=run_state.accel + gphi0)

        def inner(s, _):
            return one_near(_tracked(s)), None

        def outer(carry, _):
            s, gphi_f, _, _ = carry
            s = s.replace(vel=s.vel - (0.5 * m * dt) * gphi_f)
            s, _ = jax.lax.scan(inner, s, None, length=m)
            phi_f, gphi2, na_f = far_eval(s)
            s = s.replace(vel=s.vel - (0.5 * m * dt) * gphi2)
            return (s, gphi2, phi_f, na_f), None

        (out, gphi_l, phi_l, na_l), _ = jax.lax.scan(
            outer, (run2, gphi0, phi0, na0), None, length=k // m)
        # restore the full-field invariant for diagnostics and the next
        # chunk's seed (all evaluated at the final positions)
        out = out.replace(accel=out.accel - gphi_l,
                          grad_phi=out.grad_phi + gphi_l,
                          phi=out.phi + phi_l,
                          n_approx=na_l)
    else:
        def body(s, _):
            return one(_tracked(s)), None

        out, _ = jax.lax.scan(body, run_state, None, length=k)
    if sorted_chunk:
        out = _permute_state(out, grp.unsort_idx)
    if return_groups:
        grps = st.groups if _uses_block_cache(cfg) else None
        return out, info, grps
    return out, info


def _run_cached_span(state: ParticleState, cfg: SimConfig, n_steps: int):
    """Advance n_steps on the cached pipeline with static control flow:
    windows rebuilt every rebuild_every steps, the Morton sort/grouping
    redone only every sort_every steps (both amortizations are loud-
    overflow-safe; see run_chunk_cached). Returns (state, summed info)."""
    zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}
    add = lambda a, b: jax.tree.map(jnp.add, a, b)
    k = cfg.rebuild_every
    n_outer, rem = divmod(n_steps, k)
    s_chunks = 1
    if cfg.sort_every and _uses_block_cache(cfg):
        s_chunks = max(1, cfg.sort_every // k)
    n_per, rem_chunks = divmod(n_outer, s_chunks)

    def period(carry, _):
        s, acc = carry
        s, info, grps = run_chunk_cached(s, cfg, k, return_groups=True)
        acc = add(acc, info)
        if s_chunks > 1:
            def cb(c2, _):
                s2, a2 = c2
                s2, i2 = run_chunk_cached(s2, cfg, k, groups=grps)
                return (s2, add(a2, i2)), None
            (s, acc), _ = jax.lax.scan(cb, (s, acc), None,
                                       length=s_chunks - 1)
        return (s, acc), None

    info = zero
    if n_per:
        (state, info), _ = jax.lax.scan(period, (state, zero), None,
                                        length=n_per)
    if rem_chunks:
        def body_c(carry, _):
            s, acc = carry
            s2, i2 = run_chunk_cached(s, cfg, k)
            return (s2, add(acc, i2)), None
        (state, info), _ = jax.lax.scan(body_c, (state, info), None,
                                        length=rem_chunks)
    if rem:
        state, info_r = run_chunk_cached(state, cfg, rem)
        info = add(info, info_r)
    return state, info


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def run_info(state: ParticleState, cfg: SimConfig, n_steps: int):
    """Advance n_steps under one lax.scan; returns (state, info).

    `info` sums the structure overflow counters over every rebuild in the
    run, upholding the 'dropped AND counted, never silent' contract on the
    public run API (an undersized nbr_window/tree capacity must never drop
    interactions without a surfaced diagnostic).
    """
    zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
            "tree_overflow": jnp.asarray(0, jnp.int32)}
    if cfg.rebuild_every > 1:
        return _run_cached_span(state, cfg, n_steps)

    def body(carry, _):
        s, acc = carry
        s, info = step(s, cfg, return_info=True)
        return (s, jax.tree.map(jnp.add, acc, info)), None
    (out, info), _ = jax.lax.scan(body, (state, zero), None, length=n_steps)
    return out, info


def run(state: ParticleState, cfg: SimConfig, n_steps: int) -> ParticleState:
    """Advance n_steps (state only; see run_info for overflow accounting)."""
    return run_info(state, cfg, n_steps)[0]


@partial(jax.jit, static_argnames=("cfg", "n_chunks", "chunk"))
def run_with_diagnostics(state: ParticleState, cfg: SimConfig,
                         n_chunks: int, chunk: int):
    """Advance n_chunks*chunk steps, measuring diagnostics every `chunk` steps.

    This is the in-graph analog of the reference's every-100-updates stats
    dump (``KernelSystem.cs:59-74``) plus the roadmap's conserved-quantity
    display (``README.md:51-54``).
    """
    from ..utils import diagnostics

    if cfg.rebuild_every > 1:
        def outer_c(s, _):
            s, info = _run_cached_span(s, cfg, chunk)
            d = diagnostics.measure(s, cfg)
            d.update({k2: v.astype(jnp.int32) for k2, v in info.items()})
            return s, d
        return jax.lax.scan(outer_c, state, None, length=n_chunks)

    def outer(s, _):
        zero = {"nbr_overflow": jnp.asarray(0, jnp.int32),
                "tree_overflow": jnp.asarray(0, jnp.int32)}

        def inner(carry, _):
            s2, acc = carry
            s2, i = step(s2, cfg, return_info=True)
            return (s2, jax.tree.map(jnp.add, acc, i)), None
        (s, info), _ = jax.lax.scan(inner, (s, zero), None, length=chunk)
        d = diagnostics.measure(s, cfg)
        d.update(info)
        return s, d

    return jax.lax.scan(outer, state, None, length=n_chunks)

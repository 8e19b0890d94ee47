"""Initial-condition generators.

The reference's only IC is ``ParticleAuthoring.SpawnParticleJob``
(``Assets/Scripts/Systems/ParticleAuthoring.cs:126-246``): N particles
rejection-sampled uniformly inside a sphere (:229-245), at rest (:163), with
per-particle support radius kh = particleRadius * (1 + U[0, 0.5)) (:164),
equal masses totalMass/count (:212), and an initial uniform density estimate
totalMass / (4/3 pi R^3) (:209-217). Its RNG is seeded nondeterministically
(``RandomSystem.cs:37-40``); we use deterministic jax PRNG keys instead.

Additional ICs cover the BASELINE.json scenario list: two-planet collision
(bulk velocities) and an over-rotating planet (solid-body angular velocity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState
from ..ops import eos as eos_ops


def uniform_sphere(key, n, radius, dtype=jnp.float32, method="rejection"):
    """n points uniform in a ball of given radius.

    method='rejection' mirrors the reference's sampler (uniform in the
    bounding cube, resample until inside — ``ParticleAuthoring.cs:229-245``)
    in a shape-static way: oversample the cube, then take the first n
    accepted points (acceptance pi/6 ~ 0.52, so 4x oversampling fails with
    probability < 1e-40 at any realistic n).
    method='direct' uses the exact inverse-CDF construction (r ~ R u^{1/3},
    isotropic direction) — statistically identical, no rejection.
    """
    if method == "direct":
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (n,), dtype)
        r = radius * jnp.cbrt(u)
        d = jax.random.normal(k2, (n, 3), dtype)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return r[:, None] * d

    m = 4 * n + 64
    pts = jax.random.uniform(key, (m, 3), dtype, -radius, radius)
    inside = jnp.sum(pts * pts, axis=-1) < radius * radius
    # Stable order: indices of accepted points in draw order, padded with the
    # first accepted point (never reached in practice).
    order = jnp.argsort(~inside, stable=True)
    return pts[order[:n]]


def _init_u(cfg: SimConfig, rho):
    """IC thermal state: the cold material energy cfg.u0 (tillotson), or
    the polytropic relation at the IC density (adiabatic starts pressure-
    consistent with the reference's barotropic EOS; inert otherwise)."""
    if cfg.eos_mode == "tillotson":
        return jnp.full_like(rho, cfg.u0)
    return eos_ops.internal_energy(rho, cfg.eos_k, cfg.eos_gamma)


def _init_matid(cfg: SimConfig, n: int):
    """Uniform material ids from cfg.material (inert unless tillotson)."""
    return jnp.full((n,), eos_ops.material_index(cfg.material), jnp.int32)


def jupiter(cfg: SimConfig) -> ParticleState:
    """The reference scene: cold uniform ball of gas, at rest.

    (SimScene.unity:276-279 — count=3000, particleRadius=5, radius=50,
    totalMass=100.)
    """
    dt = cfg.jnp_dtype
    key = jax.random.PRNGKey(cfg.seed)
    k_pos, k_h = jax.random.split(key)

    pos = uniform_sphere(k_pos, cfg.n, cfg.radius, dt)
    # Support radius kh = particleRadius * (1 + U[0, 0.5)); h = kh / kappa
    # (ParticleAuthoring.cs:164 + ParticleSmoothing ctor semantics).
    kh = cfg.particle_radius * (1.0 + jax.random.uniform(k_h, (cfg.n,), dt, 0.0, 0.5))
    h = kh / cfg.kappa

    mass = jnp.full((cfg.n,), cfg.particle_mass, dt)
    rho0 = cfg.total_mass / (4.0 / 3.0 * jnp.pi * cfg.radius**3)
    rho = jnp.full((cfg.n,), rho0, dt)

    zeros3 = jnp.zeros((cfg.n, 3), dt)
    zeros1 = jnp.zeros((cfg.n,), dt)
    izeros = jnp.zeros((cfg.n,), jnp.int32)
    return ParticleState(
        pos=pos, vel=zeros3, mass=mass, h=h, rho=rho,
        pressure=eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma),
        grad_p=zeros3, phi=zeros1, grad_phi=zeros3,
        n_neighbors=izeros, n_direct=izeros, n_approx=izeros,
        accel=zeros3,
        # thermal state matching the polytropic relation at the IC density
        # (so an adiabatic run starts pressure-consistent with the
        # reference's barotropic EOS at t=0)
        u=_init_u(cfg, rho),
        du_dt=zeros1,
        matid=_init_matid(cfg, cfg.n),
        balsara=jnp.ones((cfg.n,), dt),
    )


def polytrope(cfg: SimConfig, rho_floor_frac: float = 0.01) -> ParticleState:
    """n=1 polytrope: the ANALYTIC hydrostatic equilibrium for P = K rho^2.

    The Lane-Emden n=1 solution is closed-form: rho(r) = rho_c sin(xi)/xi
    with xi = pi r / R1 and outer radius R1 = pi sqrt(K/(2 pi G)) —
    independent of mass, so rho_c = M pi^2 / (4 R1^3). Particles are drawn
    from the exact enclosed-mass CDF m(xi)/M = (sin xi - xi cos xi)/pi by
    inverse transform, at rest, with h = eta (m/rho)^(1/3) matched to the
    local density (eta from cfg.target_neighbors).

    This is the equilibrium state the reference's cold-collapse scene
    relaxes TOWARD (README.md:34 "hydrostatic equilibrium"); starting here
    skips the violent collapse bounce, which at 100k is a strong shock the
    reference's fixed dt=0.02 cannot integrate. rho is floored at
    rho_floor_frac * rho_c when assigning h so outer-shell smoothing
    lengths stay bounded (the profile's rho -> 0 at R1).
    """
    from .planet import h_eta

    dt = cfg.jnp_dtype
    key = jax.random.PRNGKey(cfg.seed)
    k_u, k_d = jax.random.split(key)

    g = cfg.g_const
    r1 = float(jnp.pi * jnp.sqrt(cfg.eos_k / (2.0 * jnp.pi * g)))
    xi_grid = jnp.linspace(0.0, jnp.pi, 4097, dtype=dt)
    cdf = (jnp.sin(xi_grid) - xi_grid * jnp.cos(xi_grid)) / jnp.pi
    u = jax.random.uniform(k_u, (cfg.n,), dt)
    xi = jnp.interp(u, cdf, xi_grid)
    r = xi * (r1 / jnp.pi)
    d = jax.random.normal(k_d, (cfg.n, 3), dt)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = r[:, None] * d

    rho_c = cfg.total_mass * jnp.pi**2 / (4.0 * r1**3)
    sinc = jnp.where(xi > 1e-4, jnp.sin(xi) / jnp.maximum(xi, 1e-4), 1.0)
    rho = rho_c * sinc
    rho_h = jnp.maximum(rho, rho_floor_frac * rho_c)

    mass = jnp.full((cfg.n,), cfg.particle_mass, dt)
    h = h_eta(cfg) * jnp.cbrt(mass / rho_h)
    if cfg.h_max > 0.0:
        h = jnp.minimum(h, cfg.h_max)

    zeros3 = jnp.zeros((cfg.n, 3), dt)
    zeros1 = jnp.zeros((cfg.n,), dt)
    izeros = jnp.zeros((cfg.n,), jnp.int32)
    return ParticleState(
        pos=pos, vel=zeros3, mass=mass, h=h, rho=rho,
        pressure=eos_ops.pressure(rho, cfg.eos_k, cfg.eos_gamma),
        grad_p=zeros3, phi=zeros1, grad_phi=zeros3,
        n_neighbors=izeros, n_direct=izeros, n_approx=izeros,
        accel=zeros3,
        u=_init_u(cfg, rho),
        du_dt=zeros1,
        matid=_init_matid(cfg, cfg.n),
        balsara=jnp.ones((cfg.n,), dt),
    )


def two_planet_collision(
    cfg: SimConfig,
    separation: float = 150.0,
    approach_speed: float = 0.5,
    impact_parameter: float = 0.0,
    materials=None,
) -> ParticleState:
    """Two Jupiter-like planets on a collision course (BASELINE config 4).

    The particles split (n+1)//2 / n//2 (so the state always has exactly
    cfg.n particles, odd n included) with mass proportional to count and a
    bulk velocity of +-approach_speed/2 along x; impact_parameter offsets
    them along y.

    `materials` (tillotson only): per-body material names, e.g.
    ("basalt", "ice") for a rock-on-ice impact. Each body's RADIUS is then
    derived from its material's cold reference density (r_b such that the
    body starts at rho0 — a body inheriting cfg.radius would start
    compressed by rho_IC/rho0 and explode under the stiff cold-pressure
    terms; masses stay count-proportional so particles are equal-mass
    across both bodies).
    """
    n_a = (cfg.n + 1) // 2
    n_b = cfg.n - n_a
    mat_a, mat_b = materials if materials is not None \
        else (cfg.material, cfg.material)

    def body_cfg(nn, mat, seed):
        c = cfg.replace(n=nn, total_mass=cfg.total_mass * nn / cfg.n,
                        seed=seed, material=mat)
        if materials is not None and cfg.eos_mode == "tillotson":
            rho0 = float(eos_ops.material_rho0(mat))
            r = (3.0 * c.total_mass / (4.0 * float(jnp.pi) * rho0)) \
                ** (1.0 / 3.0)
            c = c.replace(radius=r,
                          particle_radius=cfg.particle_radius
                          * r / cfg.radius)
        return c

    a = jupiter(body_cfg(n_a, mat_a, cfg.seed))
    b = jupiter(body_cfg(n_b, mat_b, cfg.seed + 1))

    dx = jnp.asarray([separation / 2, impact_parameter / 2, 0.0], a.pos.dtype)
    dv = jnp.asarray([approach_speed / 2, 0.0, 0.0], a.pos.dtype)

    def cat(x, y):
        return jnp.concatenate([x, y], axis=0)

    return jax.tree.map(cat, a, b).replace(
        pos=cat(a.pos - dx, b.pos + dx),
        vel=cat(a.vel + dv, b.vel - dv),
    )


def differentiated_planet(
    cfg: SimConfig,
    core_material: str = "iron",
    mantle_material: str = "basalt",
    core_mass_frac: float = 0.3,
) -> ParticleState:
    """Differentiated body: a dense core inside a lighter mantle
    (tillotson EOS; the classic planetary-collision IC, cf. Benz &
    Asphaug 1999).

    Geometry is derived from the materials' cold reference densities so
    the body starts pressure-free: V_core = f M / rho0_core, the mantle
    fills the rest at rho0_mantle, and the OUTER RADIUS OVERRIDES
    cfg.radius (a cold Tillotson shell at rho != rho0 would start with
    ~A-scale pressure and explode). Particle counts split proportional to
    mass (equal-mass particles: SPH resolution follows mass), positions
    uniform within each shell, u = cfg.u0, at rest.
    """
    if cfg.eos_mode != "tillotson":
        raise ValueError("differentiated_planet needs eos_mode='tillotson' "
                         "(materials define the density structure)")
    dt = cfg.jnp_dtype
    key = jax.random.PRNGKey(cfg.seed)
    k_core, k_shell_u, k_shell_d, k_h = jax.random.split(key, 4)

    rho_core = float(eos_ops.material_rho0(core_material))
    rho_mant = float(eos_ops.material_rho0(mantle_material))
    m_core_tot = core_mass_frac * cfg.total_mass
    m_mant_tot = cfg.total_mass - m_core_tot
    v_core = m_core_tot / rho_core
    v_mant = m_mant_tot / rho_mant
    four_pi_3 = 4.0 / 3.0 * float(jnp.pi)
    r_core = (v_core / four_pi_3) ** (1.0 / 3.0)
    r_out = ((v_core + v_mant) / four_pi_3) ** (1.0 / 3.0)

    n_core = max(1, min(cfg.n - 1, round(cfg.n * core_mass_frac)))
    n_mant = cfg.n - n_core

    pos_core = uniform_sphere(k_core, n_core, r_core, dt)
    # mantle shell: r = (r_core^3 + U (r_out^3 - r_core^3))^(1/3)
    uu = jax.random.uniform(k_shell_u, (n_mant,), dt)
    r = jnp.cbrt(r_core**3 + uu * (r_out**3 - r_core**3))
    d = jax.random.normal(k_shell_d, (n_mant, 3), dt)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.concatenate([pos_core, r[:, None] * d], axis=0)

    mass = jnp.concatenate([
        jnp.full((n_core,), m_core_tot / n_core, dt),
        jnp.full((n_mant,), m_mant_tot / n_mant, dt)])
    rho = jnp.concatenate([jnp.full((n_core,), rho_core, dt),
                           jnp.full((n_mant,), rho_mant, dt)])
    matid = jnp.concatenate([
        jnp.full((n_core,), eos_ops.material_index(core_material), jnp.int32),
        jnp.full((n_mant,), eos_ops.material_index(mantle_material),
                 jnp.int32)])

    from .planet import h_eta
    h = h_eta(cfg) * jnp.cbrt(mass / rho)
    if cfg.h_max > 0.0:
        h = jnp.minimum(h, cfg.h_max)

    n = cfg.n
    zeros3 = jnp.zeros((n, 3), dt)
    zeros1 = jnp.zeros((n,), dt)
    izeros = jnp.zeros((n,), jnp.int32)
    u = jnp.full((n,), cfg.u0, dt)
    return ParticleState(
        pos=pos, vel=zeros3, mass=mass, h=h, rho=rho,
        pressure=eos_ops.tillotson_pressure(rho, u, matid),
        grad_p=zeros3, phi=zeros1, grad_phi=zeros3,
        n_neighbors=izeros, n_direct=izeros, n_approx=izeros,
        accel=zeros3, u=u, du_dt=zeros1, matid=matid,
        balsara=jnp.ones((n,), dt),
    )


def rotating_planet(cfg: SimConfig, omega: float = 0.05) -> ParticleState:
    """Over-rotating planet: solid-body rotation about z (BASELINE config 5)."""
    st = jupiter(cfg)
    w = jnp.asarray([0.0, 0.0, omega], st.pos.dtype)
    return st.replace(vel=jnp.cross(jnp.broadcast_to(w, st.pos.shape), st.pos))

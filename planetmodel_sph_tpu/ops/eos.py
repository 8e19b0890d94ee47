"""Equation of state.

Reference: ``PressureFieldSystem.cs:30-34`` — polytropic P = K rho^2 with
K = 1000 (the comment at :27-28 claims K=1; the code says 1000 — we follow
the code). Generalized here to P = K rho^gamma.

The associated specific internal energy for a polytrope (used only for the
conserved-energy diagnostic; the reference never computes it) is
u = K rho^(gamma-1) / (gamma-1), i.e. u = K rho for gamma = 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def pressure(rho, k: float, gamma: float = 2.0):
    if gamma == 2.0:
        return k * rho * rho
    return k * jnp.power(rho, gamma)


def internal_energy(rho, k: float, gamma: float = 2.0):
    """Specific internal energy u(rho) for the polytropic EOS."""
    if gamma == 2.0:
        return k * rho
    return k * jnp.power(rho, gamma - 1.0) / (gamma - 1.0)


def sound_speed(rho, k: float, gamma: float = 2.0):
    """c_s = sqrt(dP/drho) — used by the CFL diagnostic (new capability)."""
    return jnp.sqrt(gamma * k * jnp.power(rho, gamma - 1.0))


# ---------------------------------------------------------------------------
# Tillotson (1962) material EOS — the standard for planetary impact SPH.
# Constants (cgs: g/cm^3, dyne/cm^2, erg/g) from Benz & Asphaug (1999)
# table 1 and Melosh (1989) appendix II. New capability beyond the
# reference; pairs with the evolved internal energy (eos_mode='tillotson').
# ---------------------------------------------------------------------------

TILLOTSON_MATERIALS = {
    #          rho0     a     b     A        B        e0       e_iv     e_cv     alpha beta
    "basalt": (2.700, 0.50, 1.50, 2.67e11, 2.67e11, 4.87e12, 4.72e10, 1.82e11, 5.0, 5.0),
    "granite": (2.680, 0.50, 1.30, 1.80e11, 1.80e11, 1.60e11, 3.50e10, 1.80e11, 5.0, 5.0),
    "iron":   (7.860, 0.50, 1.50, 1.28e12, 1.05e12, 9.50e10, 1.42e10, 8.45e10, 5.0, 5.0),
    "ice":    (0.917, 0.30, 0.10, 9.47e10, 9.47e10, 1.00e11, 7.73e9,  3.04e10, 10.0, 5.0),
    "water":  (0.998, 0.70, 0.15, 2.18e10, 1.33e11, 7.00e10, 4.19e9,  2.69e10, 10.0, 5.0),
}

# Cold-expanded cutoff: below this compression ratio the condensed branch's
# tension term is unphysical (fractured/rarefied material holds no tension);
# the standard fix (e.g. Reinhardt & Stadel 2017) clamps P >= 0 there.
TILLOTSON_ETA_FLOOR = 0.8

# Material-id encoding for per-particle material arrays (ParticleState.matid
# under multi-material runs): index into the insertion order above.
MATERIAL_NAMES = tuple(TILLOTSON_MATERIALS)
MATERIAL_INDEX = {name: i for i, name in enumerate(MATERIAL_NAMES)}


def material_index(name: str) -> int:
    """Stable integer id of a Tillotson material (ParticleState.matid)."""
    return MATERIAL_INDEX[name]


def material_rho0(material) -> jnp.ndarray:
    """Reference (zero-pressure cold) density; str or matid array."""
    if isinstance(material, str):
        return jnp.asarray(TILLOTSON_MATERIALS[material][0])
    tab = jnp.asarray([m[0] for m in TILLOTSON_MATERIALS.values()])
    return tab[material]


def _till_consts(material):
    """Tillotson constants for a material name (python floats — the fast
    scalar path) or a per-particle int matid array (one [M,10] table row
    gather; every constant becomes an array broadcasting with rho/u)."""
    if isinstance(material, str):
        return TILLOTSON_MATERIALS[material]
    tab = jnp.asarray(list(TILLOTSON_MATERIALS.values()))   # [M, 10]
    row = tab[material]                                     # [..., 10]
    return tuple(row[..., i] for i in range(10))


def tillotson_pressure(rho, u, material="basalt"):
    """P(rho, u) with the three-branch Tillotson form:

    condensed (rho >= rho0, or u <= e_iv):
        Pc = (a + b/w) rho u + A mu + B mu^2,   w = u/(e0 eta^2) + 1
    expanded (rho < rho0 and u >= e_cv):
        Pe = a rho u + [b rho u / w + A mu exp(-beta x)] exp(-alpha x^2),
        x = rho0/rho - 1
    hybrid (rho < rho0, e_iv < u < e_cv): linear interpolation in u.

    Fully elementwise and branch-free (jnp.where), so jax.jvp gives the
    exact partials for the sound speed. rho is floored at 1e-30 to keep
    the expanded exponentials finite at vacuum.

    `material`: a name (uniform material, scalar constants) or an int
    matid array (per-particle materials, see MATERIAL_INDEX) broadcasting
    against rho/u.
    """
    rho0, a, b, A, B, e0, e_iv, e_cv, alpha, beta = _till_consts(material)
    rho = jnp.maximum(rho, 1e-30)
    u = jnp.maximum(u, 0.0)
    eta = rho / rho0
    mu = eta - 1.0
    # eta floor + x clamp: at vacuum densities eta^2 underflows f32 (w ->
    # inf) and x^2 overflows (exp chain -> 0*inf NaN under jvp); both
    # clamps are inert for eta > ~1e-8 and the clamped exponentials are
    # exactly 0 at f32 precision anyway
    eta_s = jnp.maximum(eta, 1e-8)
    w = u / (e0 * eta_s * eta_s) + 1.0
    pc = (a + b / w) * rho * u + A * mu + B * mu * mu
    # cold-expanded: no tension in rarefied material
    pc = jnp.where((eta < TILLOTSON_ETA_FLOOR) & (u < e_cv),
                   jnp.maximum(pc, 0.0), pc)
    x = jnp.minimum(rho0 / rho - 1.0, 100.0)
    decay = jnp.exp(-alpha * x * x)
    pe = a * rho * u + (b * rho * u / w
                        + A * mu * jnp.exp(-beta * x)) * decay
    t = jnp.clip((u - e_iv) / (e_cv - e_iv), 0.0, 1.0)
    hybrid = (1.0 - t) * pc + t * pe
    return jnp.where(rho >= rho0, pc,
                     jnp.where(u <= e_iv, pc,
                               jnp.where(u >= e_cv, pe, hybrid)))


def tillotson_sound_speed(rho, u, material="basalt"):
    """c_s = sqrt(dP/drho|u + (P/rho^2) dP/du|rho), the adiabatic sound
    speed, with the exact partials from jax.jvp on the pressure form.
    Floored at 1e-3 * sqrt(A/rho0) (a fraction of the cold bulk sound
    speed) so AV and the CFL criterion stay defined in tension/vacuum."""
    import jax
    rho0, a, b, A = _till_consts(material)[:4]
    # higher floor than the pressure's: rho^2 in the P/rho^2 dP/du term
    # must not underflow f32 (1e-30^2 -> 0 -> 0/0 NaN); the cs floor
    # dominates at these densities anyway
    rho = jnp.maximum(rho, 1e-12)
    u = jnp.maximum(u, 0.0)
    p = tillotson_pressure(rho, u, material)
    _, dp_drho = jax.jvp(lambda r: tillotson_pressure(r, u, material),
                         (rho,), (jnp.ones_like(rho),))
    _, dp_du = jax.jvp(lambda e: tillotson_pressure(rho, e, material),
                       (u,), (jnp.ones_like(u),))
    cs2 = dp_drho + p / (rho * rho) * dp_du
    cs2_floor = 1e-6 * A / rho0
    return jnp.sqrt(jnp.maximum(cs2, cs2_floor))


# --- cfg-aware forms (u ignored when polytropic) ---

def pressure_cfg(rho, cfg, u=None, matid=None):
    """P from the configured EOS. 'adiabatic' (cfg.eos_mode) is the ideal
    gas P = (gamma-1) rho u; 'tillotson' the material EOS above — both
    with u the EVOLVED specific internal energy (state.u). 'polytropic'
    is the reference's barotropic P = K rho^gamma.

    `matid` (tillotson only): per-particle material ids (MATERIAL_INDEX);
    None = the uniform cfg.material."""
    if cfg.evolves_u and u is None:
        raise ValueError(f"{cfg.eos_mode} EOS needs the internal energy u")
    if cfg.eos_mode == "adiabatic":
        return (cfg.eos_gamma - 1.0) * rho * jnp.maximum(u, 0.0)
    if cfg.eos_mode == "tillotson":
        return tillotson_pressure(
            rho, u, cfg.material if matid is None else matid)
    return pressure(rho, cfg.eos_k, cfg.eos_gamma)


def sound_speed_cfg(rho, cfg, u=None, matid=None):
    """c_s for the configured EOS: adiabatic sqrt(gamma (gamma-1) u),
    tillotson from the exact partials, polytropic
    sqrt(gamma K rho^(gamma-1)). Floor-safe for u=0/rho=0."""
    if cfg.evolves_u and u is None:
        raise ValueError(f"{cfg.eos_mode} EOS needs the internal energy u")
    if cfg.eos_mode == "adiabatic":
        return jnp.sqrt(cfg.eos_gamma * (cfg.eos_gamma - 1.0)
                        * jnp.maximum(u, 0.0))
    if cfg.eos_mode == "tillotson":
        return tillotson_sound_speed(
            rho, u, cfg.material if matid is None else matid)
    return sound_speed(jnp.maximum(rho, 0.0), cfg.eos_k, cfg.eos_gamma)

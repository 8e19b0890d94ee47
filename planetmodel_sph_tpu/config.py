"""Typed configuration for the TPU-native SPH engine.

One dataclass covers every constant that is scattered across the reference
project (see SURVEY.md §5 "Config / flag system"):

- editor-serialized authoring fields (count/particleRadius/radius/totalMass,
  reference ``Assets/Scripts/Systems/ParticleAuthoring.cs:26-37``)
- compile-time consts: gravity impl switch (``GravityFieldSystem.cs:19-25``),
  theta=0.7 (``GravityFieldSystem.cs:228``), G=1 (``GravityFieldSystem.cs:26``),
  TARGET_NEIGHBORS=50 (``ParticleSmoothingSystem.cs:18``), EOS K=1000
  (``PressureFieldSystem.cs:31``), kappa=2 (``SplineKernel.cs:44``),
  neighbor capacity 50 (``Components/Kernel.cs:5``)
- the fixed timestep dt=0.02 (``ProjectSettings/TimeManager.asset:6``)

Two presets are provided:

- :func:`parity` — bit-faithful behavioral parity with the reference,
  including its physics quirks (asymmetric pressure gradient, receiver-only
  gravity softening, the kernel-derivative sign bug, staggered Euler).
- :func:`default` — physically-corrected settings (symmetric momentum-
  conserving pressure force, symmetrized softening, corrected kernel
  derivative, leapfrog KDK), the recommended production configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (trace-time) simulation configuration.

    All fields are Python scalars/strings so the config hashes cleanly as a
    ``jax.jit`` static argument.
    """

    # ---- scenario / initial conditions (ParticleAuthoring.cs:26-37) ----
    n: int = 3000                  # particle count          ("count")
    radius: float = 50.0           # IC sphere radius        ("radius")
    total_mass: float = 100.0      # total mass              ("totalMass")
    particle_radius: float = 5.0   # base support kh         ("particleRadius")
    seed: int = 0                  # deterministic RNG (reference uses a
                                   # nondeterministic System.Random seed,
                                   # RandomSystem.cs:37-40 — we improve on it)

    # ---- kernel ----
    kappa: float = 2.0             # support/h ratio (SplineKernel.cs:44)
    # Reproduce the reference's sign error in the r<h branch of the kernel
    # derivative (SplineKernel.cs:135 uses +3q where the Monaghan-Lattanzio
    # derivative is -3q; the h<=r<2h branch at :142 is correctly negative).
    kernel_deriv_sign_bug: bool = False

    # ---- EOS (PressureFieldSystem.cs:30-34) ----
    eos_k: float = 1000.0          # P = K rho^2
    eos_gamma: float = 2.0         # polytropic exponent (reference hardcodes 2)
    # 'polytropic': barotropic P = K rho^gamma (the reference's EOS; the
    #   thermal state is implied by rho and never evolved).
    # 'adiabatic' : ideal-gas P = (gamma-1) rho u with the specific internal
    #   energy u evolved by the conjugate SPH energy equation
    #   du_i/dt = P_i/(Omega_i rho_i^2) sum_j m_j v_ij . gradW(h_i) (grad-h)
    #   or the 1/2 (P_i/rho_i^2 + P_j/rho_j^2) pairwise form (symmetric),
    #   plus the AV heating term 1/2 Pi_ij v_ij . gradW_sym — so shocks
    #   (two-planet impacts) convert kinetic energy into heat instead of
    #   destroying it. New capability beyond the reference. Requires a
    #   momentum-conserving pressure form (not 'reference_asymmetric').
    # 'tillotson' : the standard material EOS for planetary impact
    #   simulations (Tillotson 1962; constants from Benz & Asphaug 1999 /
    #   Melosh 1989): condensed branch P = (a + b/w) rho u + A mu + B mu^2,
    #   expanded branch with exponential decay toward the ideal gas, and
    #   the u-interpolated hybrid between incipient and complete
    #   vaporization. u is evolved exactly as under 'adiabatic'. The
    #   material constants are DIMENSIONAL (cgs) — pair with a
    #   cgs-consistent scenario (g_const=6.674e-8, cm/g/s scales; see
    #   config.basalt_impact()).
    eos_mode: Literal["polytropic", "adiabatic", "tillotson"] = "polytropic"
    # Tillotson material (key into ops.eos.TILLOTSON_MATERIALS) and the
    # cold specific internal energy the ICs assign (erg/g in cgs)
    material: str = "basalt"
    u0: float = 0.0

    @property
    def evolves_u(self) -> bool:
        """Whether the EOS evolves the specific internal energy."""
        return self.eos_mode in ("adiabatic", "tillotson")

    # ---- pressure force ----
    # 'reference_asymmetric': grad P_i = sum_j (m_j/rho_j) P_j gradW_sym
    #   (PressureFieldSystem.cs:44-70 — no self term, not momentum conserving)
    # 'symmetric': momentum-conserving  a_i = -sum_j m_j (P_i/rho_i^2 +
    #   P_j/rho_j^2) gradW_sym  (standard SPH; exposed to VelocitySystem as an
    #   effective gradP_i = rho_i * sum_j ...)
    # 'grad_h': Springel & Hernquist (2002) formulation — gather-form
    #   density rho_i = sum m_j W(h_i), Omega correction factors, pairwise
    #   force with per-particle kernels. Energy-consistent with adaptive h
    #   (pair with h_mode='newton'). Supported on BOTH the dense and the
    #   block/grid pipelines (structure._density_sweep gradh branch); the
    #   100k production preset runs it.
    grad_p_mode: Literal["reference_asymmetric", "symmetric",
                         "grad_h"] = "symmetric"

    # ---- gravity ----
    g_const: float = 1.0           # G (GravityFieldSystem.cs:26)
    theta: float = 0.7             # Salmon-Warren bmax MAC (GravityFieldSystem.cs:228)
    # 'direct'  : all-pairs P2P (GravityImpl.GRAVITY_PARTICLE_CPU analog)
    # 'tree'    : Barnes-Hut monopole over Morton octree (GRAVITY_TREE_CPU analog)
    # 'none'    : disable self-gravity
    gravity_solver: Literal["direct", "tree", "none"] = "direct"
    # Softening length for the Dyer-Ip P2P term:
    # 'receiver_h'    : a = h_i of the field (receiving) particle — reference
    #                   behavior (GravityFieldSystem.cs:144,282)
    # 'symmetric_max' : a = max(h_i, h_j) — conserves momentum
    softening_mode: Literal["receiver_h", "symmetric_max"] = "symmetric_max"

    # ---- adaptive smoothing length (ParticleSmoothingSystem.cs) ----
    adaptive_h: bool = True
    target_neighbors: float = 50.0  # TARGET_NEIGHBORS (:18)
    # 'relax' : the reference's relaxation h <- h*(1+(target/N)^(1/3))/2
    # 'newton': fixed-point solve of the consistency relation
    #           h = eta (m/rho(h))^(1/3) each force evaluation (the
    #           BASELINE 'adaptive-h Newton iteration' config; requires
    #           grad_p_mode='grad_h' for consistent energy bookkeeping)
    h_mode: Literal["relax", "newton"] = "relax"
    # Upper bound on the smoothing length (0 = uncapped). Escaping halo
    # particles otherwise grow h without bound chasing 50 neighbors in
    # near-vacuum; one huge-h particle inflates its block's pair cutoff
    # against every target and overflows the fixed windows (measured
    # runaway at 100k: h_avg 2.4 -> 20 within 500 steps of the collapse
    # bounce). Physically a cap just freezes the (force-free) vacuum
    # smoothing scale. The reference has no halo to speak of at 3k.
    h_max: float = 0.0
    h_newton_iters: int = 3
    # Block-pipeline Newton solves clamp each solve to h*(1 +/- this) and
    # widen the adjacency cutoffs by the same margin, so h can never
    # outgrow the frozen windows (the 'bounded-h' variant; dense mode
    # needs no clamp).
    h_newton_clamp: float = 0.3

    # ---- neighbor search ----
    # 'dense' : masked all-pairs (exact; O(N^2) memory-light tiles)
    # 'grid'  : Morton-group adjacency (sorted 32-particle blocks, group-AABB
    #           candidate windows, dense tile evaluation) — the broadphase
    #           replacement for 10k+ particles
    neighbor_mode: Literal["dense", "grid"] = "dense"
    nbr_group_size: int = 64       # particles per Morton block (the TARGET
                                   # tile height of every windowed sweep)
    nbr_sub: int = 16              # SOURCE window granularity: windows list
                                   # 16-particle sub-blocks, whose AABBs are
                                   # ~1.6x tighter than whole blocks (fewer
                                   # candidate pair-slots for the same
                                   # physics; must divide nbr_group_size)
    nbr_window: int = 192          # adjacent source SUB-blocks per target
                                   # block (overflow counted, never wrapped)
    # Particle-granularity SPH candidate lists (0 = off). When set, the
    # rebuild refines the sub-block window ONCE per rebuild period: it
    # gathers the candidate particles behind the sub-block window and
    # keeps only those within the (skin- and h-margin-inflated) support
    # cutoff of the target block's AABB, compacted to a [G, this] window
    # of particle ids. The sub-block window stays conservative at sub-AABB
    # granularity, so most of its pair slots are geometric padding
    # (measured 2560 slots/target for ~55 real neighbors at the settled
    # 100k point vs ~340 exact); every per-step SPH sweep then runs ~5x
    # fewer slots, for one amortized extra pass at rebuild. Overflow is
    # counted in the same sph_overflow counter.
    sph_exact_window: int = 0
    # Sub-block-granularity TRUE-pair refinement of the SPH window (the
    # cheap middle point between the raw sub-AABB window and the exact
    # particle lists above, which measured net SLOWER at 100k — per-
    # particle gathers lose more than the 7x slot cut wins, ksweep3 xw
    # rows). The same rebuild-time filter_sph sweep marks candidates
    # under the true (skin- and margin-inflated) cutoff; sub-blocks with
    # zero surviving candidates are dropped from the [G, W] window.
    # Per-step sweeps keep their tuned tile layout — only the valid-row
    # count shrinks. Ignored when sph_exact_window > 0 (strictly finer).
    sph_refine_subblock: bool = False
    # Post-refine SPH window capacity (0 = keep nbr_window). The per-step
    # source-row gathers are CAPACITY-shaped — they fetch the full [G, W]
    # window every step regardless of occupancy — and the refine shrinks
    # real occupancy far below the AABB capacity (measured max 64 of a
    # 240-row window at the settled 100k point), so truncating the
    # refined window cuts per-step gather traffic proportionally.
    # Truncation drops counted interactions (same loud-overflow contract).
    sph_refined_window: int = 0
    # Exact-list capacity for the Newton h-solve's margin-widened
    # candidates (0: auto — sph_exact_window * (1+h_newton_clamp)^3
    # rounded up to a block_chunk multiple).
    h_solve_window: int = 0
    nbr_group_level: int = 4       # blocks never cross cells of this octree
                                   # level (kills Morton-seam blocks)
    # Block-unified pipeline (ops/structure.py) static sizing. Gravity is a
    # three-tier partition per (target block, source): far blocks -> dense
    # block-monopole scan (M2P); the in-between ring (block-MAC rejected,
    # sub-MAC accepted) -> windowed SUB-block monopoles; near sub-blocks
    # -> windowed P2P. block_chunk is the Pallas lane-tile width of every
    # windowed sweep. Overflow is dropped AND counted, never wrapped.
    p2p_window: int = 256          # near-field source sub-blocks per block
    m2p_window: int = 256          # ring sub-block monopoles per block
    block_chunk: int = 512         # pair-tile lane width (multiple of 128)
    # Supergroup far tier: aggregate sg_blocks consecutive blocks into
    # supergroup monopoles; the dense far-field scan runs over NSG = NB/
    # sg_blocks supergroup entries (MAC'd with the tight member bound
    # bmax_sg = max_b(|cm_b - cm_sg| + bmax_b) — the union-AABB corner
    # bound measured 2.4x larger on Morton rim blocks, flooding the block
    # tier), and the blocks whose supergroup was MAC-rejected but that
    # pass the block MAC themselves form a windowed block-monopole tier
    # (blk_window entries). Cuts the far-scan slot count ~sg_blocks-fold —
    # at 100k the [G, NB~2k] dense block scan is ~2ms/step of pure masked
    # slots — and keeps the far field O(N/sg) as N grows. 0/1 disables the
    # supergroup tier (the default: a dense block-monopole scan; measured
    # faster than sg tiers at 100k, see tools/ksweep2 sg rows).
    sg_blocks: int = 0
    blk_window: int = 192          # block-monopole window (sg tier only)
    # Multipole order of the far-field tiers (1 = monopole — the
    # reference's GravityFieldSystem uses monopole-only moments; 2 adds
    # traceless quadrupoles to every monopole tier, cutting the MAC error
    # ~5-10x at equal theta so theta can rise and shrink the P2P tier).
    multipole_order: int = 1
    # Tree gravity is not exactly momentum-conserving: MAC acceptance is
    # target-dependent, so pairwise forces don't cancel (the reference
    # leaves the same asymmetry as an open TODO — GravityFieldSystem.cs:
    # 277-283; measured |p| growth 2.9e-2 over 10k steps at 100k). This
    # opt-in correction subtracts the mass-weighted net gravitational
    # force (one reduction, psum'd under dp): a_i += F_net/M_total, i.e.
    # a uniform frame acceleration that restores exact momentum
    # conservation without touching relative dynamics (F_net/M ~ 1e-7 in
    # sim units — far below the MAC force error). Off by default to keep
    # behavioral parity with the uncorrected tree.
    grav_com_correction: bool = False
    # Fuse near-field gravity for the SPH-window sub-blocks into the
    # pass-2 SPH sweep (grid + tree only). The refined SPH window's
    # sub-blocks are overwhelmingly MAC-rejected near-field: their pair
    # geometry (dx, r2, rsqrt — the expensive half of the P2P math) is
    # already computed by pass 2 on already-gathered rows, so evaluating
    # Dyer-Ip gravity there costs ~15 extra VPU ops/slot while REMOVING
    # those sub-blocks from the windowed P2P/ring tiers entirely (their
    # slots AND their share of the window row gather). The build
    # guarantees each sub-block is covered exactly once: SPH-window
    # sub-blocks are excluded from every gravity tier (blocks containing
    # them are pushed out of the dense far scan into the sub-granular
    # partition first). Requires sub-granular SPH windows
    # (sph_exact_window=0) and no supergroup tier; self-pair corrections
    # cancel globally (the tier sweep's +2.4Gm/h self term offsets the
    # fused sweep's included Dyer-Ip self potential).
    fuse_p2p_sph: bool = False
    # Sweep the RESIDUAL p2p window (the non-SPH near sub-blocks that
    # fuse_p2p_sph leaves behind) inside the pass-2 launch as well,
    # instead of a separate gk2.p2p launch. The round-5 stage profile
    # showed the separate launch's per-group fixed costs (~2us DMA
    # issue/semaphores per 64-target group) costing as much as its pair
    # math at the shrunken round-4 windows — a 2-trip p2p sweep timed
    # ~equal to a 3-trip pass1. Merging drops one launch from the
    # per-step path (same windows, same math, same loud overflow).
    # Requires fuse_p2p_sph.
    fuse_p2p_residual: bool = False
    # Pad per-entry gather table rows to this many floats (0 = off).
    # Tiny rows (<=16 B: ring/blk moment entries, single-column exact-list
    # extras) gather at a pathological ~30-150 M rows/s on this TPU while
    # >=128 B rows stream at HBM rate — 32 trades bytes for row rate.
    gather_pad_rows: int = 0
    kernel_gb: int = 1             # target groups batched per Pallas grid
                                   # step (in-kernel fori + dynamic slices
                                   # instead of grid steps). MEASURED SLOWER
                                   # at the settled 100k point (gb=8: pass1
                                   # 5.27 vs 4.94 ms, p2p 11.5 vs 9.9 — the
                                   # grid pipeline double-buffers DMA better
                                   # than an in-kernel loop); kept as a knob
                                   # for other operating points.

    # ---- integration ----
    dt: float = 0.02               # fixed step (TimeManager.asset:6); with
                                   # dt_mode='cfl' this is the dt CEILING
    # 'fixed': the reference's constant 50 Hz step.
    # 'cfl'  : adaptive global timestep from the CFL condition —
    #   dt = cfl_number * min_i( h_i/(c_i + |v_i|), sqrt(h_i/|a_i|) ),
    #   clipped to [dt_min, dt]. Uses the previous step's fields (state is
    #   primed), so the whole run stays one jitted scan. New capability
    #   beyond the reference (needed for collisions at alpha=1 AV).
    dt_mode: Literal["fixed", "cfl"] = "fixed"
    cfl_number: float = 0.25
    dt_min: float = 1e-5
    # 'staggered_euler': reference ordering — forces at x_n, then
    #   x_{n+1} = x_n + v_n dt, then v_{n+1} = v_n + a(x_n) dt
    #   (Integrator.cs:98-101 + VelocitySystem.cs:28-34, see SURVEY §3.2)
    # 'leapfrog_kdk'   : kick-drift-kick, second order, one force eval/step
    integrator: Literal["staggered_euler", "leapfrog_kdk"] = "leapfrog_kdk"

    # ---- interaction-list caching (Verlet-skin amortization) ----
    # Rebuild the neighbor adjacency and the gravity tree lists every
    # `rebuild_every` steps instead of every step, with structures built
    # using a skin margin of skin_safety * rebuild_every * dt * v_max so
    # they stay conservative between rebuilds. The reference rebuilds its
    # broadphase every step but already uses the same trick within a step
    # (AABBs expanded by v*dt, Broadphase.cs:743-761). With rebuild_every=1
    # behavior is identical to rebuilding per step (skin=0). Adaptive-h
    # updates are applied only at rebuild steps when caching is on, so
    # support radii cannot outgrow the cached cutoffs.
    rebuild_every: int = 1
    skin_safety: float = 2.0
    # Re-run the Morton sort + block grouping only every `sort_every` steps
    # (0: at every rebuild). Between sorts, rebuilds reuse the FROZEN group
    # membership but recompute every AABB/centroid/window from current
    # positions, so adjacency and MAC decisions stay exactly conservative —
    # staleness only loosens block tightness (more candidates), never
    # correctness. Rationale: a 100k argsort costs ~2.5s on this TPU
    # (tools/profile_build.py) — the sort must amortize over many rebuilds.
    sort_every: int = 0
    # Keep the state in the padded Morton-sorted [G*B] layout for the whole
    # rebuild period (grid mode): run_chunk_cached sorts every per-particle
    # field ONCE after the rebuild, steps with structure.forces(sorted_io=
    # True) — no per-step sort/unsort gathers — and unsorts once at the
    # chunk boundary. Bitwise-identical results: padding slots duplicate
    # their cell's last particle, integrate to identical values, and are
    # dropped on the unsort gather. Saves ~2 x 8-field layout gathers per
    # step (~5ms/step at 100k, tools/profile_block.py).
    sorted_chunks: bool = True

    # ---- velocity damping (settling runs; new capability) ----
    # v <- v * exp(-vel_damping * dt) after each kick. Quasi-statically
    # relaxes an IC to hydrostatic equilibrium without the violent collapse
    # bounce (the measured 100k failure mode: the bounce compresses the
    # core past the fixed window capacities -> dropped interactions ->
    # momentum non-conservation -> explosion). 0 disables (production).
    vel_damping: float = 0.0

    # ---- artificial viscosity (Monaghan 1992; new capability) ----
    # alpha=0 disables (the reference has no shock treatment). Typical
    # shock-capturing values: alpha=1, beta=2. Dense neighbor mode only
    # this round.
    av_alpha: float = 0.0
    av_beta: float = 0.0
    # Balsara (1995) switch: per-particle AV limiter f_i = |div v| /
    # (|div v| + |curl v| + 1e-4 c/h), applied to Pi_ij as 0.5(f_i+f_j).
    # Kills the spurious shear dissipation of plain Monaghan AV
    # (differentially rotating bodies, oblique impacts) while keeping
    # full strength in compressive shocks. div/curl sums ride the same
    # pass-2 sweep that evaluates Pi_ij; the factor is applied one step
    # lagged (state.balsara), the standard leapfrog treatment. Inert
    # unless av_alpha > 0.
    av_balsara: bool = False

    # ---- data-parallel source layout (parallel/dp.py, parallel/halo.py) --
    # 'replicated': every shard all_gathers the full global source set and
    #   builds its own structure over it — simple, exact, and fastest up to
    #   ~1M particles (SURVEY §2c; docs/DESIGN.md "Multi-chip").
    # 'halo': Morton-range sharding + ring halo exchange — each shard
    #   ppermute-collects raw particles only from its +-halo_ring_radius
    #   ring neighbors (the spatially adjacent Morton ranges) and covers
    #   every farther shard with all_gathered per-chunk multipole moments
    #   (a ~25x smaller message). Gathered bytes drop from O(N) to
    #   O(N/D + N/halo_chunk) per shard; requires morton_shard_state and
    #   gravity_solver='tree' (or 'none') + neighbor_mode='grid'. A
    #   non-ring chunk that drifts within interaction range of a shard is
    #   counted loudly (halo_violations), never silently mis-approximated.
    # Per-step smoothing-length tracking between rebuilds (cached runs,
    # h_mode='newton' + grad_p_mode='grad_h' + grid). 0.0 = freeze h for
    # the whole rebuild period (the round-2 behavior). > 0: every step
    # sets  h_i = clamp(eta (m_i/rho_i)^(1/3), h_rb/(1+m), h_rb*(1+m))
    # from the PREVIOUS step's density — one elementwise op, no extra
    # sweep — where h_rb is the chunk-boundary Newton solution and m this
    # margin; the build widens the SPH cutoffs by (1+m) so tracked h can
    # never outgrow the frozen windows (loud counters verify).
    # WHY: grad-h forces are conservative only while h satisfies the
    # consistency relation h = eta (m/rho)^(1/3). Freezing h for 16 steps
    # while the polytrope breathes PUMPS energy at 100k (drift100k K=16
    # runs: dE doubling ~1000 steps from ~step 7000, mono AND quad; K=8 —
    # half the staleness — was stable at 2.8e-4/10k). Physical drift of h
    # over 16 steps is ~(dt K/3)|div v| ~ 1-2%, so a 3-5% margin tracks
    # faithfully; the clamp only engages on outliers, where it degrades
    # tracking, never window validity.
    h_track_margin: float = 0.0

    # RESPA multirate tree gravity (impulse/Trotter splitting, Tuckerman
    # et al. 1992): the far tiers (ring sub-block monopoles + dense
    # block/supergroup scan — the slowly-varying part of the force) are
    # evaluated every `respa_every` steps from CURRENT positions and
    # applied as half-period velocity impulses bracketing the inner
    # near-field (SPH + P2P) KDK steps. 1 = off (every tier every step).
    # Gated to the cached grid+tree KDK pipeline with fixed dt;
    # respa_every must divide rebuild_every. The inner steps skip the
    # moment reductions AND the ring/far entry gathers entirely. The dp
    # runner mirrors the full multirate scheme (parallel/dp.
    # run_chunk_cached): inner steps also skip the far-tier source
    # moment traffic, so the saving survives sharding.
    respa_every: int = 1

    dp_mode: Literal["replicated", "halo"] = "replicated"
    halo_ring_radius: int = 1      # raw-particle exchange reach (shards)
    halo_chunk: int = 64           # particles per far-moment chunk

    # ---- debug toggles ----
    # parity with the reference's DISABLE_VELOCITY_SYSTEM define
    # (VelocitySystem.cs:1): fields are computed but the SPH/gravity
    # acceleration never updates velocities (positions still drift).
    freeze_velocity: bool = False

    # ---- numerics ----
    dtype: str = "float32"
    # Pair-tile arithmetic precision for the GRAVITY sweeps (P2P + M2P) on
    # the block pipeline. 'bfloat16' runs the per-pair math at 2x VPU rate:
    # separations are still computed in f32 (bf16 would lose ~16% on
    # near-block dx), then cast — per-pair force error ~0.5%, below the
    # theta=0.7 MAC's own approximation error. f32 accumulation either way.
    grav_pair_dtype: Literal["float32", "bfloat16"] = "float32"

    # ---- execution ----
    use_pallas: bool = True        # fused Pallas pairwise kernels on TPU
    block_n: int = 512             # i/j tile for the blocked pairwise kernel

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def particle_mass(self) -> float:
        return self.total_mass / self.n

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


def parse_override(key: str, value: str):
    """Coerce a CLI ``k=v`` override to the SimConfig field's type.

    `type(default)(v)` is wrong for bools (bool('0') is True); tools that
    accept overrides must route through this."""
    fld = type(getattr(SimConfig(), key))
    if fld is bool:
        if value.lower() in ("1", "true", "yes", "on"):
            return True
        if value.lower() in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"bad bool for {key}: {value!r}")
    return fld(value)


def default(**kw) -> SimConfig:
    """Recommended physically-corrected configuration."""
    return SimConfig(**kw)


def auto(**kw) -> SimConfig:
    """Physically-corrected config with the pipeline picked by scale.

    Measured on one v5e (docs/results/scaling.json): the exact O(N^2)
    fused-Pallas path beats list-driven evaluation up to ~30-50k particles;
    above that the grid+tree cached pipeline wins — and above the crossover
    this hands out the FULL validated production stack (grad-h/Newton h +
    per-step h tracking + true-pair window refinement/truncation + RESPA +
    quadrupole far field), i.e. :func:`jupiter_100k` scaled to n: same
    drift-validated formulation, same measured operating point (VERDICT r3
    weak #6 — auto() must not lag the preset by a round). Explicit kwargs
    override any choice; tests/test_presets.py pins auto(100k) ≡
    jupiter_100k.
    """
    n = kw.get("n", SimConfig.n)
    if n > 32768:
        # keep the mean interparticle spacing scaling of jupiter_100k so
        # the 50-neighbor target stays reachable at any n
        kw.setdefault("particle_radius", 5.0 * (3000 / n) ** (1.0 / 3.0))
        return jupiter_100k(**kw)
    kw.setdefault("neighbor_mode", "dense")
    kw.setdefault("gravity_solver", "direct")
    return SimConfig(**kw)


def parity(**kw) -> SimConfig:
    """Behavioral parity with the reference (including its quirks).

    Matches: asymmetric pressure gradient (PressureFieldSystem.cs:44-70),
    receiver-h-only gravity softening (GravityFieldSystem.cs:144), the kernel
    derivative sign bug (SplineKernel.cs:135), staggered Euler ordering
    (SURVEY §3.2), and the 3k-particle Jupiter scene parameters
    (SimScene.unity:276-279).
    """
    base = dict(
        grad_p_mode="reference_asymmetric",
        softening_mode="receiver_h",
        kernel_deriv_sign_bug=True,
        integrator="staggered_euler",
        gravity_solver="tree",
        adaptive_h=True,
    )
    base.update(kw)
    return SimConfig(**base)


def basalt_impact(**kw) -> SimConfig:
    """Planetary-impact scenario in cgs units: two cold basalt bodies.

    Tillotson EOS demo configuration (new capability; the reference's
    fake-unit polytrope cannot represent material response). Scales: two
    R = 50 km basalt planetesimals (rho0 = 2.7 g/cm^3 ->
    M ~ 1.4e21 g each), G in cgs, cold interiors (u0 = 1e9 erg/g
    << e_iv = 4.72e10). Cold basalt bulk sound speed
    sqrt(A/rho0) ~ 3.1e5 cm/s sets the CFL scale: dt_max = 1 s with the
    adaptive CFL timestep on by default. Pair with
    ics.two_planet_collision(separation~2e7 cm, approach_speed~a few
    1e5 cm/s) for a super-escape hypervelocity impact.
    """
    r_body = 5.0e6                        # 50 km in cm
    rho0 = 2.7
    m_body = 4.0 / 3.0 * 3.14159265 * r_body ** 3 * rho0
    base = dict(
        n=4096,
        eos_mode="tillotson",
        material="basalt",
        u0=1.0e9,
        g_const=6.674e-8,
        radius=r_body,
        total_mass=2.0 * m_body,          # two_planet_collision splits it
        particle_radius=r_body * (100.0 / 4096.0) ** (1.0 / 3.0),
        av_alpha=1.0,
        av_beta=2.0,
        dt_mode="cfl",
        # Tillotson is STIFF (cold bulk cs independent of u): at a Mach-10
        # impact the measured total-energy error converges first-order in
        # dt — 9.0% / 3.6% / 1.8% at cfl 0.25 / 0.1 / 0.05 over the whole
        # impact (n=1024). 0.1 is the accuracy/cost default; tighten for
        # publication-grade energy accounting.
        cfl_number=0.1,
        dt=1.0,                           # dt ceiling (seconds)
        dt_min=1e-4,
        h_max=r_body,                     # vacuum-halo h cap at body scale
        gravity_solver="direct",
        neighbor_mode="dense",
    )
    base.update(kw)
    return SimConfig(**base)


def jupiter_3k(**kw) -> SimConfig:
    """BASELINE.json config "Jupiter v1": 3k particles, corrected physics."""
    base = dict(n=3000, gravity_solver="direct", neighbor_mode="dense")
    base.update(kw)
    return SimConfig(**base)


def jupiter_100k(**kw) -> SimConfig:
    """North-star perf config: 100k particles, grid neighbors + tree gravity."""
    base = dict(
        n=100_000,
        gravity_solver="tree",
        neighbor_mode="grid",
        # the production physics the drift protocol validates and every
        # measurement tool (drift100k/ksweep/roofline/trace) runs:
        # energy-consistent grad-h SPH with the bounded Newton h-solve.
        # Previously the tools layered these on top while the preset
        # itself defaulted to symmetric+relax — the preset IS the
        # operating point now, no hidden deltas.
        grad_p_mode="grad_h",
        h_mode="newton",
        # Measured sweep at 100k (tools/ksweep3): sub=32 beats sub=16 by
        # ~10% despite ~25% more candidate slots (finer rows cost more in
        # gather/window overhead than they save in pair math).
        nbr_sub=32,
        rebuild_every=32,
        sort_every=64,
        # Round-3 operating point (tools/ksweep2 r3 ladder + 12k-step
        # drift validations from the settled polytrope, all on the TPU):
        #
        #   21.0 steps/s  round-2 ship (mono K=8, frozen h)
        #   24.6          + per-step h tracking, K=16 (h_track_margin —
        #                   frozen h over a 16-step chunk PUMPS energy;
        #                   tracking is what makes long chunks stable,
        #                   see the h_track_margin field doc)
        #   26.7          + sub-block true-pair refine (sph rows 79->37)
        #   30.1          + post-refine window truncation (gathers are
        #                   capacity-shaped: 240 -> 96 rows fetched/step)
        #   32.3          + K=32 Verlet chunks
        #   36.3          + impulse-RESPA far field every 8 steps
        #   42.0          + quadrupole far field at theta=1.0 (the
        #                   10-field far scan is ~free under RESPA while
        #                   the ~2x smaller P2P tier pays every step) +
        #                   capacity-tightened gravity windows
        #   45.3          + round-4 finishers (ksweep2 r4fuse ladder):
        #                   pass-2 P2P fusion with the residual p2p tier
        #                   at its measured capacity (fuse_p2p_sph;
        #                   max 168 -> 108 non-SPH sub-blocks), refined
        #                   SPH window 96 -> 80 (settled max 65), far
        #                   field every 16 steps
        #   46.2          + far field once per rebuild period (r5r32;
        #                   drift-validated at 1.46e-5/10k,
        #                   drift100k_r4ship32/)
        #   50.3          + residual-P2P merge (ksweep2 r5mg): the
        #                   non-SPH near window sweeps inside the pass-2
        #                   launch (fuse_p2p_residual) — the separate
        #                   p2p launch's per-group fixed costs rivaled
        #                   its pair math at these window sizes
        #                   (drift-validated in drift100k_r5ship/)
        #
        # The round-2 'quad pumps energy' diagnosis was frozen-h in
        # disguise: with tracked h BOTH far fields are drift-flat
        # (mono 3.3e-5, quad 2.2e-5 per 10k steps — drift100k_v2/ and
        # drift100k_q10t/), and the full stack is re-validated at this
        # exact preset (drift100k_r3ship/ for the r3 point,
        # drift100k_r4ship/ for this one).
        multipole_order=2,
        theta=1.0,
        # Ship-point momentum conservation (VERDICT r3 weak #5): the MAC's
        # target-dependent acceptance makes tree forces asymmetric — the
        # r3 ship validation measured |p| growing to 2.9e-2 over 12k steps
        # with the correction off. One psum'd reduction per force eval
        # (planet.com_correct) restores exact sum(m a_grav)=0; the
        # reference leaves this as an open TODO
        # (GravityFieldSystem.cs:277-283). Validated in
        # docs/results/drift100k_r4ship (respa 16) and _r4ship32 (the
        # shipped point): |p| stays at float-noise AND the energy drift
        # is unchanged.
        grav_com_correction=True,
        gather_pad_rows=32,
        h_track_margin=0.04,
        sph_refine_subblock=True,
        sph_refined_window=80,
        respa_every=32,
        fuse_p2p_sph=True,
        fuse_p2p_residual=True,
        # window capacities in SUB-block units; sized from measured
        # settled-state maxima with K=32 skins (ksweep2 r3q10sbrk32r8w:
        # sph pre-refine 187 / post-refine 64, m2p 92; under fusion the
        # p2p tier keeps only non-SPH near sub-blocks, max 108) +
        # headroom. Per-step gathers are capacity-shaped, so capacities
        # hug the maxima; overflow is counted loudly, never silent.
        nbr_window=240,
        p2p_window=112,
        m2p_window=128,
        # same mean interparticle spacing as the 3k scene is NOT preserved;
        # scale the IC sphere so the neighbor count target stays reachable.
        radius=50.0,
        particle_radius=5.0 * (3000 / 100_000) ** (1.0 / 3.0),
    )
    base.update(kw)
    return SimConfig(**base)

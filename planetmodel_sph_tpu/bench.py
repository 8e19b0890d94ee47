"""Benchmark helper shared by `cli bench` and the repo-root bench.py.

Baseline: the reference targets real-time at 50 steps/s with 3k particles on
a gaming laptop (``ProjectSettings/TimeManager.asset:6`` fixed dt=0.02 +
``README.md:2``), i.e. 150k particle-steps/s, with 6.5 ms spent in neighbor/
kernel calculation alone (``README.md:38``). `vs_baseline` is the ratio of
our particle-steps/s to that 150k particle-steps/s reference rate.
"""

from __future__ import annotations

import time

import jax

from . import config as config_mod
from .models import ics, planet

REFERENCE_PARTICLE_STEPS_PER_SEC = 3000 * 50.0


def _force(state):
    """Force device completion via scalar readback (block_until_ready can
    return early on relay-backed remote devices)."""
    import jax.numpy as jnp
    float(jnp.sum(state.pos))
    return state


def run_bench(n: int = 3000, steps: int = 200,
              preset: str = "jupiter_3k",
              checkpoint_path: str | None = None) -> dict:
    """`checkpoint_path`: optional settled-state checkpoint. Benchmarking
    the cold ball's early transient flatters the 100k number (the
    equilibrium core is ~8x denser than the young collapse state, with
    correspondingly fuller interaction windows); when the settled
    artifact exists, the bench loads it and reports the production
    operating point instead. The checkpoint's own (overflow-validated)
    config is used."""
    import os
    operating_point = "early_transient"
    if checkpoint_path and os.path.exists(checkpoint_path):
        from .utils import checkpoint as ck_mod
        state, cfg, _ = ck_mod.load(checkpoint_path)
        operating_point = "settled"
    else:
        preset_fn = getattr(config_mod, preset)
        cfg = preset_fn(n=n) if n else preset_fn()

        # jit the priming eval: the eager per-op path materializes unfused
        # broadcast tiles (OOM at 100k)
        state = jax.jit(lambda s: planet.prime(s, cfg))(ics.jupiter(cfg))
    # warm up with the SAME static step count so compilation (and the scan
    # program) is fully cached before the timed region
    state = _force(planet.run(state, cfg, steps))

    t0 = time.perf_counter()
    state, info = planet.run_info(state, cfg, steps)
    _force(state)
    dt_wall = time.perf_counter() - t0

    steps_per_sec = steps / dt_wall
    psps = cfg.n * steps_per_sec
    # overflowing windows DROP interactions — an overflowed rate is
    # invalid-fast, not fast, so the counters ride along with the number
    overflow = {k: int(v) for k, v in info.items()}
    return {
        "overflow": overflow,
        "metric": f"particle_steps_per_sec_n{cfg.n}",
        "value": round(psps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psps / REFERENCE_PARTICLE_STEPS_PER_SEC, 3),
        "steps_per_sec": round(steps_per_sec, 2),
        "n": cfg.n,
        "wall_s": round(dt_wall, 3),
        "operating_point": operating_point,
        "device": str(jax.devices()[0]),
    }

#!/usr/bin/env python3
"""Driver benchmark: one JSON line per tracked config.

Line 1 — flagship 3k-particle Jupiter hydrostatic-equilibrium config (dense
exact neighbors + direct softened gravity + leapfrog), the scenario the
reference achieves at 50 steps/s real time on a gaming laptop (BASELINE.md).
vs_baseline = our particle-steps/s over the reference's 150k
particle-steps/s.

Line 2 — the BASELINE.json north-star config: jupiter_100k (grid neighbors +
tree gravity + Verlet-cached rebuilds). vs_baseline for this row is measured
against the north-star target rate (6M particle-steps/s = 60 steps/s at
100k), so 1.0 means the target is met.
"""

import json
import os
import subprocess
import sys
import time

# Persistent XLA compilation cache (VERDICT r3 weak #2): the 100k stage
# cold-compiles for many minutes on the relay-backed chip, which is most of
# the driver's bench window. The cache directory survives across rounds on
# this machine, so a re-run (or the driver's end-of-round run after this
# round primed it) loads the executable instead of recompiling.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from planetmodel_sph_tpu.bench import run_bench

NORTH_STAR_PARTICLE_STEPS_PER_SEC = 100_000 * 60.0


def _probe_device(timeout_s: int = 120, attempts: int = 3,
                  sleep_s: int = 45) -> None:
    """Fail fast (instead of hanging forever) when the relay-backed chip
    is unreachable — observed multi-hour outages mid-round. The probe
    runs in a SUBPROCESS because the hang sits inside a C call holding
    the GIL, where in-process SIGALRM handlers never run. A few retries
    ride out transient 'TPU worker process crashed' flaps without
    stalling the driver more than ~7 minutes on a real outage."""
    last = None
    for i in range(attempts):
        if i:
            time.sleep(sleep_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((128,128)))), "
                 "jax.devices()[0].platform)"],
                timeout=timeout_s, capture_output=True)
        except subprocess.TimeoutExpired as e:
            last = e
            continue
        if r.returncode == 0:
            return
        last = RuntimeError(f"probe rc={r.returncode}: "
                            f"{r.stderr.decode()[-200:]}")
    raise RuntimeError(f"device unreachable after {attempts} probes: {last}")


def main() -> int:
    try:
        _probe_device()
        # The 3k row benches the young cold ball (operating_point:
        # "early_transient"). For THIS config that is cost-honest: the
        # dense O(N^2) pipeline's work is shape-static (every pair slot is
        # evaluated regardless of density contrast), so steps/s does not
        # depend on how settled the state is — unlike the windowed 100k
        # pipeline, which is why that row loads a settled checkpoint.
        result = run_bench(n=3000, steps=200)
    except Exception as e:  # noqa: BLE001 — ALWAYS emit a JSON line
        print(json.dumps({"metric": "particle_steps_per_sec", "value": 0.0,
                          "unit": "particle-steps/s", "vs_baseline": 0.0,
                          "error": str(e)[:300]}),
              flush=True)
        return 1
    print(json.dumps(result), flush=True)

    try:
        ck = next((p for p in
                   ("docs/results/drift100k_r5ship/state.psph",
                    "docs/results/drift100k_r4ship32/state.psph",
                    "docs/results/drift100k_r3ship/state.psph")
                   if os.path.exists(p)), None)
        big = run_bench(n=100_000, steps=64, preset="jupiter_100k",
                        checkpoint_path=ck)
        big["metric"] = "particle_steps_per_sec_n100000"
        big["vs_baseline"] = round(
            big["value"] / NORTH_STAR_PARTICLE_STEPS_PER_SEC, 3)
        print(json.dumps(big), flush=True)
    except Exception as e:  # noqa: BLE001 — the 3k headline must survive
        print(json.dumps({"metric": "particle_steps_per_sec_n100000",
                          "value": 0.0, "unit": "particle-steps/s",
                          "vs_baseline": 0.0, "error": str(e)[:300]}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

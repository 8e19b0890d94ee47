#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line.

Flagship benchmark: 3k-particle Jupiter hydrostatic-equilibrium config
(dense exact neighbors + direct softened gravity + leapfrog), the scenario
the reference achieves at 50 steps/s real time on a gaming laptop
(BASELINE.md). vs_baseline = our particle-steps/s over the reference's
150k particle-steps/s.
"""

import json
import sys

from planetmodel_sph_tpu.bench import run_bench


def main() -> int:
    result = run_bench(n=3000, steps=200)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/bin/bash
# Round-2 fused-kernel measurement battery: run when the TPU comes back.
# Each stage appends to /tmp/r2m.log; safe to re-run (idempotent).
set -x
cd /root/repo
LOG=/tmp/r2m.log
echo "=== $(date) fused-kernel battery ===" >> $LOG

# 0. health probe
timeout 120 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('probe', float(jnp.sum(jnp.ones((256,256)) @ jnp.ones((256,256)))))
" >> $LOG 2>&1 || { echo "TPU DOWN" >> $LOG; exit 1; }

# 1. operating-point sweep: fused base, exact lists, supergroup, theta
timeout 2400 python tools/ksweep2.py --ck docs/results/drift100k/state.psph \
    --var k16 --var xwk16 --var xw640 --var xwk16gp --var xwk16sg4 \
    --var xwk16t08 --var xwq09 --var xwq10 \
    >> $LOG 2>&1

# 1b. winner-stage combos on the quad operating point (decision-driving;
#     run unattended so no manual round-trip is needed on recovery)
timeout 2400 python tools/ksweep2.py --ck docs/results/drift100k/state.psph \
    --var xwq09sg4 --var xwq09c256 --var xwq09k32 --var xwq09bf \
    >> $LOG 2>&1

# 2. component profile at the settled operating point (k=32, honest)
timeout 1200 python tools/profile_block.py --only forces,build,hsolve,gravity,pass1,pass2 \
    --k 32 --ck docs/results/drift100k/state.psph --gradh >> $LOG 2>&1

# 3. xplane trace + top-op summary at the settled point (the glue hunt)
timeout 1800 python tools/trace_run.py --steps 16 >> $LOG 2>&1

# 4. entry-gather row-size curve (ring/blk moment gathers)
timeout 900 python tools/micro_gather.py >> $LOG 2>&1

# 5. roofline: primitive ceilings + modeled floor vs measured at settled
timeout 1800 python tools/roofline.py --json /tmp/roofline.json >> $LOG 2>&1

# 6. driver-style bench sanity
timeout 1800 python bench.py >> $LOG 2>&1

echo "=== battery done $(date) ===" >> $LOG

# 7. unattended finisher: pick the overflow-free ksweep2 winner and run
#    the 100k drift protocol at that operating point (ROUND3.md 1+3);
#    winner JSON lands in /tmp/r3_winner.json, drift artifacts in
#    docs/results/drift100k_v2
timeout 14400 python tools/r3_finish.py --log $LOG >> $LOG 2>&1
timeout 1800 python bench.py >> $LOG 2>&1
echo "=== finisher done $(date) ===" >> $LOG

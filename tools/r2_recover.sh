#!/bin/bash
# Session-restart recovery: the settled 100k checkpoint (gitignored) was
# wiped with the workspace. Regenerate it (settle-only drift run), then run
# the full measurement battery, whose finisher (tools/r3_finish.py) picks
# the overflow-free ksweep2 winner and runs the 12k-step drift protocol at
# that operating point.
set -x
cd /root/repo
LOG=/tmp/r2m.log
echo "=== $(date) recovery: regenerate settled checkpoint ===" >> $LOG

for i in 1 2 3 4 5 6 7 8; do
    timeout 3600 python tools/drift100k.py --target 2000 --settle 2000 \
        --out docs/results/drift100k >> $LOG 2>&1 && break
    echo "settle attempt $i failed; retrying" >> $LOG
    sleep 120
done

if [ ! -f docs/results/drift100k/state.psph ]; then
    echo "SETTLE FAILED — no checkpoint" >> $LOG
    exit 1
fi

bash tools/r2_measure.sh

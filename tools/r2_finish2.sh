#!/bin/bash
# Remaining battery stages after the recovery sweep, reordered so the
# plain-pipeline quad variants (q09/q10/...) are measured BEFORE the
# finisher picks the drift/bench operating point.
set -x
cd /root/repo
LOG=/tmp/r2m.log

# wait for the in-flight profile stage (PID $1) to release the TPU
if [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

echo "=== $(date) q-variant sweep ===" >> $LOG
timeout 3600 python tools/ksweep2.py --ck docs/results/drift100k/state.psph \
    --var q09 --var q10 --var q10c256 --var q10k32 --var q10sg4 \
    >> $LOG 2>&1

# xplane trace + top-op summary at the settled point (the glue hunt)
timeout 1800 python tools/trace_run.py --steps 16 >> $LOG 2>&1

# roofline: primitive ceilings + modeled floor (needs the checkpoint)
timeout 1800 python tools/roofline.py --json /tmp/roofline.json >> $LOG 2>&1

timeout 1800 python bench.py >> $LOG 2>&1
echo "=== battery done $(date) ===" >> $LOG

# finisher: pick the overflow-free winner across ALL rows since the LAST
# battery marker — append a fresh marker is wrong here (rows span two
# epochs); r3_finish splits on the marker, so rewrite the log tail into
# one epoch first.
python - <<'EOF'
text = open('/tmp/r2m.log').read()
marker = 'fused-kernel battery ==='
# keep everything after the FIRST post-recovery marker as one epoch
idx = text.find('=== Tue Aug 18 23:59:13')
if idx == -1:
    idx = 0
epoch = text[idx:].replace(marker, 'battery-epoch (merged)')
open('/tmp/r2m_rows.log', 'w').write('=== merged fused-kernel battery ===\n' + epoch)
EOF
timeout 14400 python tools/r3_finish.py --log /tmp/r2m_rows.log >> $LOG 2>&1
timeout 1800 python bench.py >> $LOG 2>&1
echo "=== finisher done $(date) ===" >> $LOG

#!/bin/bash
# Round-3 recovery watcher: wait for the TPU relay to come back, then run
# the drift A/B probe ladder (VERDICT item 1). Appends to /tmp/r3watch.log.
LOG=/tmp/r3watch.log
cd /root/repo
echo "=== watcher start $(date) ===" >> $LOG
for i in $(seq 1 120); do
  timeout 120 python - <<'EOF' >> $LOG 2>&1
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('probe', float(jnp.sum(jnp.ones((256,256)) @ jnp.ones((256,256)))))
EOF
  if [ $? -eq 0 ]; then
    echo "TPU back at $(date) (attempt $i)" >> $LOG
    break
  fi
  sleep 60
done
timeout 7200 python tools/drift_probe.py \
    --probe ctrl --probe q10 --probe q10k8 --probe q10hw --probe q10t07 \
    --probe mono_k16 --probe q10k8hw --probe q09k8 \
    --steps 3000 --chunk 500 --out /tmp/drift_probe.jsonl \
    >> /tmp/drift_probe.log 2>&1
echo "=== probe ladder done $(date) rc=$? ===" >> $LOG

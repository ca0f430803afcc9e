#!/bin/bash
# Probe the axon TPU relay until it answers, then fire the pending A/B queue.
# Detached runner: nohup bash experiments/tpu_watch.sh & — progress in
# /tmp/tpu_watch.log, queue results in /tmp/tpu_queue/.
set -u
cd /root/repo
LOG=/tmp/tpu_watch.log
echo "[watch] start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); import jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()), d)" >> "$LOG" 2>&1; then
    echo "[watch] RELAY UP $(date -u +%H:%M:%S) — running queue" >> "$LOG"
    bash experiments/run_tpu_queue.sh /tmp/tpu_queue >> "$LOG" 2>&1
    echo "[watch] QUEUE DONE $(date -u +%H:%M:%S) — adoption report:" >> "$LOG"
    python experiments/adopt_from_queue.py /tmp/tpu_queue >> "$LOG" 2>&1
    break
  fi
  echo "[watch] relay still down $(date -u +%H:%M:%S); sleeping 300s" >> "$LOG"
  sleep 300
done

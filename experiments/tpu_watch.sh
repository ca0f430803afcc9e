#!/bin/bash
# Probe the axon TPU relay until it answers, then fire the pending A/B queue
# and adopt any measured wins unattended:
#   1. run_tpu_queue.sh           — all pending in-net A/Bs + a full bench
#   2. adopt_from_queue --apply   — write i8_adopt.json if wins clear the
#                                   noise margin + quality gates
#   3. bench.py (post-adoption)   — confirm the headline; REVERT the json
#                                   if it regressed >1% vs the queue's bench
# The working tree is left for review/commit (the round driver commits
# uncommitted work at round end, so an unattended window still lands).
# Detached runner: nohup bash experiments/tpu_watch.sh & — progress in
# /tmp/tpu_watch.log, queue results in /tmp/tpu_queue/.
set -u
cd /root/repo
LOG=/tmp/tpu_watch.log
OUT=/tmp/tpu_queue
ADOPT=neuralstyletransferv1_tpu/i8_adopt.json
echo "[watch] start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); import jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()), d)" >> "$LOG" 2>&1; then
    echo "[watch] RELAY UP $(date -u +%H:%M:%S) — running queue" >> "$LOG"
    bash experiments/run_tpu_queue.sh "$OUT" >> "$LOG" 2>&1
    if [ -f "$OUT/ABORTED" ]; then
      # relay died mid-window: skip adoption (partial data), keep probing —
      # the queue reruns (and overwrites) everything next window
      echo "[watch] queue ABORTED mid-window $(date -u +%H:%M:%S); rearming" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[watch] QUEUE DONE $(date -u +%H:%M:%S) — adoption:" >> "$LOG"
    python experiments/adopt_from_queue.py "$OUT" --apply >> "$LOG" 2>&1
    if [ -f "$ADOPT" ]; then
      echo "[watch] flips applied — post-adoption bench" >> "$LOG"
      timeout 3000 env BENCH_EXTRAS=0 python -u bench.py \
        > "$OUT/bench_after_adopt.txt" 2>&1
      if python experiments/adopt_from_queue.py --bench-regressed \
           "$OUT/bench_full.txt" "$OUT/bench_after_adopt.txt" >> "$LOG" 2>&1; then
        echo "[watch] adoption CONFIRMED (bench_after_adopt.txt)" >> "$LOG"
      else
        echo "[watch] adoption REVERTED (headline regressed or missing)" >> "$LOG"
        rm -f "$ADOPT"
      fi
    fi
    break
  fi
  echo "[watch] relay still down $(date -u +%H:%M:%S); sleeping 300s" >> "$LOG"
  sleep 300
done
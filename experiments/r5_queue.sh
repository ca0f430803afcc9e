#!/bin/bash
# Round-5 TPU measurement queue — run serially (1-CPU box; never overlap
# jax compiles). Each step logs to /tmp/r5_<name>.log; a step failing must
# not block the rest.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a /tmp/r5_queue.log
  timeout "$QTO" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
}

QTO=${QTO:-2400}

# 1. DeepLab masked-stylize step attribution (VERDICT round-4 #4)
run mk44 python -u experiments/mk44_trace_deeplab_step.py

# 2. ReCoNet trace + MAC table (VERDICT round-4 #5)
run mk40 python -u experiments/mk40_trace_reconet.py in

# 3. DIS stage attribution at the production operating point (flow #6)
run mk36 env SIZES=540p-ds2 BATCHES=16 CELL_TIMEOUT_S=300 \
    python -u experiments/mk36_dis_breakdown.py

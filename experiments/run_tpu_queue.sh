#!/bin/bash
# Round-3 pending TPU A/B queue (run when the relay is back).
# Usage: bash experiments/run_tpu_queue.sh [outdir]
# Each step is independently timeout-bounded; results land in $OUT/*.txt.
set -u
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"
cd /root/repo

probe() { # is the relay still answering? (cheap; guards each step so a
          # mid-window relay death aborts in minutes, not 6h of timeouts)
  timeout 180 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
    > /dev/null 2>&1
}

run() { # name timeout cmd...   (a crashed row retries ONCE if the relay
        #  still answers — a mid-row relay HTTP 500 must not strand the row
        #  for a whole round; VERDICT round-3 next-6)
  local name=$1 to=$2 rc; shift 2
  for attempt in 1 2; do
    if ! probe; then
      echo "=== RELAY LOST before $name — aborting queue (rerun next window) ==="
      touch "$OUT/ABORTED"
      exit 75
    fi
    echo "=== $name (attempt $attempt) ==="
    timeout "$to" env "$@" > "$OUT/$name.txt" 2>&1
    rc=$?
    echo "rc=$rc -> $OUT/$name.txt"
    [ "$rc" -eq 0 ] && break
  done
  tail -n 12 "$OUT/$name.txt"
}
rm -f "$OUT/ABORTED"

# Ordered by expected headline impact — a short relay window should land
# the biggest decisions first (adopt_from_queue copes with missing files).

# 1. static-norm modes (frozen IN stats): bf16_static + int8_static +
#    s8-carry chains (+head) vs dynamic bf16 / int8 pal+dec @B16+B48 —
#    the quality-gated headline candidates (bench.py picks the fastest
#    config whose MAE gate holds).
run mk35_static 2400 BATCHES=16,48 python -u experiments/mk35_ab_static.py

# 2. head_i8 adoption A/B (fused head variant vs engine set) @B16
run mk24_head 1500 ONLY_SITES="res,c2,c3,d1,d2" BATCHES=16 \
    python -u experiments/mk24_ab_int8.py

# 2b. pair-d2 ON (K=128 column-pair form) vs the default K=64 d2s form —
#    compare the i8-pal+dec rows of this run and run 2
run mk24_paird2_on 1200 PAIR_D2=1 ONLY_SITES="res,d1,d2" BATCHES=16 \
    python -u experiments/mk24_ab_int8.py

# 3. t7 int8 (BN-folded — the eccv16 shape; fastest backend, 163 bf16).
#    Includes the s8-carry variants (res_site_s8o/s8i_yadd) and the dec-s8
#    extension rows (s8c+ds8 / s8c+ds8c2).
run mk32_t7_bn 3000 NORM=bn BATCHES=16,48 python -u experiments/mk32_ab_t7_i8.py

# 4. t7 instance-norm variant
run mk32_t7_in 1200 NORM=in BATCHES=16 python -u experiments/mk32_ab_t7_i8.py

# 5. NST int8 (504-pad sw geometry) + static-norm rows (frozen IN),
#    incl. the s8-carry rows (i8-s8c / i8-s8c+dec / i8-s8c+ds8)
run mk33_nst 2700 BATCHES=16 python -u experiments/mk33_ab_nst_i8.py

# 6. ReCoNet int8 (IN + FRN) + static-norm rows (incl. the s8-carry
#    i8-s8c rows), then the skip-fold variant (RECO_SKIP=1)
run mk34_reco_in 2400 NORM=in BATCHES=16 python -u experiments/mk34_ab_reconet_i8.py
run mk34_reco_frn 2400 NORM=frn BATCHES=16 python -u experiments/mk34_ab_reconet_i8.py
run mk34_reco_skip 1800 NORM=in RECO_SKIP=1 BATCHES=16 python -u experiments/mk34_ab_reconet_i8.py

# 7. xplane trace of the engine int8 config — attributes the remaining
#    XLA<->Pallas boundary/relayout tax (the next headline lever).
run mk25_trace 1500 python -u experiments/mk25_trace_int8.py bf16 pallas

# 7b. DIS per-stage attribution — where the ~68 ms/pair sits (blur / VF /
#     GN iterations / pyramid+extract+densify floor), @1080p and ds2,
#     B8+B16. Informs the route to the <=50 ms flow target.
run mk36_dis 1500 python -u experiments/mk36_dis_breakdown.py

# 8. Full bench sweep (headline + int8 + latency + backends + ladder +
#    gram + deeplab + magenta + flow e2e) — captures every BASELINE config
#    number in one relay window even before any adoption flips.
run bench_full 3000 BENCH_EXTRAS=1 BENCH_BUDGET_S=0 python -u bench.py

echo "=== queue done; summary ==="
grep -H "fps\|quality" "$OUT"/*.txt | tail -60

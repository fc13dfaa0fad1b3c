#!/bin/bash
# Round-5 hardware measurement queue.  One JSON line per config to
# MEASURE_r5.jsonl (+ a marker line naming the config); stderr goes to
# MEASURE_r5.jsonl.err interleaved with config names so per-config
# failures stay attributable (VERDICT r3 weak #3 discipline).
#
# Priority order for the hardware day:
#   1. the new-defaults converged headline (pass-count-reworked MG-PCG +
#      MXU Galerkin coarsening — MG_LAB_r5 measured 3.1-3.5 ms/solve vs
#      round-4's 7.5) — this is VERDICT r4 item 1's "done" row;
#   2. warm-start A/B (VERDICT item 7 discriminator at the new cost);
#   3. converged scaling rows: 2048 (item 9) and 4096 (item 3 — the
#      adaptive stream-window rework should now fit 128M VMEM);
#   4. K=16 lossless store (item 5 — split destination passes);
#   5. the stale A/B queue (item 8): batch-8 HostBatchRunner, rainbow,
#      padded-store, tile geometry.
# Serialize: never two TPU processes at once.
set -u
cd "$(dirname "$0")/.."
OUT=MEASURE_r5.jsonl
run() {
  echo "{\"config\": \"$1\"}" >> "$OUT"
  echo "=== config: $1 ===" >> "$OUT.err"
  local budget="$2"
  shift 2
  EULER_BENCH_BUDGET_S=$((budget - 60)) timeout "$budget" \
    python bench.py "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
}

# 1. headline: round-5 defaults (mg converged, K=8, warm start per config.py)
run "1024-mg-warm"   3000 --frames 24 --no-also-speed
# 2. A/B: warm start off (same kernels; isolates iteration savings at the
#    new ~160-190 us/iter cost where a saved iteration is worth less)
run "1024-mg-cold"   1800 --frames 24 --no-warm-start --no-also-speed
# 3. converged scaling
run "2048-mg"        3000 --frames 8 --size 2048 --no-also-speed
run "4096-mg"        3600 --frames 4 --size 4096 --warmup-frames 2 --no-also-speed
# 4. lossless store (split destination passes; VMEM-sized this round)
run "1024-mg-k16"    3000 --frames 24 --slots-per-cell 16 --marker-tile 128x256 --no-also-speed
# 5. stale A/B queue (each reuses the headline's compiled kernels where
#    shapes match; batch/rainbow/padded change shapes -> own compiles)
run "1024-batch8"    3000 --frames 24 --batch 8 --no-also-speed
run "1024-rainbow"   1800 --frames 24 --rainbow --no-also-speed
run "1024-padded"    1800 --frames 24 --padded-store --no-also-speed
run "1024-tile-256x256" 1800 --frames 24 --marker-tile 256x256 --no-also-speed
echo done >> "$OUT"

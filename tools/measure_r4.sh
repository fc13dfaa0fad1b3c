#!/bin/bash
# Round-4 hardware measurement queue.  Appends one JSON line per
# configuration to MEASURE_r4.jsonl plus a marker line naming the
# config; stderr (rung failures, compile times, cache hits) goes to
# MEASURE_r4.jsonl.err with the config name interleaved so per-config
# exceptions are attributable (VERDICT r3 weak #3).
# Priority-ordered for a cold compile cache: the new-defaults headline
# first (K=16 lossless store + warm start + fused MG substep), then the
# discriminating A/Bs (warm-start off; K=8 store), then the >=2048
# converged rows.  Serialize: never two TPU processes at once.
set -u
cd "$(dirname "$0")/.."
OUT=MEASURE_r4.jsonl
run() {
  echo "{\"config\": \"$1\"}" >> "$OUT"
  echo "=== config: $1 ===" >> "$OUT.err"
  shift
  timeout 3000 python bench.py "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
}

# headline: all round-4 defaults (mg converged + warm start + K=16)
run "1024-mg-warm-k16"   --frames 24 --slots-per-cell 16 --marker-tile 128x256 --no-also-speed
# A/B: warm start off (same kernels, isolates the iteration saving)
run "1024-mg-cold-k16"   --frames 24 --slots-per-cell 16 --marker-tile 128x256 --no-warm-start --no-also-speed
# A/B: round-3 store depth (isolates the K=16 lossless-store cost)
run "1024-mg-warm-k8"    --frames 24 --slots-per-cell 8 --no-also-speed
# converged scaling rows (VERDICT r3 missing #3)
run "2048-mg-warm"       --frames 8 --size 2048 --no-also-speed
run "4096-mg-warm"       --frames 4 --size 4096 --warmup-frames 2 --no-also-speed
# speed mode at the new store depth
run "1024-jacobi-k16"    --frames 24 --slots-per-cell 16 --marker-tile 128x256 --precon jacobi
echo done >> "$OUT"

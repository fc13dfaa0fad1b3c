#!/bin/bash
# Round-5 follow-up queue (run AFTER tools/measure_r5.sh drains).
#
# Purpose: the VERDICT r4 item-1 bar is "converged 1024^2 >= 2.5e8 with
# div_inf <= 0.05".  The r5 headline (2.39e8) runs tol_rel 1e-4 and
# lands div_inf 0.023 — half the allowed residual.  This ladder
# measures where the tol_rel knob crosses the div_inf 0.05 line and
# what each step buys, so the headline default is chosen on disclosed
# A/B evidence (same discipline as the warm-start decision).
#
# Usage: bash tools/measure_r5b.sh
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5b
OUT="$ROOT/MEASURE_r5.jsonl"

git -C "$ROOT" worktree remove --force "$SNAP" 2>/dev/null || true
rm -rf "$SNAP"
git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\"}" >> "$OUT"
cd "$SNAP"

run() {
  echo "{\"config\": \"$1\"}" >> "$OUT"
  echo "=== config: $1 ===" >> "$OUT.err"
  local budget="$2"
  shift 2
  EULER_BENCH_BUDGET_S=$((budget - 60)) timeout "$budget" \
    python bench.py "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
}

# full 24-frame re-run of the headline config: the phaseA row came
# back as a 4-frame provisional (the post-rework fused-substep compile
# ate ~40 of the 49-min budget; it is now in the persistent cache)
run "1024-mg-packed-full" 2400 --frames 24 --no-also-speed

run "1024-mg-tol2e4" 2400 --frames 24 --tol-rel 2e-4 --no-also-speed
run "1024-mg-tol5e4" 2400 --frames 24 --tol-rel 5e-4 --no-also-speed
echo done >> "$OUT"

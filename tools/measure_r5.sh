#!/bin/bash
# Round-5 hardware measurement queue — SNAPSHOT-BASED.
#
# Lesson from the first launch: each `run` row starts a fresh Python
# that imports the LIVE working tree, so kernel edits made while the
# queue runs contaminate later rows (the first 2048 row imported a
# mid-edit stream kernel).  The runner now executes from an immutable
# git-worktree snapshot of HEAD; results still land in the repo.
#
# Usage: bash tools/measure_r5.sh [phaseA|phaseB|phaseC|all]
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5
OUT="$ROOT/MEASURE_r5.jsonl"
PHASE="${1:-all}"

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

tool() {
  local name="$1" budget="$2"
  shift 2
  echo "=== tool: $name ===" >> "$OUT.err"
  timeout "$budget" python "$@" 2>>"$OUT.err" >>"$OUT.err"
}

if [ "$PHASE" = all ] || [ "$PHASE" = phaseA ]; then
  # the VERDICT "done"-bar rows first
  run "1024-mg-packed"  3000 --frames 24 --no-also-speed
  run "2048-mg"         3000 --frames 8 --size 2048 --no-also-speed
  run "4096-mg"         3600 --frames 4 --size 4096 --warmup-frames 2 --no-also-speed
  run "1024-mg-k16"     3000 --frames 24 --slots-per-cell 16 --marker-tile 128x256 --no-also-speed
fi

if [ "$PHASE" = all ] || [ "$PHASE" = phaseB ]; then
  # diagnostics: converged-frame profile, coarse-share lab, warm-start
  # iters evidence (tools write their own artifacts into $SNAP; copy)
  tool profile 1800 tools/profile_step.py --precon mg --tol-rel 1e-4 --frames 2
  tool mg_lab  3000 tools/mg_lab_hw.py --schedules d1-wd2-ci4 d1-wd2-ci24 d1-v --out "$ROOT/MG_LAB_r5.jsonl"
  tool iters   3000 tools/iters_trajectory.py --out "$ROOT/ITERS_r5.jsonl"
fi

if [ "$PHASE" = all ] || [ "$PHASE" = phaseC ]; then
  # A/Bs: packed-insert off, warm-start off, then the stale r3 queue
  run "1024-mg-nopacked" 3000 --frames 24 --no-packed-insert --no-also-speed
  run "1024-mg-cold"     3000 --frames 24 --no-warm-start --no-also-speed
  run "1024-batch8"      3000 --frames 24 --batch 8 --no-also-speed
  run "1024-padded"      2400 --frames 24 --padded-store --no-also-speed
  run "1024-rainbow"     2400 --frames 24 --rainbow --no-also-speed
  run "1024-tile-256x256" 2400 --frames 24 --marker-tile 256x256 --no-also-speed
fi
echo done >> "$OUT"

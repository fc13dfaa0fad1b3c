#!/bin/bash
# Round-5f queue: crash-resumable successor to measure_r5e.sh.  The r5e
# run died to a session restart mid-way through its first row (the
# 1024-mg-headline cold recompile after the reboot wiped the compile
# cache; MEASURE_r5.jsonl.err 00:08).  This version marks each row
# {"attempted": ...} when its bench invocation RETURNS (success or
# failure) and skips attempted rows on re-launch, so a crashed queue
# resumes at the in-flight row instead of starting over.
#
# Order (VERDICT r4 value): headline (item 1 + driver cache prime),
# the two candidate headline levers on the warm 1024 cache (fh, tol
# ladder), 2048/4096 converged (items 9, 3 — cold compiles, ~45-60 min
# each), k16 lossless (item 5), iters evidence (item 7), warm/packed
# A/Bs (items 4, 7), then the stale r3 tail (item 8).
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5f
OUT="$ROOT/MEASURE_r5.jsonl"

if [ ! -d "$SNAP" ]; then
  git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
fi
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\", \"queue\": \"r5f\"}" >> "$OUT"
cd "$SNAP"

run() {
  local name="$1" budget="$2"
  shift 2
  grep -q "\"attempted\": \"$name\"" "$OUT" && return
  echo "{\"config\": \"$name\"}" >> "$OUT"
  echo "=== config: $name ===" >> "$OUT.err"
  EULER_BENCH_BUDGET_S=$((budget - 60)) timeout "$budget" \
    python bench.py "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  local rc=${PIPESTATUS[0]}
  echo "{\"attempted\": \"$name\", \"rc\": $rc}" >> "$OUT"
}

tool() {
  local name="$1" budget="$2"
  shift 2
  grep -q "\"attempted\": \"tool-$name\"" "$OUT" && return
  echo "=== tool: $name ===" >> "$OUT.err"
  timeout "$budget" python "$@" 2>>"$OUT.err" >>"$OUT.err"
  echo "{\"attempted\": \"tool-$name\", \"rc\": $?}" >> "$OUT"
}

run "1024-mg-headline"  3600 --frames 24
run "1024-mg-fh"        3000 --frames 24 --frame-hierarchy
run "1024-mg-tol5e4"    2700 --frames 24 --tol-rel 5e-4
run "2048-mg"           3600 --frames 8 --size 2048
run "4096-mg"           3600 --frames 4 --size 4096 --warmup-frames 2
run "1024-mg-k16"       3000 --frames 24 --slots-per-cell 16 --marker-tile 128x256
tool iters              2400 tools/iters_trajectory.py --out "$ROOT/ITERS_r5.jsonl"
run "1024-mg-cold"      2400 --frames 24 --no-warm-start
run "1024-mg-nopacked"  2400 --frames 24 --no-packed-insert
run "1024-jacobi-speed" 1800 --frames 24 --precon jacobi
run "1024-batch8"       2700 --frames 24 --batch 8
run "1024-rainbow"      2400 --frames 24 --rainbow
run "1024-padded"       2400 --frames 24 --padded-store
run "1024-tile-256x256" 2400 --frames 24 --marker-tile 256x256
echo '{"queue": "r5f", "done": true}' >> "$OUT"

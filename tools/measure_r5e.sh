#!/bin/bash
# Round-5e queue: successor to measure_r5c.sh after its first headline
# attempt lost its cold compile to a 2400s budget on a host that was
# concurrently running the CPU test suite (single core — local XLA
# compile and pytest contend; MEASURE_r5.jsonl.err "1024-mg-headline").
# Budgets raised for cold compiles; the host stays idle during this
# queue.  Run after killing r5c once its in-flight row completes.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5e
OUT="$ROOT/MEASURE_r5.jsonl"

git -C "$ROOT" worktree remove --force "$SNAP" 2>/dev/null || true
rm -rf "$SNAP"
git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\", \"queue\": \"r5e\"}" >> "$OUT"
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

# Ordered by VERDICT r4 value: headline (item 1 + driver cache prime),
# 4096/2048 converged (items 3, 9), then the two candidate headline
# levers (frame-hierarchy, tol ladder — a winning default flip must
# already be primed in the cache for the driver's end-of-round bench),
# then k16 lossless (item 5), evidence tools (items 2, 7), A/Bs (4, 7),
# and the stale r3 queue (8).
run "1024-mg-headline"  3600 --frames 24
run "4096-mg"           3600 --frames 4 --size 4096 --warmup-frames 2
# 2048 retry only if the r5c in-flight row left no metric
if ! grep -q 'at 2048\^2' "$OUT"; then
  run "2048-mg-retry"   3600 --frames 8 --size 2048
fi
run "1024-mg-fh"        3000 --frames 24 --frame-hierarchy
run "1024-mg-tol5e4"    3000 --frames 24 --tol-rel 5e-4
run "1024-mg-k16"       3000 --frames 24 --slots-per-cell 16 --marker-tile 128x256
tool iters              2400 tools/iters_trajectory.py --out "$ROOT/ITERS_r5.jsonl"
run "1024-mg-cold"      3000 --frames 24 --no-warm-start
run "1024-mg-nopacked"  3000 --frames 24 --no-packed-insert
tool profile            1800 tools/profile_step.py --precon mg --tol-rel 1e-4 --frames 2
run "1024-mg-tol2e4"    2700 --frames 24 --tol-rel 2e-4
run "1024-jacobi-speed" 1800 --frames 24 --precon jacobi
run "1024-batch8"       2700 --frames 24 --batch 8
run "1024-rainbow"      2400 --frames 24 --rainbow
run "1024-padded"       2400 --frames 24 --padded-store
run "1024-tile-256x256" 2400 --frames 24 --marker-tile 256x256
echo '{"queue": "r5e", "done": true}' >> "$OUT"

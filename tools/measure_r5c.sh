#!/bin/bash
# Round-5c hardware measurement queue — relaunch of the r5 in-flight
# rows at HEAD (the first queue died at 17:55 with the pre-79eca02
# stream-MG MLIRError at 2048 and silent instant-exits after it), and
# the XLA compile cache was wiped between sessions, so every distinct
# program cold-compiles again (~10-25 min each).
#
# Ordered so an early death still leaves the highest-value rows, and
# so the DRIVER's end-of-round bare `python bench.py` finds its exact
# default config in the persistent cache (tol_rel is baked into the
# compiled program, so only the bare-default row primes it):
#   1. 1024-mg headline at HEAD, bare defaults (cache-primer + the row)
#   2. 2048-mg      (VERDICT item 9: >=1.5e8 converged at 2048^2)
#   3. 4096-mg      (item 3: a converged 4096^2 row at all)
#   4. 1024-mg-k16  (item 5: lossless store on silicon, dropped=0)
#   5. iters tool   (item 7: warm-start iters/substep evidence)
#   6. cold/nopacked A/Bs + tol ladder (items 1, 4, 7)
#   7. stale r3 queue: batch8 / rainbow / padded / tile (item 8)
#
# Snapshot-based: rows execute from an immutable git worktree of HEAD
# so live edits don't contaminate later rows; results land in the repo.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5c
OUT="$ROOT/MEASURE_r5.jsonl"

git -C "$ROOT" worktree remove --force "$SNAP" 2>/dev/null || true
rm -rf "$SNAP"
git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\", \"queue\": \"r5c\"}" >> "$OUT"
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

run "1024-mg-headline" 2400 --frames 24
run "2048-mg"          3000 --frames 8 --size 2048
run "4096-mg"          3600 --frames 4 --size 4096 --warmup-frames 2
run "1024-mg-k16"      2700 --frames 24 --slots-per-cell 16 --marker-tile 128x256
tool iters             2400 tools/iters_trajectory.py --out "$ROOT/ITERS_r5.jsonl"
run "1024-mg-cold"     2400 --frames 24 --no-warm-start
run "1024-mg-nopacked" 2400 --frames 24 --no-packed-insert
run "1024-mg-tol2e4"   2400 --frames 24 --tol-rel 2e-4
run "1024-mg-tol5e4"   2400 --frames 24 --tol-rel 5e-4
run "1024-batch8"      2400 --frames 24 --batch 8
run "1024-rainbow"     1800 --frames 24 --rainbow
run "1024-padded"      1800 --frames 24 --padded-store
run "1024-tile-256x256" 1800 --frames 24 --marker-tile 256x256
echo '{"queue": "r5c", "done": true}' >> "$OUT"

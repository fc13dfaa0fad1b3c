#!/bin/bash
# Round-5d follow-up queue (run AFTER tools/measure_r5c.sh drains).
#
#  1. frame-hierarchy A/B: the stale-coarse-preconditioner lever
#     (cfg.solver.mg_frame_hierarchy) vs the r5c headline row — the
#     last rebuild residue is 7/8 removable if convergence holds on
#     the real trajectory (tests/test_frame_hierarchy.py proves the
#     64² interpret case; this measures iterations + throughput).
#  2. profile refresh on the EXACT headline config (VERDICT r4 item 2
#     said "do it first on the hardware day" — the r5 trace that
#     root-caused the rebuild predates the MXU coarsening + pass-count
#     rework; this one prices what remains).
#
# Usage: bash tools/measure_r5d.sh
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5d
OUT="$ROOT/MEASURE_r5.jsonl"

git -C "$ROOT" worktree remove --force "$SNAP" 2>/dev/null || true
rm -rf "$SNAP"
git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\", \"queue\": \"r5d\"}" >> "$OUT"
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

run "1024-mg-fh" 2400 --frames 24 --frame-hierarchy
tool profile 1800 tools/profile_step.py --precon mg --tol-rel 1e-4 --frames 2
echo '{"queue": "r5d", "done": true}' >> "$OUT"

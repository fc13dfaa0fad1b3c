#!/bin/bash
# Round-5g queue: warm-cache completion pass after measure_r5f.sh.
# The r5f headline and fh rows finished their cold compiles (so their
# programs are in the persistent cache) but only got 4-frame
# provisionals out before their budgets expired — the pre-e3fea40
# bench discarded the full pass if the budget died inside the post-pass
# quality probes.  This queue re-runs them as full 24-frame rows on the
# warm cache (minutes each), then takes the expensive named
# deliverables (k16 lossless, warm-start iters evidence) with whatever
# window remains.  Run it ONLY after measure_r5f is stopped — never two
# TPU processes at once.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SNAP=/tmp/euler_snap_r5f   # SAME worktree as r5f: the compile cache was
                           # populated from this path; bench.py there is
                           # hot-patched to the e3fea40+ watchdog
OUT="$ROOT/MEASURE_r5.jsonl"

if [ ! -d "$SNAP" ]; then
  git -C "$ROOT" worktree add --detach "$SNAP" HEAD >/dev/null
  cp "$ROOT/bench.py" "$SNAP/bench.py"
fi
echo "{\"snapshot\": \"$(git -C "$SNAP" rev-parse --short HEAD)\", \"queue\": \"r5g\", \"bench\": \"hot-patched\"}" >> "$OUT"
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

# Endgame order (repo-path headline runs separately first via
# tools/prime_driver_cache.sh): the two cold named deliverables
# (VERDICT r4 items 3 and 5), then cheap warm-cache completions.
run "4096-mg"               3600 --frames 4 --size 4096 --warmup-frames 2
run "1024-mg-k16"           3300 --frames 24 --slots-per-cell 16 --marker-tile 128x256
run "1024-mg-fh-full"       1500 --frames 24 --frame-hierarchy
tool iters                  2400 tools/iters_trajectory.py --out "$ROOT/ITERS_r5.jsonl"
echo '{"queue": "r5g", "done": true}' >> "$OUT"

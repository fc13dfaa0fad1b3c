#!/bin/bash
# Sharded test runner: the full suite in ONE pytest process dies with a
# Python-level segfault inside XLA's backend_compile_and_load while
# compiling the fused-substep program at ~97% (~150 tests in;
# tests/test_substep_fused.py passes in isolation, 6 passed).  The
# compile arena of a long-lived process accumulates until a late big
# Mosaic compile tips it over, so the suite runs as sequential pytest
# SUBPROCESS groups: heavy-compile kernel modules isolated from the
# rest, the fused substep alone.  Exit code is nonzero if any group
# fails; a summary table prints at the end.  `make test` calls this.
#
# Usage: tools/run_tests.sh [extra pytest args, e.g. -x]
set -u
cd "$(dirname "$0")/.."
EXTRA=("$@")

declare -a NAMES=()
declare -a RCS=()
fail=0

run_group() {
  local name="$1"; shift
  echo "=== test group: $name ($*) ==="
  python -m pytest -q "${EXTRA[@]}" "$@"
  local rc=$?
  NAMES+=("$name"); RCS+=("$rc")
  if [ "$rc" -ne 0 ]; then fail=1; fi
}

# Heavy-compile groups (each its own process).
G_SUBSTEP=(tests/test_substep_fused.py)
G_SOLVER=(tests/test_mg_kernel.py tests/test_stream_mg.py
          tests/test_stream_pcg.py tests/test_fused_projection.py)
G_MARKERS=(tests/test_pallas_markers.py tests/test_pallas_grid.py)
G_PARALLEL=(tests/test_halo.py tests/test_halo2d.py
            tests/test_pallas_shard.py tests/test_parallel.py
            tests/test_batch_vmap.py tests/test_spatial.py)

# Everything else (light compiles) in one process, computed by exclusion
# so new test files are never silently skipped.
HEAVY="${G_SUBSTEP[*]} ${G_SOLVER[*]} ${G_MARKERS[*]} ${G_PARALLEL[*]}"
G_REST=()
for f in tests/test_*.py; do
  case " $HEAVY " in
    *" $f "*) ;;
    *) G_REST+=("$f") ;;
  esac
done

run_group rest     "${G_REST[@]}"
run_group markers  "${G_MARKERS[@]}"
run_group solver   "${G_SOLVER[@]}"
run_group substep  "${G_SUBSTEP[@]}"
run_group parallel "${G_PARALLEL[@]}"

echo "=== test summary ==="
for i in "${!NAMES[@]}"; do
  if [ "${RCS[$i]}" -eq 0 ]; then st=ok; else st="FAIL(rc=${RCS[$i]})"; fi
  echo "  ${NAMES[$i]}: $st"
done
exit $fail

#!/bin/bash
# Round-5 endgame: run the full 24-frame headline FROM /root/repo.
# Two jobs in one row:
#   1. The round's final full headline measurement at HEAD with the
#      hardened bench (div_inf attached even under watchdog expiry).
#   2. Priming the persistent compile cache FOR THE DRIVER: the cache
#      key is path-dependent for Pallas programs (Mosaic payloads embed
#      source paths), so the end-of-round `python bench.py` from
#      /root/repo would otherwise hit a ~40-55 min cold compile and die
#      against the driver's [950, 1680) s kill window (BENCH_r03/r04
#      rc=124 precedent).
# Must run with NO other TPU process alive.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$ROOT/MEASURE_r5.jsonl"
cd "$ROOT"

name="1024-mg-headline-repo"
grep -q "\"attempted\": \"$name\"" "$OUT" && exit 0
echo "{\"config\": \"$name\", \"note\": \"run from /root/repo to prime the driver-path compile cache\"}" >> "$OUT"
echo "=== config: $name (from /root/repo) ===" >> "$OUT.err"
EULER_BENCH_BUDGET_S=4440 timeout 4500 \
  python bench.py --frames 24 2>>"$OUT.err" | tail -1 >> "$OUT"
rc=${PIPESTATUS[0]}
echo "{\"attempted\": \"$name\", \"rc\": $rc}" >> "$OUT"

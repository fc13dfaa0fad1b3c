#!/bin/bash
# Round-3 hardware measurement queue (ROADMAP.md).  Run when the TPU
# tunnel is back; appends one JSON line per configuration to
# MEASURE_r3.jsonl plus a marker line naming the config.
# Ordered by priority: the persistent compile cache is COLD, so the
# headline (mg + fused substep) goes first on its own timeout — the
# jacobi speed mode is a separate run so a compile overrun cannot eat
# the headline measurement.  Serialize: never two TPU processes at once
# (device faults).
set -u
cd "$(dirname "$0")/.."
OUT=MEASURE_r3.jsonl
run() {
  echo "{\"config\": \"$1\"}" >> "$OUT"
  shift
  timeout 3000 python bench.py "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
}

# headline: mg converged, fused substep (driver's bench.py default)
run "1024-mg-fused"          --frames 20 --no-also-speed
# speed-mode A/B (jacobi, fused) — warms the second kernel family
run "1024-jacobi-fused"      --frames 20 --precon jacobi
# scaling rows (stream-MG converged at 4096/2048; VERDICT r2 item 5)
run "4096-mg"                --frames 4 --size 4096 --no-also-speed --warmup-frames 2
run "2048-mg"                --frames 8 --size 2048 --no-also-speed
# A/B: substep fusion off (kernel-per-stage path)
run "1024-mg-nofuse"         --frames 20 --no-fuse-projection --no-also-speed
run "1024-jacobi-nofuse"     --frames 20 --precon jacobi --no-fuse-projection
# A/B: padded slot store
run "1024-mg-padded"         --frames 20 --padded-store --no-also-speed
run "4096-jacobi"            --frames 4 --size 4096 --precon jacobi --warmup-frames 2
run "2048-jacobi"            --frames 8 --size 2048 --precon jacobi
# interior-fast march needs >= 3 column tiles (config.py caveat):
# narrower tiles trade per-tile overhead for submerged-tile skips
run "1024-mg-tile128x256"    --frames 20 --marker-tile 128x256 --no-also-speed
run "1024-mg-tile64x256"     --frames 20 --marker-tile 64x256 --no-also-speed
# batch + rainbow sanity
run "1024-batch8"            --frames 8 --batch 8 --no-also-speed
run "1024-rainbow"           --frames 20 --rainbow --no-also-speed
echo done >> "$OUT"
cat "$OUT"

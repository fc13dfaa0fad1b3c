"""Summarize a MEASURE_r*.jsonl queue log as a markdown table.

tools/measure_r3.sh appends alternating marker lines ({"config": name})
and bench.py JSON result lines; a config whose bench run crashed or
timed out is followed directly by the next marker.  This prints one
row per config in queue order, flagging missing results, so the
PERF.md results table is a paste instead of a transcription.

Usage: python tools/summarize_measure.py [MEASURE_r3.jsonl]
"""

from __future__ import annotations

import json
import sys


def rows(path: str):
    pending = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line == "done":
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if set(obj) == {"config"}:
                if pending is not None:
                    yield pending, None
                pending = obj["config"]
            elif pending is not None:
                yield pending, obj
                pending = None
    if pending is not None:
        yield pending, None


def fmt(v, nd=3):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:.{nd}g}"
    return str(v)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "MEASURE_r3.jsonl"
    print("| config | cell-steps/s | vs baseline | div_inf | precon |"
          " active/8 | dropped | notes |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in rows(path):
        if r is None:
            print(f"| {name} | *no result (crash/timeout — see "
                  f"{path}.err)* | | | | | | |")
            continue
        notes = []
        if r.get("fallback_rung"):
            notes.append(f"fallback: {r['fallback_rung']}")
        if r.get("speed_mode_cell_steps_per_sec"):
            notes.append(
                f"speed mode {fmt(r['speed_mode_cell_steps_per_sec'])} "
                f"(div_inf {fmt(r.get('speed_mode_div_inf'))})")
        if r.get("speed_mode_error"):
            notes.append("speed-mode run failed")
        print(
            f"| {name} | {fmt(r.get('value'))} "
            f"| {fmt(r.get('vs_baseline'), 4)}x "
            f"| {fmt(r.get('post_projection_div_inf'))} "
            f"| {r.get('precon', '—')} "
            f"| {fmt(r.get('active_substeps_per_frame'))} "
            f"| {fmt(r.get('dropped_markers'))} "
            f"| {'; '.join(notes)} |"
        )


if __name__ == "__main__":
    main()

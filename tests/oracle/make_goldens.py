"""Regenerate the committed golden-frame fixtures.

Runs the NumPy oracle (a faithful port of the reference's semantics,
oracle.py) on every bundled scenario and records the per-cell marker
counts — the rendered observable that defines parity (SURVEY.md §4) —
at frames 1, 5 and 10 into tests/goldens/<scenario>.npz.

Usage:  python tests/oracle/make_goldens.py
"""

import os
import sys

import numpy as np

# run as a script from inside tests/oracle/: shadowing makes `oracle`
# resolve to oracle.py itself, so strip the script dir from sys.path
sys.path = [p for p in sys.path
            if os.path.abspath(p or ".")
            != os.path.dirname(os.path.abspath(__file__))]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle.oracle import Oracle  # noqa: E402

SCENARIOS = ["basic.txt", "block.txt", "filter.txt", "waterfall.txt",
             "weird-edges.txt"]
FRAMES = (1, 5, 10, 25, 50)


def counts_of(ora):
    c = np.zeros((ora.Y, ora.X), np.int32)
    m = ora.markers_array()
    if len(m):
        np.add.at(c, (np.floor(m[:, 1]).astype(int),
                      np.floor(m[:, 0]).astype(int)), 1)
    return c.astype(np.uint8)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(root)
    out_dir = os.path.join(root, "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in SCENARIOS:
        with open(os.path.join(repo, "scenarios", name)) as f:
            text = f.read()
        ora = Oracle(text, max_iterations=400)
        arrays = {}
        frame = 0
        for target in FRAMES:
            while frame < target:
                ora.sim_step()
                frame += 1
            arrays[f"counts_{target}"] = counts_of(ora)
            arrays[f"u_{target}"] = ora.u.astype(np.float64)
            arrays[f"v_{target}"] = ora.v.astype(np.float64)
        path = os.path.join(out_dir, name.replace(".txt", "") + ".npz")
        np.savez_compressed(path, **arrays)
        print(f"{name}: wrote {path} "
              f"({arrays['counts_10'].sum()} markers at frame 10)")


if __name__ == "__main__":
    main()

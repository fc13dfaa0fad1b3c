"""Dump the TPU-compiled HLO of the benchmark step for op attribution.

    python tools/dump_hlo.py --size 1024 > /tmp/step_hlo.txt

Each optimized-HLO op carries source metadata; grep the hot op names
from tools/profile_step.py output (e.g. broadcast_in_dim.222) to see
which Python line produced them.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import jax

    from euler_tpu.config import SimConfig, SolverConfig
    from euler_tpu.core.presets import dam_break
    from euler_tpu.sim import step_frame

    cfg = SimConfig(
        nx=args.size, ny=args.size, marker_layout="slots",
        use_pallas_markers=True,
        solver=SolverConfig(max_iterations=100, tol=1e-6, dtype="float32",
                            preconditioner="jacobi", use_pallas=True),
    )
    scn, state = dam_break(cfg)
    lowered = jax.jit(step_frame, static_argnums=0).lower(cfg, scn, state)
    print(lowered.compile().as_text())


if __name__ == "__main__":
    main()

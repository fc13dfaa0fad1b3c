"""CPU lab: PCG iteration counts for the LEVEL-SKIP Galerkin cycle.

The beyond-VMEM (2048²+) streamed solve cannot hold the half-resolution
level's planes in VMEM, so the streamed MG cycle restricts the FINE
residual directly to the quarter level (4x constant prolongation — the
composition of two 2x constant prolongations, so A_quarter is exactly
the existing level-2 Galerkin operator).  This lab measures what the
skipped level costs in PCG iterations on developed dam-break systems —
the go/no-go number for building the streamed-MG kernel.

Usage: python tools/stream_mg_lab.py [N] [frame]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from euler_tpu.config import SimConfig, SolverConfig  # noqa: E402
from euler_tpu.core.presets import dam_break  # noqa: E402
from euler_tpu.ops import multigrid as MG  # noqa: E402
from euler_tpu.ops import project as P  # noqa: E402
from euler_tpu.ops.forces import calculate_timestep  # noqa: E402
from euler_tpu.sim import step_frame_jit  # noqa: E402


def build_system(N, frame):
    cfg = SimConfig(
        nx=N, ny=N, marker_layout="slots",
        solver=SolverConfig(max_iterations=100, tol=1e-6, tol_rel=1e-4,
                            dtype="float32", preconditioner="mg"),
    )
    scn, st = dam_break(cfg)
    for _ in range(frame):
        st = step_frame_jit(cfg, scn, st)
    fluid = st.fluid
    dt = calculate_timestep(cfg, st.u, st.v, jnp.float32(cfg.frame_time))
    b = P.divergence_rhs(cfg, st.u, st.v, fluid, dt)
    a = P.pressure_matrix_diag(cfg, scn.solid, fluid)
    return cfg, b, a, fluid, scn.solid


def skip_cycle(levels, b, skip: int = 1, **kw):
    """Fine smoothing + restrict PAST `skip` intermediate levels (2^(1+
    skip) constant coarsening) + resident sub-cycle + prolong + smooth."""
    lv0 = levels[0]
    Y, X = lv0.c.shape
    deg = kw.get("cheby_degree", 1)
    ratio = kw.get("cheby_ratio", 4.0)
    f = 2 ** (1 + skip)
    sub = levels[1 + skip:]

    x = MG.cheby_smooth(lv0, jnp.zeros_like(b), b, deg, ratio)
    r = b - MG.apply_edge(lv0, x)
    rc = r.reshape(Y // f, f, X // f, f).sum(axis=(1, 3))
    ec = MG.cycle_galerkin(sub, rc, 0, **kw)
    up = jnp.broadcast_to(
        ec[:, None, :, None], (Y // f, f, X // f, f)
    ).reshape(Y, X)
    x = x + up
    x = MG.cheby_smooth(lv0, x, b, deg, ratio)
    return jnp.where(lv0.active, x, 0)


def count_iters(cfg, b, a, fluid, solid, precon):
    p, iters, resid = P.pcg_loop(
        cfg, b, lambda s: P.apply_a(a, fluid, s), precon
    )
    return int(iters), float(resid)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    frame = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t0 = time.time()
    cfg, b, a, fluid, solid = build_system(N, frame)
    print(f"system {N}^2 frame {frame} built in {time.time()-t0:.0f}s; "
          f"||b||={float(jnp.abs(b).max()):.3g}")

    levels = MG.build_galerkin_hierarchy(a, fluid, jnp.float32,
                                         min_size=cfg.solver.mg_min_size)
    print(f"levels: {[lv.c.shape for lv in levels]}")

    kw = dict(w=2, smoother="cheby", cheby_degree=1, cheby_ratio=4.0,
              coarse_iters=12, coarse_ratio=100.0, w_depth=2)

    base = lambda r: MG.cycle_galerkin(levels, r, 0, **kw)
    it, res = count_iters(cfg, b, a, fluid, solid, base)
    print(f"full cycle (d1/wd2):            {it:3d} iters, resid {res:.3g}")

    for skip in (1, 2):
        for deg in (1, 2, 3):
            kws = dict(kw, cheby_degree=deg)
            pc = lambda r, s=skip, k=kws: skip_cycle(levels, r, skip=s, **k)
            it, res = count_iters(cfg, b, a, fluid, solid, pc)
            print(f"skip {skip} level(s) (4^{skip}x jump), fine cheby d{deg}: "
                  f"{it:3d} iters, resid {res:.3g}")


if __name__ == "__main__":
    main()

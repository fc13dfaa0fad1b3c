"""On-chip MG-PCG schedule lab (round 4, VERDICT item 1).

Round 3's converged headline measured 1.29e8 cell-steps/s — identical to
the pre-d1+wd2 number — with the solve costing ~420 us/PCG-iteration
against a predicted ~0.5x cut.  This tool measures the STANDALONE
single-launch MG kernel (ops/pallas/mg_kernel.py) on REAL 1024²
dam-break pressure systems across cycle schedules, separating the two
competing explanations:

  (a) per-iteration kernel cost does not respond to the schedule
      (latency-bound deep levels / Mosaic codegen floor), or
  (b) real 1024² systems need many more PCG iterations than the 512²
      lab systems the schedule was tuned on.

Each row: {schedule, frame, iters, resid, ms_per_solve, us_per_iter}.
Appends JSONL to MG_LAB_r4.jsonl.  Standalone-kernel compiles are ~2 min
each (vs ~28 min for the fused substep), so an 8-config sweep fits one
sitting; rows stream out as they land, worst-case-last ordering.

Run: python tools/mg_lab_hw.py [--size 1024] [--frames 8 24] [--reps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--frames", type=int, nargs="+", default=[8, 24],
                    help="dam-break frames at which to capture systems")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--out", default="MG_LAB_r4.jsonl")
    ap.add_argument("--schedules", nargs="*", default=None,
                    help="subset of schedule names to run")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/euler_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from euler_tpu.config import SimConfig, SolverConfig
    from euler_tpu.core.presets import dam_break
    from euler_tpu.ops.forces import max_speed_sq
    from euler_tpu.ops.project import divergence_rhs, pressure_matrix_diag
    from euler_tpu.sim import _dt_from_msq, step_frame

    # State generation mirrors bench.py's jacobi config EXACTLY (incl.
    # the 4-frame jitted chain) so the r3-warmed persistent cache hits.
    cfg = SimConfig(
        nx=args.size, ny=args.size,
        marker_layout="slots", marker_tile=(128, 512),
        use_pallas_markers=True,
        solver=SolverConfig(
            max_iterations=100, tol=1e-6, tol_rel=1e-6,
            dtype="float32", preconditioner="jacobi",
            use_pallas=True, fuse_projection=True,
        ),
    )
    scn, state = dam_break(cfg)
    from euler_tpu.parallel.spatial import to_spatial

    state = to_spatial(cfg, state)

    def _chain(scn, state, _n=4):
        for _ in range(_n):
            state = step_frame(cfg, scn, state)
        return state

    step4 = jax.jit(_chain)

    @jax.jit
    def capture(state):
        fluid = state.marker_count > 0
        msq = max_speed_sq(cfg, state.u, state.v)
        dt = _dt_from_msq(cfg, msq, jnp.asarray(cfg.frame_time, state.u.dtype))
        b = divergence_rhs(cfg, state.u, state.v, fluid, dt)
        a_diag = pressure_matrix_diag(cfg, scn.solid, fluid)
        return b, a_diag, fluid

    out = open(args.out, "a", buffering=1)

    def emit(row):
        out.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    systems = []
    t0 = time.perf_counter()
    frame = 0
    for target in sorted(args.frames):
        while frame < target:
            state = step4(scn, state)
            frame += 4
        b, a_diag, fluid = jax.tree.map(
            lambda x: jax.device_get(x), capture(state))
        systems.append((frame, jnp.asarray(b), jnp.asarray(a_diag),
                        jnp.asarray(fluid)))
        emit({"event": "captured", "frame": frame,
              "binf": float(abs(b).max()),
              "fluid_cells": int(fluid.sum()),
              "t": round(time.perf_counter() - t0, 1)})

    solid = scn.solid

    # ---- schedule sweep ----
    base = dict(max_iterations=100, tol=1e-6, tol_rel=1e-4,
                dtype="float32", preconditioner="mg", use_pallas=True)
    SCHEDULES = {
        # round-3 default (the headline config)
        "d1-wd2":        dict(mg_cheby_degree=1, mg_w_depth=2),
        # round-3b control
        "d2-wd3":        dict(mg_cheby_degree=2, mg_w_depth=3),
        # pure V cycles (cheapest per cycle; counts grow with depth)
        "v-d2":          dict(mg_cycle="v", mg_cheby_degree=2),
        "v-d3":          dict(mg_cycle="v", mg_cheby_degree=3),
        "v-d4":          dict(mg_cycle="v", mg_cheby_degree=4),
        # shallow hierarchies: fewer latency-bound tiny levels
        "ms128-d2-ci24": dict(mg_min_size=128, mg_coarse_iters=24,
                              mg_cheby_degree=2),
        "ms256-d2-ci40": dict(mg_min_size=256, mg_coarse_iters=40,
                              mg_cheby_degree=2),
        "ms64-d1-wd2":   dict(mg_min_size=64, mg_cheby_degree=1,
                              mg_w_depth=2),
        # W with minimal depth
        "wd1-d2":        dict(mg_cheby_degree=2, mg_w_depth=1),
        # round 5: coarse-solve share isolation — ci is the coarsest
        # level's Chebyshev degree; the default ladder visits the
        # coarsest 4x per W-cycle, so the ci4->ci12->ci24 slope in
        # us/iter isolates what the 32² coarse solve costs per
        # iteration (candidate for an MXU dense solve if large)
        "d1-wd2-ci4":    dict(mg_cheby_degree=1, mg_w_depth=2,
                              mg_coarse_iters=4),
        "d1-wd2-ci24":   dict(mg_cheby_degree=1, mg_w_depth=2,
                              mg_coarse_iters=24),
        # round 5: fine-pass share isolation at fixed coarse work
        "d1-v":          dict(mg_cheby_degree=1, mg_cycle="v"),
    }
    names = args.schedules or list(SCHEDULES)

    from euler_tpu.ops.pallas.mg_kernel import solve_pressure_mg_pallas

    for name in names:
        ov = SCHEDULES[name]
        scfg = dataclasses.replace(cfg, solver=SolverConfig(**base, **ov))
        for frame, b, a_diag, fluid in systems:
            try:
                tc0 = time.perf_counter()
                p, iters, resid = solve_pressure_mg_pallas(
                    scfg, b, a_diag, fluid, solid)
                it0 = int(iters)
                compile_s = time.perf_counter() - tc0
                tm0 = time.perf_counter()
                for _ in range(args.reps):
                    p, iters, resid = solve_pressure_mg_pallas(
                        scfg, b, a_diag, fluid, solid)
                resid_f = float(resid)  # sync
                elapsed = time.perf_counter() - tm0
                ms = elapsed / args.reps * 1e3
                emit({
                    "schedule": name, "frame": frame, "iters": it0,
                    "resid": resid_f, "ms_per_solve": round(ms, 3),
                    "us_per_iter": round(ms * 1e3 / max(it0, 1), 1),
                    "compile_s": round(compile_s, 1),
                    "overrides": ov,
                })
            except Exception as e:  # noqa: BLE001 — record and continue
                emit({"schedule": name, "frame": frame,
                      "error": repr(e)[:300]})
                break  # same config will fail on the other system too

    # jacobi-kernel control row: the per-iteration latency floor
    from euler_tpu.ops.pallas.pcg_kernel import solve_pressure_pallas

    jcfg = dataclasses.replace(
        cfg, solver=SolverConfig(
            max_iterations=100, tol=1e-6, tol_rel=0.0,
            dtype="float32", preconditioner="jacobi", use_pallas=True))
    for frame, b, a_diag, fluid in systems:
        try:
            p, iters, resid = solve_pressure_pallas(
                jcfg, b, a_diag, fluid)
            it0 = int(iters)
            tm0 = time.perf_counter()
            for _ in range(args.reps):
                p, iters, resid = solve_pressure_pallas(
                    jcfg, b, a_diag, fluid)
            resid_f = float(resid)
            ms = (time.perf_counter() - tm0) / args.reps * 1e3
            emit({"schedule": "jacobi-100", "frame": frame, "iters": it0,
                  "resid": resid_f, "ms_per_solve": round(ms, 3),
                  "us_per_iter": round(ms * 1e3 / max(it0, 1), 1)})
        except Exception as e:  # noqa: BLE001
            emit({"schedule": "jacobi-100", "frame": frame,
                  "error": repr(e)[:300]})
            break


if __name__ == "__main__":
    main()

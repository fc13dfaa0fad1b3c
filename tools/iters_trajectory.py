"""Per-substep MG-PCG iteration counts on the real 1024² trajectory,
warm vs cold (VERDICT r4 item 7: decide the warm-start default on
iters/substep evidence, not frame-time drift).

Replays dam-break frames substep-by-substep through the OP-BY-OP path
(fuse_projection off; the standalone single-launch MG kernel still does
each solve), capturing for every ACTIVE substep the system
(b, a_diag, fluid) and the previous substep's clamped pressure, then
solves each system twice — cold and warm-started from that pressure —
and records both iteration counts.

Appends JSONL rows {frame, substep, iters_cold, iters_warm, binf} to
ITERS_r5.jsonl plus a summary row.

Run: python tools/iters_trajectory.py [--size 1024] [--frames 4 8 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--frames", type=int, nargs="+", default=[4, 8, 16],
                    help="capture every substep of THESE frames")
    ap.add_argument("--out", default="ITERS_r5.jsonl")
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
    from euler_tpu.ops.pallas.mg_kernel import solve_pressure_mg_pallas
    from euler_tpu.ops.project import divergence_rhs, pressure_matrix_diag
    from euler_tpu.parallel.spatial import to_spatial
    from euler_tpu.sim import _dt_from_msq, step_frame, substep

    # state generation: the bench jacobi chain (r3/r4-warmed cache)
    gen_cfg = SimConfig(
        nx=args.size, ny=args.size,
        marker_layout="slots", marker_tile=(128, 512),
        use_pallas_markers=True,
        solver=SolverConfig(
            max_iterations=100, tol=1e-6, tol_rel=1e-6,
            dtype="float32", preconditioner="jacobi",
            use_pallas=True, fuse_projection=True,
        ),
    )
    # solve config: the converged-mode defaults (d1 + wd2 schedule)
    mg_cfg = SimConfig(
        nx=args.size, ny=args.size, marker_layout="slots",
        marker_tile=(128, 512), use_pallas_markers=True,
        solver=SolverConfig(
            max_iterations=100, tol=1e-6, tol_rel=1e-4,
            dtype="float32", preconditioner="mg", use_pallas=True,
        ),
    )
    scn, state = dam_break(gen_cfg)
    state = to_spatial(gen_cfg, state)

    def _chain(scn, state, _n=4):
        for _ in range(_n):
            state = step_frame(gen_cfg, scn, state)
        return state

    step4 = jax.jit(_chain)

    # one substep of the generation config, returning the solve system
    # BEFORE projection plus the post-projection state (the projection
    # runs inside, matching the trajectory bitwise)
    @jax.jit
    def sub_capture(state, frame_time, msq):
        active = frame_time > 0.0
        dt = _dt_from_msq(gen_cfg, msq,
                          jnp.asarray(frame_time, state.u.dtype))
        dt = jnp.where(active, dt, jnp.asarray(0.0, state.u.dtype))
        new_state, new_msq = substep(gen_cfg, scn, state, dt,
                                     active=active)
        fluid = new_state.marker_count > 0
        b = divergence_rhs(gen_cfg, new_state.u, new_state.v, fluid,
                           jnp.where(active, dt, jnp.inf))
        a_diag = pressure_matrix_diag(gen_cfg, scn.solid, fluid)
        frame_time = jnp.where(active, frame_time - dt, frame_time)
        msq = jnp.where(active, new_msq.astype(msq.dtype), msq)
        return new_state, frame_time, msq, b, a_diag, fluid, active

    out = open(args.out, "a", buffering=1)

    def emit(row):
        out.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    t0 = time.perf_counter()
    frame = 0
    solid = scn.solid
    rows = []
    for target in sorted(args.frames):
        while frame < target - 1:
            state = step4(scn, state)
            frame += 4
        # walk one frame substep-by-substep; warm guess = previous
        # substep's pressure within this frame (clamped, as carried)
        frame += 1
        frame_time = jnp.asarray(gen_cfg.frame_time, state.u.dtype)
        msq = max_speed_sq(gen_cfg, state.u, state.v)
        p_prev = None
        for s in range(gen_cfg.max_substeps):
            (state, frame_time, msq, b, a_diag, fluid,
             active) = sub_capture(state, frame_time, msq)
            if not bool(active):
                break
            p_c, it_c, r_c = solve_pressure_mg_pallas(
                mg_cfg, b, a_diag, fluid, solid)
            if p_prev is not None:
                p_w, it_w, r_w = solve_pressure_mg_pallas(
                    mg_cfg, b, a_diag, fluid, solid, x0=p_prev)
            else:
                it_w, r_w = it_c, r_c
            row = {
                "frame": frame, "substep": s,
                "iters_cold": int(it_c), "iters_warm": int(it_w),
                "binf": float(jnp.max(jnp.abs(b))),
                "resid_cold": float(r_c), "resid_warm": float(r_w),
                "t": round(time.perf_counter() - t0, 1),
            }
            rows.append(row)
            emit(row)
            # the trajectory's warm guess is the previous CLAMPED
            # pressure (sim carries max(p, 0) on fluid)
            p_prev = jnp.where(fluid, jnp.maximum(p_c, 0.0), 0.0)

    warm_rows = [r for r in rows if r["substep"] > 0]
    if warm_rows:
        emit({
            "summary": True,
            "n": len(warm_rows),
            "mean_iters_cold": round(
                sum(r["iters_cold"] for r in warm_rows) / len(warm_rows), 2),
            "mean_iters_warm": round(
                sum(r["iters_warm"] for r in warm_rows) / len(warm_rows), 2),
        })


if __name__ == "__main__":
    main()

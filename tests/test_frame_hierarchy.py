"""Frame-stale Galerkin coarse hierarchy (cfg.solver.mg_frame_hierarchy).

The coarse levels of the MG preconditioner are rebuilt once per frame
(from the frame's incoming fluid mask) instead of once per substep; the
Krylov-side fine operator and the fine Chebyshev row stay per-substep
exact, so the solve still converges to the same tol_rel residual of the
CURRENT system — staleness may only cost iterations (PERF.md round 5).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.pallas.mg_kernel import mg_coarse_bundle
from euler_tpu.ops.pallas.substep_kernel import (
    project_substep_mg,
    substep_fused_fits,
)
from euler_tpu.ops.project import pressure_matrix_diag
from euler_tpu.sim import step_frame_jit


def _cfg(**solver_kw):
    return SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(
            max_iterations=100, dtype="float32", tol_rel=1e-4,
            preconditioner="mg", **solver_kw,
        ),
    )


def test_stale_coarse_hierarchy_still_converges():
    """Preconditioning with a one-frame-old coarse hierarchy must reach
    the same stopping tolerance on the current system; the projected
    velocities match the fresh-hierarchy solve to solver tolerance."""
    cfg = _cfg()
    assert substep_fused_fits(cfg)
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)
    stale_state = st                      # mask as of frame 3
    st = step_frame_jit(cfg, scn, st)     # mask moves for one more frame
    dt = jnp.float32(0.03)

    a0 = pressure_matrix_diag(cfg, scn.solid, stale_state.fluid)
    stale = mg_coarse_bundle(cfg, a0, stale_state.fluid)
    # the masks genuinely differ, or the test tests nothing
    assert int(jnp.sum(stale_state.fluid != st.fluid)) > 0

    u_f, v_f, it_f, res_f, msq_f, _ = project_substep_mg(
        cfg, dt, dt, st.u, st.v, st.fluid, st.prev_fluid, scn.solid,
        interpret=True,
    )
    u_s, v_s, it_s, res_s, msq_s, _ = project_substep_mg(
        cfg, dt, dt, st.u, st.v, st.fluid, st.prev_fluid, scn.solid,
        interpret=True, mg_coarse=stale,
    )

    # both solves met the SAME current-system stopping rule
    assert float(res_s) <= max(1.05 * float(res_f), 1e-3)
    # staleness may cost a few iterations, not divergence
    assert int(it_s) <= int(it_f) + 8
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_f), atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_f), atol=2e-3)


def test_frame_hierarchy_step_frame_matches():
    """step_frame with mg_frame_hierarchy on vs off (fused interpret
    path): same converged physics to solver tolerance, identical cell
    occupancy over a short horizon."""

    def fused(cfg):
        return dataclasses.replace(
            cfg, solver=dataclasses.replace(
                cfg.solver, fuse_projection=True, use_pallas=True,
                pallas_interpret=True))

    cfg_on = fused(_cfg(mg_frame_hierarchy=True))
    cfg_off = fused(_cfg())
    scn, st_on = dam_break(cfg_on)
    _, st_off = dam_break(cfg_off)

    for _ in range(3):
        st_on = step_frame_jit(cfg_on, scn, st_on)
        st_off = step_frame_jit(cfg_off, scn, st_off)

    np.testing.assert_array_equal(np.asarray(st_on.marker_count),
                                  np.asarray(st_off.marker_count))
    du = np.abs(np.asarray(st_on.u) - np.asarray(st_off.u))
    # engagement guard: if the step_frame wiring stopped passing the
    # frame bundle through, both runs would be BITWISE identical and
    # this test would pass vacuously — the masks move across 3 frames,
    # so the stale-coarse iterate path must differ in low-order bits
    assert float(du.max()) > 0.0
    np.testing.assert_allclose(np.asarray(st_on.u), np.asarray(st_off.u),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_on.v), np.asarray(st_off.v),
                               atol=5e-3)

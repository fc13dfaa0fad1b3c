"""In-kernel MG-PCG vs the XLA multigrid-preconditioned solver."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops import project as P
from euler_tpu.ops.pallas.mg_kernel import (
    mg_pallas_fits,
    solve_pressure_mg_pallas,
)
from euler_tpu.sim import step_frame_jit


def _mid_sim_system(cfg, n_frames=3, dt=0.03):
    """A real (b, a_diag, fluid, solid) a few frames into a dam break."""
    scn, st = dam_break(cfg)
    for _ in range(n_frames):
        st = step_frame_jit(cfg, scn, st)
    fluid = st.fluid
    b = P.divergence_rhs(cfg, st.u, st.v, fluid, jnp.float32(dt))
    a_diag = P.pressure_matrix_diag(cfg, scn.solid, fluid)
    return b, a_diag, fluid, scn.solid


def test_mg_kernel_converges_and_matches_xla():
    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(
            max_iterations=60, tol=1e-5, dtype="float32",
            preconditioner="mg",
            # small coarse budget: the kernel unrolls every sweep, and
            # XLA-CPU compile time of the interpret-mode graph is
            # superlinear in coarse_iters
            mg_coarse_iters=4,
        ),
    )
    assert mg_pallas_fits(cfg)
    b, a_diag, fluid, solid = _mid_sim_system(cfg)

    p_ref, it_ref, res_ref = P.solve_pressure(cfg, b, a_diag, fluid, solid)
    p, iters, resid = solve_pressure_mg_pallas(
        cfg, b, a_diag, fluid, solid, interpret=True
    )

    # both must hit the tolerance-based exit, in a comparable number of
    # iterations (identical V-cycle algorithm; only FP ordering differs)
    assert float(res_ref) <= cfg.solver.tol
    assert float(resid) <= cfg.solver.tol
    assert int(iters) <= int(it_ref) + 4
    # the converged pressure agrees to solver tolerance
    scale = max(1.0, float(jnp.max(jnp.abs(p_ref))))
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(p_ref), atol=5e-4 * scale
    )
    # and actually annihilates the residual: ||b - A p||_inf <= tol
    r = np.asarray(b - P.apply_a(a_diag, fluid, p))
    assert np.abs(r).max() <= cfg.solver.tol * 2


def test_mg_kernel_zero_rhs():
    cfg = SimConfig(
        nx=32, ny=32,
        solver=SolverConfig(dtype="float32", preconditioner="mg",
                            mg_min_size=16, mg_coarse_iters=4,
                            max_iterations=10),
    )
    Y, X = cfg.ny, cfg.nx
    fluid = jnp.zeros((Y, X), bool)
    solid = jnp.zeros((Y, X), bool)
    b = jnp.zeros((Y, X), jnp.float32)
    a_diag = P.pressure_matrix_diag(cfg, solid, fluid)
    p, iters, resid = solve_pressure_mg_pallas(
        cfg, b, a_diag, fluid, solid, interpret=True
    )
    assert int(iters) == 0
    assert float(resid) == 0.0
    assert not np.asarray(p).any()


def test_mg_fits_gating():
    # the reference's 100x40 coarsens evenly to 50x20 at min_size 32
    cfg = SimConfig(nx=100, ny=40,
                    solver=SolverConfig(preconditioner="mg",
                                        dtype="float32"))
    assert mg_pallas_fits(cfg)
    # but an odd level size before min_size must refuse (no in-kernel
    # padding): 100x40 -> 50x20 -> 25x10 stops short of min_size 8
    cfg = SimConfig(nx=100, ny=40,
                    solver=SolverConfig(preconditioner="mg",
                                        dtype="float32", mg_min_size=8))
    assert not mg_pallas_fits(cfg)
    # jacobi never routes here
    cfg = SimConfig(nx=64, ny=64,
                    solver=SolverConfig(preconditioner="jacobi",
                                        dtype="float32"))
    assert not mg_pallas_fits(cfg)

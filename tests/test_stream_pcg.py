"""HBM-streamed PCG kernel vs the XLA PCG loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops import project as P
from euler_tpu.ops.pallas import pcg_stream_kernel as SK
from euler_tpu.sim import step_frame_jit


def _system(cfg, n_frames=3, dt=0.03):
    scn, st = dam_break(cfg)
    for _ in range(n_frames):
        st = step_frame_jit(cfg, scn, st)
    fluid = st.fluid
    b = P.divergence_rhs(cfg, st.u, st.v, fluid, jnp.float32(dt))
    a_diag = P.pressure_matrix_diag(cfg, scn.solid, fluid)
    return b, a_diag, fluid


@pytest.mark.parametrize("block_rows", [32, 64])
def test_stream_matches_xla(monkeypatch, block_rows):
    """Multi-block streamed solve == the XLA loop to solver tolerance.
    The merged-sweep As recurrence reorders float ops, so iterates drift
    a few ulps — solutions agree to tolerance, iterations within a few."""
    monkeypatch.setattr(SK, "_block_rows", lambda Y, X: block_rows)
    cfg = SimConfig(
        nx=128, ny=128, marker_layout="slots",
        solver=SolverConfig(max_iterations=200, tol=1e-5, tol_rel=1e-5,
                            dtype="float32"),
    )
    b, a_diag, fluid = _system(cfg)
    assert SK.stream_solver_fits(cfg)

    p_ref, it_ref, res_ref = P.solve_pressure(cfg, b, a_diag, fluid, None)
    p, iters, resid = SK.solve_pressure_stream(
        cfg, b, a_diag, fluid, interpret=True
    )

    b_norm = float(jnp.max(jnp.abs(b)))
    tol_eff = max(cfg.solver.tol, cfg.solver.tol_rel * b_norm)
    assert float(res_ref) <= tol_eff
    assert float(resid) <= tol_eff
    assert abs(int(iters) - int(it_ref)) <= 10
    scale = max(1.0, float(jnp.max(jnp.abs(p_ref))))
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               atol=2e-3 * scale)


def test_block_rows_divides_any_8_multiple():
    """Regression: for Y % 8 == 0 but not a power of two (2560, 3000 —
    exactly the beyond-VMEM sizes this kernel serves) the old halving
    search could skip every valid multiple-of-8 divisor and reach 0."""
    for Y in (2560, 3000, 4096, 1024, 24, 8, 1048576 // 8):
        c = SK._block_rows(Y, 2560)
        assert c % 8 == 0 and Y % c == 0, (Y, c)


def test_stream_zero_rhs(monkeypatch):
    monkeypatch.setattr(SK, "_block_rows", lambda Y, X: 16)
    cfg = SimConfig(nx=64, ny=64,
                    solver=SolverConfig(dtype="float32", max_iterations=50))
    Y, X = cfg.ny, cfg.nx
    fluid = jnp.zeros((Y, X), bool)
    b = jnp.zeros((Y, X), jnp.float32)
    a_diag = P.pressure_matrix_diag(cfg, jnp.zeros((Y, X), bool), fluid)
    p, iters, resid = SK.solve_pressure_stream(
        cfg, b, a_diag, fluid, interpret=True
    )
    assert int(iters) == 0
    assert float(resid) == 0.0
    assert not np.asarray(p).any()

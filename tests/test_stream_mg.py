"""HBM-streamed MG-PCG kernel vs the XLA multigrid solve (interpret)."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops import multigrid as MG
from euler_tpu.ops import project as P
from euler_tpu.ops.forces import calculate_timestep
from euler_tpu.ops.pallas.mg_stream_kernel import (
    solve_pressure_mg_stream,
    stream_mg_fits,
)
from euler_tpu.sim import step_frame_jit


def _system(N=128, frame=3):
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


def test_stream_mg_converges_and_matches_xla():
    cfg, b, a, fluid, solid = _system()
    assert stream_mg_fits(cfg)

    p, iters, resid = solve_pressure_mg_stream(
        cfg, b, a, fluid, solid, interpret=True
    )
    b_norm = float(jnp.max(jnp.abs(b)))
    tol_eff = max(1e-6, 1e-4 * b_norm)
    assert float(resid) <= tol_eff
    assert 0 < int(iters) <= 40

    # true residual, not just the recurrence's
    r_true = np.asarray(b - P.apply_a(a, fluid, p))
    assert np.abs(r_true).max() <= 4 * tol_eff

    # agreement with the XLA mg solve (both tol_rel-converged; the
    # iterates differ, so compare through the solution scale)
    precon = MG.make_mg_preconditioner(cfg, solid, fluid, jnp.float32,
                                       a_diag=a)
    p_ref, _, _ = P.pcg_loop(
        cfg, b, lambda s: P.apply_a(a, fluid, s), precon
    )
    # two independently tol_rel-converged CG runs agree only to the
    # solve's own accuracy, ~tol_rel amplified through A^{-1} (each is
    # separately pinned to the true residual above)
    scale = float(jnp.max(jnp.abs(p_ref))) or 1.0
    np.testing.assert_allclose(np.asarray(p) / scale,
                               np.asarray(p_ref) / scale, atol=1e-2)


def test_stream_mg_zero_rhs_exits():
    cfg, b, a, fluid, solid = _system()
    p, iters, resid = solve_pressure_mg_stream(
        cfg, jnp.zeros_like(b), a, fluid, solid, interpret=True
    )
    assert int(iters) == 0
    assert float(resid) == 0.0
    assert float(jnp.abs(p).max()) == 0.0


def test_stream_mg_level_skip_f4(monkeypatch):
    """The F=4 transfer (restrict past the half level — the 4096²
    configuration, where 2048² doesn't fit VMEM): force the resident
    root two levels down and verify convergence + the true residual."""
    import dataclasses

    import euler_tpu.ops.pallas.mg_stream_kernel as K

    cfg, b, a, fluid, solid = _system()
    # a distinct static cfg forces a fresh trace — the jit cache would
    # otherwise silently reuse the F=2 executable from the test above
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iterations=99))
    monkeypatch.setattr(K, "_resident_start", lambda shapes: 2)
    p, iters, resid = K.solve_pressure_mg_stream(
        cfg, b, a, fluid, solid, interpret=True
    )
    b_norm = float(jnp.max(jnp.abs(b)))
    tol_eff = max(1e-6, 1e-4 * b_norm)
    assert float(resid) <= tol_eff
    assert 0 < int(iters) <= 50
    r_true = np.asarray(b - P.apply_a(a, fluid, p))
    assert np.abs(r_true).max() <= 4 * tol_eff


def test_stream_mg_rectangular_and_speckled():
    """Non-square grid + irregular free-surface geometry (random speckle
    holes): exercises rectangular lane-transfer matrices and the
    measured Gershgorin bounds (a static lmax estimate diverges on
    speckled masks — ops/multigrid._edge_level)."""
    rng = np.random.default_rng(7)
    Y, X = 128, 256
    cfg = SimConfig(
        nx=X, ny=Y, marker_layout="slots",
        solver=SolverConfig(max_iterations=100, tol=1e-6, tol_rel=1e-4,
                            dtype="float32", preconditioner="mg"),
    )
    fluid = np.zeros((Y, X), bool)
    fluid[1:-1, 1:-1] = True
    # speckle: knock out ~20% random cells + a slab of air
    fluid &= rng.random((Y, X)) > 0.2
    fluid[Y // 2:, :] = False
    solid = np.zeros((Y, X), bool)
    solid[10:12, 5:-5] = True
    fluid &= ~solid
    b = (rng.standard_normal((Y, X)).astype(np.float32) * fluid)

    fluid = jnp.asarray(fluid)
    solid = jnp.asarray(solid)
    b = jnp.asarray(b)
    a = P.pressure_matrix_diag(cfg, solid, fluid)

    assert stream_mg_fits(cfg)
    p, iters, resid = solve_pressure_mg_stream(
        cfg, b, a, fluid, solid, interpret=True
    )
    b_norm = float(jnp.max(jnp.abs(b)))
    tol_eff = max(1e-6, 1e-4 * b_norm)
    assert float(resid) <= tol_eff
    r_true = np.asarray(b - P.apply_a(a, fluid, p))
    assert np.abs(r_true).max() <= 4 * tol_eff

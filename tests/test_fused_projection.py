"""Fused one-launch projection kernel vs the XLA projection path."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.advect import advect_u, advect_v
from euler_tpu.ops.extrapolate import extrapolate
from euler_tpu.ops.forces import apply_body_forces, max_speed_sq, zero_bounds
from euler_tpu.ops.pallas.pcg_kernel import project_pallas
from euler_tpu.ops.project import project
from euler_tpu.sim import step_frame_jit


def _mid_sim_faces(cfg, scn, st, dt):
    """The substep's pre-projection (ut, vt) a few frames into a run."""
    fluid, prev = st.fluid, st.prev_fluid
    u = extrapolate(cfg, st.u, fluid, prev, "u")
    v = extrapolate(cfg, st.v, fluid, prev, "v")
    u = zero_bounds(cfg, u, fluid, scn.solid, "u")
    v = zero_bounds(cfg, v, fluid, scn.solid, "v")
    ut = advect_u(cfg, u, v, fluid, dt)
    vt = advect_v(cfg, u, v, fluid, dt)
    vt = apply_body_forces(cfg, vt, dt)
    ut = zero_bounds(cfg, ut, fluid, scn.solid, "u")
    vt = zero_bounds(cfg, vt, fluid, scn.solid, "v")
    return ut, vt, fluid


def test_fused_projection_matches_xla():
    """divergence + PCG + clamp + face update + maxsq in one kernel must
    reproduce the op-by-op projection (reduction-order-level agreement)."""
    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=300, tol=1e-5, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(4):
        st = step_frame_jit(cfg, scn, st)
    dt = jnp.float32(0.025)
    ut, vt, fluid = _mid_sim_faces(cfg, scn, st, dt)

    u_ref, v_ref, info = project(cfg, dt, ut, vt, fluid, scn.solid)
    u_got, v_got, iters, resid, msq = project_pallas(
        cfg, dt, ut, vt, fluid, scn.solid, interpret=True
    )

    assert float(info["residual"]) <= cfg.solver.tol
    assert float(resid) <= cfg.solver.tol
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               atol=5e-4)

    # the emitted maxsq must be exactly maxsq(u2)+maxsq(v2) of the
    # kernel's own outputs (it feeds the next substep's CFL dt)
    want_msq = float(max_speed_sq(cfg, u_got, v_got))
    assert float(msq) == want_msq


def test_fused_projection_zero_rhs():
    """All-air grid: zero RHS takes the all_zero early-out (main.c:742)
    and the face update must leave velocities zero everywhere."""
    cfg = SimConfig(
        nx=32, ny=32,
        solver=SolverConfig(max_iterations=50, dtype="float32"),
    )
    Y, X = cfg.ny, cfg.nx
    fluid = jnp.zeros((Y, X), bool)
    solid = jnp.zeros((Y, X), bool)
    ut = jnp.zeros((Y, X), jnp.float32)
    vt = jnp.zeros((Y, X), jnp.float32)
    u2, v2, iters, resid, msq = project_pallas(
        cfg, jnp.float32(0.05), ut, vt, fluid, solid, interpret=True
    )
    assert int(iters) == 0
    assert float(msq) == 0.0
    assert not np.asarray(u2).any()
    assert not np.asarray(v2).any()

"""Fused Pallas grid stage vs the op-by-op jnp sequence."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.advect import advect_u, advect_v
from euler_tpu.ops.extrapolate import extrapolate
from euler_tpu.ops.forces import apply_body_forces, zero_bounds
from euler_tpu.ops.pallas.grid_kernel import grid_stage_pallas
from euler_tpu.sim import step_frame_jit


def test_grid_stage_matches_jnp_sequence():
    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)
    # make prev != current so extrapolation has work to do
    st2 = step_frame_jit(cfg, scn, st)
    dt = jnp.float32(0.03)

    fluid, prev = st2.fluid, st2.prev_fluid
    u = extrapolate(cfg, st2.u, fluid, prev, "u")
    v = extrapolate(cfg, st2.v, fluid, prev, "v")
    u = zero_bounds(cfg, u, fluid, scn.solid, "u")
    v = zero_bounds(cfg, v, fluid, scn.solid, "v")
    ut_ref = advect_u(cfg, u, v, fluid, dt)
    vt_ref = advect_v(cfg, u, v, fluid, dt)
    vt_ref = apply_body_forces(cfg, vt_ref, dt)
    ut_ref = zero_bounds(cfg, ut_ref, fluid, scn.solid, "u")
    vt_ref = zero_bounds(cfg, vt_ref, fluid, scn.solid, "v")

    ut, vt = grid_stage_pallas(
        cfg, st2.u, st2.v, fluid, prev, scn.solid, dt, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ut), np.asarray(ut_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(vt_ref), atol=2e-4)

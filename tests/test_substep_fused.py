"""Mega-fused substep kernel (grid stage + projection in one launch) vs
the op-by-op path, in interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.advect import advect_u, advect_v
from euler_tpu.ops.extrapolate import extrapolate
from euler_tpu.ops.forces import apply_body_forces, max_speed_sq, zero_bounds
from euler_tpu.ops.pallas.mg_kernel import solve_pressure_mg_pallas
from euler_tpu.ops.pallas.substep_kernel import (
    project_substep_mg,
    substep_fused_fits,
)
from euler_tpu.ops.project import divergence_rhs, pressure_matrix_diag
from euler_tpu.sim import step_frame_jit


def _cfg():
    return SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(
            max_iterations=100, dtype="float32", tol_rel=1e-4,
            preconditioner="mg",
        ),
    )


def _reference(cfg, scn, st, dt, dt_proj):
    """The op-by-op substep tail: jnp grid ops + interpret-mode MG solve
    + the projection tail of ops/project.project."""
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

    b = divergence_rhs(cfg, ut, vt, fluid, dt_proj)
    a_diag = pressure_matrix_diag(cfg, scn.solid, fluid)
    p, iters, resid = solve_pressure_mg_pallas(
        cfg, b, a_diag, fluid, scn.solid, interpret=True
    )
    p = jnp.where(fluid, jnp.maximum(p, 0), 0).astype(jnp.float32)

    from euler_tpu.core.state import (
        shift_right,
        shift_up,
        u_property,
        v_property,
        valid_region,
    )

    f = jnp.float32
    c = jnp.asarray(-1.0 / (cfg.density * cfg.side_length), f)
    u_keep = (valid_region(cfg, "u") & ~u_property(scn.solid)
              & u_property(fluid))
    u2 = jnp.where(u_keep, ut + (c * (shift_right(p) - p)) * dt, 0.0)
    v_keep = (valid_region(cfg, "v") & ~v_property(scn.solid)
              & v_property(fluid))
    v2 = jnp.where(v_keep, vt + (c * (shift_up(p) - p)) * dt, 0.0)
    return u2, v2, iters, max_speed_sq(cfg, u2, v2)


def _developed_state(cfg):
    scn, st = dam_break(cfg)
    for _ in range(4):
        st = step_frame_jit(cfg, scn, st)
    return scn, st


def test_fused_substep_matches_op_sequence():
    cfg = _cfg()
    assert substep_fused_fits(cfg)
    scn, st = _developed_state(cfg)
    dt = jnp.float32(0.03)

    u_ref, v_ref, it_ref, msq_ref = _reference(cfg, scn, st, dt, dt)
    u2, v2, iters, resid, msq, _p = project_substep_mg(
        cfg, dt, dt, st.u, st.v, st.fluid, st.prev_fluid, scn.solid,
        interpret=True,
    )

    # grid stage matches at FMA-contraction level; the solve amplifies
    # that slightly through the pressure gradient
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref),
                               atol=2e-3)
    assert abs(int(iters) - int(it_ref)) <= 1
    np.testing.assert_allclose(float(msq), float(msq_ref), rtol=1e-3)


def test_fused_substep_inactive_is_free():
    """dt = 0 (inactive substep) with dt_proj = +inf: the RHS is exactly
    zero, the solve exits with 0 iterations, and the outputs are finite
    (they are select-discarded by sim.py, but must not poison anything
    downstream of a where())."""
    cfg = _cfg()
    scn, st = _developed_state(cfg)
    u2, v2, iters, resid, msq, _p = project_substep_mg(
        cfg, jnp.float32(0.0), jnp.float32(np.inf),
        st.u, st.v, st.fluid, st.prev_fluid, scn.solid, interpret=True,
    )
    assert int(iters) == 0
    assert float(resid) == 0.0
    assert np.isfinite(np.asarray(u2)).all()
    assert np.isfinite(np.asarray(v2)).all()
    assert np.isfinite(float(msq))


def test_fused_substep_frame_parity():
    """step_frame with the fused-substep path vs the op-by-op path: the
    two differ only at FMA-contraction level, so short-horizon frames
    must agree to float tolerance and cell occupancy exactly."""
    import dataclasses

    cfg_f = _cfg()
    assert cfg_f.solver.fuse_projection is False  # default off
    cfg_f = dataclasses.replace(
        cfg_f, solver=dataclasses.replace(cfg_f.solver,
                                          fuse_projection=True,
                                          use_pallas=True,
                                          pallas_interpret=True))
    cfg_r = _cfg()
    scn, st_f = dam_break(cfg_f)
    _, st_r = dam_break(cfg_r)

    from euler_tpu.sim import step_frame

    for _ in range(2):
        st_f = step_frame(cfg_f, scn, st_f)
        st_r = step_frame(cfg_r, scn, st_r)

    np.testing.assert_array_equal(np.asarray(st_f.marker_count),
                                  np.asarray(st_r.marker_count))
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_r.u),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v),
                               atol=5e-3)


def test_fused_substep_jacobi_matches_fused_projection():
    """The jacobi speed-mode variant: grid sweeps + the fused projection
    kernel in one launch must match jnp grid ops + project_pallas."""
    import dataclasses

    from euler_tpu.ops.pallas.pcg_kernel import project_pallas
    from euler_tpu.ops.pallas.substep_kernel import (
        project_substep_jacobi,
        substep_jacobi_fused_fits,
    )

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver,
                                        preconditioner="jacobi"))
    assert substep_jacobi_fused_fits(cfg)
    scn, st = _developed_state(cfg)
    dt = jnp.float32(0.03)
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
    u_ref, v_ref, it_ref, _res, msq_ref = project_pallas(
        cfg, dt, ut, vt, fluid, scn.solid, interpret=True
    )

    u2, v2, iters, resid, msq = project_substep_jacobi(
        cfg, dt, dt, st.u, st.v, fluid, prev, scn.solid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref),
                               atol=2e-3)
    assert abs(int(iters) - int(it_ref)) <= 1
    np.testing.assert_allclose(float(msq), float(msq_ref), rtol=1e-3)


def test_fused_substep_frame_parity_interior_solids():
    """Same as test_fused_substep_frame_parity but on a scenario with
    INTERIOR solid obstacles (block.txt-style shelf), which exercises the
    grid stage's solid-property masking and the marker march's collision
    handling near non-boundary solids."""
    import dataclasses

    from euler_tpu.core.scenario import build_scenario

    text = (
        b"0000000000\n"
        b"0000000000\n"
        b"0000000000\n"
        b"\n"
        b"   XXXX\n"
        b"\n"
        b"XX      XX\n"
    )
    cfg_f = _cfg()
    cfg_f = dataclasses.replace(
        cfg_f, nx=32, ny=32,
        solver=dataclasses.replace(cfg_f.solver, fuse_projection=True,
                                   use_pallas=True, pallas_interpret=True))
    cfg_r = dataclasses.replace(_cfg(), nx=32, ny=32)
    scn, st_f = build_scenario(text, cfg_f)
    _, st_r = build_scenario(text, cfg_r)

    from euler_tpu.sim import step_frame

    for _ in range(3):
        st_f = step_frame(cfg_f, scn, st_f)
        st_r = step_frame(cfg_r, scn, st_r)

    np.testing.assert_array_equal(np.asarray(st_f.marker_count),
                                  np.asarray(st_r.marker_count))
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_r.u),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v),
                               atol=5e-3)


def test_fused_substep_with_padded_store():
    """The bench's --padded-store configuration: persistent padded slot
    store AND the fused substep together must match the op-by-op path on
    counts exactly (velocities to FMA slack)."""
    import dataclasses

    cfg_f = _cfg()
    cfg_f = dataclasses.replace(
        cfg_f, use_pallas_markers=True, pallas_interpret=True,
        marker_padded_store=True,
        solver=dataclasses.replace(cfg_f.solver, fuse_projection=True,
                                   use_pallas=True,
                                   pallas_interpret=True))
    cfg_r = _cfg()
    scn, st_f = dam_break(cfg_f)
    _, st_r = dam_break(cfg_r)

    from euler_tpu.sim import step_frame

    for _ in range(2):
        st_f = step_frame(cfg_f, scn, st_f)
        st_r = step_frame(cfg_r, scn, st_r)

    np.testing.assert_array_equal(np.asarray(st_f.marker_count),
                                  np.asarray(st_r.marker_count))
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_r.u),
                               atol=5e-3)
    assert st_f.markers.shape == st_r.markers.shape  # unpadded outside

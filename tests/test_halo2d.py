"""2D domain decomposition: ("y", "x") block sharding of the grid.

Covers the ROADMAP backlog item: column halo exchange in the explicit
shard_map solver, and the full frame step under a ("data", "y", "x")
GSPMD mesh.  Runs on the 8 virtual CPU devices (conftest.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.ops import project as P
from euler_tpu.parallel.batch import build_batch, step_frame_batched_jit
from euler_tpu.parallel.halo import make_sharded_pressure_solver
from euler_tpu.parallel.mesh import make_mesh, make_sharded_step, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_pcg_2d_matches_single_device():
    """4x2 ("y", "x") block-sharded PCG vs the single-device solver."""
    N = 64
    rng = np.random.default_rng(1)
    fluid = np.zeros((N, N), bool)
    fluid[1:-1, 1:-1] = True
    solid = np.zeros((N, N), bool)
    solid[20:24, 5:50] = True
    solid[40:44, 30:34] = True
    fluid &= ~solid
    b = rng.standard_normal((N, N)) * fluid

    cfg = SimConfig(
        nx=N,
        ny=N,
        solver=SolverConfig(
            max_iterations=600, tol=1e-10, dtype="float64",
            preconditioner="jacobi",
        ),
    )
    fluid_j = jnp.asarray(fluid)
    a = P.pressure_matrix_diag(cfg, jnp.asarray(solid), fluid_j)
    b_j = jnp.asarray(b)

    p_ref, iters, resid = P.solve_pressure(cfg, b_j, a, fluid_j)
    assert float(resid) <= cfg.solver.tol

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("y", "x"))
    solver = make_sharded_pressure_solver(cfg, mesh, axes=("y", "x"))
    p_sharded = solver(b_j, a, fluid_j)

    np.testing.assert_allclose(
        np.asarray(p_sharded), np.asarray(p_ref), atol=1e-8
    )

    # block-Jacobi MG precon on 2D blocks: same pressure, fewer iters
    cfg_mg = SimConfig(
        nx=N, ny=N,
        solver=SolverConfig(
            max_iterations=600, tol=1e-10, dtype="float64",
            preconditioner="mg", mg_min_size=8,
        ),
    )
    mg = make_sharded_pressure_solver(cfg_mg, mesh, axes=("y", "x"),
                                      stats=True)
    p_mg, iters_mg, resid_mg = mg(b_j, a, fluid_j)
    assert float(resid_mg) <= cfg_mg.solver.tol
    np.testing.assert_allclose(np.asarray(p_mg), np.asarray(p_ref), atol=1e-8)


def test_full_step_2d_mesh_matches_unsharded():
    """One batched frame on a (data=2, y=2, x=2) mesh == unsharded."""
    mesh = make_mesh(8, data=2, x=2)
    assert mesh.devices.shape == (2, 2, 2)
    cfg = SimConfig(
        nx=32, ny=16, max_substeps=2, solver=SolverConfig(max_iterations=30)
    )
    texts = [b"00000\n00000\n", b"  000\nX 000\n"]
    scn, st = build_batch(texts, cfg)
    ref = step_frame_batched_jit(cfg, scn, st)

    scn_s, st_s = shard_batch(mesh, scn, st)
    step = make_sharded_step(cfg, mesh)
    got = step(scn_s, st_s)

    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(ref.v), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got.marker_count), np.asarray(ref.marker_count)
    )

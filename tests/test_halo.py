"""shard_map halo-exchange pressure solver vs the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.ops import project as P
from euler_tpu.parallel.halo import make_sharded_pressure_solver
from jax.sharding import Mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_pcg_matches_single_device():
    N = 64  # 64 rows over 8 shards
    rng = np.random.default_rng(0)
    fluid = np.zeros((N, N), bool)
    fluid[1:-1, 1:-1] = True
    solid = np.zeros((N, N), bool)
    solid[20:24, 5:50] = True
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

    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    solver = make_sharded_pressure_solver(cfg, mesh)
    p_sharded = solver(b_j, a, fluid_j)

    np.testing.assert_allclose(
        np.asarray(p_sharded), np.asarray(p_ref), atol=1e-8
    )


def test_sharded_block_mg_precon():
    """Block-Jacobi additive-Schwarz MG preconditioning: each shard runs
    a local Galerkin cycle on its principal submatrix.  Must converge to
    the same pressure, in far fewer outer iterations than jacobi."""
    N = 128  # 16 rows per shard
    rng = np.random.default_rng(3)
    fluid = np.zeros((N, N), bool)
    fluid[1:-1, 1:-1] = True
    solid = np.zeros((N, N), bool)
    solid[40:44, 10:100] = True
    solid[80:90, 60:64] = True
    fluid &= ~solid
    fluid[100:, :] = False  # free surface: air above
    b = rng.standard_normal((N, N)) * fluid

    def cfg_for(precon):
        return SimConfig(
            nx=N, ny=N,
            solver=SolverConfig(
                max_iterations=600, tol=1e-10, dtype="float64",
                preconditioner=precon, mg_min_size=8,
            ),
        )

    cfg = cfg_for("mg")
    fluid_j = jnp.asarray(fluid)
    a = P.pressure_matrix_diag(cfg, jnp.asarray(solid), fluid_j)
    b_j = jnp.asarray(b)

    p_ref, _, resid_ref = P.solve_pressure(cfg, b_j, a, fluid_j,
                                           jnp.asarray(solid))
    assert float(resid_ref) <= cfg.solver.tol

    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    solver = make_sharded_pressure_solver(cfg, mesh, stats=True)
    p_mg, iters_mg, resid_mg = solver(b_j, a, fluid_j)
    assert float(resid_mg) <= cfg.solver.tol
    np.testing.assert_allclose(np.asarray(p_mg), np.asarray(p_ref), atol=1e-8)

    jac = make_sharded_pressure_solver(cfg_for("jacobi"), mesh, stats=True)
    _, iters_jac, _ = jac(b_j, a, fluid_j)
    # local V/W-cycles pay off: well under half the jacobi iterations
    assert int(iters_mg) < int(iters_jac) // 2, (
        int(iters_mg), int(iters_jac))

"""Multigrid preconditioner: symmetry, convergence, oracle agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.ops import multigrid as MG
from euler_tpu.ops import project as P

from helpers import read_scenario, scenario_from_oracle, state_from_oracle
from oracle.oracle import Oracle


def _problem(N=64, seed=0):
    rng = np.random.default_rng(seed)
    fluid = np.zeros((N, N), bool)
    fluid[1:-1, 1:-1] = True
    solid = np.zeros((N, N), bool)
    solid[N // 3 : N // 3 + 2, 5 : N - 5] = True
    fluid[N // 2 :, N // 2 : N // 2 + 6] = False
    fluid &= ~solid
    b = rng.standard_normal((N, N)).astype(np.float64) * fluid
    return jnp.asarray(fluid), jnp.asarray(solid), jnp.asarray(b)


def test_vcycle_linear_and_symmetric():
    """M^{-1} must be (numerically) symmetric for PCG validity:
    <x, M^{-1} y> == <M^{-1} x, y>."""
    fluid, solid, _ = _problem()
    levels = MG.build_hierarchy(solid, fluid, jnp.float64)
    f = jax.jit(partial(MG.v_cycle, levels))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(fluid.shape) * np.asarray(fluid))
    y = jnp.asarray(rng.standard_normal(fluid.shape) * np.asarray(fluid))
    lhs = float(jnp.sum(x * f(y)))
    rhs = float(jnp.sum(f(x) * y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    # linearity
    z = f(x + 2.0 * y)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(f(x) + 2.0 * f(y)), rtol=1e-9, atol=1e-12
    )


def test_restrict_is_adjoint_of_prolong():
    rng = np.random.default_rng(2)
    fine = jnp.asarray(rng.standard_normal((32, 32)))
    coarse = jnp.asarray(rng.standard_normal((16, 16)))
    # <P c, f> == <c, R f>
    lhs = float(jnp.sum(MG._prolong(coarse, (32, 32)) * fine))
    rhs = float(jnp.sum(coarse * MG._restrict(fine)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_galerkin_coarse_equals_dense_rap():
    """The edge-weight coarsening is EXACTLY P^T A P for constant
    prolongation — verified against dense matrices on a small grid."""
    rng = np.random.default_rng(0)
    Y, X = 12, 10
    solid = rng.random((Y, X)) < 0.2
    solid[0] = solid[-1] = True
    solid[:, 0] = solid[:, -1] = True
    fluid = (rng.random((Y, X)) < 0.5) & ~solid
    fluid_j, solid_j = jnp.asarray(fluid), jnp.asarray(solid)
    cfg = SimConfig(nx=X, ny=Y)
    a_diag = P.pressure_matrix_diag(cfg, solid_j, fluid_j)
    lv0 = MG.fine_edge_level(a_diag, fluid_j, jnp.float64)

    N = Y * X
    A = np.zeros((N, N))
    for k in range(N):
        ek = np.zeros(N)
        ek[k] = 1
        A[:, k] = np.asarray(
            MG.apply_edge(lv0, jnp.asarray(ek.reshape(Y, X)))
        ).ravel()
    # A must equal the reference operator apply_a on masked vectors
    for _ in range(3):
        v = rng.standard_normal((Y, X)) * fluid
        np.testing.assert_allclose(
            (A @ v.ravel()).reshape(Y, X),
            np.asarray(P.apply_a(a_diag, fluid_j, jnp.asarray(v))),
            atol=1e-12,
        )

    Yc, Xc = Y // 2, X // 2
    Pm = np.zeros((N, Yc * Xc))
    for k in range(Yc * Xc):
        ek = np.zeros((Yc, Xc))
        ek.ravel()[k] = 1
        up = np.repeat(np.repeat(ek, 2, 0), 2, 1) * fluid
        Pm[:, k] = up.ravel()
    RAP = Pm.T @ A @ Pm

    lv1 = MG.coarsen_galerkin(lv0)
    A1 = np.zeros((Yc * Xc, Yc * Xc))
    for k in range(Yc * Xc):
        ek = np.zeros(Yc * Xc)
        ek[k] = 1
        A1[:, k] = np.asarray(
            MG.apply_edge(lv1, jnp.asarray(ek.reshape(Yc, Xc)))
        ).ravel()
    np.testing.assert_allclose(A1, RAP, atol=1e-12)
    assert np.abs(A1 - A1.T).max() == 0.0


@pytest.mark.parametrize("cycle", ["v", "w"])
def test_galerkin_cycle_symmetric(cycle):
    """The Galerkin W/V-cycle must be a symmetric linear operator."""
    fluid, solid, _ = _problem()
    cfg = SimConfig(nx=64, ny=64,
                    solver=SolverConfig(mg_scheme="galerkin", mg_cycle=cycle))
    a_diag = P.pressure_matrix_diag(cfg, solid, fluid)
    f = jax.jit(MG.make_mg_preconditioner(cfg, solid, fluid, jnp.float64,
                                          a_diag=a_diag))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(fluid.shape) * np.asarray(fluid))
    y = jnp.asarray(rng.standard_normal(fluid.shape) * np.asarray(fluid))
    lhs = float(jnp.sum(x * f(y)))
    rhs = float(jnp.sum(f(x) * y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    z = f(x + 2.0 * y)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(f(x) + 2.0 * f(y)), rtol=1e-9, atol=1e-12
    )


def test_galerkin_odd_level_padding():
    """A grid whose halvings pass through an odd size must build and
    converge (padded cells are inactive and stay exactly zero)."""
    Y = X = 72  # 72 -> 36 -> 18 (odd at next halving) -> pad -> 9...
    rng = np.random.default_rng(3)
    fluid = np.zeros((Y, X), bool)
    fluid[1:-1, 1:-1] = rng.random((Y - 2, X - 2)) < 0.7
    solid = np.zeros((Y, X), bool)
    solid[0] = solid[-1] = True
    solid[:, 0] = solid[:, -1] = True
    fluid &= ~solid
    cfg = SimConfig(
        nx=X, ny=Y,
        solver=SolverConfig(max_iterations=80, tol=1e-8, dtype="float64",
                            preconditioner="mg", mg_min_size=8),
    )
    b = jnp.asarray(rng.standard_normal((Y, X)) * fluid)
    a = P.pressure_matrix_diag(cfg, jnp.asarray(solid), jnp.asarray(fluid))
    p, iters, resid = P.solve_pressure(cfg, b, a, jnp.asarray(fluid),
                                       jnp.asarray(solid))
    assert float(resid) <= 1e-8
    assert not np.isnan(np.asarray(p)).any()


def test_mg_pcg_converges_fast():
    fluid, solid, b = _problem(N=128)
    cfg = SimConfig(
        nx=128,
        ny=128,
        solver=SolverConfig(
            max_iterations=60, tol=1e-8, dtype="float64", preconditioner="mg"
        ),
    )
    a = P.pressure_matrix_diag(cfg, solid, fluid)
    p, iters, resid = P.solve_pressure(cfg, b, a, fluid, solid)
    assert float(resid) <= 1e-8
    assert int(iters) < 40
    # solution check: A p = b on fluid cells
    r = np.asarray(b - P.apply_a(a, fluid, p))
    assert np.abs(r).max() <= 1e-8


def test_mg_projection_matches_oracle():
    ora = Oracle(read_scenario("basic.txt"))
    for _ in range(3):
        ora.sim_step()
    cfg = SimConfig(
        solver=SolverConfig(
            dtype="float64", max_iterations=200, preconditioner="mg"
        )
    )
    scn = scenario_from_oracle(ora)
    st = state_from_oracle(ora, cfg)
    dt = np.float32(0.02)

    import copy

    o2 = copy.deepcopy(ora)
    uout = o2.u.copy()
    vout = o2.v.copy()
    o2.project(dt, o2.u, o2.v, uout, vout)

    u2, v2, info = P.project(cfg, jnp.float32(dt), st.u, st.v, st.fluid, scn.solid)
    np.testing.assert_allclose(np.asarray(u2), uout, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), vout, atol=1e-4)

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

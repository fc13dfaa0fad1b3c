"""IC(0) wavefront preconditioner vs the oracle's loop-level transcription."""

import copy

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.ops import project as P
from euler_tpu.ops.ic0 import make_ic0_preconditioner

from helpers import read_scenario, scenario_from_oracle, state_from_oracle
from oracle.oracle import Oracle


def _rolled():
    ora = Oracle(read_scenario("basic.txt"))
    for _ in range(3):
        ora.sim_step()
    return ora


def test_ic0_apply_matches_oracle_first_call():
    """On a fresh precon (the reference's very first projection) the
    wavefront application matches the sequential oracle exactly."""
    ora = _rolled()
    cfg = SimConfig(solver=SolverConfig(dtype="float64", preconditioner="ic0"))
    scn = scenario_from_oracle(ora)
    st = state_from_oracle(ora, cfg)

    a_np = ora.a_diag()
    rng = np.random.default_rng(3)
    r = rng.standard_normal((cfg.ny, cfg.nx)) * np.asarray(st.fluid)

    # oracle with a fresh (zero) precon cache
    o2 = copy.deepcopy(ora)
    o2._precon = np.zeros((cfg.ny, cfg.nx), np.float64)
    z_want = o2.apply_preconditioner(a_np, r.astype(np.float64))

    a = P.pressure_matrix_diag(cfg, scn.solid, st.fluid)
    apply = make_ic0_preconditioner(a, st.fluid, jnp.float64)
    z_got = np.asarray(apply(jnp.asarray(r)))
    np.testing.assert_allclose(z_got, z_want, rtol=1e-12, atol=1e-14)


def test_ic0_pcg_converges_and_matches():
    ora = _rolled()
    cfg = SimConfig(
        solver=SolverConfig(
            dtype="float64", preconditioner="ic0", max_iterations=200
        )
    )
    scn = scenario_from_oracle(ora)
    st = state_from_oracle(ora, cfg)
    dt = np.float32(0.02)

    o2 = copy.deepcopy(ora)
    uout = o2.u.copy()
    vout = o2.v.copy()
    o2.project(dt, o2.u, o2.v, uout, vout)

    u2, v2, info = P.project(cfg, jnp.float32(dt), st.u, st.v, st.fluid, scn.solid)
    assert float(info["residual"]) <= cfg.solver.tol
    np.testing.assert_allclose(np.asarray(u2), uout, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), vout, atol=1e-4)

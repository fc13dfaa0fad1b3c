"""Fused MG substep kernel under a data-parallel shard_map (8 virtual
CPU devices, interpret mode): per-shard results must match the
single-device kernel exactly — the kernel is dispatched per shard, so
the only moving part is the shard_map plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.pallas.substep_kernel import project_substep_mg
from euler_tpu.parallel.pallas_shard import make_dp_substep_mg
from euler_tpu.sim import step_frame_jit


def _cfg():
    return SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=32, preconditioner="mg",
                            tol_rel=1e-3, warm_start=True),
    )


def test_dp_substep_matches_single_device():
    cfg = _cfg()
    scn, st = dam_break(cfg)
    for _ in range(2):
        st = step_frame_jit(cfg, scn, st)
    dt = jnp.float32(0.02)

    n = min(8, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
    fstep = make_dp_substep_mg(cfg, mesh, interpret=True)

    stk = lambda a: jnp.stack([a] * n)
    u2, v2, iters, resid, msq, p = fstep(
        dt, dt, stk(st.u), stk(st.v), stk(st.fluid),
        stk(st.prev_fluid), stk(scn.solid), stk(st.p),
    )

    ur, vr, itr, rr, msqr, pr = project_substep_mg(
        cfg, dt, dt, st.u, st.v, st.fluid, st.prev_fluid, scn.solid,
        st.p, interpret=True,
    )
    for b in (0, n - 1):
        np.testing.assert_array_equal(np.asarray(u2[b]), np.asarray(ur))
        np.testing.assert_array_equal(np.asarray(v2[b]), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(p[b]), np.asarray(pr))
    assert int(iters[0]) == int(itr)

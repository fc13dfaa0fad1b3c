"""Stencil-select interpolation must be bit-identical to the gather path
for grid advection, and the full frame must agree under either impl."""

import numpy as np
import jax.numpy as jnp
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.ops.advect import advect_p, advect_u, advect_v
from euler_tpu.sim import step_frame_jit

from helpers import read_scenario

GATHER = SimConfig(advect_impl="gather")
STENCIL = SimConfig(advect_impl="stencil")


@pytest.fixture(scope="module")
def rolled_state():
    scn, st = build_scenario(read_scenario("block.txt"), STENCIL)
    for _ in range(4):
        st = step_frame_jit(STENCIL, scn, st)
    return scn, st


@pytest.mark.parametrize("which", ["u", "v", "p"])
def test_advect_bitwise_equal(rolled_state, which):
    scn, st = rolled_state
    dt = jnp.float32(0.02)
    fn = {"u": advect_u, "v": advect_v}.get(which)
    if which == "p":
        a = advect_p(GATHER, st.r, st.u, st.v, st.fluid, dt)
        b = advect_p(STENCIL, st.r, st.u, st.v, st.fluid, dt)
    else:
        a = fn(GATHER, st.u, st.v, st.fluid, dt)
        b = fn(STENCIL, st.u, st.v, st.fluid, dt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_frames_bitwise_equal():
    scn, st_g = build_scenario(read_scenario("waterfall.txt"), GATHER)
    _, st_s = build_scenario(read_scenario("waterfall.txt"), STENCIL)
    for _ in range(3):
        st_g = step_frame_jit(GATHER, scn, st_g)
        st_s = step_frame_jit(STENCIL, scn, st_s)
    np.testing.assert_array_equal(np.asarray(st_g.u), np.asarray(st_s.u))
    np.testing.assert_array_equal(np.asarray(st_g.v), np.asarray(st_s.v))
    np.testing.assert_array_equal(
        np.asarray(st_g.markers), np.asarray(st_s.markers)
    )

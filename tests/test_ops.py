"""Per-kernel comparison of the vectorised JAX ops against the oracle.

The oracle (tests/oracle/oracle.py) is a loop-level transcription of the
C reference; these tests validate that each masked dense formulation is
semantically identical on a nontrivial state (a few substeps into the
basic scenario, so velocities, fluid masks and newly-fluid cells exist).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from euler_tpu.config import SimConfig
from euler_tpu.ops.advect import advect_p, advect_u, advect_v
from euler_tpu.ops.extrapolate import extrapolate
from euler_tpu.ops.forces import apply_body_forces, calculate_timestep, zero_bounds
from euler_tpu.ops.interp import interpolate
from euler_tpu.ops.markers import (
    advect_markers,
    refresh_marker_counts,
    update_fluid_sources,
    velocity_at,
)
from euler_tpu.ops.color import hsv_basis

from helpers import read_scenario, scenario_from_oracle, state_from_oracle
from oracle.oracle import Oracle, hsv_basis as hsv_oracle


@pytest.fixture(scope="module")
def rolled():
    """Oracle advanced 3 frames into basic.txt: nontrivial state."""
    ora = Oracle(read_scenario("basic.txt"))
    for _ in range(3):
        ora.sim_step()
    return ora


def _pair(rolled):
    cfg = SimConfig()
    return cfg, scenario_from_oracle(rolled), state_from_oracle(rolled, cfg)


def test_hsv_basis_matches():
    ts = np.linspace(-8, 14, 113).astype(np.float32)
    got = np.asarray(hsv_basis(jnp.asarray(ts)))
    want = np.array([hsv_oracle(t) for t in ts])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_interpolate_matches(rolled):
    cfg, scn, st = _pair(rolled)
    rng = np.random.default_rng(0)
    pts_x = rng.uniform(-2, cfg.nx + 1, 500).astype(np.float32)
    pts_y = rng.uniform(-2, cfg.ny + 1, 500).astype(np.float32)
    for ctype, q in (("u", rolled.u), ("v", rolled.v), ("p", rolled.r)):
        got = np.asarray(
            interpolate(
                cfg, jnp.asarray(q), st.fluid, jnp.asarray(pts_x), jnp.asarray(pts_y), ctype
            )
        )
        want = np.array(
            [rolled.interpolate(q, x, y, ctype) for x, y in zip(pts_x, pts_y)]
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=ctype)


def test_advect_uvp_matches(rolled):
    cfg, scn, st = _pair(rolled)
    dt = np.float32(0.02)

    want_u = rolled.u.copy()
    rolled.advect_u(rolled.u, rolled.v, dt, want_u)
    got_u = np.asarray(advect_u(cfg, st.u, st.v, st.fluid, jnp.float32(dt)))
    mask_u = np.zeros_like(want_u, bool)
    for y in range(rolled.UY):
        for x in range(rolled.UX):
            mask_u[y, x] = rolled.prop(rolled.fluid, x, y, "u")
    np.testing.assert_allclose(got_u[mask_u], want_u[mask_u], atol=1e-5)

    want_v = rolled.v.copy()
    rolled.advect_v(rolled.u, rolled.v, dt, want_v)
    got_v = np.asarray(advect_v(cfg, st.u, st.v, st.fluid, jnp.float32(dt)))
    mask_v = np.zeros_like(want_v, bool)
    for y in range(rolled.VY):
        for x in range(rolled.VX):
            mask_v[y, x] = rolled.prop(rolled.fluid, x, y, "v")
    np.testing.assert_allclose(got_v[mask_v], want_v[mask_v], atol=1e-5)

    q = rolled.u * 0.3 + 1.0  # arbitrary smooth cell field
    want_p = q.copy()
    rolled.advect_p(q, rolled.u, rolled.v, dt, want_p)
    got_p = np.asarray(
        advect_p(cfg, jnp.asarray(q), st.u, st.v, st.fluid, jnp.float32(dt))
    )
    np.testing.assert_allclose(got_p, want_p, atol=1e-5)


def test_extrapolate_matches(rolled):
    cfg, scn, st = _pair(rolled)
    for ctype, q in (("u", rolled.u), ("v", rolled.v), ("p", rolled.r)):
        want = q.copy()
        rolled.extrapolate(want, ctype)
        got = np.asarray(
            extrapolate(cfg, jnp.asarray(q), st.fluid, st.prev_fluid, ctype)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=ctype)


def test_zero_bounds_and_forces_match(rolled):
    cfg, scn, st = _pair(rolled)
    dt = np.float32(0.0125)
    for ctype, q in (("u", rolled.u), ("v", rolled.v)):
        want = q.copy()
        rolled.zero_bounds(want, ctype)
        got = np.asarray(
            zero_bounds(cfg, jnp.asarray(q), st.fluid, scn.solid, ctype)
        )
        np.testing.assert_array_equal(got, want, err_msg=ctype)

    want = rolled.v.copy()
    rolled.apply_body_forces(want, dt)
    got = np.asarray(apply_body_forces(cfg, st.v, jnp.float32(dt)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_timestep_matches(rolled):
    cfg, scn, st = _pair(rolled)
    want = rolled.calculate_timestep(np.float32(0.1))
    got = float(calculate_timestep(cfg, st.u, st.v, jnp.float32(0.1)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_velocity_at_matches(rolled):
    cfg, scn, st = _pair(rolled)
    m = rolled.markers_array()
    got_x, got_y = velocity_at(
        cfg, st.u, st.v, st.fluid, jnp.asarray(m[:, 0]), jnp.asarray(m[:, 1])
    )
    want = np.array([rolled.velocity_at(px, py) for px, py in m])
    np.testing.assert_allclose(np.asarray(got_x), want[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_y), want[:, 1], atol=1e-5)


def test_advect_markers_matches(rolled):
    cfg, scn, st = _pair(rolled)
    dt = np.float32(0.02)

    import copy

    ora2 = copy.deepcopy(rolled)
    ora2.advect_markers(dt)
    want = ora2.markers_array()

    st2 = advect_markers(cfg, scn, st, jnp.float32(dt))
    n = len(rolled.markers)
    got = np.asarray(st2.markers).T[:n]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_refresh_marker_counts_matches(rolled):
    cfg, scn, st = _pair(rolled)
    import copy

    ora2 = copy.deepcopy(rolled)
    ora2.refresh_marker_counts()
    st2 = refresh_marker_counts(cfg, scn, st)
    np.testing.assert_array_equal(
        np.asarray(st2.marker_count), ora2.marker_count
    )
    np.testing.assert_array_equal(
        np.asarray(st2.prev_marker_count), ora2.prev_marker_count
    )
    assert int(st2.alive_count) == len(ora2.markers)


def test_update_fluid_sources_matches():
    cfg = SimConfig()
    ora = Oracle(read_scenario("waterfall.txt"))
    for _ in range(2):
        ora.sim_step()
    scn = scenario_from_oracle(ora)
    st = state_from_oracle(ora, cfg)

    import copy

    ora2 = copy.deepcopy(ora)
    ora2.update_fluid_sources()
    st2 = update_fluid_sources(cfg, scn, st)

    np.testing.assert_array_equal(np.asarray(st2.marker_count), ora2.marker_count)
    assert int(st2.alive_count) == len(ora2.markers)
    assert bool(st2.source_exhausted) == ora2.source_exhausted
    # emitted marker positions match within randf32's 1-ulp tolerance
    from helpers import sorted_positions

    np.testing.assert_allclose(
        sorted_positions(st2.markers, st2.alive),
        sorted_positions(
            ora2.markers_array(), np.ones(len(ora2.markers), bool)
        ),
        atol=2e-5,
    )
    # colour refresh at source cells
    np.testing.assert_allclose(np.asarray(st2.r), ora2.r, atol=1e-6)

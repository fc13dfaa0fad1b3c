"""End-to-end frame tests vs the oracle plus physical invariants.

Frame-for-frame comparisons use short horizons: the dynamics are chaotic,
so even IEEE-vs-fast-math differences in the C build itself would diverge
eventually.  Parity is judged on per-cell marker counts (the rendered
observable) and velocity fields within float tolerance — SURVEY.md §7.
"""

import numpy as np
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.sim import step_frame_jit

from helpers import cell_counts, read_scenario
from oracle.oracle import Oracle

FRAMES = 3


def _run_pair(name, frames=FRAMES, rainbow=False):
    text = read_scenario(name)
    cfg = SimConfig(
        rainbow=rainbow,
        solver=SolverConfig(dtype="float64", max_iterations=400),
    )
    ora = Oracle(text, rainbow=rainbow, max_iterations=400)
    scn, st = build_scenario(text, cfg)
    for _ in range(frames):
        ora.sim_step()
        st = step_frame_jit(cfg, scn, st)
    return cfg, ora, st


@pytest.mark.parametrize("name", ["basic.txt", "block.txt", "filter.txt", "weird-edges.txt"])
def test_frames_match_oracle(name):
    cfg, ora, st = _run_pair(name)

    got_counts = cell_counts(st.markers, st.alive, cfg)
    want_counts = np.zeros_like(got_counts)
    m = ora.markers_array()
    np.add.at(
        want_counts,
        (np.floor(m[:, 1]).astype(int), np.floor(m[:, 0]).astype(int)),
        1,
    )
    # marker-count parity: identical up to at most a few boundary straddlers
    diff = np.abs(got_counts - want_counts).sum()
    assert diff <= 2, f"marker count mismatch total {diff}"

    np.testing.assert_allclose(np.asarray(st.u), ora.u, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st.v), ora.v, atol=5e-3)


def test_waterfall_sources_match_oracle():
    cfg, ora, st = _run_pair("waterfall.txt", frames=2)
    assert int(st.alive_count) == len(ora.markers)
    got_counts = cell_counts(st.markers, st.alive, cfg)
    want = np.zeros_like(got_counts)
    m = ora.markers_array()
    np.add.at(want, (np.floor(m[:, 1]).astype(int), np.floor(m[:, 0]).astype(int)), 1)
    assert np.abs(got_counts - want).sum() <= 2


def test_rainbow_frames_match_oracle():
    cfg, ora, st = _run_pair("basic.txt", frames=2, rainbow=True)
    fluid = np.asarray(st.fluid)
    np.testing.assert_allclose(
        np.asarray(st.r)[fluid], ora.r[fluid], atol=5e-3
    )


def test_invariants_long_run():
    """Structural invariants over a longer (oracle-free) run."""
    text = read_scenario("block.txt")
    cfg = SimConfig()
    scn, st = build_scenario(text, cfg)
    n0 = int(st.alive_count)
    from euler_tpu.core.state import u_property, v_property, valid_region
    import jax.numpy as jnp

    for i in range(15):
        st = step_frame_jit(cfg, scn, st)

    u = np.asarray(st.u)
    v = np.asarray(st.v)
    assert not np.isnan(u).any() and not np.isnan(v).any()
    assert not np.isnan(np.asarray(st.markers)).any()

    # velocities are zero on solid faces and outside the fluid
    solid = np.asarray(scn.solid)
    fluid = np.asarray(st.fluid)
    u_solid = np.asarray(u_property(jnp.asarray(solid)))
    v_solid = np.asarray(v_property(jnp.asarray(solid)))
    u_fluid = np.asarray(u_property(jnp.asarray(fluid)))
    v_fluid = np.asarray(v_property(jnp.asarray(fluid)))
    assert np.all(u[u_solid & valid_region(cfg, "u")] == 0)
    assert np.all(v[v_solid & valid_region(cfg, "v")] == 0)
    assert np.all(u[~u_fluid] == 0)
    assert np.all(v[~v_fluid] == 0)

    # no sources in block.txt: markers only die (in sinks), never appear
    assert int(st.alive_count) <= n0
    # counts histogram consistent with marker positions
    np.testing.assert_array_equal(
        cell_counts(st.markers, st.alive, cfg), np.asarray(st.marker_count)
    )
    # markers never inside solids (modulo the reference's acknowledged
    # float-precision leak, main.c:461-463 — tolerate a tiny fraction)
    m = np.asarray(st.markers).T[np.asarray(st.alive)]
    yi = np.floor(m[:, 1]).astype(int)
    xi = np.floor(m[:, 0]).astype(int)
    frac_in_solid = solid[yi, xi].mean()
    assert frac_in_solid < 0.01


def test_marker_capacity_exhaustion():
    """Emission stops permanently at the capacity cap (main.c:276-291)."""
    cfg = SimConfig(nx=8, ny=6, markers_per_cell=4)
    # one source cell, tiny grid -> cap = 4*8*6 = 192 markers
    rows = ["?" + " " * 5]
    text = "\n".join(rows) + "\n"
    scn, st = build_scenario(text, cfg)
    for _ in range(400):
        st = step_frame_jit(cfg, scn, st)
        if bool(st.source_exhausted):
            break
    assert int(st.alive_count) <= cfg.max_markers

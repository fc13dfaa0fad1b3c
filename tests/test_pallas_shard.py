"""Sharded fused Pallas marker kernel vs the single-device kernel.

VERDICT round-2 weak #4: the fast Pallas path did not compose with
multi-chip sharding.  parallel/pallas_shard row-shards the domain over a
mesh axis and runs the SAME fused kernel per shard with ppermute halo
exchange; these tests pin it against the single-device kernel (bitwise)
and the unsharded full step on the 8-device virtual CPU mesh, with the
kernels in interpret mode (SURVEY.md §4e test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.parallel.pallas_shard import (
    make_sharded_march_rebin,
    make_sharded_marker_pass,
    make_spatial_step_pallas,
)
from euler_tpu.parallel.spatial import shard_spatial, spatial_mesh, to_flat
from euler_tpu.sim import step_frame, step_frame_jit

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = SimConfig(
    nx=64, ny=64, marker_layout="slots", max_substeps=2,
    solver=SolverConfig(max_iterations=40, dtype="float32"),
)


def _developed(cfg):
    """A few frames of real flow so markers cross shard boundaries."""
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)
    return scn, st


def test_sharded_kernel_bitwise_matches_single_device():
    """march+re-bin on a y=4 mesh == the single-device fused kernel,
    bitwise (same arithmetic per site; halo markers re-marched with
    identical stencil windows)."""
    mesh = spatial_mesh(4, x=1)
    scn, st = _developed(CFG)
    K = CFG.slots_per_cell
    slots = st.markers.reshape(2 * K, CFG.ny, CFG.nx)
    dead = (scn.sink | scn.solid).astype(slots.dtype)
    dt = jnp.float32(0.03)

    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    ref_slots, ref_cnt, ref_drop = march_rebin_pallas(
        CFG, st.u, st.v, st.fluid, scn.solid, slots, dt,
        st.marker_count, interpret=True, dead=dead,
    )
    kern = make_sharded_march_rebin(CFG, mesh, "y", interpret=True)
    got_slots, got_cnt, got_drop = kern(
        st.u, st.v, st.fluid, scn.solid, slots, dt, st.marker_count, dead
    )

    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))
    np.testing.assert_array_equal(np.asarray(got_drop), np.asarray(ref_drop))
    np.testing.assert_array_equal(
        np.asarray(got_slots), np.asarray(ref_slots)
    )
    assert int(jnp.sum(ref_cnt)) > 500  # the scene is actually live


def test_sharded_marker_pass_state_contract():
    """The drop-in marker_pass produces the same FluidState delta as the
    single-device fused pass (markers/alive/counts/dropped)."""
    mesh = spatial_mesh(4, x=1)
    scn, st = _developed(CFG)
    dt = jnp.float32(0.03)

    from euler_tpu.ops.markers_slots import marker_pass_slots

    cfg_fused = CFG  # jnp reference path
    ref = marker_pass_slots(cfg_fused, scn, st, dt)
    pass_fn = make_sharded_marker_pass(CFG, mesh, "y", interpret=True)
    got = pass_fn(CFG, scn, st, dt)

    np.testing.assert_array_equal(
        np.asarray(got.marker_count), np.asarray(ref.marker_count)
    )
    np.testing.assert_array_equal(
        np.asarray(got.alive), np.asarray(ref.alive)
    )
    assert int(got.alive_count) == int(ref.alive_count)
    assert int(got.dropped_markers) == int(ref.dropped_markers)
    m = np.asarray(ref.alive).reshape(-1)
    gm = np.asarray(got.markers).reshape(2, -1)
    rm = np.asarray(ref.markers).reshape(2, -1)
    np.testing.assert_allclose(gm[:, m], rm[:, m], atol=1e-4)


def test_full_step_sharded_pallas_matches_unsharded():
    """Full frames: the shard_map'd Pallas marker pass + GSPMD grid ops
    vs the single-device XLA step (test_spatial-style tolerance)."""
    mesh = spatial_mesh(4, x=1)
    scn, st = _developed(CFG)

    ref = st
    for _ in range(2):
        ref = step_frame_jit(CFG, scn, ref)

    scn_s, st_s = shard_spatial(CFG, mesh, scn, st)
    step = make_spatial_step_pallas(CFG, mesh, interpret=True)
    got = st_s
    for _ in range(2):
        got = step(scn_s, got)

    got = to_flat(CFG, got)
    np.testing.assert_array_equal(
        np.asarray(got.marker_count), np.asarray(ref.marker_count)
    )
    np.testing.assert_array_equal(
        np.asarray(got.alive), np.asarray(ref.alive)
    )
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(ref.v),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.rng), np.asarray(ref.rng))
    assert int(got.alive_count) == int(ref.alive_count)

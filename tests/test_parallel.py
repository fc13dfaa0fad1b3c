"""Batching and mesh-sharding tests (8 virtual CPU devices)."""

import numpy as np
import jax
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.parallel.batch import (
    build_batch,
    run_frames_batched_jit,
    step_frame_batched_jit,
)
from euler_tpu.parallel.mesh import make_mesh, make_sharded_step, shard_batch
from euler_tpu.sim import step_frame_jit

from helpers import read_scenario

CFG = SimConfig(solver=SolverConfig(max_iterations=100))
TEXTS = [read_scenario("basic.txt"), read_scenario("waterfall.txt")]


def test_batched_matches_unbatched():
    scn_b, st_b = build_batch(TEXTS, CFG)
    st_b = step_frame_batched_jit(CFG, scn_b, st_b)

    max_sources = scn_b.source_yx.shape[1]
    for i, text in enumerate(TEXTS):
        scn, st = build_scenario(text, CFG, pad_sources=max_sources)
        st = step_frame_jit(CFG, scn, st)
        np.testing.assert_allclose(
            np.asarray(st_b.u[i]), np.asarray(st.u), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(st_b.marker_count[i]), np.asarray(st.marker_count)
        )
        assert int(st_b.alive_count[i]) == int(st.alive_count)


def test_source_padding_is_inert():
    """Padded source entries must not emit or consume RNG."""
    text = read_scenario("waterfall.txt")
    scn0, st0 = build_scenario(text, CFG)
    scn1, st1 = build_scenario(text, CFG, pad_sources=scn0.num_sources + 7)
    st0 = step_frame_jit(CFG, scn0, st0)
    st1 = step_frame_jit(CFG, scn1, st1)
    np.testing.assert_array_equal(np.asarray(st0.rng), np.asarray(st1.rng))
    assert int(st0.alive_count) == int(st1.alive_count)
    np.testing.assert_array_equal(
        np.asarray(st0.marker_count), np.asarray(st1.marker_count)
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_unsharded():
    mesh = make_mesh(8, data=2)
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


def test_run_frames_batched():
    scn_b, st_b = build_batch(TEXTS, CFG)
    out = run_frames_batched_jit(CFG, scn_b, st_b, 3)
    assert int(out.frame_count[0]) == 3
    assert not np.isnan(np.asarray(out.u)).any()

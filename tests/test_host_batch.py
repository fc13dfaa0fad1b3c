"""HostBatchRunner (host-level DP over independent instances) matches
per-instance stepping exactly — it IS per-instance stepping, pipelined;
this pins the API contract (spatial conversion, frame counts, sync)."""

import numpy as np

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.parallel.batch import HostBatchRunner
from euler_tpu.parallel.spatial import to_spatial
from euler_tpu.sim import step_frame_jit


def test_host_batch_matches_sequential():
    cfg = SimConfig(nx=64, ny=64, marker_layout="slots",
                    solver=SolverConfig(max_iterations=30))
    pairs = [dam_break(cfg, seed=i) for i in range(3)]

    runner = HostBatchRunner(cfg, pairs)
    states = runner.run(2)
    runner.sync()

    for (scn, st0), st_b in zip(pairs, states):
        st = to_spatial(cfg, st0)
        for _ in range(2):
            st = step_frame_jit(cfg, scn, st)
        np.testing.assert_array_equal(np.asarray(st.u), np.asarray(st_b.u))
        np.testing.assert_array_equal(
            np.asarray(st.marker_count), np.asarray(st_b.marker_count))
        assert int(st_b.frame_count) == 2

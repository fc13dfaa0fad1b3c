"""Checkpoint round-trip: resume must be bit-exact."""

import numpy as np

from euler_tpu.config import SimConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.io import checkpoint
from euler_tpu.sim import step_frame_jit

from helpers import read_scenario


def test_npz_roundtrip_resume_bitexact(tmp_path):
    cfg = SimConfig()
    scn, st = build_scenario(read_scenario("waterfall.txt"), cfg)
    for _ in range(2):
        st = step_frame_jit(cfg, scn, st)

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, cfg, scn, st)
    cfg2, scn2, st2 = checkpoint.load(path)

    assert cfg2 == cfg
    for name in ("u", "v", "markers", "marker_count", "rng"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(st2, name))
        )

    # continue both one frame: identical trajectories
    a = step_frame_jit(cfg, scn, st)
    b = step_frame_jit(cfg2, scn2, st2)
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    np.testing.assert_array_equal(np.asarray(a.markers), np.asarray(b.markers))
    np.testing.assert_array_equal(np.asarray(a.rng), np.asarray(b.rng))

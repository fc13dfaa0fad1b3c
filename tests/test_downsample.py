"""On-device downsampling render gather (euler_tpu/render/downsample.py)."""

import numpy as np

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.render.ansi import C_EMPTY, C_SINK, C_SOLID, gather_frame
from euler_tpu.render.downsample import (
    draw_frame_downsampled,
    gather_frame_downsampled,
    pick_factors,
)
from euler_tpu.sim import step_frame_jit

from helpers import read_scenario

CFG = SimConfig(solver=SolverConfig(max_iterations=60))


def _state():
    scn, st = build_scenario(read_scenario("block.txt"), CFG)
    st = step_frame_jit(CFG, scn, st)
    return scn, st


def test_identity_at_factor_one():
    scn, st = _state()
    glyph, cls, rgb = gather_frame(CFG, scn, st)
    dg, dc, dr = gather_frame_downsampled(CFG, 1, 1, scn, st)
    # interior identical; the ring is re-padded as empty
    np.testing.assert_array_equal(
        np.asarray(dg)[1:-1, 1:-1], np.asarray(glyph)[1:-1, 1:-1]
    )
    np.testing.assert_array_equal(
        np.asarray(dc)[1:-1, 1:-1], np.asarray(cls)[1:-1, 1:-1]
    )


def test_pooling_semantics():
    scn, st = _state()
    glyph, cls, _ = gather_frame(CFG, scn, st)
    fy, fx = 4, 4
    dg, dc, _ = gather_frame_downsampled(CFG, fy, fx, scn, st)
    dg, dc = np.asarray(dg), np.asarray(dc)
    g_i = np.asarray(glyph)[1:-1, 1:-1]
    c_i = np.asarray(cls)[1:-1, 1:-1]
    iy, ix = g_i.shape
    for by in range(dg.shape[0] - 2):
        for bx in range(dg.shape[1] - 2):
            gb = g_i[by * fy : (by + 1) * fy, bx * fx : (bx + 1) * fx]
            cb = c_i[by * fy : (by + 1) * fy, bx * fx : (bx + 1) * fx]
            assert dg[by + 1, bx + 1] == gb.max()
            if (cb == C_SOLID).any():
                assert dc[by + 1, bx + 1] == C_SOLID
            elif (cb == C_SINK).any():
                assert dc[by + 1, bx + 1] == C_SINK
            else:
                assert dc[by + 1, bx + 1] == C_EMPTY


def test_pick_factors_fits_window():
    cfg = SimConfig(nx=1026, ny=1026)
    fy, fx = pick_factors(cfg, 40, 120)
    assert -(-1024 // fy) <= 40 and -(-1024 // fx) <= 120


def test_draw_frame_downsampled_bytes():
    scn, st = _state()
    buf = draw_frame_downsampled(CFG, scn, st, 12, 30)
    assert buf.startswith(b"\x1b[H") and buf.endswith(b"\x1b[?25l")
    # 12-row window: at most 12 rendered rows (11 newlines)
    assert buf.count(b"\r\n") <= 12
    assert b"X" in buf  # block.txt obstacles survive pooling

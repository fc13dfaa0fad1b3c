"""ANSI encoder tests against hand-computed reference byte streams
(draw_rows semantics, main.c:914-951)."""

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.render.ansi import (
    C_EMPTY,
    C_SINK,
    C_SOLID,
    T_BLUE,
    T_CLEAR_LINE,
    T_RESET,
    encode_frame_py,
    gather_frame,
)


def _grids(cfg):
    glyph = np.zeros((cfg.ny, cfg.nx), np.uint8)
    cls = np.full((cfg.ny, cfg.nx), C_EMPTY, np.uint8)
    rgb = np.zeros((cfg.ny, cfg.nx, 3), np.uint8)
    return glyph, cls, rgb


def test_basic_row_encoding():
    cfg = SimConfig(nx=8, ny=4)  # rows drawn: y=2 down to y_cutoff=1
    glyph, cls, rgb = _grids(cfg)
    glyph[2, 1:4] = [1, 2, 3]   # water run "oO0"
    cls[2, 5] = C_SOLID
    out = encode_frame_py(cfg, glyph, cls, rgb, 40, 80, False)
    want = (
        T_BLUE + b"oO0" + T_RESET + b" " + b"X" + b" "
        + T_RESET + T_CLEAR_LINE + b"\r\n"
        + b"      " + T_RESET + T_CLEAR_LINE
    )
    assert out == want


def test_sink_preserves_prev_water_quirk():
    """main.c:927-931: sink emits reset but does not clear prev_water, so
    water after a sink does NOT re-emit its colour code."""
    cfg = SimConfig(nx=7, ny=3)  # single drawn row y=1
    glyph, cls, rgb = _grids(cfg)
    glyph[1, 1] = 1
    cls[1, 2] = C_SINK
    glyph[1, 3] = 2
    out = encode_frame_py(cfg, glyph, cls, rgb, 40, 80, False)
    # x=3 water after the sink gets NO colour code (prev_water stayed
    # true); the run then ends at x=4 with a reset before the spaces.
    want = (
        T_BLUE + b"o" + T_RESET + b"=" + b"O" + T_RESET + b"  "
        + T_RESET + T_CLEAR_LINE
    )
    assert out == want


def test_window_clipping():
    cfg = SimConfig(nx=10, ny=8)
    glyph, cls, rgb = _grids(cfg)
    glyph[:, :] = 1
    # window 3 rows: y_cutoff = max(8-1-3, 1) = 4 -> rows 6..4
    out = encode_frame_py(cfg, glyph, cls, rgb, 3, 4, False)
    rows = out.split(b"\r\n")
    assert len(rows) == 3
    # cols: x in 1..min(X-2, wx)=4 -> 4 glyphs per row
    assert rows[0] == T_BLUE + b"oooo" + T_RESET + T_CLEAR_LINE


def test_rainbow_truecolor():
    cfg = SimConfig(nx=5, ny=3, rainbow=True)
    glyph, cls, rgb = _grids(cfg)
    glyph[1, 1] = 3
    rgb[1, 1] = (255, 128, 0)
    out = encode_frame_py(cfg, glyph, cls, rgb, 40, 80, True)
    assert b"\x1b[38;2;255;128;0m0" in out


def test_gather_frame_matches_reference_quantisation():
    cfg = SimConfig(rainbow=True)
    text = b"00000\n00000\n"
    scn, st = build_scenario(text, cfg)
    st = st.replace(
        r=jnp.full_like(st.r, 0.5),
        g=jnp.full_like(st.g, 1.0),
        b=jnp.full_like(st.b, 0.0),
        marker_count=st.marker_count.at[5, 5].set(200),
    )
    count, cls, rgb = gather_frame(cfg, scn, st)
    assert int(count[5, 5]) == 3  # clamped at 3 (main.c:915-916, 933)
    # float_to_byte_color(linear_to_sRGB(x)) per misc/color.h
    end = np.nextafter(np.float32(256.0), np.float32(0.0))
    want_r = int(np.clip(end * np.float32(0.5) ** np.float32(1 / 2.2), 0, end))
    got = np.asarray(rgb)
    assert got[5, 5, 0] == want_r
    assert got[5, 5, 1] == 255
    assert got[5, 5, 2] == 0

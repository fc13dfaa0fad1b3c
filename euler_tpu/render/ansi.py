"""ANSI frame encoding.

Reproduces draw_rows (/root/reference/main.c:914-951) byte-for-byte:
glyphs by clamped marker count {" ", "o", "O", "0"}, solids "X", sinks
"=", run-length colour-state tracking (prev_water) to minimise escape
codes, 24-bit truecolor with sRGB conversion in rainbow mode, and the
window clipping of main.c:917-920.

The device side gathers a compact per-cell frame (glyph index + packed
RGB); the host side encodes bytes.  A C++ encoder (euler_tpu/native) is
used when built — the pure-Python encoder is the fallback and the
reference implementation for its tests.

Note one replicated reference quirk: the sink branch (main.c:927-931)
does not clear prev_water, so a water run interrupted by sinks resumes
without re-emitting its colour code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from euler_tpu.config import SimConfig
from euler_tpu.core.state import FluidState, Scenario
from euler_tpu.ops.color import float_to_byte_color

T_RESET = b"\x1b[0m"
T_BLUE = b"\x1b[34m"
T_CLEAR_LINE = b"\x1b[K"
T_CLEAR = b"\x1b[2J"
T_REPOSITION = b"\x1b[H"
T_HIDE_CURSOR = b"\x1b[?25l"
T_SHOW_CURSOR = b"\x1b[?25h"

SYMBOLS = (b" ", b"o", b"O", b"0")
# cell classes for the encoder
C_EMPTY, C_SOLID, C_SINK = 0, 1, 2


@partial(jax.jit, static_argnums=0)
def gather_frame(cfg: SimConfig, scn: Scenario, state: FluidState):
    """Device-side render gather: per-cell glyph index, class and colour.

    Returns (glyph[Y,X] u8 in 0..3, cls[Y,X] u8, rgb[Y,X,3] u8).  The
    sRGB conversion and byte quantisation (main.c:902-912) happen on
    device so the host transfer is 5 bytes/cell.
    """
    count = jnp.minimum(state.marker_count, 3).astype(jnp.uint8)
    cls = jnp.where(
        scn.solid, jnp.uint8(C_SOLID), jnp.where(scn.sink, jnp.uint8(C_SINK), jnp.uint8(C_EMPTY))
    )
    end = np.nextafter(np.float32(256.0), np.float32(0.0))

    def tobyte(x):
        srgb = jnp.power(jnp.maximum(x, 0.0), np.float32(1 / 2.2))
        return jnp.clip(end * srgb, 0.0, end).astype(jnp.uint8)

    rgb = jnp.stack([tobyte(state.r), tobyte(state.g), tobyte(state.b)], axis=-1)
    return count, cls, rgb


def encode_frame(
    cfg: SimConfig,
    glyph: np.ndarray,
    cls: np.ndarray,
    rgb: np.ndarray,
    window_rows: int,
    window_cols: int,
    rainbow: bool,
) -> bytes:
    """Host-side ANSI encoding of a gathered frame (main.c:914-951)."""
    try:
        from euler_tpu.native import encoder as _native
    except Exception:
        _native = None
    if _native is not None:
        return _native.encode_frame(
            glyph, cls, rgb, window_rows, window_cols, rainbow
        )
    return encode_frame_py(cfg, glyph, cls, rgb, window_rows, window_cols, rainbow)


def encode_frame_py(
    cfg: SimConfig,
    glyph: np.ndarray,
    cls: np.ndarray,
    rgb: np.ndarray,
    window_rows: int,
    window_cols: int,
    rainbow: bool,
) -> bytes:
    Y, X = cfg.ny, cfg.nx
    y_cutoff = max(Y - 1 - window_rows, 1)
    out = bytearray()
    x_end = min(X - 1, window_cols + 1)  # exclusive (x < X-1 && x < wx+1)
    for y in range(Y - 2, y_cutoff - 1, -1):
        prev_water = False
        row_cls = cls[y]
        row_glyph = glyph[y]
        for x in range(1, x_end):
            c = row_cls[x]
            if c == C_SOLID:
                if prev_water:
                    out += T_RESET
                out += b"X"
                prev_water = False
            elif c == C_SINK:
                if prev_water:
                    out += T_RESET
                out += b"="
                # prev_water intentionally unchanged (main.c:927-931)
            else:
                i = min(int(row_glyph[x]), 3)  # min_u8 clamp (main.c:933)
                has_water = i > 0
                if not prev_water and has_water and not rainbow:
                    out += T_BLUE
                elif has_water and rainbow:
                    r, g, b = rgb[y, x]
                    out += b"\x1b[38;2;%d;%d;%dm" % (r, g, b)
                elif prev_water and not has_water:
                    out += T_RESET
                out += SYMBOLS[i]
                prev_water = has_water
        out += T_RESET + T_CLEAR_LINE
        if y > y_cutoff:
            out += b"\r\n"
    return bytes(out)


def draw_frame(cfg, scn, state, window_rows, window_cols) -> bytes:
    """Full frame bytes: cursor home + rows + hide cursor (main.c:953-959)."""
    count, cls, rgb = gather_frame(cfg, scn, state)
    body = encode_frame(
        cfg,
        np.asarray(count),
        np.asarray(cls),
        np.asarray(rgb),
        window_rows,
        window_cols,
        cfg.rainbow,
    )
    return T_REPOSITION + body + T_HIDE_CURSOR

"""Scenario parsing and initial-state construction.

Replicates sim_init (/root/reference/main.c:209-274) exactly:

* characters: 'X' solid, '0' fluid, '?' fluid+source, '=' sink
  (main.c:226-235);
* the first text line lands on row y = Y-2, rows descend to y = 1
  (the loop `for (y = Y-2; y > 0; --y)`, main.c:220) — i.e. the text is
  y-flipped into the grid, whose y axis points up;
* cells are placed in columns 1..X-2; anything beyond the simulation
  width is discarded up to the next newline (main.c:237-240);
* a border ring of sinks is added on all four edges (main.c:244-252);
* 4 jittered markers are seeded per fluid cell in x-major cell order with
  the sub-cell pattern of main.c:259-262, consuming the xorshift64*
  stream in the same order (x jitter then y jitter per marker);
* marker counts are refreshed and, in rainbow mode, cells are colourised
  (main.c:268-273).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core import rng as rng_mod
from euler_tpu.core.state import FluidState, Scenario, zeros_state


def parse_scenario_text(text: str, cfg: SimConfig):
    """Parse scenario text into (solid, fluid, source, sink) bool arrays.

    Follows main.c:218-241 byte-for-byte, including the truncation of
    over-wide lines and the handling of a trailing line without newline.
    """
    Y, X = cfg.ny, cfg.nx
    solid = np.zeros((Y, X), dtype=bool)
    fluid = np.zeros((Y, X), dtype=bool)
    source = np.zeros((Y, X), dtype=bool)
    sink = np.zeros((Y, X), dtype=bool)

    data = text.encode() if isinstance(text, str) else text
    length = len(data)
    i = 0
    y = Y - 2
    while y > 0 and i < length:
        x = 1
        while x < X - 1 and i < length:
            c = chr(data[i])
            i += 1
            if c == "\n":
                break
            elif c == "X":
                solid[y, x] = True
            elif c == "0":
                fluid[y, x] = True
            elif c == "?":
                fluid[y, x] = True
                source[y, x] = True
            elif c == "=":
                sink[y, x] = True
            x += 1
        # discard anything beyond the simulation width (main.c:237-240)
        if x == X - 1:
            while i < length and chr(data[i]) != "\n":
                i += 1
            if i < length:
                i += 1
        y -= 1

    # border sinks on all four edges (main.c:244-252)
    sink[:, 0] = True
    sink[:, X - 1] = True
    sink[0, :] = True
    sink[Y - 1, :] = True
    return solid, fluid, source, sink


def seed_markers(fluid: np.ndarray, cfg: SimConfig, gen: rng_mod.XorShift64Star):
    """Seed 4 jittered markers per fluid cell (main.c:254-267).

    Cell order is x-major (outer loop over x, inner over y, main.c:256-257);
    marker k of a cell sits in sub-cell quadrant (k<2 ? 0 : .5, k%2 ? 0 : .5)
    plus jitter randf()/2 on x then y.
    """
    Y, X = cfg.ny, cfg.nx
    positions = []
    for i in range(X):
        for j in range(Y):
            if fluid[j, i]:
                for k in range(4):
                    x = i + (0.0 if k < 2 else 0.5) + gen.randf() / np.float32(2.0)
                    y = j + (0.0 if k % 2 else 0.5) + gen.randf() / np.float32(2.0)
                    positions.append(
                        (np.float32(cfg.side_length) * np.float32(x),
                         np.float32(cfg.side_length) * np.float32(y))
                    )
    return np.array(positions, dtype=np.float32).reshape(-1, 2)


def _source_scan_order(source: np.ndarray) -> np.ndarray:
    """Source cells in update_fluid_sources scan order (main.c:284-285)."""
    ys, xs = np.nonzero(source)  # nonzero on [Y, X] is already y-major
    return np.stack([ys, xs], axis=1).astype(np.int32)


def load_scenario(path: str, cfg: SimConfig, pad_sources: int | None = None):
    with open(path, "rb") as f:
        text = f.read()
    return build_scenario(text, cfg, pad_sources)


def build_scenario(text, cfg: SimConfig, pad_sources: int | None = None):
    """Build (Scenario, FluidState) from scenario text.

    The xorshift64* stream starts at the reference seed; whatever remains
    after marker seeding becomes the device-side RNG state so source
    emission continues the same stream (main.c:203-207 static state).
    """
    solid, fluid, source, sink = parse_scenario_text(text, cfg)

    gen = rng_mod.XorShift64Star()
    positions = seed_markers(fluid, cfg, gen)
    n = positions.shape[0]
    if n > cfg.max_markers:
        raise ValueError(
            f"scenario seeds {n} markers, exceeds capacity {cfg.max_markers}"
        )

    source_yx = _source_scan_order(source)
    n_src = source_yx.shape[0]
    pad = n_src if pad_sources is None else pad_sources
    if pad < n_src:
        raise ValueError(f"pad_sources={pad} < actual source count {n_src}")
    valid = np.zeros((pad,), bool)
    valid[:n_src] = True
    padded = np.zeros((pad, 2), np.int32)
    padded[:n_src] = source_yx

    scn = Scenario(
        solid=jnp.asarray(solid),
        source=jnp.asarray(source),
        sink=jnp.asarray(sink),
        source_yx=jnp.asarray(padded),
        source_valid=jnp.asarray(valid),
    )

    state = zeros_state(cfg, gen.state_u32_pair())
    markers = np.zeros((2, cfg.max_markers), dtype=np.float32)
    alive = np.zeros((cfg.max_markers,), dtype=bool)
    if cfg.marker_layout == "slots":
        # place each cell's markers into its own slot block; seeding
        # order (and thus the RNG stream, main.c:256-266) is unchanged.
        # Slot-layout flat index is (k*Y + y)*X + x (grid dims minor).
        k = cfg.markers_per_cell
        xs_f, ys_f = np.nonzero(fluid.T)  # x-major cell order
        cell = ys_f * cfg.nx + xs_f
        slots = (
            cell[:, None] + np.arange(k)[None, :] * (cfg.nx * cfg.ny)
        ).ravel()
        markers[:, slots] = positions.T
        alive[slots] = True
    else:
        markers[:, :n] = positions.T
        alive[:n] = True
    state = state.replace(
        markers=jnp.asarray(markers),
        alive=jnp.asarray(alive),
        alive_count=jnp.asarray(n, jnp.int32),
    )

    # refresh_marker_counts at init (main.c:268): prev takes the old
    # (zero) counts, current becomes the histogram of seeded markers, and
    # markers in sink/solid cells are dropped.
    from euler_tpu.ops.markers import get_marker_ops

    _, refresh, _ = get_marker_ops(cfg)
    state = refresh(cfg, scn, state)

    if cfg.rainbow:
        from euler_tpu.ops.color import colorize

        state = colorize(cfg, scn, state)
    return scn, state

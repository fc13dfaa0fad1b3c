"""Programmatic scenario presets for headless / scaled runs.

The reference is locked to 100x40 text scenarios; scaled grids
(BASELINE.md north star: 1024² and beyond) need scenarios synthesised
directly as masks.  Marker seeding at this scale uses a vectorised
counter-based RNG instead of the reference's sequential xorshift64*
stream — bit-exact parity only matters for the bundled text scenarios,
which go through euler_tpu.core.scenario.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core import rng as rng_mod
from euler_tpu.core.state import Scenario, zeros_state


def _finish(cfg: SimConfig, solid, fluid, source, sink, seed=0):
    """Assemble Scenario + FluidState from masks with fast marker seeding."""
    Y, X = cfg.ny, cfg.nx
    sink = sink.copy()
    sink[:, 0] = sink[:, X - 1] = True
    sink[0, :] = sink[Y - 1, :] = True
    fluid = fluid & ~solid & ~sink

    ys, xs = np.nonzero(fluid)
    n_cells = len(ys)
    k = cfg.markers_per_cell
    n = n_cells * k
    if n > cfg.max_markers:
        raise ValueError("preset overfills marker capacity")

    rng = np.random.default_rng(seed)
    # sub-cell quadrant pattern of main.c:259-262 + jitter/2
    offs = np.array(
        [[0.0, 0.5], [0.0, 0.0], [0.5, 0.5], [0.5, 0.0]], np.float32
    )[:k]
    base = np.stack([xs, ys], axis=1).astype(np.float32)  # [C, 2] (x, y)
    pos = (
        base[:, None, :]
        + offs[None, :, :]
        + rng.random((n_cells, k, 2), np.float32) * 0.5
    ).reshape(-1, 2) * np.float32(cfg.side_length)

    markers = np.zeros((2, cfg.max_markers), np.float32)
    alive = np.zeros((cfg.max_markers,), bool)
    if cfg.marker_layout == "slots":
        cell = ys * cfg.nx + xs
        slots = (
            cell[:, None] + np.arange(k)[None, :] * (cfg.nx * cfg.ny)
        ).ravel()
        markers[:, slots] = pos.T
        alive[slots] = True
    else:
        markers[:, :n] = pos.T
        alive[:n] = True

    sy, sx = np.nonzero(source)
    scn = Scenario(
        solid=jnp.asarray(solid),
        source=jnp.asarray(source),
        sink=jnp.asarray(sink),
        source_yx=jnp.asarray(np.stack([sy, sx], axis=1).astype(np.int32)),
        source_valid=jnp.ones((len(sy),), bool),
    )
    state = zeros_state(cfg, rng_mod.initial_device_state())
    state = state.replace(
        markers=jnp.asarray(markers),
        alive=jnp.asarray(alive),
        alive_count=jnp.asarray(n, jnp.int32),
    )
    from euler_tpu.ops.markers import get_marker_ops

    _, refresh, _ = get_marker_ops(cfg)
    state = refresh(cfg, scn, state)
    if cfg.rainbow:
        from euler_tpu.ops.color import colorize

        state = colorize(cfg, scn, state)
    return scn, state


def _solid_box(Y, X):
    """Solid floor and side walls just inside the border sink ring, like
    the bundled scenarios' 'X' walls — without them fluid free-falls
    into the bottom sinks and the pressure solve degenerates."""
    solid = np.zeros((Y, X), bool)
    solid[1, 1 : X - 1] = True
    solid[1:-1, 1] = True
    solid[1:-1, X - 2] = True
    return solid


def dam_break(cfg: SimConfig, fill_x: float = 0.4, fill_y: float = 0.6, seed=0):
    """A water column against the left wall — the classic dam break."""
    Y, X = cfg.ny, cfg.nx
    solid = _solid_box(Y, X)
    fluid = np.zeros((Y, X), bool)
    fluid[2 : 2 + int((Y - 3) * fill_y), 2 : 2 + int((X - 3) * fill_x)] = True
    source = np.zeros((Y, X), bool)
    sink = np.zeros((Y, X), bool)
    return _finish(cfg, solid, fluid, source, sink, seed)


def block_obstacles(cfg: SimConfig, seed=0):
    """Falling water over interior solid obstacles (block.txt, scaled)."""
    Y, X = cfg.ny, cfg.nx
    solid = _solid_box(Y, X)
    fluid = np.zeros((Y, X), bool)
    fluid[Y // 2 : Y - 2, 2 : X - 2] = True
    # a row of solid blocks in the lower half
    bw = max(2, X // 16)
    for x0 in range(X // 8, X - X // 8, 2 * bw):
        solid[Y // 4 : Y // 4 + max(2, Y // 16), x0 : x0 + bw] = True
    source = np.zeros((Y, X), bool)
    sink = np.zeros((Y, X), bool)
    return _finish(cfg, solid, fluid, source, sink, seed)

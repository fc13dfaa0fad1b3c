"""Shared test utilities: oracle <-> FluidState conversion."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core.state import FluidState, Scenario, zeros_state

SCENARIO_DIR = "scenarios"


def read_scenario(name: str) -> bytes:
    with open(f"{SCENARIO_DIR}/{name}", "rb") as f:
        return f.read()


def scenario_from_oracle(ora) -> Scenario:
    ys, xs = np.nonzero(ora.source)
    return Scenario(
        solid=jnp.asarray(ora.solid),
        source=jnp.asarray(ora.source),
        sink=jnp.asarray(ora.sink),
        source_yx=jnp.asarray(np.stack([ys, xs], axis=1).astype(np.int32)),
        source_valid=jnp.ones((len(ys),), bool),
    )


def state_from_oracle(ora, cfg: SimConfig) -> FluidState:
    """Mirror the oracle's current state into a FluidState.

    Markers land in slots 0..n-1 (the oracle keeps a compacted list); the
    device RNG continues the oracle's stream.
    """
    st = zeros_state(
        cfg,
        np.array(
            [ora.rng.state >> np.uint64(32), ora.rng.state & np.uint64(0xFFFFFFFF)],
            dtype=np.uint32,
        ),
    )
    n = len(ora.markers)
    markers = np.zeros((2, cfg.max_markers), np.float32)
    if n:
        markers[:, :n] = np.array(ora.markers, np.float32).T
    alive = np.zeros((cfg.max_markers,), bool)
    alive[:n] = True
    return st.replace(
        u=jnp.asarray(ora.u.astype(np.float32)),
        v=jnp.asarray(ora.v.astype(np.float32)),
        r=jnp.asarray(ora.r.astype(np.float32)),
        g=jnp.asarray(ora.g.astype(np.float32)),
        b=jnp.asarray(ora.b.astype(np.float32)),
        markers=jnp.asarray(markers),
        alive=jnp.asarray(alive),
        marker_count=jnp.asarray(ora.marker_count.astype(np.int32)),
        prev_marker_count=jnp.asarray(ora.prev_marker_count.astype(np.int32)),
        alive_count=jnp.asarray(n, jnp.int32),
        source_exhausted=jnp.asarray(ora.source_exhausted),
        frame_count=jnp.asarray(ora.frame_count, jnp.int32),
    )


def cell_counts(markers, alive, cfg):
    """Histogram marker positions to per-cell counts (order-free)."""
    m = np.asarray(markers).T[np.asarray(alive)]
    xi = np.floor(m[:, 0]).astype(int)
    yi = np.floor(m[:, 1]).astype(int)
    counts = np.zeros((cfg.ny, cfg.nx), np.int32)
    np.add.at(counts, (yi, xi), 1)
    return counts


def sorted_positions(markers, alive):
    m = np.asarray(markers)
    if m.shape[0] == 2 and m.shape[-1] != 2:
        m = m.T
    m = m[np.asarray(alive)]
    order = np.lexsort((m[:, 1], m[:, 0]))
    return m[order]

"""Velocity/colour extrapolation into newly-fluid cells.

Reproduces extrapolate (/root/reference/main.c:173-185): a sample that is
fluid now but was not fluid in the previous step takes the average of its
3x3 neighbours (clamped at the grid edge) that *were* fluid previously
(valid_neighbor_average main.c:158-171).

The C loop updates in place, but written cells are never read as sources
(sources must be prev-fluid; written cells are by definition not), so the
dense masked formulation is exactly equivalent:

    out = where(newly_fluid, sum(q * prev_mask over 3x3) / count, q)

The reference asserts count > 0 (main.c:169), relying on CFL < 1 cell;
here count == 0 yields 0 instead of undefined behaviour.
"""

from __future__ import annotations

import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core.state import property_of, valid_region


def _neighborhood_sum(a):
    """Sum of the 3x3 neighbourhood (zero beyond edges) of each cell."""
    # Row pass then column pass: 4 adds per cell instead of 8.
    p = jnp.pad(a, ((1, 1), (1, 1)))
    rows = p[:-2, :] + p[1:-1, :] + p[2:, :]
    return rows[:, :-2] + rows[:, 1:-1] + rows[:, 2:]


def extrapolate(cfg: SimConfig, q, fluid, prev_fluid, celltype: str):
    region = valid_region(cfg, celltype)
    prop = property_of(fluid, celltype) & region
    prev_prop = property_of(prev_fluid, celltype) & region

    newly = (~prev_prop) & prop

    prev_f = prev_prop.astype(q.dtype)
    total = _neighborhood_sum(q * prev_f)
    count = _neighborhood_sum(prev_f)
    avg = total / jnp.where(count > 0, count, 1.0)
    avg = jnp.where(count > 0, avg, 0.0)
    return jnp.where(newly, avg, q).astype(q.dtype)

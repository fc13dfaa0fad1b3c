"""Validity-masked bilinear interpolation.

Reproduces interpolate (/root/reference/main.c:337-364) with its
fraction-snapping treatment of missing data (get_fraction main.c:301-309,
bilinear main.c:318-331): a corner outside the fluid contributes nothing —
the interpolation fraction snaps to the valid side.  As the reference
notes (main.c:315-317) this is order-dependent (vertical first); we match
that order exactly.

This is the generic gather form: sample positions may be arbitrary arrays
(used for marker particles and, until the stencil kernels land, for grid
advection).  The grid-advection fast path exploits the CFL bound to turn
these gathers into 3x3 stencil selects — see euler_tpu/ops/advect.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from euler_tpu.config import SimConfig
from euler_tpu.core.state import grid_size, property_of


def _get_fraction(frac, start_valid, end_valid):
    """main.c:301-309 — snap the fraction when one endpoint is missing."""
    one = jnp.ones_like(frac)
    zero = jnp.zeros_like(frac)
    return jnp.where(~start_valid, one, jnp.where(~end_valid, zero, frac))


def _linear(x0, x1, frac):
    # main.c:311-313
    return (1.0 - frac) * x0 + frac * x1


def bilinear(q00, q01, q10, q11, frac_x, frac_y, v00, v01, v10, v11):
    """main.c:318-331.  First index is y (0 bottom, 1 top), second is x.

    If all four corners are invalid the result is 0 (the reference asserts
    instead, main.c:319; callers only use results where the target site is
    in fluid, so the value is irrelevant there).
    """
    left_frac = _get_fraction(frac_y, v00, v10)
    right_frac = _get_fraction(frac_y, v01, v11)
    left_value = _linear(q00, q10, left_frac)
    right_value = _linear(q01, q11, right_frac)
    horz_frac = _get_fraction(frac_x, v00 | v10, v01 | v11)
    return _linear(left_value, right_value, horz_frac)


def interpolate(cfg: SimConfig, q, fluid, idx_x, idx_y, celltype: str):
    """Sample field `q` (stored [Y, X]) at fractional indices.

    Follows interpolate (main.c:337-364): clamp into
    [0, nextafter(size-1, 0)] so the 2x2 neighbourhood stays in range,
    split into whole+frac with modff, mask corners by the fluid property
    of the cell type, and bilinear with fraction snapping.
    """
    size_x, size_y = grid_size(cfg, celltype)
    f = q.dtype
    # nextafterf(size-1, 0): largest float strictly below size-1
    # (main.c:339-340), keeping base+1 within the logical grid.
    hi_x = np.nextafter(np.array(size_x - 1, f), np.array(0.0, f))
    hi_y = np.nextafter(np.array(size_y - 1, f), np.array(0.0, f))
    ix = jnp.clip(idx_x.astype(f), 0.0, hi_x)
    iy = jnp.clip(idx_y.astype(f), 0.0, hi_y)

    whole_x = jnp.floor(ix)
    whole_y = jnp.floor(iy)
    frac_x = ix - whole_x
    frac_y = iy - whole_y
    bx = whole_x.astype(jnp.int32)
    by = whole_y.astype(jnp.int32)

    prop = property_of(fluid, celltype)  # [Y, X] bool

    def corner(dy, dx):
        yy = by + dy
        xx = bx + dx
        return prop[yy, xx], q[yy, xx]

    v00, q00 = corner(0, 0)
    v01, q01 = corner(0, 1)
    v10, q10 = corner(1, 0)
    v11, q11 = corner(1, 1)
    q00 = jnp.where(v00, q00, 0.0)
    q01 = jnp.where(v01, q01, 0.0)
    q10 = jnp.where(v10, q10, 0.0)
    q11 = jnp.where(v11, q11, 0.0)
    return bilinear(q00, q01, q10, q11, frac_x, frac_y, v00, v01, v10, v11)


def interpolate_u(cfg, u, fluid, idx_x, idx_y):
    return interpolate(cfg, u, fluid, idx_x, idx_y, "u")


def interpolate_v(cfg, v, fluid, idx_x, idx_y):
    return interpolate(cfg, v, fluid, idx_x, idx_y, "v")


def interpolate_p(cfg, q, fluid, idx_x, idx_y):
    return interpolate(cfg, q, fluid, idx_x, idx_y, "p")

"""RK1 semi-Lagrangian advection of grid quantities.

Reproduces advect_u / advect_v / advect_p (/root/reference/main.c:382-438):
for each sample site inside the fluid, sample the full velocity at the
site (the cross component via the staggered index transforms
vidx_from_u main.c:378-380 and uidx_from_v main.c:401-403), trace one
Euler step backwards, and interpolate the advected field there.

The reference writes results only at fluid sites and leaves stale data
elsewhere, which zero_bounds then clears (main.c:867-889); here non-fluid
sites are written as 0 directly — consumers never read them.
"""

from __future__ import annotations

import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core.state import (
    shift_down,
    shift_left,
    u_property,
    v_property,
    valid_region,
)
from euler_tpu.ops.interp import interpolate


def _interp(cfg: SimConfig, q, fluid, idx_x, idx_y, celltype: str):
    """Grid-site interpolation via the configured implementation."""
    if cfg.advect_impl == "stencil":
        from euler_tpu.ops.interp_stencil import interpolate_stencil

        return interpolate_stencil(cfg, q, fluid, idx_x, idx_y, celltype)
    return interpolate(cfg, q, fluid, idx_x, idx_y, celltype)


def _site_index_grids(cfg: SimConfig, dtype):
    Y, X = cfg.ny, cfg.nx
    xs = jnp.arange(X, dtype=dtype)[None, :]
    ys = jnp.arange(Y, dtype=dtype)[:, None]
    return jnp.broadcast_to(xs, (Y, X)), jnp.broadcast_to(ys, (Y, X))


def advect_u(cfg: SimConfig, u, v, fluid, dt):
    """main.c:382-399."""
    xs, ys = _site_index_grids(cfg, u.dtype)
    inv_h = 1.0 / cfg.side_length
    dx = u
    # velocity's v component at the u site: v grid index (x+0.5, y-0.5)
    dy = _interp(cfg, v, fluid, xs + 0.5, ys - 0.5, "v")
    prev_x = xs - dx * dt * inv_h
    prev_y = ys - dy * dt * inv_h
    out = _interp(cfg, u, fluid, prev_x, prev_y, "u")
    mask = u_property(fluid) & valid_region(cfg, "u")
    return jnp.where(mask, out, 0.0).astype(u.dtype)


def advect_v(cfg: SimConfig, u, v, fluid, dt):
    """main.c:405-422."""
    xs, ys = _site_index_grids(cfg, v.dtype)
    inv_h = 1.0 / cfg.side_length
    dy = v
    # velocity's u component at the v site: u grid index (x-0.5, y+0.5)
    dx = _interp(cfg, u, fluid, xs - 0.5, ys + 0.5, "u")
    prev_x = xs - dx * dt * inv_h
    prev_y = ys - dy * dt * inv_h
    out = _interp(cfg, v, fluid, prev_x, prev_y, "v")
    mask = v_property(fluid) & valid_region(cfg, "v")
    return jnp.where(mask, out, 0.0).astype(v.dtype)


def advect_p(cfg: SimConfig, q, u, v, fluid, dt):
    """main.c:424-438 — advect a cell-centred quantity (colours).

    Cell-centred velocity is the face average; boundary cells are never
    fluid (border sinks), so the y-1 / x-1 reads are in range — the
    shifted arrays use a zero fill that is masked out anyway.

    Unlike velocities, the reference keeps the old value at non-fluid
    cells (colour fields are not zero_bound-ed), so we do too.
    """
    xs, ys = _site_index_grids(cfg, q.dtype)
    inv_h = 1.0 / cfg.side_length
    dy = (v + shift_down(v)) * 0.5
    dx = (u + shift_left(u)) * 0.5
    prev_x = xs - dx * dt * inv_h
    prev_y = ys - dy * dt * inv_h
    out = _interp(cfg, q, fluid, prev_x, prev_y, "p")
    return jnp.where(fluid, out, q).astype(q.dtype)

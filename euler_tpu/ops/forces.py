"""Body forces, boundary zeroing and the CFL timestep.

apply_body_forces (/root/reference/main.c:539-545), zero_bounds
(main.c:822-832) and calculate_timestep (main.c:834-841) as dense masked
array ops.  All of them respect the logical sample regions (U is
[Y, X-1], V is [Y-1, X]) so the storage padding stays zero, matching the
reference's never-written padding.
"""

from __future__ import annotations

import jax.numpy as jnp

from euler_tpu.config import SimConfig
from euler_tpu.core.state import property_of, valid_region


def apply_body_forces(cfg: SimConfig, v, dt):
    """Gravity on every V sample (main.c:539-545), fluid or not."""
    region = valid_region(cfg, "v")
    return jnp.where(region, v + (cfg.gravity * dt).astype(v.dtype), v)


def zero_bounds(cfg: SimConfig, q, fluid, solid, celltype: str):
    """Zero non-fluid and solid faces (main.c:822-832)."""
    region = valid_region(cfg, celltype)
    keep = property_of(fluid, celltype) & ~property_of(solid, celltype)
    return jnp.where(keep & region, q, 0.0).astype(q.dtype)


def max_speed_sq(cfg: SimConfig, u, v):
    """maxsq over U plus maxsq over V (main.c:808-820, 839)."""
    mu = jnp.max(jnp.where(valid_region(cfg, "u"), u * u, 0.0))
    mv = jnp.max(jnp.where(valid_region(cfg, "v"), v * v, 0.0))
    return mu + mv


def calculate_timestep(cfg: SimConfig, u, v, frame_time):
    """main.c:834-841: dt = min(cfl*h / max||vel||, frame_time)."""
    max_distance = cfg.cfl * cfg.side_length
    max_velocity = jnp.sqrt(max_speed_sq(cfg, u, v))
    dt = jnp.where(
        max_velocity > 0.0,
        max_distance / jnp.where(max_velocity > 0.0, max_velocity, 1.0),
        jnp.inf,
    )
    return jnp.minimum(dt, frame_time).astype(u.dtype)

"""Colour machinery for --rainbow mode.

hsv_basis / linear_to_sRGB / float_to_byte_color follow
/root/reference/misc/color.h:6-33; colorize follows main.c:187-201.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from euler_tpu.config import SimConfig
from euler_tpu.core.state import FluidState, Scenario


def hsv_basis(t):
    """Piecewise-linear periodic HSV component (misc/color.h:16-33)."""
    t = jnp.asarray(t)
    t = t - 6.0 * jnp.floor((1.0 / 6.0) * t)
    t = jnp.where(t < 0.0, t + 6.0, t)
    return jnp.where(
        t < 1.0,
        t,
        jnp.where(t < 3.0, 1.0, jnp.where(t < 4.0, 4.0 - t, 0.0)),
    ).astype(t.dtype)


def colorize(cfg: SimConfig, scn: Scenario, state: FluidState) -> FluidState:
    """Rainbow init (main.c:187-201): phase (x+y)*6/period, 0 at sources."""
    Y, X = cfg.ny, cfg.nx
    f = state.r.dtype
    xs = jnp.arange(X, dtype=f)[None, :]
    ys = jnp.arange(Y, dtype=f)[:, None]
    t = (xs + ys) * (6.0 / cfg.initial_color_period)
    t = jnp.where(scn.source, 0.0, t).astype(f)
    fluid = state.fluid
    return state.replace(
        r=jnp.where(fluid, hsv_basis(t + 2.0), state.r).astype(f),
        g=jnp.where(fluid, hsv_basis(t), state.g).astype(f),
        b=jnp.where(fluid, hsv_basis(t - 2.0), state.b).astype(f),
    )


def linear_to_srgb(x):
    """Approximate gamma (misc/color.h:11-13)."""
    return jnp.power(jnp.maximum(x, 0.0), 1.0 / 2.2)


def float_to_byte_color(x: np.ndarray) -> np.ndarray:
    """misc/color.h:6-9 — host-side (used by the ANSI encoder)."""
    end = np.nextafter(np.float32(256.0), np.float32(0.0))
    return np.clip(end * x, 0.0, end).astype(np.int32)

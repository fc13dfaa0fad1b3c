"""Pallas TPU kernel: fused grid stage of one substep.

Covers, in one launch, the grid-velocity section of sim_step
(main.c:865-889): extrapolate u and v into newly-fluid faces, zero
non-fluid/solid faces, semi-Lagrangian advect both components, apply
gravity, and zero again — everything between the marker refresh and the
projection, for the non-rainbow path.

Each input plane arrives as five row-shifted views (rows y-2 .. y+2):
advection at a row needs the extrapolated+zeroed velocities of its ±1
neighbour rows, and extrapolation itself reaches ±1, so halo rows are
recomputed in-tile from the deeper views instead of exchanged.  All
stencils are in-VMEM x-shifts; the backtraces stay in the 3x3 window by
the CFL bound, served by the same fraction-snapped bilinear tile
interpolator as the marker kernel.

Matches the jnp op sequence (ops/extrapolate + forces.zero_bounds +
ops/advect + forces.apply_body_forces) to float32 FMA-contraction level;
asserted in tests/test_pallas_grid.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig
from euler_tpu.ops.pallas.marker_kernel import (
    _clamped_base,
    _interp_tile,
    _shift_x,
)


def _grid_kernel(cfg: SimConfig, TY, dt_ref,
                 u_views, v_views, fl_views, pf_views, so_views,
                 ut_ref, vt_ref):
    """u_views etc: tuples of 7 refs (row shifts -3..+3), [TY, X] each.

    Depth 7 because: advection reads extrapolated rows at ±1, whose
    extrapolation reaches ±1 further, and the v-property of a mask row
    reads one row above it (main.c:134-138)."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    inv_h = np.float32(1.0) / np.float32(cfg.side_length)
    dt = dt_ref[0, 0]
    row0 = pl.program_id(0) * TY

    site_x = jax.lax.broadcasted_iota(jnp.int32, (TY, X), 1)
    site_y = jax.lax.broadcasted_iota(jnp.int32, (TY, X), 0) + row0
    xs = site_x.astype(f)
    ys = site_y.astype(f)

    def V(views, s):
        return views[s + 3][:]

    # -- per-shift mask machinery (u/v properties with logical regions) --
    def u_region(s):
        return site_x < (X - 1)

    def v_region(s):
        return (site_y + s) < (Y - 1)

    def u_prop(views, s):
        m = V(views, s)
        return (m + _shift_x(m, 1)) != 0

    def v_prop(views, s):
        return (V(views, s) + V(views, s + 1)) != 0

    prop = {"u": u_prop, "v": v_prop}
    region = {"u": u_region, "v": v_region}

    # -- extrapolate + zero_bounds at row shift s in {-1, 0, 1} --
    def extrap_zero(q_views, ct, s):
        """extrapolate (main.c:173-185) + zero_bounds (main.c:822-832)."""
        q = V(q_views, s)
        reg = region[ct](s)
        cur = prop[ct](fl_views, s) & reg
        prv_center = prop[ct](pf_views, s) & reg
        newly = cur & ~prv_center

        # neighbourhood sums of q*prev_prop and prev_prop, where the
        # neighbour masks carry their own region clamp
        qm_rows = None
        m_rows = None
        for ds in (-1, 0, 1):
            m = (prop[ct](pf_views, s + ds)
                 & region[ct](s + ds)).astype(f)
            qm = V(q_views, s + ds) * m
            qm_rows = qm if qm_rows is None else qm_rows + qm
            m_rows = m if m_rows is None else m_rows + m
        total = _shift_x(qm_rows, -1) + qm_rows + _shift_x(qm_rows, 1)
        count = _shift_x(m_rows, -1) + m_rows + _shift_x(m_rows, 1)
        avg = total / jnp.where(count > 0, count, 1.0)
        avg = jnp.where(count > 0, avg, 0.0)
        q = jnp.where(newly, avg, q)

        solid_p = prop[ct](so_views, s)
        keep = cur & ~solid_p
        return jnp.where(keep, q, 0.0)

    zu = {s: extrap_zero(u_views, "u", s) for s in (-1, 0, 1)}
    zv = {s: extrap_zero(v_views, "v", s) for s in (-1, 0, 1)}

    # -- 3x3 stacks for the tile interpolator --
    def stack9(zq):
        return [[_shift_x(zq[s], dx) for dx in (-1, 0, 1)] for s in (-1, 0, 1)]

    def pstack9(views, ct):
        return [
            [
                _shift_x(
                    (prop[ct](views, s) & region[ct](s)).astype(f), dx
                )
                for dx in (-1, 0, 1)
            ]
            for s in (-1, 0, 1)
        ]

    u9 = stack9(zu)
    v9 = stack9(zv)
    up9 = pstack9(fl_views, "u")
    vp9 = pstack9(fl_views, "v")

    # -- advect_u (main.c:382-399) --
    dxu = zu[0]
    bx, fx = _clamped_base(xs + 0.5, site_x, X, f)
    by, fy = _clamped_base(ys - 0.5, site_y, Y - 1, f)
    dyu = _interp_tile(v9, vp9, bx, by, fx, fy)
    bx, fx = _clamped_base(xs - dxu * dt * inv_h, site_x, X - 1, f)
    by, fy = _clamped_base(ys - dyu * dt * inv_h, site_y, Y, f)
    ut = _interp_tile(u9, up9, bx, by, fx, fy)
    mask_u = u_prop(fl_views, 0) & u_region(0)
    ut = jnp.where(mask_u, ut, 0.0)

    # -- advect_v (main.c:405-422) --
    dyv = zv[0]
    bx, fx = _clamped_base(xs - 0.5, site_x, X - 1, f)
    by, fy = _clamped_base(ys + 0.5, site_y, Y, f)
    dxv = _interp_tile(u9, up9, bx, by, fx, fy)
    bx, fx = _clamped_base(xs - dxv * dt * inv_h, site_x, X, f)
    by, fy = _clamped_base(ys - dyv * dt * inv_h, site_y, Y - 1, f)
    vt = _interp_tile(v9, vp9, bx, by, fx, fy)
    mask_v = v_prop(fl_views, 0) & v_region(0)
    vt = jnp.where(mask_v, vt, 0.0)

    # -- gravity (main.c:539-545) + zero_bounds (main.c:888-889) --
    vt = jnp.where(v_region(0), vt + np.float32(cfg.gravity) * dt, vt)
    solid_u = u_prop(so_views, 0)
    solid_v = v_prop(so_views, 0)
    ut = jnp.where(mask_u & ~solid_u, ut, 0.0)
    vt = jnp.where(mask_v & ~solid_v, vt, 0.0)

    ut_ref[:] = ut
    vt_ref[:] = vt


def _seven_views(a):
    """rows y-3..y+3 of a [Y, X] plane, zero beyond edges."""
    Y = a.shape[0]
    p = jnp.pad(a, ((3, 3), (0, 0)))
    return tuple(p[s : s + Y] for s in range(7))


@functools.partial(jax.jit, static_argnums=(0, 7))
def grid_stage_pallas(cfg: SimConfig, u, v, fluid, prev_fluid, solid, dt,
                      interpret: bool = False):
    """Fused extrapolate->zero->advect->gravity->zero.  Returns (ut, vt).

    Non-rainbow path only (rainbow needs the intermediate extrapolated
    velocities for colour advection — it uses the jnp ops).
    """
    Y, X = cfg.ny, cfg.nx
    f = u.dtype

    TY = min(Y, 128 if X <= 2048 else 32)
    while Y % TY:
        TY //= 2
    grid = (Y // TY,)

    planes = []
    for a in (
        u,
        v,
        fluid.astype(f),
        prev_fluid.astype(f),
        solid.astype(f),
    ):
        planes.extend(_seven_views(a))

    dt_arr = jnp.full((1, 128), dt, f)

    row_spec = pl.BlockSpec((TY, X), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kernel(dt_ref, *refs):
        views = [refs[i * 7 : (i + 1) * 7] for i in range(5)]
        _grid_kernel(cfg, TY, dt_ref, *views, refs[35], refs[36])

    ut, vt = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),
            jax.ShapeDtypeStruct((Y, X), f),
        ],
        in_specs=[pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [row_spec] * 35,
        out_specs=[row_spec, row_spec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dt_arr, *planes)
    return ut, vt

"""Pallas TPU kernel: fused slot-marker advection + collision march.

One pallas_call fuses, per row-block tile, everything the marker
advection substage needs (velocity interpolation at marker positions,
the DDA collision march against solids, the final position advance —
main.c:440-537 semantics, identical arithmetic to
euler_tpu.ops.markers_slots.advect_markers_slots):

  * each grid plane (u, v, their fluid properties, solid) is passed as
    three row-shifted views (rows y-1, y, y+1), so halo access needs no
    manual DMA — every input is a plain non-overlapping row block;
  * marker slots are processed one k-slice at a time inside the kernel,
    keeping the VMEM working set to a few [TY, X] buffers while the XLA
    version materialises [K, Y, X] temporaries between fusions;
  * the whole march chain stays on-chip;
  * row blocks with no live markers (marker_count all zero) skip the
    whole body behind one tile-level branch and pass positions through
    — at 1024² most of the domain is empty air or solid interior.

Bitwise-identical to advect_markers_slots for live slots (asserted in
tests/test_pallas_markers.py, including interpret mode on CPU); dead
slots carry garbage either way and are masked by re-binning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig
from euler_tpu.core.state import u_property, v_property
from euler_tpu.ops.interp import bilinear

_FLT_MAX = np.float32(np.finfo(np.float32).max)


def _shift_x(a, dx: int):
    """a[:, x + dx] with zero fill, static dx, on a [R, X] tile."""
    if dx == 0:
        return a
    z = jnp.zeros_like(a[:, :1])
    if dx > 0:
        return jnp.concatenate([a[:, dx:], z], axis=1)
    return jnp.concatenate([z, a[:, :dx]], axis=1)


def _shift_x_any(a, dx: int):
    """a[:, x + dx] with zero fill — layout-insensitive form.

    The concatenate form above is cheapest but Mosaic refuses it when
    the operand is a row-offset ref slice (sublane offset != 0):
    "result/input offset mismatch on non-concat dimension".  tpu.rotate
    assigns its operand a canonical layout (forcing a supported
    relayout), so this form is safe on slices like ref[r0+1:r1+1] that
    the fused substep / MG kernels shift; use it wherever the operand
    is not a freshly loaded whole plane."""
    if dx == 0:
        return a
    X = a.shape[-1]
    r = pltpu.roll(a, (-dx) % X, len(a.shape) - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, len(a.shape) - 1)
    zero = jnp.zeros_like(a)
    if dx > 0:
        return jnp.where(col >= X - dx, zero, r)
    return jnp.where(col < -dx, zero, r)


def _interp_tile(q9, p9, at_bx, at_by, frac_x, frac_y):
    """Fraction-snapped bilinear (main.c:301-364) on a row tile.

    q9/p9: 3x3 lists of [TY, X] planes indexed [dy+1][dx+1] relative to
    the site cell; at_bx/at_by: interpolation base == site (else site-1).
    """

    def corner(cy, cx):
        def pick(S):
            lo = jnp.where(at_bx, S[cy][cx + 1], S[cy][cx])
            hi = jnp.where(at_bx, S[cy + 1][cx + 1], S[cy + 1][cx])
            return jnp.where(at_by, hi, lo)

        return pick(p9) != 0, pick(q9)

    v00, q00 = corner(0, 0)
    v01, q01 = corner(0, 1)
    v10, q10 = corner(1, 0)
    v11, q11 = corner(1, 1)
    q00 = jnp.where(v00, q00, 0.0)
    q01 = jnp.where(v01, q01, 0.0)
    q10 = jnp.where(v10, q10, 0.0)
    q11 = jnp.where(v11, q11, 0.0)
    return bilinear(q00, q01, q10, q11, frac_x, frac_y, v00, v01, v10, v11)


def _clamped_base(idx, site, size, f):
    """clamp + modf of interpolate (main.c:337-346) relative to the site."""
    hi = np.nextafter(np.array(size - 1, f), np.array(0.0, f))
    ix = jnp.clip(idx, 0.0, hi)
    whole = jnp.floor(ix)
    frac = ix - whole
    at_base = whole.astype(jnp.int32) == site
    return at_base, frac


def _time_to(p0, p1, vel):
    nz = jnp.abs(vel) > 0.0
    return jnp.where(nz, (p1 - p0) / jnp.where(nz, vel, 1.0), _FLT_MAX)


def _march_kernel(cfg: SimConfig, TY, TX, dt_ref, cnt_ref, *refs):
    """refs: 45 grid-view refs (5 planes x 9 (dy, dx) shifted views),
    then px, py inputs and opx, opy outputs, each [K, TY, TX]."""
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    h = np.float32(cfg.side_length)
    inv_h = np.float32(1.0) / h
    f = jnp.float32
    row0 = pl.program_id(0) * TY
    col0 = pl.program_id(1) * TX
    views = [refs[i * 9 : (i + 1) * 9] for i in range(5)]
    px_ref, py_ref, opx_ref, opy_ref = refs[45:49]

    dt = dt_ref[0, 0]

    def skip_tile(_):
        # no live marker in this block: positions pass through
        # (dead-slot garbage is masked by re-binning)
        opx_ref[:] = px_ref[:]
        opy_ref[:] = py_ref[:]
        return 0

    def march_tile(_):
        def grid9(vs):
            # [dy+1][dx+1][y, x] == plane[y+dy, x+dx] (views precomputed
            # in HBM, so x-halos need no in-VMEM shifts)
            return [
                [vs[(dy + 1) * 3 + (dx + 1)][:] for dx in (-1, 0, 1)]
                for dy in (-1, 0, 1)
            ]

        u9 = grid9(views[0])
        v9 = grid9(views[1])
        up9 = grid9(views[2])
        vp9 = grid9(views[3])
        so9 = grid9(views[4])

        site_x = jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 1) + col0
        site_y = jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 0) + row0

        def solid_at(yy, xx):
            # select in f32 and compare once at the end: Mosaic can't
            # select between i1 vectors (i8->i1 truncation is unsupported)
            dy = jnp.clip(yy - site_y, -1, 1)
            dx = jnp.clip(xx - site_x, -1, 1)
            out = None
            for a in (-1, 0, 1):
                row = jnp.where(
                    dx == -1,
                    so9[a + 1][0],
                    jnp.where(dx == 0, so9[a + 1][1], so9[a + 1][2]),
                )
                out = row if out is None else jnp.where(dy == a, row, out)
            return out != 0

        def do_slot(k, carry_unused):
            px = px_ref[k]
            py = py_ref[k]

            bx_u, fx_u = _clamped_base(px * inv_h - 1.0, site_x, X - 1, f)
            by_u, fy_u = _clamped_base(py * inv_h - 0.5, site_y, Y, f)
            vx = _interp_tile(u9, up9, bx_u, by_u, fx_u, fy_u)
            bx_v, fx_v = _clamped_base(px * inv_h - 0.5, site_x, X, f)
            by_v, fy_v = _clamped_base(py * inv_h - 1.0, site_y, Y - 1, f)
            vy = _interp_tile(v9, vp9, bx_v, by_v, fx_v, fy_v)

            x_idx = jnp.floor(px * inv_h).astype(jnp.int32)
            y_idx = jnp.floor(py * inv_h).astype(jnp.int32)
            x_dir = jnp.where(vx > 0, 1, -1).astype(jnp.int32)
            nx_idx = x_idx + (vx > 0)
            npx = nx_idx.astype(f) * h
            t_x = _time_to(px, npx, vx)
            x_off = jnp.where(vx < 0, -1, 0).astype(jnp.int32)
            y_dir = jnp.where(vy > 0, 1, -1).astype(jnp.int32)
            ny_idx = y_idx + (vy > 0)
            npy = ny_idx.astype(f) * h
            t_y = _time_to(py, npy, vy)
            y_off = jnp.where(vy < 0, -1, 0).astype(jnp.int32)

            t_prev = jnp.zeros_like(px)
            t_near = jnp.minimum(t_x, t_y)
            dt_rem = jnp.zeros_like(px) + dt

            def march_iter(c):
                (px, py, vx, vy, x_idx, y_idx, nx_idx, ny_idx, npx, npy,
                 t_x, t_y, t_prev, t_near, dt_rem) = c
                active = t_near < dt_rem
                horiz = t_x < t_y
                hit_h = active & horiz & solid_at(y_idx, nx_idx + x_off)
                adv_h = active & horiz & ~hit_h
                hit_v = active & ~horiz & solid_at(ny_idx + y_off, x_idx)
                adv_v = active & ~horiz & ~hit_v
                hit = hit_h | hit_v

                px = jnp.where(hit, px + t_prev * vx, px)
                py = jnp.where(hit, py + t_prev * vy, py)
                dt_rem = jnp.where(hit, dt_rem - t_prev, dt_rem)
                vx = jnp.where(hit_h, 0.0, vx)
                vy = jnp.where(hit_v, 0.0, vy)
                x_idx = jnp.where(adv_h, nx_idx, x_idx)
                nx_idx = jnp.where(adv_h, nx_idx + x_dir, nx_idx)
                npx = jnp.where(adv_h, nx_idx.astype(f) * h, npx)
                y_idx = jnp.where(adv_v, ny_idx, y_idx)
                ny_idx = jnp.where(adv_v, ny_idx + y_dir, ny_idx)
                npy = jnp.where(adv_v, ny_idx.astype(f) * h, npy)
                t_x = jnp.where(active, _time_to(px, npx, vx), t_x)
                t_y = jnp.where(active, _time_to(py, npy, vy), t_y)
                t_prev = jnp.where(active, jnp.where(hit, 0.0, t_near), t_prev)
                t_near = jnp.where(active, jnp.minimum(t_x, t_y), t_near)
                return (px, py, vx, vy, x_idx, y_idx, nx_idx, ny_idx, npx, npy,
                        t_x, t_y, t_prev, t_near, dt_rem)

            c = (jnp.int32(0), px, py, vx, vy, x_idx, y_idx, nx_idx, ny_idx,
                 npx, npy, t_x, t_y, t_prev, t_near, dt_rem)
            # bounded while rather than a fixed unroll: most slot-tiles have
            # no active lane after 1-2 events, so the whole tile early-exits
            # — the reference's per-particle while (main.c:495), tile-level.
            # The cap keeps it bitwise-equal to the fixed masked loop of
            # advect_markers_slots (the skipped iterations are no-ops).
            c = jax.lax.while_loop(
                lambda c: (c[0] < cfg.marker_march_iters)
                & jnp.any(c[14] < c[15]),
                lambda c: (c[0] + 1,) + march_iter(c[1:]),
                c,
            )
            (_, px, py, vx, vy, _, _, _, _, _, _,
             t_x, t_y, t_prev, t_near, dt_rem) = c

            t = jnp.where(t_near < _FLT_MAX, dt_rem, t_prev)
            opx_ref[k] = px + t * vx
            opy_ref[k] = py + t * vy
            return 0

        def copy_slot(k, carry_unused):
            opx_ref[k] = px_ref[k]
            opy_ref[k] = py_ref[k]
            return 0

        # rolled loop over slots: unrolling keeps all K slices' march
        # intermediates live at once and blows the VMEM stack budget.
        # Validity is a front-compaction prefix (slot k live iff
        # k < count[cell]), so slots >= max(count) over the tile are dead
        # everywhere — copy those through instead of marching them.
        kmax = jnp.max(cnt_ref[:]).astype(jnp.int32)
        jax.lax.fori_loop(0, kmax, do_slot, 0)
        jax.lax.fori_loop(kmax, K, copy_slot, 0)
        return 0

    jax.lax.cond(jnp.any(cnt_ref[:] != 0), march_tile, skip_tile, 0)


def _three_views(a):
    """(rows y-1, y, y+1) of a plane, zero beyond edges, as [Y, X] each."""
    p = jnp.pad(a, ((1, 1), (0, 0)))
    Y = a.shape[0]
    return p[0:Y], p[1 : Y + 1], p[2 : Y + 2]


def _nine_views(a):
    """view(dy, dx)[y, x] == a[y+dy, x+dx], zero beyond edges; dy-major.

    HBM-precomputed 2D halo views: column-tiled kernel blocks read their
    x-neighbours without in-VMEM shifts (x-shifts can't cross a tile
    edge)."""
    Y, X = a.shape
    p = jnp.pad(a, ((1, 1), (1, 1)))
    return tuple(
        p[1 + dy : 1 + dy + Y, 1 + dx : 1 + dx + X]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )


@functools.partial(jax.jit, static_argnums=(0, 9))
def advect_markers_pallas(cfg: SimConfig, u, v, fluid, solid, px, py, dt,
                          count, interpret: bool = False):
    """Fused marker advection: returns (new_px, new_py) [K, Y, X].

    `count` is the per-cell live-marker count ([Y, X]) used only for the
    tile-level empty-block skip.  Positions are produced for ALL slots
    (dead slots yield garbage that re-binning masks out), matching
    advect_markers_slots' contract.
    """
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    f = px.dtype

    # 2D (row x column) tiles: finer empty-block skip granularity (a
    # vertical fluid column leaves column blocks beside it skippable)
    # and a more local max(count) slot bound.  TX is capped so the VMEM
    # working set stays small at any grid size.
    TX = min(X, 256)
    while X % TX:
        TX //= 2
    TY = min(Y, 32)
    while Y % TY:
        TY //= 2
    grid = (Y // TY, X // TX)

    planes = []
    for a in (
        u,
        v,
        u_property(fluid).astype(f),
        v_property(fluid).astype(f),
        solid.astype(f),
    ):
        planes.extend(_nine_views(a))

    # (1, 128) VMEM plane rather than an SMEM scalar: the SMEM form
    # breaks the pallas_call batching rule under vmap
    dt_arr = jnp.full((1, 128), dt, f)

    tile_spec = pl.BlockSpec(
        (TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    slot_spec = pl.BlockSpec(
        (K, TY, TX), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_march_kernel, cfg, TY, TX)
    opx, opy = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((K, Y, X), f),
            jax.ShapeDtypeStruct((K, Y, X), f),
        ],
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [tile_spec]
        + [tile_spec] * 45
        + [slot_spec, slot_spec],
        out_specs=[slot_spec, slot_spec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dt_arr, count.astype(f), *planes, px, py)
    return opx, opy

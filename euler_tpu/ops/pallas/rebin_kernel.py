"""Pallas TPU kernel: fused slot-marker re-binning (refresh counts).

The counterpart of refresh_marker_counts (main.c:102-117) on the slot
layout: take advected positions (possibly one cell away from their home
slot), drop markers landing in sink/solid cells, compact arrivals into
the destination cells' slot arrays, and count.

One pass per row-block tile: the nine candidate neighbourhoods arrive as
three row-shifted views x three in-VMEM x-shifts, destination slots are
assigned by a running per-cell count with a prefix-sum rank along the
(leading, K-sized) slot axis, and each output slot accumulates its
unique candidate with masked sums.  Row blocks whose views hold no live
marker skip the insertion loop behind one tile-level branch and write
zeros (bitwise-equal: no arrival implies all-zero outputs).  The XLA version of this pass
materialises dozens of [K, Y, X] intermediates in HBM; here everything
after the block loads stays on-chip.

Agreement with refresh_marker_counts_slots is exact (selection and
compaction are integer/boolean ops; positions are copied, not
recomputed) — asserted in tests/test_pallas_markers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig


def _shift_x(a, dx: int, fill=0.0):
    if dx == 0:
        return a
    z = jnp.full_like(a[..., :1], fill)
    if dx > 0:
        return jnp.concatenate([a[..., dx:], z], axis=-1)
    return jnp.concatenate([z, a[..., :dx]], axis=-1)


def _rebin_kernel(cfg: SimConfig, TY,
                  px_m1, px_0, px_p1, py_m1, py_0, py_p1,
                  va_m1, va_0, va_p1, dead_ref,
                  opx_ref, opy_ref, ova_ref, cnt_ref, drop_ref):
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    inv_h = np.float32(1.0) / np.float32(cfg.side_length)
    row0 = pl.program_id(0) * TY

    site_x = jax.lax.broadcasted_iota(jnp.int32, (TY, X), 1)
    site_y = jax.lax.broadcasted_iota(jnp.int32, (TY, X), 0) + row0
    dead = dead_ref[:] != 0  # [TY, X]

    views = {
        -1: (px_m1, py_m1, va_m1),
        0: (px_0, py_0, va_0),
        1: (px_p1, py_p1, va_p1),
    }

    def skip_tile(_):
        # no live marker in this block or its row halo: every output of
        # the insertion loop below would be exactly zero — write zeros
        # (bitwise-equal to the full computation)
        zf = jnp.zeros((TY, X), jnp.float32)
        for d in range(K):
            opx_ref[d] = zf
            opy_ref[d] = zf
            ova_ref[d] = zf
        cnt_ref[:] = jnp.zeros((TY, X), jnp.int32)
        drop_ref[:] = jnp.zeros((TY, X), jnp.int32)
        return 0

    def rebin_tile(_):
        count = jnp.zeros((TY, X), jnp.int32)
        # per-destination-cell capacity drops (see marker_fused_kernel)
        drop = jnp.zeros((TY, X), jnp.int32)
        # accumulators per destination slot (validity is NOT accumulated:
        # insertion is front-compacted, so valid slots are exactly d < count)
        acc_px = [jnp.zeros((TY, X), jnp.float32) for _ in range(K)]
        acc_py = [jnp.zeros((TY, X), jnp.float32) for _ in range(K)]

        # same (dy, dx) traversal as refresh_marker_counts_slots (own
        # cell FIRST, then neighbours) — the insertion order determines
        # slot assignment within a cell.  Source cell is (y-dy, x-dx):
        # row view -dy, x-shift by -dx.
        from euler_tpu.ops.markers_slots import OFFSETS_OWN_FIRST

        for dy, dx in OFFSETS_OWN_FIRST:
                pxv, pyv, vav = views[-dy]
                spx = _shift_x(pxv[:], -dx)
                spy = _shift_x(pyv[:], -dx)
                sva = _shift_x(vav[:], -dx)
                # bound for (y, x)?  destination = floor(position)
                ncx = jnp.floor(spx * inv_h).astype(jnp.int32)
                ncy = jnp.floor(spy * inv_h).astype(jnp.int32)
                sel = (sva != 0) & (ncx == site_x[None]) & (ncy == site_y[None])
                # explicit running prefix count over the (small, static) slot
                # axis — Mosaic has no cumsum primitive.  `run` counts
                # SELECTED candidates (the cumsum rank), `count` counts
                # accepted ones, matching refresh_marker_counts_slots.
                run = count
                newcount = count
                for k in range(K):
                    selk = sel[k]
                    destk = run
                    okk = selk & (destk < K) & ~dead
                    okf = okk.astype(jnp.float32)
                    for d in range(K):
                        mf = okf * (destk == d).astype(jnp.float32)
                        acc_px[d] = acc_px[d] + mf * spx[k]
                        acc_py[d] = acc_py[d] + mf * spy[k]
                    run = run + selk.astype(jnp.int32)
                    newcount = newcount + okk.astype(jnp.int32)
                # capacity drops = candidates - accepted at non-dead
                # cells (at dead cells the difference is the reference's
                # sink/solid deletion, not a drop)
                drop = drop + jnp.where(dead, 0, run - newcount)
                count = newcount

        for d in range(K):
            opx_ref[d] = acc_px[d]
            opy_ref[d] = acc_py[d]
            ova_ref[d] = jnp.where(count > d, 1.0, 0.0).astype(jnp.float32)
        cnt_ref[:] = count
        drop_ref[:] = drop
        return 0

    # tile-level skip: arrivals can only come from this block's rows and
    # their 1-row halo, all present in the three valid views
    any_live = jnp.any((va_m1[:] + va_0[:] + va_p1[:]) != 0)
    jax.lax.cond(any_live, rebin_tile, skip_tile, 0)


def _three_row_views(a):
    """(rows y-1, y, y+1) along axis -2 of [K, Y, X], zero beyond edges."""
    K, Y, X = a.shape
    p = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
    return p[:, 0:Y], p[:, 1 : Y + 1], p[:, 2 : Y + 2]


@functools.partial(jax.jit, static_argnums=(0, 5))
def rebin_markers_pallas(cfg: SimConfig, px, py, valid_f, dead,
                         interpret: bool = False):
    """Fused re-binning.  px/py/valid_f: [K, Y, X] (valid as f32 0/1),
    dead: [Y, X] f32 (sink|solid).  Returns
    (px', py', valid_f', count, dropped) — dropped is a [Y, X] i32 plane
    of per-destination-cell markers lost to the slot capacity this
    pass."""
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    f = px.dtype

    # tile height adapted to X so the double-buffered VMEM working set
    # stays inside the limit: 12 K-deep blocks of [K, TY, X] f32 live at
    # once (9 in + 3 out, x2 pipeline buffers), so hold TY*X <= 32768
    # (~32 MB of windows) and let compute temps use the rest
    TY = min(Y, max(8, 32768 // X))
    while Y % TY:
        TY //= 2
    grid = (Y // TY,)

    slot_blk = pl.BlockSpec(
        (K, TY, X), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    row_blk = pl.BlockSpec((TY, X), lambda i: (i, 0), memory_space=pltpu.VMEM)

    inputs = []
    for a in (px, py, valid_f):
        inputs.extend(_three_row_views(a))

    kernel = functools.partial(_rebin_kernel, cfg, TY)
    opx, opy, ova, cnt, drop = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((K, Y, X), f),
            jax.ShapeDtypeStruct((K, Y, X), f),
            jax.ShapeDtypeStruct((K, Y, X), f),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
        ],
        in_specs=[slot_blk] * 9 + [row_blk],
        out_specs=[slot_blk, slot_blk, slot_blk, row_blk, row_blk],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs, dead)
    return opx, opy, ova, cnt, drop

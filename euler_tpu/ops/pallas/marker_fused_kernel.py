"""Pallas TPU kernel: ONE fused, software-pipelined marker pass.

Fuses advect_markers_slots + refresh_marker_counts_slots
(main.c:464-537 + main.c:102-117) into a single kernel launch per
substep.  The standalone pair moves ~700 MB/substep of HBM traffic at
1024² (the re-binning kernel alone streams NINE [K, Y, X] row-shifted
views); here each 2D tile DMAs ONE haloed window of everything it
needs, marches every marker in the tile and its 1-cell halo (halo
markers are re-marched redundantly by the owning neighbour tile —
bitwise-identical arithmetic, so no communication), and re-bins
entirely in VMEM.

The manual halo DMAs are software-pipelined two tiles deep (Pallas
cannot auto-pipeline manually-DMA'd windows the way it does BlockSpec
streams): at tile n the kernel
  1. waits tile n+1's count window (started at n-1) and, if it shows
     any live marker, starts tile n+1's grid+slot window DMAs;
  2. starts tile n+2's count window DMA;
  3. waits its own window DMAs (in flight since n-1) and computes.
Tiles whose count window is all zero skip both the big DMAs and all
compute (the CFL bound ==> no marker can arrive from beyond the halo),
so empty regions cost one small count-window DMA and nothing else.

Validity is never streamed OR emitted: slots are front-compacted, so
slot k of a cell is live iff k < count — the count window already in
VMEM on input, and `k < count'` on output.  The kernel's I/O is the
combined [2K, Y, X] slot-plane array, which is a free reshape of both
marker-store layouts (flat [2, M] and spatial [2, K, Y, X]) — the whole
pass does zero layout work outside the kernel.

Bitwise-identical to the two-kernel path (asserted against the jnp
slots pipeline in tests/test_pallas_markers.py, including interpret
mode on CPU).
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


def _interp_tile(q9, p9, at_bx, at_by, frac_x, frac_y):
    """Fraction-snapped bilinear (main.c:301-364) on a row tile."""

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


def _interp_plain(q9, at_bx, at_by, frac_x, frac_y):
    """Bilinear WITHOUT validity machinery — bitwise-equal to
    _interp_tile when every corner's property is set (fraction snapping
    degenerates to the identity and the zero-masking to a no-op), which
    the interior-tile condition guarantees."""

    def corner(cy, cx):
        def pick(S):
            lo = jnp.where(at_bx, S[cy][cx + 1], S[cy][cx])
            hi = jnp.where(at_bx, S[cy + 1][cx + 1], S[cy + 1][cx])
            return jnp.where(at_by, hi, lo)

        return pick(q9)

    q00 = corner(0, 0)
    q01 = corner(0, 1)
    q10 = corner(1, 0)
    q11 = corner(1, 1)
    # identical expression shape to interp.bilinear's _linear chain
    left_value = (1.0 - frac_y) * q00 + frac_y * q10
    right_value = (1.0 - frac_y) * q01 + frac_y * q11
    return (1.0 - frac_x) * left_value + frac_x * right_value


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


def _fused_kernel(cfg: SimConfig, TY, TX, RW, LW, RWS, LWS, SB, SBL,
                  padded_out, nj, nt, clamp_ny,
                  dt_ref, dead_ref, cnt_hbm, grid_hbm, slots_hbm,
                  oslots_ref, ocnt_ref, odrop_ref,
                  csc, gsc, ssc, sems, *opt):
    """csc: [3, RWS, LWS] count windows; gsc: [2*5, RW, LW] grid
    windows; ssc: [2*2K, RWS, LWS] slot windows; sems: 7 DMA semaphores
    (0-2 count, 3-4 grid, 5-6 slots).

    (SB, SBL) is the halo-tile origin inside a count/slot window:
    (0, 0) for the per-substep-padded layout (interior at (1, 1) of the
    padded array, windows starting one row/lane before it), (7, 127) for
    the PERSISTENT padded store (interior at (8, 128) so every tile's
    OUTPUT offset is (8, 128)-aligned for the manual write DMA;
    marker_padded_store).  padded_out: oslots_ref is a whole padded
    [2K, Yp, Xp] HBM ref written by per-tile DMA from the `opt` scratch
    (osl [2, 2K, TY, TX], osem DMA (2,), olast SMEM (2,) i32 = last tile
    index holding an outstanding DMA on that buffer, -1 none); slot pads
    may hold GARBAGE — a pad cell's count is zero (the count plane is
    zero-padded each substep), so its slots are never read.

    clamp_ny: GLOBAL row count for the interpolation clamps — equals
    cfg.ny single-device; under row-sharding (parallel/pallas_shard)
    cfg.ny is the halo-padded LOCAL plane height while the clamp bound
    stays global.  dt_ref lane 1 carries the shard's global row offset
    (global row index of plane row 0; 0 single-device)."""
    Y, X, K = clamp_ny, cfg.nx, cfg.slots_per_cell
    TH, TW = TY + 2, TX + 2  # halo tile (marched cells)
    h = np.float32(cfg.side_length)
    inv_h = np.float32(1.0) / h
    f = jnp.float32
    n = pl.program_id(0)
    dt = dt_ref[0, 0]
    row_off = dt_ref[0, 1].astype(jnp.int32)

    def origin(m):
        return (m // nj) * TY, (m % nj) * TX

    def count_dma(m):
        r0, c0 = origin(m)
        return pltpu.make_async_copy(
            cnt_hbm.at[pl.ds(r0, RWS), pl.ds(c0, LWS)],
            csc.at[m % 3], sems.at[m % 3],
        )

    def grid_dma(m):
        r0, c0 = origin(m)
        return pltpu.make_async_copy(
            grid_hbm.at[:, pl.ds(r0, RW), pl.ds(c0, LW)],
            gsc.at[pl.ds((m % 2) * 5, 5)], sems.at[3 + m % 2],
        )

    def slots_dma(m):
        r0, c0 = origin(m)
        return pltpu.make_async_copy(
            slots_hbm.at[:, pl.ds(r0, RWS), pl.ds(c0, LWS)],
            ssc.at[pl.ds((m % 2) * 2 * K, 2 * K)], sems.at[5 + m % 2],
        )

    def live(m):
        # reduce over the true halo rows/cols only: the DMA window
        # over-reads real rows below the tile (alignment), and counting
        # those would make air tiles above a fluid surface do full work
        return jnp.any(csc[m % 3, SB:SB + TH, SBL:SBL + TW] > 0)

    if padded_out:
        osl, osem, olast = opt

        def out_dma(m):
            r0 = (m // nj) * TY
            c0 = (m % nj) * TX
            return pltpu.make_async_copy(
                osl.at[m % 2],
                oslots_ref.at[:, pl.ds(8 + r0, TY), pl.ds(128 + c0, TX)],
                osem.at[m % 2],
            )

    # ---- pipeline bookkeeping -------------------------------------
    @pl.when(n == 0)
    def _prologue():
        count_dma(0).start()
        count_dma(0).wait()
        if padded_out:
            olast[0] = jnp.int32(-1)
            olast[1] = jnp.int32(-1)

        @pl.when(live(0))
        def _():
            grid_dma(0).start()
            slots_dma(0).start()

        @pl.when(nt > 1)
        def _():
            count_dma(1).start()

    @pl.when(n + 1 < nt)
    def _advance():
        count_dma(n + 1).wait()

        @pl.when(live(n + 1))
        def _():
            grid_dma(n + 1).start()
            slots_dma(n + 1).start()

    @pl.when(n + 2 < nt)
    def _prefetch():
        count_dma(n + 2).start()

    # ---- this tile -------------------------------------------------
    row0, col0 = origin(n)
    cslot = n % 3
    bslot = n % 2

    def skip_tile(_):
        if not padded_out:
            # padded mode: the tile's output slots stay whatever the
            # fresh buffer holds — its counts are zero, so never read
            zf = jnp.zeros((TY, TX), f)
            for d in range(2 * K):
                oslots_ref[d] = zf
        ocnt_ref[:] = jnp.zeros((TY, TX), jnp.int32)
        odrop_ref[:] = jnp.zeros((TY, TX), jnp.int32)
        return 0

    def work_tile(_):
        grid_dma(n).wait()
        slots_dma(n).wait()

        # ---- march (advect_markers_slots on the [TH, TW] halo tile) ----
        def grid9(p):
            # [dy+1][dx+1][y, x] == plane[y+dy, x+dx] for halo-tile sites
            return [
                [gsc[bslot * 5 + p, 1 + dy : 1 + dy + TH, 1 + dx : 1 + dx + TW]
                 for dx in (-1, 0, 1)]
                for dy in (-1, 0, 1)
            ]

        u9 = grid9(0)
        v9 = grid9(1)
        up9 = grid9(2)
        vp9 = grid9(3)
        so9 = grid9(4)

        site_x = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + (col0 - 1)
        site_y = (jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
                  + (row0 - 1) + row_off)

        def solid_at(yy, xx):
            # select in f32 and compare once at the end: Mosaic can't
            # select between i1 vectors
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
            px = ssc[bslot * 2 * K + k, SB:SB + TH, SBL:SBL + TW]
            py = ssc[bslot * 2 * K + K + k, SB:SB + TH, SBL:SBL + TW]

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
            c = jax.lax.while_loop(
                lambda c: (c[0] < cfg.marker_march_iters)
                & jnp.any(c[14] < c[15]),
                lambda c: (c[0] + 1,) + march_iter(c[1:]),
                c,
            )
            (_, px, py, vx, vy, _, _, _, _, _, _,
             t_x, t_y, t_prev, t_near, dt_rem) = c

            t = jnp.where(t_near < _FLT_MAX, dt_rem, t_prev)
            # march in place: re-binning reads the marched window below
            ssc[bslot * 2 * K + k, SB:SB + TH, SBL:SBL + TW] = px + t * vx
            ssc[bslot * 2 * K + K + k, SB:SB + TH, SBL:SBL + TW] = (
                py + t * vy)
            return 0

        def do_slot_fast(k, carry_unused):
            """Interior-tile march: with every property in the window set
            and no solid anywhere, the DDA march cannot hit (final
            position is EXACTLY px + dt*v — the cell-crossing loop only
            does bookkeeping) and the interpolation's validity machinery
            is the identity.  Bitwise-equal to do_slot under the
            `interior` condition (test_pallas_markers)."""
            px = ssc[bslot * 2 * K + k, SB:SB + TH, SBL:SBL + TW]
            py = ssc[bslot * 2 * K + K + k, SB:SB + TH, SBL:SBL + TW]

            bx_u, fx_u = _clamped_base(px * inv_h - 1.0, site_x, X - 1, f)
            by_u, fy_u = _clamped_base(py * inv_h - 0.5, site_y, Y, f)
            vx = _interp_plain(u9, bx_u, by_u, fx_u, fy_u)
            bx_v, fx_v = _clamped_base(px * inv_h - 0.5, site_x, X, f)
            by_v, fy_v = _clamped_base(py * inv_h - 1.0, site_y, Y - 1, f)
            vy = _interp_plain(v9, bx_v, by_v, fx_v, fy_v)

            ssc[bslot * 2 * K + k, SB:SB + TH, SBL:SBL + TW] = px + dt * vx
            ssc[bslot * 2 * K + K + k, SB:SB + TH, SBL:SBL + TW] = (
                py + dt * vy)
            return 0

        # validity is front-compacted, so slots >= max(count) are dead
        # everywhere in the window — only kmax slots march
        kmax = jnp.max(csc[cslot, SB:SB + TH, SBL:SBL + TW]).astype(
            jnp.int32)
        if cfg.marker_interior_fast:
            # interior condition: every u/v property set and no solid
            # over everything the interp/march can touch ([TH+2, TW+2]
            # window region; pads beyond the grid are zero, so edge
            # tiles are conservatively excluded)
            interior = (
                jnp.all(gsc[bslot * 5 + 2, 0:TH + 2, 0:TW + 2] != 0)
                & jnp.all(gsc[bslot * 5 + 3, 0:TH + 2, 0:TW + 2] != 0)
                & jnp.all(gsc[bslot * 5 + 4, 0:TH + 2, 0:TW + 2] == 0)
            )

            @pl.when(interior)
            def _fast_march():
                jax.lax.fori_loop(0, kmax, do_slot_fast, 0)

            @pl.when(jnp.logical_not(interior))
            def _full_march():
                jax.lax.fori_loop(0, kmax, do_slot, 0)
        else:
            jax.lax.fori_loop(0, kmax, do_slot, 0)

        # ---- re-binning (refresh_marker_counts_slots, tile interior) ----
        dead = dead_ref[:] != 0

        # hoist the destination-cell floors out of the 9-view loop: each
        # marched slot's target cell is computed once on the halo tile
        hx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + (col0 - 1)
        hy = (jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
              + (row0 - 1) + row_off)
        hcnt = csc[cslot, SB:SB + TH, SBL:SBL + TW]

        # Insertion is SELECTION, not accumulation: destination ranks are
        # consecutive (run increments once per candidate across the whole
        # own-first + 8-view sequence), so each destination slot receives
        # at most ONE candidate — `where(mask, src, acc)` replaces the
        # one-hot multiply-add (4 vops per (slot, dest) pair vs 7), and
        # count/drops finalise ONCE from the total candidate count
        # (count = min(run, K), drop = run - count at live cells) instead
        # of per-(view, slot) bookkeeping.  All outputs bitwise equal to
        # the jnp path (tests/test_pallas_markers.py).
        #
        # KE parametrises the SOURCE-slot depth: when the tile's kmax is
        # <= K//2 every slot k >= KE is dead everywhere in the window, so
        # a half-depth re-binning is exact at roughly half the (view,
        # slot) insertion pairs — the common case on settled flows where
        # most cells hold their seeded 4 markers.
        #
        # DP parametrises the DESTINATION-slot depth of the PRIMARY
        # insertion pass.  With the lossless 16-slot store (K = 16,
        # config.slots_per_cell — sized from the measured per-cell
        # maximum of 16 across all bundled scenarios at 50 frames),
        # destinations 8..K-1 exist only to absorb the rare > 8-arrivals
        # cell (the reference bounds per-cell counts only by its uint8
        # counter, main.c:92-97): the primary pass writes d < DP = 8 and
        # accumulates the full rank count; a SECOND pass, gated per-tile
        # on any cell's accepted count actually exceeding DP, re-walks
        # the views writing only d in [DP, K).  Drop-free tiles pay
        # nothing beyond zero-filling the overflow planes, so the
        # lossless store costs ~0 vector work on settled flow.
        DP = min(K, 8)

        def store_px(d, val):
            if padded_out:
                osl[n % 2, d] = val
            else:
                oslots_ref[d] = val

        def store_py(d, val):
            if padded_out:
                osl[n % 2, K + d] = val
            else:
                oslots_ref[K + d] = val

        def movement_codes(KE):
            # movement CODE per marched slot: (movy+1)*3 + (movx+1) in
            # 0..8 (CFL bounds movement to one cell) — per-view selection
            # is then ONE compare against the view's constant instead of
            # two compares + and per (view, slot)
            movc = []
            for k in range(KE):
                mpx = ssc[bslot * 2 * K + k, SB:SB + TH, SBL:SBL + TW]
                mpy = ssc[bslot * 2 * K + K + k, SB:SB + TH, SBL:SBL + TW]
                mx = jnp.floor(mpx * inv_h).astype(jnp.int32) - hx
                my = jnp.floor(mpy * inv_h).astype(jnp.int32) - hy
                # dead slots get code -1 (matches no view)
                movc.append(jnp.where(k < hcnt, (my + 1) * 3 + (mx + 1),
                                      jnp.int32(-1)))
            return movc

        def overflow_views(KE, movc, stays):
            """Destinations [DP, K): stayers first (a stayer's rank is
            bounded by its slot index, so only slots k >= DP can spill —
            for KE <= DP this loop degenerates to the plain run count),
            then the arrivals of the 8 neighbour views, ranks continuing
            where the primary pass's run left off.  Generalising the
            stayer case (round 5) lets the DEEP tier split its
            destinations too: the old full-depth rebin(K) path held
            2K accumulator planes live and pushed Mosaic liveness to
            245.7M of 128M at K=16 (MEASURE_r4.jsonl.err)."""
            nd = ~dead
            run = jnp.zeros((TY, TX), jnp.int32)
            acc_px = [jnp.zeros((TY, TX), f) for _ in range(DP, K)]
            acc_py = [jnp.zeros((TY, TX), f) for _ in range(DP, K)]
            for k in range(KE):
                if k >= DP:  # triangular bound: rank <= slot index
                    spx0k = ssc[bslot * 2 * K + k, SB + 1 : SB + 1 + TY,
                                SBL + 1 : SBL + 1 + TX]
                    spy0k = ssc[bslot * 2 * K + K + k,
                                SB + 1 : SB + 1 + TY,
                                SBL + 1 : SBL + 1 + TX]
                    snd = stays[k] & nd
                    if cfg.marker_packed_insert:
                        rk = jnp.where(snd, run, jnp.int32(-1))
                        for d in range(DP, min(k + 1, K)):
                            m = rk == d
                            acc_px[d - DP] = jnp.where(m, spx0k,
                                                       acc_px[d - DP])
                            acc_py[d - DP] = jnp.where(m, spy0k,
                                                       acc_py[d - DP])
                    else:
                        for d in range(DP, min(k + 1, K)):
                            m = snd & (run == d)
                            acc_px[d - DP] = jnp.where(m, spx0k,
                                                       acc_px[d - DP])
                            acc_py[d - DP] = jnp.where(m, spy0k,
                                                       acc_py[d - DP])
                run = run + stays[k].astype(jnp.int32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy, dx) == (0, 0):
                        continue
                    ys, xs = 1 - dy, 1 - dx
                    vc = (dy + 1) * 3 + (dx + 1)
                    sels = [movc[k][ys : ys + TY, xs : xs + TX] == vc
                            for k in range(KE)]
                    any_sel = sels[0]
                    for s in sels[1:]:
                        any_sel = any_sel | s

                    def insert_view(carry, _ys=ys, _xs=xs, _sels=sels):
                        run, acc_px, acc_py = carry
                        for k in range(KE):
                            if cfg.marker_packed_insert:
                                def body_k(c, _k=k, _yy=_ys, _xx=_xs,
                                           _sel=_sels[k]):
                                    run, acc_px, acc_py = c
                                    spx = ssc[bslot * 2 * K + _k,
                                              SB + _yy : SB + _yy + TY,
                                              SBL + _xx : SBL + _xx + TX]
                                    spy = ssc[bslot * 2 * K + K + _k,
                                              SB + _yy : SB + _yy + TY,
                                              SBL + _xx : SBL + _xx + TX]
                                    rk = jnp.where(_sel & nd, run,
                                                   jnp.int32(-1))
                                    for d in range(DP, K):
                                        m = rk == d
                                        acc_px[d - DP] = jnp.where(
                                            m, spx, acc_px[d - DP])
                                        acc_py[d - DP] = jnp.where(
                                            m, spy, acc_py[d - DP])
                                    return (run + _sel.astype(jnp.int32),
                                            acc_px, acc_py)

                                run, acc_px, acc_py = jax.lax.cond(
                                    jnp.any(_sels[k]), body_k,
                                    lambda c: c, (run, acc_px, acc_py))
                                continue
                            spx = ssc[bslot * 2 * K + k,
                                      SB + _ys : SB + _ys + TY,
                                      SBL + _xs : SBL + _xs + TX]
                            spy = ssc[bslot * 2 * K + K + k,
                                      SB + _ys : SB + _ys + TY,
                                      SBL + _xs : SBL + _xs + TX]
                            snd = _sels[k] & nd
                            for d in range(DP, K):
                                m = snd & (run == d)
                                acc_px[d - DP] = jnp.where(m, spx,
                                                           acc_px[d - DP])
                                acc_py[d - DP] = jnp.where(m, spy,
                                                           acc_py[d - DP])
                            run = run + _sels[k].astype(jnp.int32)
                        return run, acc_px, acc_py

                    run, acc_px, acc_py = jax.lax.cond(
                        jnp.any(any_sel),
                        insert_view,
                        lambda carry: carry,
                        (run, acc_px, acc_py),
                    )
            for d in range(DP, K):
                store_px(d, acc_px[d - DP])
                store_py(d, acc_py[d - DP])

        def rebin(KE, DEST=None):
            if DEST is None:
                DEST = K  # single full-depth pass (no overflow split)
            movc = movement_codes(KE)

            run = jnp.zeros((TY, TX), jnp.int32)
            acc_px = [jnp.zeros((TY, TX), f) for _ in range(DEST)]
            acc_py = [jnp.zeros((TY, TX), f) for _ in range(DEST)]

            # ---- own cell first (offset (0, 0), OFFSETS_OWN_FIRST[0]):
            # processed before any arrival, so a stayer's destination
            # rank is at most its own slot index (triangular bound), and
            # when NO live marker in the tile leaves its cell, slot k
            # maps to slot k exactly (front-compaction makes the rank
            # prefix the identity) ----
            scnt0 = csc[cslot, SB + 1 : SB + 1 + TY,
                        SBL + 1 : SBL + 1 + TX]
            spx0 = [ssc[bslot * 2 * K + k, SB + 1 : SB + 1 + TY,
                        SBL + 1 : SBL + 1 + TX] for k in range(KE)]
            spy0 = [ssc[bslot * 2 * K + K + k, SB + 1 : SB + 1 + TY,
                        SBL + 1 : SBL + 1 + TX] for k in range(KE)]
            stays = []
            any_leaver = None
            for k in range(KE):
                mc = movc[k][1 : 1 + TY, 1 : 1 + TX]
                stayk = mc == 4  # code (0, 0); dead slots are -1
                stays.append(stayk)
                leaverk = (mc >= 0) & ~stayk
                any_leaver = (leaverk if any_leaver is None
                              else (any_leaver | leaverk))

            def own_fast(carry):
                # no leaver anywhere in the tile: every live slot keeps
                # its marker in place (rank k == slot k); slots >= DEST
                # (possible only in the deep tier's split) spill via the
                # overflow pass
                run, acc_px, acc_py = carry
                nd = ~dead
                for k in range(min(KE, DEST)):
                    okk = (k < scnt0) & nd
                    acc_px[k] = jnp.where(okk, spx0[k], acc_px[k])
                    acc_py[k] = jnp.where(okk, spy0[k], acc_py[k])
                return run + scnt0, acc_px, acc_py

            def own_full(carry):
                run, acc_px, acc_py = carry
                nd = ~dead
                for k in range(KE):
                    snd = stays[k] & nd
                    if cfg.marker_packed_insert:
                        # masked rank: -1 at non-candidates, so the
                        # destination scan is one compare + two selects
                        # per pair (stayers are the common case — no
                        # any() gate, it would almost always be true)
                        rk = jnp.where(snd, run, jnp.int32(-1))
                        for d in range(min(k + 1, DEST)):
                            m = rk == d
                            acc_px[d] = jnp.where(m, spx0[k], acc_px[d])
                            acc_py[d] = jnp.where(m, spy0[k], acc_py[d])
                    else:
                        # triangular bound: rank <= k; ranks >= DEST
                        # spill
                        for d in range(min(k + 1, DEST)):
                            m = snd & (run == d)
                            acc_px[d] = jnp.where(m, spx0[k], acc_px[d])
                            acc_py[d] = jnp.where(m, spy0[k], acc_py[d])
                    run = run + stays[k].astype(jnp.int32)
                return run, acc_px, acc_py

            run, acc_px, acc_py = jax.lax.cond(
                jnp.any(any_leaver), own_full, own_fast,
                (run, acc_px, acc_py),
            )

            # ---- the 8 neighbour offsets, lexicographic (matching
            # refresh_marker_counts_slots' OFFSETS_OWN_FIRST tail) ----
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy, dx) == (0, 0):
                        continue
                    ys, xs = 1 - dy, 1 - dx
                    vc = (dy + 1) * 3 + (dx + 1)
                    # ONE compare per (view, slot): liveness and
                    # direction are both folded into the movement code
                    sels = [movc[k][ys : ys + TY, xs : xs + TX] == vc
                            for k in range(KE)]  # movc is halo-tile-local
                    any_sel = sels[0]
                    for s in sels[1:]:
                        any_sel = any_sel | s

                    def insert_view(carry, _ys=ys, _xs=xs, _sels=sels):
                        run, acc_px, acc_py = carry
                        nd = ~dead
                        for k in range(KE):
                            if cfg.marker_packed_insert:
                                # packed: skip this slot's whole
                                # destination scan when it has no
                                # candidate anywhere in the tile (run
                                # would also not change); otherwise use
                                # the masked rank — one compare + two
                                # selects per (slot, dest) pair
                                def body_k(c, _k=k, _yy=_ys, _xx=_xs,
                                           _sel=_sels[k], _nd=nd):
                                    run, acc_px, acc_py = c
                                    spx = ssc[bslot * 2 * K + _k,
                                              SB + _yy : SB + _yy + TY,
                                              SBL + _xx : SBL + _xx + TX]
                                    spy = ssc[bslot * 2 * K + K + _k,
                                              SB + _yy : SB + _yy + TY,
                                              SBL + _xx : SBL + _xx + TX]
                                    rk = jnp.where(_sel & _nd, run,
                                                   jnp.int32(-1))
                                    for d in range(DEST):
                                        m = rk == d
                                        acc_px[d] = jnp.where(
                                            m, spx, acc_px[d])
                                        acc_py[d] = jnp.where(
                                            m, spy, acc_py[d])
                                    return (run + _sel.astype(jnp.int32),
                                            acc_px, acc_py)

                                run, acc_px, acc_py = jax.lax.cond(
                                    jnp.any(_sels[k]), body_k,
                                    lambda c: c, (run, acc_px, acc_py))
                                continue
                            spx = ssc[bslot * 2 * K + k,
                                      SB + _ys : SB + _ys + TY,
                                      SBL + _xs : SBL + _xs + TX]
                            spy = ssc[bslot * 2 * K + K + k,
                                      SB + _ys : SB + _ys + TY,
                                      SBL + _xs : SBL + _xs + TX]
                            snd = _sels[k] & nd
                            for d in range(DEST):
                                m = snd & (run == d)
                                acc_px[d] = jnp.where(m, spx, acc_px[d])
                                acc_py[d] = jnp.where(m, spy, acc_py[d])
                            run = run + _sels[k].astype(jnp.int32)
                        return run, acc_px, acc_py

                    # view-level skip: no marker of these source cells
                    # lands in this tile with this offset -> the whole
                    # insertion pass is a no-op
                    run, acc_px, acc_py = jax.lax.cond(
                        jnp.any(any_sel),
                        insert_view,
                        lambda carry: carry,
                        (run, acc_px, acc_py),
                    )

            # ---- finalise: ranks are consecutive, so accepted =
            # min(run, K) at live cells; the remainder is the
            # slot-capacity drop (at dead cells the difference is the
            # reference's sink/solid deletions — main.c:109-113 — not
            # drops).  A [TY, TX] plane rather than a scalar so a
            # sharded caller can crop redundant halo cells. ----
            accepted = jnp.minimum(run, K)
            count = jnp.where(dead, 0, accepted)
            drop = jnp.where(dead, 0, run - accepted)

            for d in range(DEST):
                store_px(d, acc_px[d])
                store_py(d, acc_py[d])
            if DEST < K:
                # rare second pass: some cell's accepted count exceeds
                # the primary destination depth — fill slots [DEST, K).
                # Otherwise zero-fill them (bitwise-equal to the jnp
                # twin's zero accumulators at dead slots).
                overflow = jnp.any(count > DEST)

                @pl.when(overflow)
                def _spill():
                    overflow_views(KE, movc, stays)

                @pl.when(jnp.logical_not(overflow))
                def _zero_tail():
                    zf = jnp.zeros((TY, TX), f)
                    for d in range(DEST, K):
                        store_px(d, zf)
                        store_py(d, zf)
            ocnt_ref[:] = count
            odrop_ref[:] = drop

        if padded_out:
            # the osl buffer this tile fills may still be draining tile
            # n-2's write DMA — wait it (reconstructed by the recorded
            # tile index; sizes are uniform, offsets differ)
            prev = olast[n % 2]

            @pl.when(prev >= 0)
            def _drain():
                out_dma(prev).wait()

        if cfg.marker_kmax_specialize and K >= 2 and K > DP:
            # three tiers for the lossless deep store (K = 16), ALL
            # using the overflow-split primary pass (destinations < DP
            # resident, [DP, K) in the gated spill) — the round-4
            # full-depth deep tier held 2K accumulator planes live and
            # OOM'd VMEM on chip; overflow_views now handles deep-slot
            # stayers, so the split is exact at every KE.
            t1, t2 = min(K // 4, DP), min(K // 2, DP)

            @pl.when(kmax <= t1)
            def _tiny():
                rebin(t1, DP)

            @pl.when((kmax > t1) & (kmax <= t2))
            def _small():
                rebin(t2, DP)

            @pl.when(kmax > t2)
            def _deep():
                rebin(K, DP)
        elif cfg.marker_kmax_specialize and K >= 2:
            small = kmax <= K // 2

            @pl.when(small)
            def _small():
                rebin(K // 2)

            @pl.when(jnp.logical_not(small))
            def _full():
                rebin(K)
        else:
            rebin(K, DP if K > DP else None)

        if padded_out:
            out_dma(n).start()
            olast[n % 2] = n
        return 0

    def _maybe_epilogue():
        if not padded_out:
            return

        @pl.when(n == nt - 1)
        def _epilogue():
            l0 = olast[0]
            l1 = olast[1]

            @pl.when(l0 >= 0)
            def _():
                out_dma(l0).wait()

            @pl.when(l1 >= 0)
            def _():
                out_dma(l1).wait()

    jax.lax.cond(live(n), work_tile, skip_tile, 0)
    _maybe_epilogue()


@functools.partial(jax.jit, static_argnums=(0, 8),
                   static_argnames=("interpret", "clamp_ny"))
def march_rebin_pallas(cfg: SimConfig, u, v, fluid, solid, slots, dt,
                       count, interpret: bool = False, *, dead,
                       clamp_ny: int | None = None, row_offset=None):
    """Fused marker pass: march + re-bin in one launch.

    slots: [2K, Y, X] — px planes 0..K-1, py planes K..2K-1.  This is a
    FREE reshape of both marker-store layouts (flat [2, M] with
    m = (k*Y + y)*X + x, and spatial [2, K, Y, X]), so the whole pass is
    layout work-free: the round-1 interface took separate px/py views
    and re-stacked the outputs, which cost ~6 ms/frame of pure HBM
    copies at 1024² (slice + reshape + stack + concatenate, see PERF.md).
    dead: [Y, X] f32 (sink|solid); count: [Y, X] i32 live counts.
    Validity is NOT an input or output — slots are front-compacted, so
    slot k of a cell is live iff k < count.  Returns
    (slots', count', dropped) where dropped is a [Y, X] i32 plane of
    per-destination-cell markers lost to the slot capacity this pass
    (the slots layout's documented deviation from main.c:92-97;
    sink/solid deletions are NOT counted — those match the reference).
    A plane rather than a scalar so sharded callers can crop halo cells;
    single-chip callers jnp.sum it.

    Sharding (parallel/pallas_shard.py): cfg.ny describes the LOCAL
    (halo-padded) plane; clamp_ny keeps the interpolation clamps at the
    GLOBAL row count and row_offset (traced i32) is the global row index
    of plane row 0.  Both default to the single-device identity.

    Batching: the pallas_call takes HBM-space refs (the manual halo
    DMAs), which Pallas cannot auto-batch — a custom_vmap rule maps the
    launch over the batch instead (each launch saturates the chip, so
    sequential launches lose nothing; measured batching is flat anyway,
    PERF.md).
    """
    if row_offset is None:
        row_offset = jnp.int32(0)

    @jax.custom_batching.custom_vmap
    def call(u, v, fluid, solid, slots, dt, count, dead, row_offset):
        return _march_rebin_single(cfg, u, v, fluid, solid, slots, dt,
                                   count, interpret, dead, clamp_ny,
                                   row_offset)

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        def at(i):
            return [a[i] if b else a for a, b in zip(args, in_batched)]

        # Python-unrolled over the batch: a lax.map here wraps the
        # pallas_call in a loop fusion whose scoped-VMEM accounting
        # overflows XLA's 16 MB stack limit at 1024²
        outs = [call(*at(i)) for i in range(axis_size)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        return stacked, (True, True, True)

    return call(u, v, fluid, solid, slots, dt, count, dead, row_offset)


def _march_rebin_single(cfg: SimConfig, u, v, fluid, solid, slots, dt,
                        count, interpret, dead, clamp_ny=None,
                        row_offset=None):
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    f = slots.dtype
    if clamp_ny is None:
        clamp_ny = Y
    if row_offset is None:
        row_offset = jnp.int32(0)

    # tile sizes: offsets (i*TY, j*TX) must land on (8, 128)-aligned
    # window starts for the DMA slices; otherwise fall back to one tile.
    # Smaller tiles skip empty regions at finer granularity but pay more
    # per-tile overhead; (32, 512) won the 1024² A/B (PERF.md).
    ty0, tx0 = cfg.marker_tile
    TX = next((c for c in (tx0, 512, 256, 128) if c <= X and X % c == 0), X)
    TY = next((c for c in (ty0, 32, 16, 8) if c <= Y and Y % c == 0), Y)
    nj = X // TX
    nt = (Y // TY) * nj
    # DMA window shape: rows to a multiple of 8, lanes to a multiple of
    # 128, covering the largest halo (the grid planes' +-2)
    RW = -(-(TY + 4) // 8) * 8
    LW = -(-(TX + 4) // 128) * 128

    # Padding layouts are chosen so every tile's DMA window starts at
    # (row0, col0) — already (8, 128)-aligned — and Mosaic's DMA slice
    # alignment rule (rows multiple of 8, lanes multiple of 128) is met
    # by over-reading: the halo only needs [TY+2, TX+2].  The extra
    # rows/cols are zero padding or real neighbour data the compute
    # never consumes.
    grid_pad = jnp.pad(
        jnp.stack([
            u, v,
            u_property(fluid).astype(f),
            v_property(fluid).astype(f),
            solid.astype(f),
        ]),
        ((0, 0), (2, RW - TY - 2), (2, LW - TX - 2)),
    )
    slots_pad = jnp.pad(
        slots,
        ((0, 0), (1, RW - TY - 1), (1, LW - TX - 1)),
    )
    cnt_pad = jnp.pad(count, ((1, RW - TY - 1), (1, LW - TX - 1)))

    # (1, 128) VMEM plane rather than an SMEM scalar: the SMEM form
    # breaks the pallas_call batching rule under vmap.  Lane 0: dt;
    # lane 1: the shard's global row offset (f32-exact for any real Y).
    dt_arr = jnp.full((1, 128), dt, f).at[0, 1].set(
        jnp.asarray(row_offset, jnp.int32).astype(f)
    )

    tile_spec = pl.BlockSpec((TY, TX), lambda n: (n // nj, n % nj),
                             memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((2 * K, TY, TX), lambda n: (0, n // nj, n % nj),
                             memory_space=pltpu.VMEM)
    # HBM, not ANY: on small grids the compiler would place ANY inputs in
    # VMEM, where DMA window slices must be (8, 128)-aligned.
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)

    kernel = functools.partial(_fused_kernel, cfg, TY, TX, RW, LW,
                               RW, LW, 0, 0, False, nj, nt, clamp_ny)
    oslots, ocnt, odrop = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=[
            jax.ShapeDtypeStruct((2 * K, Y, X), f),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 128), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,   # dead
            hbm_spec,    # counts (padded)
            hbm_spec,    # grid planes (padded)
            hbm_spec,    # slot planes (padded)
        ],
        out_specs=[slot_spec, tile_spec, tile_spec],
        scratch_shapes=[
            pltpu.VMEM((3, RW, LW), jnp.int32),
            pltpu.VMEM((2 * 5, RW, LW), f),
            pltpu.VMEM((2 * 2 * K, RW, LW), f),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(dt_arr, dead, cnt_pad, grid_pad, slots_pad)
    return oslots, ocnt, odrop


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("interpret",))
def march_rebin_padded(cfg: SimConfig, u, v, fluid, solid, slots_padded,
                       dt, count, *, dead, interpret: bool = False):
    """Fused marker pass over a PERSISTENT padded slot store.

    slots_padded: [2K, Y+16, X+256] with the interior at (8, 128) — the
    (8, 128)-aligned offset lets every tile's output land by manual
    write DMA, so the store round-trips substeps WITHOUT the per-substep
    jnp.pad copy of the slot planes (~1.4 ms/frame at 1024², PERF.md
    "pads").  Pad cells may hold garbage: their counts are zero (the
    count plane is zero-padded here, cheap — one [Y, X] i32), so their
    slots are never read.  Output slot pads are likewise unwritten
    garbage, dead for the same reason.  count: [Y, X] UNPADDED (all
    non-marker consumers stay padding-agnostic).  Returns
    (slots_padded', count', dropped) with count'/dropped unpadded.

    Single-device only (the sharded path keeps the per-substep-padded
    kernel); no vmap rule — the batch harness round-robins."""
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    f = slots_padded.dtype
    ty0, tx0 = cfg.marker_tile
    TX = next((c for c in (tx0, 512, 256, 128) if c <= X and X % c == 0), X)
    TY = next((c for c in (ty0, 32, 16, 8) if c <= Y and Y % c == 0), Y)
    nj = X // TX
    nt = (Y // TY) * nj
    # grid windows: per-substep padded geometry (interior at (2, 2))
    RW = -(-(TY + 4) // 8) * 8
    LW = -(-(TX + 4) // 128) * 128
    # slot/count windows: persistent geometry (interior at (8, 128));
    # window (r0, c0) covers halo rows 8+r0-1 .. and the output offset
    # (8 + r0, 128 + c0) stays (8, 128)-aligned
    RWS = TY + 16
    LWS = TX + 256
    Yp, Xp = Y + 16, X + 256
    assert slots_padded.shape == (2 * K, Yp, Xp), slots_padded.shape

    grid_pad = jnp.pad(
        jnp.stack([
            u, v,
            u_property(fluid).astype(f),
            v_property(fluid).astype(f),
            solid.astype(f),
        ]),
        ((0, 0), (2, RW - TY - 2), (2, LW - TX - 2)),
    )
    cnt_pad = jnp.pad(count, ((8, 8), (128, 128)))
    dead_arr = dead

    dt_arr = jnp.full((1, 128), dt, f)

    tile_spec = pl.BlockSpec((TY, TX), lambda n: (n // nj, n % nj),
                             memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)

    kernel = functools.partial(_fused_kernel, cfg, TY, TX, RW, LW,
                               RWS, LWS, 7, 127, True, nj, nt, Y)
    oslots, ocnt, odrop = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=[
            jax.ShapeDtypeStruct((2 * K, Yp, Xp), f),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
            jax.ShapeDtypeStruct((Y, X), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 128), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,   # dead
            hbm_spec,    # counts (persistent-geometry padded)
            hbm_spec,    # grid planes (per-substep padded)
            hbm_spec,    # slot planes (persistent padded store)
        ],
        out_specs=[hbm_spec, tile_spec, tile_spec],
        scratch_shapes=[
            pltpu.VMEM((3, RWS, LWS), jnp.int32),
            pltpu.VMEM((2 * 5, RW, LW), f),
            pltpu.VMEM((2 * 2 * K, RWS, LWS), f),
            pltpu.SemaphoreType.DMA((7,)),
            pltpu.VMEM((2, 2 * K, TY, TX), f),   # out slot buffers
            pltpu.SemaphoreType.DMA((2,)),       # out-DMA sems
            pltpu.SMEM((2,), jnp.int32),         # olast
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(dt_arr, dead_arr, cnt_pad, grid_pad, slots_padded)
    return oslots, ocnt, odrop


def pad_slot_store(cfg: SimConfig, markers):
    """[2, M]/[2, K, Y, X] marker store -> persistent padded
    [2K, Y+16, X+256] planes (interior at (8, 128))."""
    Y, X, K = cfg.ny, cfg.nx, cfg.slots_per_cell
    slots = markers.reshape(2 * K, Y, X)
    return jnp.pad(slots, ((0, 0), (8, 8), (128, 128)))


def unpad_slot_store(cfg: SimConfig, padded, like):
    """Inverse of pad_slot_store, reshaped to `like`'s layout."""
    Y, X = cfg.ny, cfg.nx
    return padded[:, 8:8 + Y, 128:128 + X].reshape(like.shape)

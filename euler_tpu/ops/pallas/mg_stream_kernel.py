"""Pallas TPU kernel: single-launch MG-PCG with an HBM-streamed fine level.

The VMEM-resident MG solver (mg_kernel.py) tops out near ~1200²; beyond
it the only converged option was the launch-bound XLA multigrid loop, so
2048²/4096² ran the jacobi "speed mode" whose 100-iteration budget both
fails to converge AND dominates the frame (62% at 4096², PERF.md).  This
kernel keeps one-launch MG-PCG at any grid size:

  * the FINE level's planes (packed, r, p, s, As, x, z) stay in HBM and
    stream through triple-buffered VMEM row-block windows (the
    pcg_stream_kernel machinery);
  * the cycle restricts the fine residual DIRECTLY to the first level
    that fits VMEM — skipping intermediate levels when the half
    resolution is still too big.  Constant prolongation composes, so the
    F=2^k-to-1 transfer's Galerkin operator is exactly the existing
    level-k operator from build_galerkin_hierarchy; skipping costs +3-4
    PCG iterations (13 vs 9 at 256², tools/stream_mg_lab.py);
  * the resident sub-hierarchy below the root runs make_mg_cycle
    (mg_kernel.py) with an edge-form root (packed0=None);
  * fine smoothing is DEGREE-1 Chebyshev (x = r/theta), which is
    elementwise — the pre-smooth costs no sweep at all (the restriction
    computes res = r - A(r/theta) = r - A r/theta on the fly), and the
    post-smooth is one sweep.

Per PCG iteration: 4 streamed sweeps, 17 fine-plane-streams (reads 12 +
writes 5) — ~1.1 GB at 4096² vs the jacobi speed mode's 100 iterations
x 13 streams.  Round 5 fused the prolong sweep into the post-smooth
(the coarse correction is resident, so x = r/theta + fl·P ec is
computable on the halo rows A x needs — no x HBM plane at all) and
carries the residual max out of the loop (no post-loop r re-read).
Stopping rule: the reference's (<= max_iterations, inf-norm tol,
main.c:735-767) + the f32-native tol_rel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig
from euler_tpu.ops.multigrid import cheby_coefficients
from euler_tpu.ops.pallas.mg_kernel import (
    _chunk_rows,
    _level_shapes,
    make_mg_cycle,
)

_HALO = 8    # DMA row starts must be 8-aligned; over-read 8 rows/side
_NBUF = 3
_NSLOT = 6   # packed, r, s, As, p, aux(x/z)
# Resident sub-hierarchy budget: 7 planes (c/e/n + x/b/d/rr) per level,
# geometric in level area — root at the first level that fits this.
_RES_BUDGET = 48 * 1024 * 1024


def _block_rows(Y: int, X: int, F: int) -> int:
    """~0.5M-element block, dividing Y, multiple of lcm(8, F)."""
    step = max(8, F)
    target = min(Y, max(step, (1 << 19) // X))
    c = (target // step) * step
    while c > step and Y % c:
        c -= step
    return max(c, step)


def _vmem_plan(Y: int, X: int, shapes, ls: int, F: int):
    """(BH, est_bytes): the largest stream-window height whose total
    VMEM estimate — triple-buffered windows + the resident sub-hierarchy
    (7 planes/level) + the lane-transfer matrices (RxF/RxFT are [X, Xr]
    f32: 16.8M EACH at 4096²) — fits the chip with Mosaic headroom.

    Round 4 measured the fixed BH=128 plan missing 4096² VMEM by 6.28M
    (134.28M of 128M, MEASURE_r4.jsonl.err); halving BH to 64 saves
    ~18.9M of window at ~12% more halo over-read — the difference
    between a converged 4096² solve and none."""
    res_shapes = shapes[ls:]
    resident = sum(7 * Yl * Xl * 4 for Yl, Xl in res_shapes)
    transfers = 2 * sum(
        res_shapes[l][1] * res_shapes[l + 1][1] * 4
        for l in range(len(res_shapes) - 1)
    ) + 2 * X * res_shapes[0][1] * 4
    budget = 112 * 1024 * 1024  # 128M chip minus Mosaic overhead margin
    BH = _block_rows(Y, X, F)
    step = max(8, F)

    def est(bh):
        return _NBUF * _NSLOT * (bh + 2 * _HALO) * X * 4 + resident + transfers

    while BH > step and est(BH) > budget:
        nxt = BH - step
        while nxt > step and Y % nxt:
            nxt -= step
        BH = nxt
    return BH, est(BH)


def _pair_matrix_f(Xf: int, Xc: int, F: int) -> np.ndarray:
    """Lane restriction [Xf, Xc] for F-to-1 constant prolongation:
    column j sums fine lanes F*j .. F*j + F - 1."""
    W = np.zeros((Xf, Xc), np.float32)
    for j in range(Xc):
        for i in range(F):
            W[F * j + i, j] = 1.0
    return W


def _resident_start(shapes) -> int:
    """First level whose sub-hierarchy (7 planes/level, geometric) fits
    the resident budget."""
    for ls in range(1, len(shapes)):
        Y, X = shapes[ls]
        if int(Y * X * 4 * 7 * 4 / 3) <= _RES_BUDGET:
            return ls
    return len(shapes) - 1


def _stream_mg_kernel(cfg: SimConfig, res_shapes, res_chunks,
                      BH: int, Y: int, X: int, F: int,
                      packed_hbm, b_hbm, res_coefs_ref, *refs):
    """refs: resident coef planes [c,e,n per level], resident Rx, RxT,
    then outputs [p_hbm, iters, resid, r_hbm(aliased b), s_hbm, as_hbm,
    z_hbm], then scratch [wins, sems, resident x/b/d/rr planes]."""
    f32 = jnp.float32
    Lr = len(res_shapes)
    max_iters = cfg.solver.max_iterations
    tol = float(cfg.solver.tol)
    tol_rel = float(cfg.solver.tol_rel)
    nblk = Y // BH
    # fine level's degree-1 Chebyshev 1/theta (traced: depends on the
    # fluid mask's Gershgorin bound) — appended as SMEM row Lr
    it0 = res_coefs_ref[Lr, 0]

    o = 3 * Lr  # c/e/n planes for every resident level incl. the root
    coef = [refs[3 * l: 3 * l + 3] for l in range(Lr)]
    Rx = list(refs[o:o + Lr - 1])
    RxT = list(refs[o + Lr - 1:o + 2 * (Lr - 1)])
    o += 2 * (Lr - 1)
    RxF = refs[o]          # [X, Xr] fine->root lane restriction
    RxFT = refs[o + 1]     # [Xr, X]
    o += 2
    (p_hbm, iters_ref, resid_ref, r_hbm, s_hbm, as_hbm,
     z_hbm) = refs[o:o + 7]
    o += 7
    wins, sems = refs[o], refs[o + 1]
    o += 2
    x_l = list(refs[o:o + Lr])
    b_l = list(refs[o + Lr:o + 2 * Lr])
    d_l = list(refs[o + 2 * Lr:o + 3 * Lr])
    rr_l = list(refs[o + 3 * Lr:o + 4 * Lr])
    assert o + 4 * Lr == len(refs), (o, Lr, len(refs))

    res_cycle, _, res_zref = make_mg_cycle(
        res_shapes, res_chunks,
        cfg.solver.mg_cheby_degree, cfg.solver.mg_coarse_iters,
        2 if cfg.solver.mg_cycle == "w" else 1, cfg.solver.mg_w_depth,
        res_coefs_ref, None, coef, Rx, RxT, x_l, b_l, d_l, rr_l,
    )
    ec_ref = res_zref[0]  # the resident root's cycle output plane

    # ---------------- streaming machinery (pcg_stream pattern) --------
    def rd(slot, hbm, m, halo: bool):
        buf = m % _NBUF
        r0 = m * BH
        if halo:
            lo = max(r0 - _HALO, 0)
            hi = min(r0 + BH + _HALO, Y)
            dst = wins.at[buf, slot, pl.ds(_HALO - (r0 - lo), hi - lo)]
        else:
            lo, hi = r0, r0 + BH
            dst = wins.at[buf, slot, pl.ds(_HALO, BH)]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, hi - lo)], dst, sems.at[buf, slot]
        )

    def wb(slot, hbm, m):
        buf = m % _NBUF
        return pltpu.make_async_copy(
            wins.at[buf, slot, pl.ds(_HALO, BH)],
            hbm.at[pl.ds(m * BH, BH)], sems.at[buf, _NSLOT]
        )

    def sweep(read_specs, wb_specs, compute):
        nwb = len(wb_specs)
        for slot, hbm, halo in read_specs:
            rd(slot, hbm, 0, halo).start()
        for m in range(nblk):
            buf = m % _NBUF
            if m + 1 < nblk:
                if m - 2 >= 0 and nwb:
                    for slot, hbm in wb_specs:
                        wb(slot, hbm, m - 2).wait()
                for slot, hbm, halo in read_specs:
                    rd(slot, hbm, m + 1, halo).start()
            for slot, hbm, halo in read_specs:
                rd(slot, hbm, m, halo).wait()
            compute(m, buf)
            for slot, hbm in wb_specs:
                wb(slot, hbm, m).start()
        if nwb:
            for m in range(max(nblk - 3, 0), nblk):
                for slot, hbm in wb_specs:
                    wb(slot, hbm, m).wait()

    def decode(pk):
        fl = jnp.where(pk >= 8.0, 1.0, 0.0).astype(f32)
        a = pk - 8.0 * fl
        return fl, a

    from euler_tpu.ops.pallas.marker_kernel import _shift_x_any

    def shl(v):
        return _shift_x_any(v, -1)

    def shr(v):
        return _shift_x_any(v, 1)

    def zero_edge(v, m, off):
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        gr = row + m * BH + off
        return jnp.where((gr >= 0) & (gr < Y), v, 0.0)

    sl = slice(_HALO, _HALO + BH)

    def fine_lap(buf, q_slot, m):
        """fl * (a q - sum of neighbours) on block m's interior rows;
        window slot 0 holds packed (haloed), q_slot holds q (haloed)."""
        pkw = zero_edge(wins[buf, 0], m, -_HALO)
        qw = zero_edge(wins[buf, q_slot], m, -_HALO)
        q = qw[sl]
        q_up = qw[_HALO + 1:_HALO + BH + 1]
        q_dn = qw[_HALO - 1:_HALO + BH - 1]
        fl, a = decode(pkw[sl])
        return fl, (fl * (a * q - (shl(q) + shr(q) + q_up + q_dn)))

    # ================= init: p = 0; s = 0; As = 0; rmax0 ==============
    acc0 = {"rmax0": jnp.zeros((), f32)}

    def init_compute(m, buf):
        b = wins[buf, 1, sl]
        wins[buf, 2, sl] = jnp.zeros((BH, X), f32)   # s
        wins[buf, 3, sl] = jnp.zeros((BH, X), f32)   # As
        wins[buf, 4, sl] = jnp.zeros((BH, X), f32)   # p
        acc0["rmax0"] = jnp.maximum(acc0["rmax0"], jnp.max(jnp.abs(b)))

    sweep(
        [(1, b_hbm, False)],
        [(2, s_hbm), (3, as_hbm), (4, p_hbm)],  # r aliases b
        init_compute,
    )
    rmax0 = acc0["rmax0"]
    nonzero = rmax0 != 0.0
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    def stream_cycle():
        """z = M^{-1} r (HBM z plane) and <z, r>.  Fine smoothing is
        degree-1 Chebyshev: pre x = r/theta (elementwise — folded into
        the restriction), post z = x + (r - A x)/theta."""
        # ---- restrict: b_root = R(r - A(r/theta)) ----
        def restrict_compute(m, buf):
            _, Ar = fine_lap(buf, 1, m)
            res = wins[buf, 1, sl] - it0 * Ar
            q = res.reshape(BH // F, F, X).sum(axis=1)
            rc = jnp.dot(q, RxF[...], preferred_element_type=f32)
            b_l[0][m * (BH // F):(m + 1) * (BH // F)] = rc

        sweep([(0, packed_hbm, True), (1, r_hbm, True)], [],
              restrict_compute)

        # ---- resident sub-cycle ----
        res_cycle(0)

        # ---- prolong + post-smooth FUSED (round 5): the coarse
        # correction ec lives in RESIDENT VMEM, so x = r/theta + fl·P ec
        # is computable on the ±1 halo rows the post-smooth's A x needs
        # directly from the already-haloed packed/r windows — the old
        # x HBM plane (1 write + 1 haloed read per iteration) and its
        # whole prolong sweep disappear: z = x + (r - A x)/theta and
        # <z, r> come out of ONE sweep reading packed + r.  21 -> 17
        # plane-streams and 5 -> 4 sweeps per PCG iteration. ----
        acc = {"zr": jnp.zeros((), f32)}
        Bc = BH // F
        Yc0 = res_shapes[0][0]

        def fused_post(m, buf):
            # coarse rows covering fine rows [m*BH - F, (m+1)*BH + F)
            lo_c = max(m * Bc - 1, 0)
            hi_c = min((m + 1) * Bc + 1, Yc0)
            ec = ec_ref[lo_c:hi_c]
            xe = jnp.dot(ec, RxFT[...], preferred_element_type=f32)
            up_ext = jnp.stack([xe] * F, axis=1).reshape(
                (hi_c - lo_c) * F, X)
            # x needed on global fine rows [m*BH - 1, (m+1)*BH + 1);
            # rows outside the grid are zero (zero-Dirichlet), matching
            # zero_edge's treatment of the old x_hbm haloed read
            need_lo = m * BH - 1
            need_hi = (m + 1) * BH + 1
            src_lo = lo_c * F
            pad_lo = max(src_lo - need_lo, 0)
            pad_hi = max(need_hi - hi_c * F, 0)
            up_x = up_ext[need_lo + pad_lo - src_lo:
                          need_hi - pad_hi - src_lo]
            if pad_lo or pad_hi:
                # only nonzero pieces — a 0-row operand is an invalid
                # Mosaic vector type
                parts = ([jnp.zeros((pad_lo, X), f32)] if pad_lo else [])
                parts.append(up_x)
                if pad_hi:
                    parts.append(jnp.zeros((pad_hi, X), f32))
                up_x = jnp.concatenate(parts)
            pkw = zero_edge(wins[buf, 0], m, -_HALO)
            rw = zero_edge(wins[buf, 1], m, -_HALO)
            ext = slice(_HALO - 1, _HALO + BH + 1)
            fl_e, a_e = decode(pkw[ext])
            x_e = it0 * rw[ext] + fl_e * up_x        # (BH + 2, X)
            x_i = x_e[1:BH + 1]
            Ax = fl_e[1:BH + 1] * (
                a_e[1:BH + 1] * x_i
                - (shl(x_i) + shr(x_i) + x_e[2:BH + 2] + x_e[0:BH]))
            r = wins[buf, 1, sl]
            z = x_i + it0 * (r - Ax)
            wins[buf, 5, sl] = z
            acc["zr"] = acc["zr"] + jnp.sum(z * r)

        sweep([(0, packed_hbm, True), (1, r_hbm, True)],
              [(5, z_hbm)], fused_post)
        return acc["zr"]

    def body(carry):
        sigma, i, done, _rmax = carry
        sigma_new = stream_cycle()
        beta = jnp.where(i == 0, 0.0,
                         sigma_new / jnp.where(sigma != 0, sigma, 1.0))

        # ---- s' = z + beta s; As' = A z + beta As; zs = <As', s'> ----
        acc = {"zs": jnp.zeros((), f32)}

        def sas_compute(m, buf):
            _, Az = fine_lap(buf, 5, m)
            z = wins[buf, 5, sl]
            s_new = z + beta * wins[buf, 2, sl]
            as_new = Az + beta * wins[buf, 3, sl]
            wins[buf, 2, sl] = s_new
            wins[buf, 3, sl] = as_new
            acc["zs"] = acc["zs"] + jnp.sum(as_new * s_new)

        sweep(
            [(0, packed_hbm, True), (5, z_hbm, True),
             (2, s_hbm, False), (3, as_hbm, False)],
            [(2, s_hbm), (3, as_hbm)],
            sas_compute,
        )
        alpha = sigma_new / jnp.where(acc["zs"] != 0, acc["zs"], 1.0)

        # ---- p += alpha s; r -= alpha As; rmax ----
        acc2 = {"rmax": jnp.zeros((), f32)}

        def pr_compute(m, buf):
            p_new = wins[buf, 4, sl] + alpha * wins[buf, 2, sl]
            r_new = wins[buf, 1, sl] - alpha * wins[buf, 3, sl]
            wins[buf, 4, sl] = p_new
            wins[buf, 1, sl] = r_new
            acc2["rmax"] = jnp.maximum(acc2["rmax"],
                                       jnp.max(jnp.abs(r_new)))

        sweep(
            [(1, r_hbm, False), (2, s_hbm, False), (3, as_hbm, False),
             (4, p_hbm, False)],
            [(1, r_hbm), (4, p_hbm)],
            pr_compute,
        )
        # NaN-robust (see project.py)
        conv = jnp.logical_not(acc2["rmax"] > tol_eff)
        return (sigma_new, i + 1, conv, acc2["rmax"])

    def cond(carry):
        sigma, i, done, rmax = carry
        return (~done) & (i < max_iters)

    # rmax rides the carry (mg_kernel round-5 pattern) — no post-loop
    # r re-read sweep; the all-zero early-out reports resid = rmax0 = 0
    _, i, _, rmax_f = jax.lax.while_loop(
        cond, body, (jnp.zeros((), f32), jnp.int32(0), ~nonzero, rmax0)
    )
    iters_ref[0, 0] = i
    resid_ref[0, 0] = rmax_f


@functools.partial(jax.jit, static_argnums=(0, 5))
def solve_pressure_mg_stream(cfg: SimConfig, b, a_diag, fluid, solid=None,
                             interpret: bool = False):
    """One-launch HBM-streamed MG-PCG for grids beyond the resident MG
    kernel's VMEM ceiling.  Returns (p, iterations, residual)."""
    from euler_tpu.ops.multigrid import build_galerkin_hierarchy

    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    shapes = tuple(_level_shapes(Y, X, cfg.solver.mg_min_size))
    ls = _resident_start(shapes)
    res_shapes = shapes[ls:]
    Lr = len(res_shapes)
    F = Y // res_shapes[0][0]
    res_chunks = tuple(_chunk_rows(Yl, Xl) for Yl, Xl in res_shapes)
    BH, vmem_est = _vmem_plan(Y, X, shapes, ls, F)

    levels = build_galerkin_hierarchy(
        a_diag, fluid, f, min_size=cfg.solver.mg_min_size
    )
    assert len(levels) == len(shapes), (len(levels), len(shapes))
    fl = fluid.astype(f)
    packed = a_diag.astype(f) * fl + 8.0 * fl

    res_levels = levels[ls:]
    coef_planes = []
    for lv in res_levels:
        coef_planes += [lv.c, lv.e, lv.n]

    # Chebyshev rows for the resident levels (same SMEM layout as
    # mg_kernel) + the fine level's degree-1 theta
    deg_s = cfg.solver.mg_cheby_degree
    deg_c = cfg.solver.mg_coarse_iters
    ncoef = 1 + 2 * max(deg_s, deg_c)
    rows = []
    for l, lv in enumerate(res_levels):
        if l == Lr - 1:
            it, cf = cheby_coefficients(
                lv.lmax.astype(f), deg_c, float(cfg.solver.mg_coarse_ratio))
        else:
            it, cf = cheby_coefficients(
                lv.lmax.astype(f), deg_s, float(cfg.solver.mg_cheby_ratio))
        vals = [it] + [v for pair in cf for v in pair]
        vals += [jnp.zeros((), f)] * (ncoef - len(vals))
        rows.append(jnp.stack([jnp.asarray(v, f) for v in vals]))
    res_coefs = jnp.stack(rows)

    # fine degree-1 schedule 1/theta on [lmax/ratio, lmax]: lmax is
    # traced (the fluid mask's Gershgorin bound), so it rides in as an
    # extra SMEM coefficient row (index Lr)
    it_fine, _ = cheby_coefficients(
        levels[0].lmax.astype(f), 1, float(cfg.solver.mg_cheby_ratio))
    fine_row = jnp.zeros((1, ncoef), f).at[0, 0].set(it_fine)
    res_coefs = jnp.concatenate([res_coefs, fine_row], axis=0)

    from euler_tpu.ops.pallas.mg_kernel import _pair_matrix

    Rx = [jnp.asarray(_pair_matrix(res_shapes[l][1], res_shapes[l + 1][1]))
          for l in range(Lr - 1)]
    RxT = [jnp.swapaxes(m, 0, 1) for m in Rx]
    RxF = jnp.asarray(_pair_matrix_f(X, res_shapes[0][1], F))
    RxFT = jnp.swapaxes(RxF, 0, 1)

    kernel = functools.partial(
        _stream_mg_kernel, cfg, res_shapes, res_chunks, BH, Y, X, F,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_coef_in = 3 * Lr + 2 * (Lr - 1) + 2
    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # p
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((Y, X), f),          # r (aliases b)
            jax.ShapeDtypeStruct((Y, X), f),          # s (HBM scratch)
            jax.ShapeDtypeStruct((Y, X), f),          # As
            jax.ShapeDtypeStruct((Y, X), f),          # z
        ],
        in_specs=[hbm, hbm, smem] + [vmem] * n_coef_in,
        out_specs=[hbm, smem, smem, hbm, hbm, hbm, hbm],
        input_output_aliases={1: 3},
        scratch_shapes=(
            [pltpu.VMEM((_NBUF, _NSLOT, BH + 2 * _HALO, X), f),
             pltpu.SemaphoreType.DMA((_NBUF, _NSLOT + 1))]
            + [pltpu.VMEM(s, f) for s in res_shapes]   # x_l
            + [pltpu.VMEM(s, f) for s in res_shapes]   # b_l
            + [pltpu.VMEM(s, f) for s in res_shapes]   # d_l
            + [pltpu.VMEM(s, f) for s in res_shapes]   # rr_l
        ),
        compiler_params=pltpu.CompilerParams(
            # the _vmem_plan estimate plus margin for Mosaic's own
            # spills/padding, capped at the 128M chip VMEM
            vmem_limit_bytes=min(vmem_est + 14 * 1024 * 1024,
                                 127 * 1024 * 1024),
        ),
        interpret=interpret,
    )(packed, b.astype(f), res_coefs, *coef_planes, *Rx, *RxT, RxF, RxFT)
    p, iters, resid = out[0], out[1], out[2]
    return p, iters[0, 0], resid[0, 0]


def stream_mg_fits(cfg: SimConfig) -> bool:
    """mg + galerkin + cheby + f32, fine level beyond the resident
    kernel, block/transfer geometry divisible."""
    if not (cfg.solver.preconditioner == "mg"
            and cfg.solver.dtype == "float32"
            and cfg.solver.mg_scheme == "galerkin"
            and cfg.solver.mg_smoother == "cheby"):
        return False
    Y, X = cfg.ny, cfg.nx
    shapes = _level_shapes(Y, X, cfg.solver.mg_min_size)
    Yl, Xl = shapes[-1]
    if min(Yl, Xl) > cfg.solver.mg_min_size:
        return False  # odd size before the coarsest level
    ls = _resident_start(shapes)
    if ls >= len(shapes) - 1:
        return False  # no resident sub-hierarchy below the root
    F = Y // shapes[ls][0]
    if Y % 8 or X % F or Y % F:
        return False
    return True

"""Pallas TPU kernel: single-launch PCG with HBM-streamed row blocks.

The VMEM-resident solver (pcg_kernel.py) tops out near 2048² (~6.5 f32
planes must fit VMEM).  Beyond that the round-1 fallback was the XLA
while-loop — thousands of small launches per frame, launch-bound.  This
kernel keeps the ONE-LAUNCH property at any grid size by leaving the
five solve planes (packed, r, p, s, As) in HBM and streaming row blocks
through triple-buffered VMEM windows with manual DMA.

Bandwidth discipline — at 4096² every plane is 67 MB, so HBM traffic
per iteration is the whole game:

  * merged search/matvec sweep via linearity: s' = z + beta*s and
    A s' = A z + beta*(A s) — the Laplacian of the NEW search direction
    comes from a recurrence on the stored A s, so the sweep never needs
    s' neighbours (which a block-local update could not provide).
    z = invd * r is recomputed from r on the fly (elementwise, halo rows
    included) instead of being stored.
  * 2 sweeps/iteration instead of 3: ~13 plane-streams vs ~17.
  * triple-buffered windows: block m computes while m+1's reads are in
    flight; a buffer is reused only after its block's writebacks are
    awaited (the uniform rule: before prefetching block m+1 into buffer
    (m+1) % 3, wait block m-2's writebacks — same buffer, two blocks of
    slack).

The stopping rule is the reference's (<= max_iterations, inf-norm tol,
main.c:735-767) plus the f32-native tol_rel (config.py).  The As
recurrence drifts like the textbook r recurrence — both are standard
PCG behaviour and sit below the f32 true-residual floor (PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig

_HALO = 8    # DMA row starts must be 8-aligned; over-read 8 rows/side
_NBUF = 3


def _block_rows(Y: int, X: int) -> int:
    """~1M elements per block window, dividing Y, multiple of 8.

    Searched downward in steps of 8 (not halved: for Y divisible by 8
    but not a power of two — 2560, 3000 — halving from the ~1M target
    can skip every valid divisor).  ny % 8 == 0 (stream_solver_fits)
    guarantees the c = 8 floor divides Y."""
    target = min(Y, max(8, (1 << 20) // X))
    c = (target // 8) * 8
    while c > 8 and Y % c:
        c -= 8
    return max(c, 8)


def _stream_kernel(max_iters: int, tol: float, tol_rel: float,
                   BH: int, Y: int, X: int,
                   packed_hbm, b_hbm,
                   p_hbm, iters_ref, resid_ref, r_hbm, s_hbm, as_hbm,
                   wins, sems):
    """wins: VMEM [_NBUF, 5, BH + 2*_HALO, X] windows (plane order:
    packed, r, s, As, p); sems: DMA semaphores [_NBUF, 6] (one per read
    plane + one shared by same-shaped writebacks)."""
    f32 = jnp.float32
    nblk = Y // BH

    def rd(plane, hbm, m, halo: bool):
        """The read DMA of block m (buffer m % _NBUF) for one plane."""
        buf = m % _NBUF
        r0 = m * BH
        if halo:
            lo = max(r0 - _HALO, 0)
            hi = min(r0 + BH + _HALO, Y)
            dst = wins.at[buf, plane, pl.ds(_HALO - (r0 - lo), hi - lo)]
        else:
            lo, hi = r0, r0 + BH
            dst = wins.at[buf, plane, pl.ds(_HALO, BH)]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, hi - lo)], dst, sems.at[buf, plane]
        )

    def wb(plane, hbm, m):
        """The writeback DMA of block m for one plane (shared sem)."""
        buf = m % _NBUF
        return pltpu.make_async_copy(
            wins.at[buf, plane, pl.ds(_HALO, BH)],
            hbm.at[pl.ds(m * BH, BH)], sems.at[buf, 5]
        )

    def decode(pk):
        fl = jnp.where(pk >= 8.0, 1.0, 0.0).astype(f32)
        a = pk - 8.0 * fl
        invd = fl / jnp.maximum(a, 1.0)
        return fl, a, invd

    def shl(v):
        return jnp.concatenate(
            [jnp.zeros((v.shape[0], 1), f32), v[:, :-1]], axis=1)

    def shr(v):
        return jnp.concatenate(
            [v[:, 1:], jnp.zeros((v.shape[0], 1), f32)], axis=1)

    def zero_edge(v, m, off):
        """Zero rows outside the grid; v's row 0 is grid row m*BH+off."""
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        gr = row + m * BH + off
        return jnp.where((gr >= 0) & (gr < Y), v, 0.0)

    def sweep(read_specs, wb_specs, compute):
        """Stream all blocks: read_specs = [(plane, hbm, halo)],
        wb_specs = [(plane, hbm)]; compute(m, buf) runs between the
        reads' wait and the writebacks' start."""
        nwb = len(wb_specs)
        for plane, hbm, halo in read_specs:
            rd(plane, hbm, 0, halo).start()
        for m in range(nblk):
            buf = m % _NBUF
            if m + 1 < nblk:
                if m - 2 >= 0 and nwb:
                    for plane, hbm in wb_specs:     # free buffer (m+1)%3
                        wb(plane, hbm, m - 2).wait()
                for plane, hbm, halo in read_specs:
                    rd(plane, hbm, m + 1, halo).start()
            for plane, hbm, halo in read_specs:
                rd(plane, hbm, m, halo).wait()
            compute(m, buf)
            for plane, hbm in wb_specs:
                wb(plane, hbm, m).start()
        if nwb:
            for m in range(max(nblk - 3, 0), nblk):
                for plane, hbm in wb_specs:
                    wb(plane, hbm, m).wait()

    # ================= init: p = 0; s = invd*b; As = 0 ================
    acc = {"sigma0": jnp.zeros((), f32), "rmax0": jnp.zeros((), f32)}

    def init_compute(m, buf):
        sl = slice(_HALO, _HALO + BH)
        pk = wins[buf, 0, sl]
        b = wins[buf, 1, sl]
        _, _, invd = decode(pk)
        z = invd * b
        wins[buf, 2, sl] = z                            # s
        wins[buf, 3, sl] = jnp.zeros((BH, X), f32)      # As
        wins[buf, 4, sl] = jnp.zeros((BH, X), f32)      # p
        acc["sigma0"] = acc["sigma0"] + jnp.sum(z * b)
        acc["rmax0"] = jnp.maximum(acc["rmax0"], jnp.max(jnp.abs(b)))

    sweep(
        [(0, packed_hbm, False), (1, b_hbm, False)],
        [(2, s_hbm), (3, as_hbm), (4, p_hbm)],   # r_hbm aliases b: r = b
        init_compute,
    )
    sigma0, rmax0 = acc["sigma0"], acc["rmax0"]

    nonzero = rmax0 != 0.0
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    def cond(carry):
        sigma, beta, i, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        sigma, beta, i, done = carry

        # ---- sweep 1: s = z + beta*s; As = Az + beta*As; zs = <As,s> --
        acc = {"zs": jnp.zeros((), f32)}

        def s_compute(m, buf):
            # compute z over the FULL +-8-row window: row shifts become
            # plain 8-aligned slices (Mosaic rejects lane-dim concats on
            # operands with unaligned sublane offsets) and zero_edge
            # already blanks outside-grid rows
            pkw = zero_edge(wins[buf, 0], m, -_HALO)     # [BH+16, X]
            rw = zero_edge(wins[buf, 1], m, -_HALO)
            _, _, invdw = decode(pkw)
            zw = invdw * rw
            sl = slice(_HALO, _HALO + BH)
            z = zw[sl]
            z_up = zw[_HALO + 1:_HALO + BH + 1]
            z_dn = zw[_HALO - 1:_HALO + BH - 1]
            fl, a, _ = decode(pkw[sl])
            Az = fl * (a * z - (shl(z) + shr(z) + z_up + z_dn))
            s_new = z + beta * wins[buf, 2, sl]
            As_new = Az + beta * wins[buf, 3, sl]
            wins[buf, 2, sl] = s_new
            wins[buf, 3, sl] = As_new
            acc["zs"] = acc["zs"] + jnp.sum(As_new * s_new)

        sweep(
            [(0, packed_hbm, True), (1, r_hbm, True),
             (2, s_hbm, False), (3, as_hbm, False)],
            [(2, s_hbm), (3, as_hbm)],
            s_compute,
        )
        alpha = sigma / jnp.where(acc["zs"] != 0, acc["zs"], 1.0)

        # ---- sweep 2: p += alpha*s; r -= alpha*As; rmax, sigma_new ----
        acc2 = {"rmax": jnp.zeros((), f32), "sig": jnp.zeros((), f32)}

        def pr_compute(m, buf):
            sl = slice(_HALO, _HALO + BH)
            _, _, invd = decode(wins[buf, 0, sl])
            p_new = wins[buf, 4, sl] + alpha * wins[buf, 2, sl]
            r_new = wins[buf, 1, sl] - alpha * wins[buf, 3, sl]
            wins[buf, 4, sl] = p_new
            wins[buf, 1, sl] = r_new
            acc2["rmax"] = jnp.maximum(acc2["rmax"],
                                       jnp.max(jnp.abs(r_new)))
            acc2["sig"] = acc2["sig"] + jnp.sum((invd * r_new) * r_new)

        sweep(
            [(0, packed_hbm, False), (1, r_hbm, False), (2, s_hbm, False),
             (3, as_hbm, False), (4, p_hbm, False)],
            [(1, r_hbm), (4, p_hbm)],
            pr_compute,
        )

        # NaN-robust (see project.py)
        conv = jnp.logical_not(acc2["rmax"] > tol_eff)
        beta_new = acc2["sig"] / jnp.where(sigma != 0, sigma, 1.0)
        return (acc2["sig"], beta_new, i + 1, conv)

    _, _, i, _ = jax.lax.while_loop(
        cond, body, (sigma0, jnp.zeros((), f32), jnp.int32(0), ~nonzero)
    )
    iters_ref[0, 0] = i

    # final residual norm (streamed read of r)
    acc3 = {"rmax": jnp.zeros((), f32)}

    def rn_compute(m, buf):
        acc3["rmax"] = jnp.maximum(
            acc3["rmax"],
            jnp.max(jnp.abs(wins[buf, 1, _HALO:_HALO + BH]))
        )

    sweep([(1, r_hbm, False)], [], rn_compute)
    resid_ref[0, 0] = acc3["rmax"]


@functools.partial(jax.jit, static_argnums=(0, 4))
def solve_pressure_stream(cfg: SimConfig, b, a_diag, fluid,
                          interpret: bool = False):
    """One-launch HBM-streamed Jacobi-PCG for grids beyond VMEM.
    Returns (p, iterations, residual) — the solve_pressure contract."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    fl = fluid.astype(f)
    packed = a_diag.astype(f) * fl + 8.0 * fl
    BH = _block_rows(Y, X)

    kernel = functools.partial(
        _stream_kernel, cfg.solver.max_iterations, float(cfg.solver.tol),
        float(cfg.solver.tol_rel), BH, Y, X,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    p, iters, resid, _r, _s, _as = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # p
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((Y, X), f),          # r (aliases b)
            jax.ShapeDtypeStruct((Y, X), f),          # s (HBM scratch)
            jax.ShapeDtypeStruct((Y, X), f),          # As (HBM scratch)
        ],
        in_specs=[hbm, hbm],
        out_specs=[hbm, smem, smem, hbm, hbm, hbm],
        input_output_aliases={1: 3},
        scratch_shapes=[
            pltpu.VMEM((_NBUF, 5, BH + 2 * _HALO, X), f),
            pltpu.SemaphoreType.DMA((_NBUF, 6)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                _NBUF * 5 * (BH + 2 * _HALO) * X * 4 + 64 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(packed, b.astype(f))
    return p, iters[0, 0], resid[0, 0]


def stream_solver_fits(cfg: SimConfig) -> bool:
    """jacobi + f32; any grid whose rows split into 8-row blocks."""
    return (
        cfg.solver.preconditioner == "jacobi"
        and cfg.solver.dtype == "float32"
        and cfg.ny % 8 == 0
    )

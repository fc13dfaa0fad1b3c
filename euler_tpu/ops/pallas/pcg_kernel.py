"""Pallas TPU kernel: the whole pressure PCG solve in one launch.

The XLA formulation of the PCG loop (ops/project.py:solve_pressure)
emits ~6-8 device kernels per iteration; at the reference budget of 100
iterations x 8 substeps that is thousands of launches per frame, and the
solve is launch-overhead-bound rather than bandwidth-bound.

Here the entire solve — Jacobi-preconditioned CG with the reference's
stopping rule (main.c:735-767: <=max_iterations, tol on the residual
infinity norm, exact break placement after the p/r update) — runs inside
one pallas_call: every iterate lives in VMEM, the 5-point Laplacian is
in-VMEM shifted slices, and the dot products reduce to kernel-local
scalars.  One launch per projection.

VMEM discipline (the round-1 kernel topped out near 1448²; VERDICT
item 4 asks for 2048²+):

  * FIVE persistent [Y, X] planes: `packed` (= a_diag + 8*fluid in one
    f32 plane — mask, diagonal and Jacobi inverse diagonal are all
    re-derived from it on the fly), the RHS `b` aliased in place as the
    residual `r`, the solution `p`, the search direction `s` (scratch),
    and `A s` (scratch).
  * every sweep runs over static ROW CHUNKS (~0.5 M elements), so
    Mosaic's vector temporaries are chunk-sized; full-plane temporaries
    previously spilled ~80 MB of vregs at 2048².
  * the while-loop carry holds scalars only.

Peak ~6 f32 planes + ~4 chunk temps: 2048² fits in ~100 MB.
`pallas_solver_fits` budgets 6.5 planes against a 112 MB ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig

_VMEM_BUDGET = 112 * 1024 * 1024


def _chunk_rows(Y: int, X: int) -> int:
    """Row-chunk height: ~0.25M elements, dividing Y."""
    c = min(Y, max(8, (1 << 18) // X))
    while Y % c:
        c //= 2
    return max(c, 1)


def _pcg_kernel(max_iters: int, tol: float, tol_rel: float, C: int,
                packed_ref, b_ref,
                p_ref, iters_ref, resid_ref, r_ref, s_ref, as_ref):
    """packed = a_diag*fluid + 8*fluid (f32).  b_ref is aliased to r_ref:
    the RHS buffer becomes the residual in place.  All sweeps are chunked
    over static row blocks of height C to bound vector-register pressure.
    """
    Y, X = packed_ref.shape
    nchunks = Y // C
    f32 = jnp.float32

    def rows(ref, r0, r1):
        return ref[r0:r1]

    def decode(r0, r1):
        packed = packed_ref[r0:r1]
        fl = jnp.where(packed >= 8.0, 1.0, 0.0).astype(f32)
        a = packed - 8.0 * fl
        # Jacobi inverse diagonal; a == 0 fluid cells fall back to the
        # identity (max(a, 1) == 1), matching _make_preconditioner.
        invd = fl / jnp.maximum(a, 1.0)
        return fl, a, invd

    def lap_chunk(c):
        """fl * (a*s - (left+right+up+down)) on chunk c's rows."""
        r0, r1 = c * C, (c + 1) * C
        fl, a, _ = decode(r0, r1)
        s = s_ref[r0:r1]
        up = s_ref[r0 + 1 : r1 + 1] if r1 < Y else jnp.concatenate(
            [s_ref[r0 + 1 : r1], jnp.zeros((1, X), f32)], axis=0
        )
        down = s_ref[r0 - 1 : r1 - 1] if r0 > 0 else jnp.concatenate(
            [jnp.zeros((1, X), f32), s_ref[r0 : r1 - 1]], axis=0
        )
        zcol = jnp.zeros((C, 1), f32)
        left = jnp.concatenate([zcol, s[:, :-1]], axis=1)
        right = jnp.concatenate([s[:, 1:], zcol], axis=1)
        return fl * (a * s - (left + right + up + down))

    # ---- init: r = b; z = invd*r; s = z; sigma0 = <z, r>; p = 0 ----
    sigma0 = jnp.zeros((), f32)
    rmax0 = jnp.zeros((), f32)
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        _, _, invd = decode(r0, r1)
        r = b_ref[r0:r1]
        r_ref[r0:r1] = r  # no-op copy when aliased; real init under interpret
        z = invd * r
        s_ref[r0:r1] = z
        p_ref[r0:r1] = jnp.zeros((C, X), f32)
        sigma0 = sigma0 + jnp.sum(z * r)
        rmax0 = jnp.maximum(rmax0, jnp.max(jnp.abs(r)))
    # all_zero early-out (main.c:742)
    nonzero = rmax0 != 0.0
    # ||r|| <= max(tol, tol_rel * ||b||): tol_rel = 0 is the reference's
    # absolute rule (unreachable in f32 once ||b|| >> 1; see config.py)
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    def cond(carry):
        sigma, i, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        sigma, i, done = carry
        # pass 1: As = A s (stored), zs = <As, s>
        zs = jnp.zeros((), f32)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            As = lap_chunk(c)
            as_ref[r0:r1] = As
            zs = zs + jnp.sum(As * s_ref[r0:r1])
        alpha = sigma / jnp.where(zs != 0, zs, 1.0)

        # pass 2: p += alpha s; r -= alpha As; norm + sigma_new
        rmax = jnp.zeros((), f32)
        sigma_new = jnp.zeros((), f32)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            _, _, invd = decode(r0, r1)
            s = s_ref[r0:r1]
            p_ref[r0:r1] = p_ref[r0:r1] + alpha * s
            r = r_ref[r0:r1] - alpha * as_ref[r0:r1]
            r_ref[r0:r1] = r
            rmax = jnp.maximum(rmax, jnp.max(jnp.abs(r)))
            sigma_new = sigma_new + jnp.sum((invd * r) * r)
        # NaN-robust (inactive-substep dt = 0 NaN RHS exits in one
        # iteration instead of burning the budget; see project.py)
        conv = jnp.logical_not(rmax > tol_eff)

        # pass 3: s = z + beta s
        beta = sigma_new / jnp.where(sigma != 0, sigma, 1.0)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            _, _, invd = decode(r0, r1)
            s_ref[r0:r1] = invd * r_ref[r0:r1] + beta * s_ref[r0:r1]

        return (sigma_new, i + 1, conv)

    _, i, _ = jax.lax.while_loop(
        cond, body, (sigma0, jnp.int32(0), ~nonzero)
    )
    iters_ref[0, 0] = i
    rmax = jnp.zeros((), f32)
    for c in range(nchunks):
        rmax = jnp.maximum(rmax, jnp.max(jnp.abs(r_ref[c * C : (c + 1) * C])))
    resid_ref[0, 0] = rmax


@functools.partial(jax.jit, static_argnums=(0, 4))
def solve_pressure_pallas(cfg: SimConfig, b, a_diag, fluid,
                          interpret: bool = False):
    """One-launch Jacobi-PCG.  Returns (p, iterations, residual), same
    contract as ops.project.solve_pressure."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    fl = fluid.astype(f)
    packed = a_diag.astype(f) * fl + 8.0 * fl

    kernel = functools.partial(
        _pcg_kernel, cfg.solver.max_iterations, float(cfg.solver.tol),
        float(cfg.solver.tol_rel), _chunk_rows(Y, X),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    p, iters, resid, _r = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), f),
            jax.ShapeDtypeStruct((Y, X), f),   # final residual plane
        ],
        in_specs=[vmem, vmem],
        out_specs=[
            vmem,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vmem,
        ],
        # the RHS buffer is donated and becomes the residual in place
        input_output_aliases={1: 3},
        scratch_shapes=[
            pltpu.VMEM((Y, X), f),   # s
            pltpu.VMEM((Y, X), f),   # A s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed, b.astype(f))
    return p, iters[0, 0], resid[0, 0]


def pallas_solver_fits(cfg: SimConfig) -> bool:
    """~6.5 live f32 planes (5 persistent + chunked sweep temporaries)
    must fit the VMEM budget — true through 2048²."""
    return (
        cfg.solver.preconditioner == "jacobi"
        and cfg.solver.dtype == "float32"
        and int(cfg.ny * cfg.nx * 4 * 6.5) <= _VMEM_BUDGET
    )


# ----------------------------------------------------------------------
# Fused projection: divergence + matrix build + PCG + pressure clamp +
# face velocity update + CFL max-speed reduction, one launch.
# ----------------------------------------------------------------------

def _project_kernel(cfg: SimConfig, C: int,
                    fl_ref, so_ref, ut_ref, vt_ref, dt_ref,
                    u2_ref, v2_ref, iters_ref, resid_ref, msq_ref,
                    packed_ref, b_ref, p_ref, s_ref, as_ref):
    """Whole projection (main.c:709-806) + maxsq (main.c:808-820) in one
    kernel.  fl/so: fluid/solid masks as f32 0/1; ut/vt are aliased in
    place to u2/v2.  b_ref doubles as the residual after init."""
    import numpy as np

    max_iters = cfg.solver.max_iterations
    tol = float(cfg.solver.tol)
    tol_rel = float(cfg.solver.tol_rel)
    Y, X = fl_ref.shape
    nchunks = Y // C
    f32 = jnp.float32
    dt = dt_ref[0, 0]
    # lane 1 carries the RHS-scale dt separately (project_pallas fills
    # both lanes with the same dt — bitwise unchanged there; the fused
    # substep passes dt_proj = +inf on inactive substeps so the RHS is
    # exactly zero and the all_zero early-out fires)
    dt_proj = dt_ref[0, 1]
    inv_h = np.float32(1.0 / cfg.side_length)
    # C computes h^2 * rho / dt in float then widens (main.c:713)
    k_inv_scale = (
        np.float32(cfg.side_length * cfg.side_length * cfg.density)
        / dt_proj
    )
    neg_inv_rho_h = np.float32(-1.0 / (cfg.density * cfg.side_length))

    def zrow():
        return jnp.zeros((1, X), f32)

    def rows_shift_up(ref, r0, r1):
        """ref[y+1] rows for chunk [r0, r1) (zeros beyond the top)."""
        if r1 < Y:
            return ref[r0 + 1 : r1 + 1]
        return jnp.concatenate([ref[r0 + 1 : r1], zrow()], axis=0)

    def rows_shift_down(ref, r0, r1):
        """ref[y-1] rows (zeros beyond the bottom)."""
        if r0 > 0:
            return ref[r0 - 1 : r1 - 1]
        return jnp.concatenate([zrow(), ref[r0 : r1 - 1]], axis=0)

    def shl(a):  # a[y, x-1]
        return jnp.concatenate([jnp.zeros((a.shape[0], 1), f32), a[:, :-1]],
                               axis=1)

    def shr(a):  # a[y, x+1]
        return jnp.concatenate([a[:, 1:], jnp.zeros((a.shape[0], 1), f32)],
                               axis=1)

    # ---- init: packed = a_diag*fl + 8*fl; b = -div * rho h^2/dt ----
    sigma0 = jnp.zeros((), f32)
    rmax0 = jnp.zeros((), f32)
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        fl = fl_ref[r0:r1]
        so = so_ref[r0:r1]
        so_up = rows_shift_up(so_ref, r0, r1)
        so_dn = rows_shift_down(so_ref, r0, r1)
        a = 4.0 - (shl(so) + shr(so) + so_up + so_dn)
        packed = a * fl + 8.0 * fl
        packed_ref[r0:r1] = packed

        ut = ut_ref[r0:r1]
        vt = vt_ref[r0:r1]
        vt_dn = rows_shift_down(vt_ref, r0, r1)
        div = (ut - shl(ut) + vt - vt_dn) * inv_h
        b = jnp.where(fl != 0, -div * k_inv_scale, 0.0)
        b_ref[r0:r1] = b
        invd = fl / jnp.maximum(a * fl, 1.0)
        z = invd * b
        s_ref[r0:r1] = z
        p_ref[r0:r1] = jnp.zeros((C, X), f32)
        sigma0 = sigma0 + jnp.sum(z * b)
        rmax0 = jnp.maximum(rmax0, jnp.max(jnp.abs(b)))
    nonzero = rmax0 != 0.0
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    def decode(r0, r1):
        packed = packed_ref[r0:r1]
        fl = jnp.where(packed >= 8.0, 1.0, 0.0).astype(f32)
        a = packed - 8.0 * fl
        invd = fl / jnp.maximum(a, 1.0)
        return fl, a, invd

    def lap_chunk(c):
        r0, r1 = c * C, (c + 1) * C
        fl, a, _ = decode(r0, r1)
        s = s_ref[r0:r1]
        up = rows_shift_up(s_ref, r0, r1)
        down = rows_shift_down(s_ref, r0, r1)
        return fl * (a * s - (shl(s) + shr(s) + up + down))

    # ---- PCG loop (identical structure to _pcg_kernel) ----
    def cond(carry):
        sigma, i, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        sigma, i, done = carry
        zs = jnp.zeros((), f32)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            As = lap_chunk(c)
            as_ref[r0:r1] = As
            zs = zs + jnp.sum(As * s_ref[r0:r1])
        alpha = sigma / jnp.where(zs != 0, zs, 1.0)

        rmax = jnp.zeros((), f32)
        sigma_new = jnp.zeros((), f32)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            _, _, invd = decode(r0, r1)
            s = s_ref[r0:r1]
            p_ref[r0:r1] = p_ref[r0:r1] + alpha * s
            r = b_ref[r0:r1] - alpha * as_ref[r0:r1]
            b_ref[r0:r1] = r
            rmax = jnp.maximum(rmax, jnp.max(jnp.abs(r)))
            sigma_new = sigma_new + jnp.sum((invd * r) * r)
        # NaN-robust (inactive-substep dt = 0 NaN RHS exits in one
        # iteration instead of burning the budget; see project.py)
        conv = jnp.logical_not(rmax > tol_eff)

        beta = sigma_new / jnp.where(sigma != 0, sigma, 1.0)
        for c in range(nchunks):
            r0, r1 = c * C, (c + 1) * C
            _, _, invd = decode(r0, r1)
            s_ref[r0:r1] = invd * b_ref[r0:r1] + beta * s_ref[r0:r1]
        return (sigma_new, i + 1, conv)

    _, i, _ = jax.lax.while_loop(
        cond, body, (sigma0, jnp.int32(0), ~nonzero)
    )
    iters_ref[0, 0] = i
    rmax = jnp.zeros((), f32)
    for c in range(nchunks):
        rmax = jnp.maximum(rmax, jnp.max(jnp.abs(b_ref[c * C : (c + 1) * C])))
    resid_ref[0, 0] = rmax

    # ---- pressure clamp (main.c:773-779), stored back so the face pass
    # reads clamped neighbour rows across chunk boundaries ----
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        fl = fl_ref[r0:r1]
        p_ref[r0:r1] = jnp.where(fl != 0, jnp.maximum(p_ref[r0:r1], 0.0), 0.0)

    # ---- face velocity update (main.c:782-806) + maxsq (main.c:808) ----
    col = jax.lax.broadcasted_iota(jnp.int32, (C, X), 1)
    u_region = col < (X - 1)
    musq = jnp.zeros((), f32)
    mvsq = jnp.zeros((), f32)
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        fl = fl_ref[r0:r1]
        so = so_ref[r0:r1]
        fl_up = rows_shift_up(fl_ref, r0, r1)
        so_up = rows_shift_up(so_ref, r0, r1)
        row = jax.lax.broadcasted_iota(jnp.int32, (C, X), 0) + r0
        v_region = row < (Y - 1)

        p = p_ref[r0:r1]
        p_r = shr(p)
        p_u = rows_shift_up(p_ref, r0, r1)

        u_keep = u_region & ((fl + shr(fl)) != 0) & ((so + shr(so)) == 0)
        u2 = jnp.where(u_keep,
                       ut_ref[r0:r1] + (neg_inv_rho_h * (p_r - p)) * dt, 0.0)
        v_keep = v_region & ((fl + fl_up) != 0) & ((so + so_up) == 0)
        v2 = jnp.where(v_keep,
                       vt_ref[r0:r1] + (neg_inv_rho_h * (p_u - p)) * dt, 0.0)
        u2_ref[r0:r1] = u2
        v2_ref[r0:r1] = v2
        musq = jnp.maximum(musq, jnp.max(u2 * u2))
        mvsq = jnp.maximum(mvsq, jnp.max(v2 * v2))
    msq_ref[0, 0] = musq + mvsq


@functools.partial(jax.jit, static_argnums=(0, 6))
def project_pallas(cfg: SimConfig, dt, ut, vt, fluid, solid,
                   interpret: bool = False):
    """One-launch fused projection.  Returns (u2, v2, iters, resid, msq)
    where msq = maxsq(u2) + maxsq(v2) feeds the next substep's CFL dt
    without a separate device reduction."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    fl = fluid.astype(f)
    so = solid.astype(f)
    dt_arr = jnp.full((1, 128), dt, f)

    kernel = functools.partial(_project_kernel, cfg, _chunk_rows(Y, X))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    u2, v2, iters, resid, msq = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),
            jax.ShapeDtypeStruct((Y, X), f),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), f),
            jax.ShapeDtypeStruct((1, 1), f),
        ],
        in_specs=[vmem, vmem, vmem, vmem,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[vmem, vmem, smem, smem, smem],
        # ut/vt buffers are donated and updated into u2/v2 in place
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((Y, X), f),   # packed a_diag + fluid
            pltpu.VMEM((Y, X), f),   # b / residual
            pltpu.VMEM((Y, X), f),   # p
            pltpu.VMEM((Y, X), f),   # s
            pltpu.VMEM((Y, X), f),   # A s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fl, so, ut.astype(f), vt.astype(f), dt_arr)
    return u2, v2, iters[0, 0], resid[0, 0], msq[0, 0]


def fused_projection_fits(cfg: SimConfig) -> bool:
    """9 persistent f32 planes + chunk temps — true through ~1448²;
    larger grids use the 5-plane PCG kernel + XLA projection tail."""
    return (
        cfg.solver.preconditioner == "jacobi"
        and cfg.solver.dtype == "float32"
        and int(cfg.ny * cfg.nx * 4 * 9.5) <= _VMEM_BUDGET
    )

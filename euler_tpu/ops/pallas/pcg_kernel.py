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


def _pcg_kernel(max_iters: int, tol: float, C: int, packed_ref, b_ref,
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
        conv = rmax <= tol

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
        _chunk_rows(Y, X),
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

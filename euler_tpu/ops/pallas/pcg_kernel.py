"""Pallas TPU kernel: the whole pressure PCG solve in one launch.

The XLA formulation of the PCG loop (ops/project.py:solve_pressure)
emits ~6-8 device kernels per iteration; at the reference budget of 100
iterations x 8 substeps that is thousands of launches per frame, and the
solve is launch-overhead-bound rather than bandwidth-bound.

Here the entire solve — Jacobi-preconditioned CG with the reference's
stopping rule (main.c:735-767: <=max_iterations, tol on the residual
infinity norm, exact break placement after the p/r update) — runs inside
one pallas_call: grid=(1,), every iterate (p, r, s) lives in VMEM, the
5-point Laplacian is in-VMEM shifted slices, and the dot products reduce
to kernel-local scalars.  One launch per projection.

Fits VMEM for grids up to ~2048² in f32 (6-8 live [Y, X] planes); the
caller falls back to the XLA path above that or for other
preconditioners (MG needs its level hierarchy; IC(0) is wavefront).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig


def _shift_up(a):
    z = jnp.zeros_like(a[:1])
    return jnp.concatenate([a[1:], z], axis=0)


def _shift_down(a):
    z = jnp.zeros_like(a[:1])
    return jnp.concatenate([z, a[:-1]], axis=0)


def _shift_right(a):
    z = jnp.zeros_like(a[:, :1])
    return jnp.concatenate([a[:, 1:], z], axis=1)


def _shift_left(a):
    z = jnp.zeros_like(a[:, :1])
    return jnp.concatenate([z, a[:, :-1]], axis=1)


def _pcg_kernel(max_iters: int, tol: float, b_ref, adiag_ref, invd_ref,
                fluid_ref, p_ref, iters_ref, resid_ref):
    f = jnp.float32
    b = b_ref[:]
    a = adiag_ref[:]      # a_diag * fluid, as f32
    invd = invd_ref[:]    # jacobi: fluid/(max(a,1)) with a==0 cells -> 1
    fl = fluid_ref[:]     # fluid mask as f32

    def apply_a(s):
        lap = a * s - (
            _shift_left(s) + _shift_right(s) + _shift_down(s) + _shift_up(s)
        )
        return fl * lap

    def precon(r):
        return invd * r

    r = b
    z = precon(r)
    s = z
    sigma = jnp.sum(z * r)
    p = jnp.zeros_like(b)
    nonzero = jnp.max(jnp.abs(r)) != 0.0

    def cond(c):
        p, r, s, sigma, i, done = c
        return (~done) & (i < max_iters)

    def body(c):
        p, r, s, sigma, i, done = c
        As = apply_a(s)
        zs = jnp.sum(As * s)
        alpha = sigma / jnp.where(zs != 0, zs, 1.0)
        p = p + alpha * s
        r = r - alpha * As
        conv = jnp.max(jnp.abs(r)) <= tol
        z = precon(r)
        sigma_new = jnp.sum(z * r)
        beta = sigma_new / jnp.where(sigma != 0, sigma, 1.0)
        s = z + beta * s
        return (p, r, s, sigma_new, i + 1, conv)

    p, r, s, sigma, i, done = jax.lax.while_loop(
        cond, body, (p, r, s, sigma, jnp.int32(0), ~nonzero)
    )
    p_ref[:] = p
    iters_ref[0, 0] = i
    resid_ref[0, 0] = jnp.max(jnp.abs(r))


@functools.partial(jax.jit, static_argnums=(0, 4))
def solve_pressure_pallas(cfg: SimConfig, b, a_diag, fluid,
                          interpret: bool = False):
    """One-launch Jacobi-PCG.  Returns (p, iterations, residual), same
    contract as ops.project.solve_pressure."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    fl = fluid.astype(f)
    a = a_diag.astype(f) * fl
    # jacobi inverse diagonal; a==0 fluid cells use identity (matching
    # _make_preconditioner's jacobi guard)
    invd = fl / jnp.maximum(a, 1.0)
    invd = jnp.where(fluid & (a_diag > 0), invd, fl)

    kernel = functools.partial(
        _pcg_kernel, cfg.solver.max_iterations, float(cfg.solver.tol)
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    p, iters, resid = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), f),
        ],
        in_specs=[vmem, vmem, vmem, vmem],
        out_specs=[
            vmem,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b.astype(f), a, invd, fl)
    return p, iters[0, 0], resid[0, 0]


def pallas_solver_fits(cfg: SimConfig) -> bool:
    """~8 live f32 planes must fit the 100 MB VMEM budget."""
    return (
        cfg.solver.preconditioner == "jacobi"
        and cfg.solver.dtype == "float32"
        and cfg.ny * cfg.nx * 4 * 8 <= 100 * 1024 * 1024
    )

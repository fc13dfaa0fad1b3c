"""Pallas TPU kernel: PCG with an in-kernel multigrid V-cycle.

The Jacobi-preconditioned single-launch solver (pcg_kernel.py) honours
the reference's iteration budget (<=100, tol 1e-6 — main.c:735-736) but
plain Jacobi-PCG does not CONVERGE within it beyond ~256²: at 1024² the
residual after 100 iterations is ~27 (bench JSON `post_projection_
div_inf`).  The XLA multigrid preconditioner (ops/multigrid.py) makes
the iteration count grid-size independent (~10) but emits hundreds of
small coarse-level kernels per V-cycle and is launch-bound on this
runtime.  This kernel runs the ENTIRE MG-PCG solve — every V-cycle,
smoothing sweep, restriction and prolongation — inside one launch, with
every level's iterate resident in VMEM.

TPU-native formulation of the transfer operators (Mosaic supports
sublane-dim reshapes but no lane-dim reshapes/strided slices — probed):

  * Y (sublane) axis on the VPU: even/odd row split via
    reshape([Yc, 2, X]) + middle-index, interleave via stack + reshape;
  * X (lane) axis on the MXU: a dot with the 1D bilinear restriction
    matrix Rx [Xf, Xc] (two + two nonzeros per row, weights 3/4, 1/4 —
    the exact adjoint pair of ops/multigrid.py's _prolong/_restrict),
    and its transpose for prolongation.

Smoothing is red-black Gauss-Seidel in symmetric colour order (red-black
pre, black-red post, forward-then-reversed coarse solve), identical to
ops/multigrid.py, so the V-cycle is a fixed SPD operator.  Chunk-sweep
in-place colour updates are safe: a red update reads only black
neighbours, so chunk order cannot change the result.

Hierarchy masks (fluid/a_diag per level, McAdams-style coarsening) are
built OUTSIDE the kernel by ops.multigrid.build_hierarchy — they are a
handful of cheap mask ops on shrinking arrays — and enter as packed f32
planes (a_diag + 8*fluid, as in pcg_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from euler_tpu.config import SimConfig
from euler_tpu.ops.pallas.pcg_kernel import _VMEM_BUDGET, _chunk_rows

_W0 = np.float32(0.75)
_W1 = np.float32(0.25)


def _level_shapes(Y: int, X: int, min_size: int):
    """Fine-to-coarse level shapes, mirroring build_hierarchy's loop."""
    shapes = [(Y, X)]
    while min(shapes[-1]) > min_size:
        Yl, Xl = shapes[-1]
        if Yl % 2 or Xl % 2:
            break  # build_hierarchy would pad; mg_pallas_fits() gates this
        shapes.append((Yl // 2, Xl // 2))
    return shapes


def _restrict_matrix(Xf: int, Xc: int) -> np.ndarray:
    """1D bilinear restriction [Xf, Xc]: column j weights fine samples
    {2j-1: 1/4, 2j: 3/4, 2j+1: 3/4, 2j+2: 1/4} (adjoint of _prolong's
    3/4-1/4 interpolation; per-axis mass 2 so the 2D pair folds in the
    dx_c^2 = 4 dx^2 factor exactly as ops/multigrid.py does)."""
    W = np.zeros((Xf, Xc), np.float32)
    for j in range(Xc):
        W[2 * j, j] = _W0
        W[2 * j + 1, j] = _W0
        if 2 * j - 1 >= 0:
            W[2 * j - 1, j] = _W1
        if 2 * j + 2 < Xf:
            W[2 * j + 2, j] = _W1
    return W


def _mg_kernel(shapes, chunks, max_iters: int, tol: float, tol_rel: float,
               pre: int, post: int, coarse_iters: int,
               b_ref, *refs):
    """refs layout: packed[0..L-1], Rx[0..L-2], RxT[0..L-2],
    p_ref, iters_ref, resid_ref, r_ref(aliased b), z_ref, s_ref, as_ref,
    x[1..L-1], bl[1..L-1]."""
    L = len(shapes)
    f32 = jnp.float32
    packed = list(refs[0:L])
    Rx = list(refs[L:2 * L - 1])
    RxT = list(refs[2 * L - 1:3 * L - 2])
    p_ref, iters_ref, resid_ref, r_ref, z_ref, s_ref, as_ref = (
        refs[3 * L - 2:3 * L + 5]
    )
    x_l = [z_ref] + list(refs[3 * L + 5:4 * L + 4])
    b_l = [r_ref] + list(refs[4 * L + 4:5 * L + 3])

    def decode(l, r0, r1):
        pk = packed[l][r0:r1]
        fl = jnp.where(pk >= 8.0, 1.0, 0.0).astype(f32)
        a = pk - 8.0 * fl
        # multigrid inv_diag convention: 0 on a == 0 cells (fully
        # enclosed), not the Jacobi identity fallback
        invd = jnp.where(a > 0, fl / jnp.maximum(a, 1.0), 0.0)
        return fl, a, invd

    def rows(ref, r0, r1, l):
        """ref rows [r0, r1) with zero fill beyond [0, Yl)."""
        Yl, Xl = shapes[l]
        lo, hi = max(r0, 0), min(r1, Yl)
        parts = []
        if r0 < 0:
            parts.append(jnp.zeros((-r0, Xl), f32))
        parts.append(ref[lo:hi])
        if r1 > Yl:
            parts.append(jnp.zeros((r1 - Yl, Xl), f32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def shl(a):
        return jnp.concatenate(
            [jnp.zeros((a.shape[0], 1), f32), a[:, :-1]], axis=1)

    def shr(a):
        return jnp.concatenate(
            [a[:, 1:], jnp.zeros((a.shape[0], 1), f32)], axis=1)

    def lap_rows(l, x_ref_l, r0, r1):
        """(a*x - sum of neighbours) on rows [r0, r1), unmasked."""
        _, a, _ = decode(l, r0, r1)
        x = x_ref_l[r0:r1]
        up = rows(x_ref_l, r0 + 1, r1 + 1, l)
        dn = rows(x_ref_l, r0 - 1, r1 - 1, l)
        return a * x - (shl(x) + shr(x) + up + dn)

    def red_mask(l, r0, r1):
        Yl, Xl = shapes[l]
        yy = jax.lax.broadcasted_iota(jnp.int32, (r1 - r0, Xl), 0) + r0
        xx = jax.lax.broadcasted_iota(jnp.int32, (r1 - r0, Xl), 1)
        return ((yy + xx) & 1) == 0

    def half_sweep(l, want_red: bool):
        """x += color * invd * (b - A x), chunked in place (safe: a red
        update reads only black neighbours and vice versa)."""
        Yl, _ = shapes[l]
        C = chunks[l]
        for c in range(Yl // C):
            r0, r1 = c * C, (c + 1) * C
            _, _, invd = decode(l, r0, r1)
            res = b_l[l][r0:r1] - lap_rows(l, x_l[l], r0, r1)
            upd = invd * res
            color = red_mask(l, r0, r1)
            if not want_red:
                color = ~color
            x_l[l][r0:r1] = x_l[l][r0:r1] + jnp.where(color, upd, 0.0)

    def smooth(l, iters: int, reverse: bool):
        for _ in range(iters):
            half_sweep(l, want_red=not reverse)
            half_sweep(l, want_red=reverse)

    def zero_level(l):
        Yl, Xl = shapes[l]
        C = chunks[l]
        for c in range(Yl // C):
            x_l[l][c * C:(c + 1) * C] = jnp.zeros((C, Xl), f32)

    def restrict(l):
        """b_{l+1} = R(fluid_l * (b_l - A_l x_l)), chunked over coarse rows."""
        Yc, Xc = shapes[l + 1]
        Cc = chunks[l + 1]
        for c in range(Yc // Cc):
            rc0, rc1 = c * Cc, (c + 1) * Cc
            fr0, fr1 = 2 * rc0 - 1, 2 * rc1 + 1  # fine rows incl. stencil halo
            fl, _, _ = (
                decode(l, max(fr0, 0), min(fr1, shapes[l][0]))
            )
            res_core = b_l[l][max(fr0, 0):min(fr1, shapes[l][0])] - lap_rows(
                l, x_l[l], max(fr0, 0), min(fr1, shapes[l][0])
            )
            res_core = fl * res_core
            # zero-fill the out-of-range boundary rows
            parts = []
            if fr0 < 0:
                parts.append(jnp.zeros((-fr0, shapes[l][1]), f32))
            parts.append(res_core)
            if fr1 > shapes[l][0]:
                parts.append(jnp.zeros((fr1 - shapes[l][0], shapes[l][1]), f32))
            res = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            # res rows cover fine [fr0, fr1); index 1 + k is fine row 2*rc0+k
            q = res[1:1 + 2 * Cc].reshape(Cc, 2, shapes[l][1])
            e0 = q[:, 0, :]
            e1 = q[:, 1, :]
            e1_dn = jnp.concatenate([res[0:1], e1[:-1]], axis=0)
            e0_up = jnp.concatenate([e0[1:], res[1 + 2 * Cc:2 + 2 * Cc]], 0)
            yt = _W0 * (e0 + e1) + _W1 * (e1_dn + e0_up)
            b_l[l + 1][rc0:rc1] = jnp.dot(
                yt, Rx[l][...], preferred_element_type=f32
            )

    def prolong_add(l):
        """x_l += fluid_l * P(fluid_{l+1} * x_{l+1}), chunked coarse rows."""
        Yc, Xc = shapes[l + 1]
        Cc = chunks[l + 1]
        for c in range(Yc // Cc):
            rc0, rc1 = c * Cc, (c + 1) * Cc
            flc, _, _ = decode(l + 1, max(rc0 - 1, 0), min(rc1 + 1, Yc))
            ew = flc * x_l[l + 1][max(rc0 - 1, 0):min(rc1 + 1, Yc)]
            parts = []
            if rc0 - 1 < 0:
                parts.append(jnp.zeros((1, Xc), f32))
            parts.append(ew)
            if rc1 + 1 > Yc:
                parts.append(jnp.zeros((1, Xc), f32))
            ew = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            xe = jnp.dot(ew, RxT[l][...], preferred_element_type=f32)
            # xe rows cover coarse [rc0-1, rc1+1); core at offset 1
            core = xe[1:1 + Cc]
            p0 = _W0 * core + _W1 * xe[0:Cc]
            p1 = _W0 * core + _W1 * xe[2:2 + Cc]
            out = jnp.stack([p0, p1], axis=1).reshape(2 * Cc, shapes[l][1])
            fr0, fr1 = 2 * rc0, 2 * rc1
            flf, _, _ = decode(l, fr0, fr1)
            x_l[l][fr0:fr1] = x_l[l][fr0:fr1] + flf * out

    def v_cycle():
        """z = M^{-1} r: x_0 accumulates into z_ref; b_0 is r_ref."""
        for l in range(L):
            zero_level(l)
        for l in range(L - 1):
            smooth(l, pre, reverse=False)
            restrict(l)
        smooth(L - 1, coarse_iters, reverse=False)
        smooth(L - 1, coarse_iters, reverse=True)
        for l in range(L - 2, -1, -1):
            prolong_add(l)
            smooth(l, post, reverse=True)

    # ---- PCG (stopping rule of main.c:738-767) ----
    Y0, X0 = shapes[0]
    C0 = chunks[0]
    nchunks0 = Y0 // C0

    rmax0 = jnp.zeros((), f32)
    for c in range(nchunks0):
        r0, r1 = c * C0, (c + 1) * C0
        r_ref[r0:r1] = b_ref[r0:r1]  # no-op when aliased
        p_ref[r0:r1] = jnp.zeros((C0, X0), f32)
        rmax0 = jnp.maximum(rmax0, jnp.max(jnp.abs(b_ref[r0:r1])))
    nonzero = rmax0 != 0.0
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    v_cycle()
    sigma0 = jnp.zeros((), f32)
    for c in range(nchunks0):
        r0, r1 = c * C0, (c + 1) * C0
        z = z_ref[r0:r1]
        s_ref[r0:r1] = z
        sigma0 = sigma0 + jnp.sum(z * r_ref[r0:r1])

    def cond(carry):
        sigma, i, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        sigma, i, done = carry
        zs = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            fl, _, _ = decode(0, r0, r1)
            As = fl * lap_rows(0, s_ref, r0, r1)
            as_ref[r0:r1] = As
            zs = zs + jnp.sum(As * s_ref[r0:r1])
        alpha = sigma / jnp.where(zs != 0, zs, 1.0)

        rmax = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            p_ref[r0:r1] = p_ref[r0:r1] + alpha * s_ref[r0:r1]
            r = r_ref[r0:r1] - alpha * as_ref[r0:r1]
            r_ref[r0:r1] = r
            rmax = jnp.maximum(rmax, jnp.max(jnp.abs(r)))
        conv = rmax <= tol_eff

        v_cycle()
        sigma_new = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            sigma_new = sigma_new + jnp.sum(z_ref[r0:r1] * r_ref[r0:r1])
        beta = sigma_new / jnp.where(sigma != 0, sigma, 1.0)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            s_ref[r0:r1] = z_ref[r0:r1] + beta * s_ref[r0:r1]
        return (sigma_new, i + 1, conv)

    _, i, _ = jax.lax.while_loop(cond, body, (sigma0, jnp.int32(0), ~nonzero))
    iters_ref[0, 0] = i
    rmax = jnp.zeros((), f32)
    for c in range(nchunks0):
        rmax = jnp.maximum(
            rmax, jnp.max(jnp.abs(r_ref[c * C0:(c + 1) * C0]))
        )
    resid_ref[0, 0] = rmax


@functools.partial(jax.jit, static_argnums=(0, 5))
def solve_pressure_mg_pallas(cfg: SimConfig, b, a_diag, fluid, solid,
                             interpret: bool = False):
    """One-launch MG-PCG.  Returns (p, iterations, residual), same
    contract as ops.project.solve_pressure."""
    from euler_tpu.ops.multigrid import build_hierarchy

    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    shapes = tuple(_level_shapes(Y, X, cfg.solver.mg_min_size))
    L = len(shapes)
    chunks = tuple(_chunk_rows(Yl, Xl) for Yl, Xl in shapes)

    levels = build_hierarchy(solid, fluid, f, min_size=cfg.solver.mg_min_size)
    assert len(levels) == L, (len(levels), L)
    packed = [
        lv.a_diag.astype(f) * lv.fluid.astype(f) + 8.0 * lv.fluid.astype(f)
        for lv in levels
    ]
    # level 0's packed plane must encode the PCG matrix itself
    packed[0] = a_diag.astype(f) * fluid.astype(f) + 8.0 * fluid.astype(f)

    Rx = [jnp.asarray(_restrict_matrix(shapes[l][1], shapes[l + 1][1]))
          for l in range(L - 1)]
    RxT = [jnp.swapaxes(m, 0, 1) for m in Rx]

    kernel = functools.partial(
        _mg_kernel, shapes, chunks,
        cfg.solver.max_iterations, float(cfg.solver.tol),
        float(cfg.solver.tol_rel),
        cfg.solver.mg_pre_smooth, cfg.solver.mg_post_smooth,
        cfg.solver.mg_coarse_iters,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_in = 1 + L + 2 * (L - 1)
    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # p
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((Y, X), f),          # r (aliases b)
        ],
        in_specs=[vmem] * n_in,
        out_specs=[vmem, smem, smem, vmem],
        input_output_aliases={0: 3},  # b buffer becomes the residual
        scratch_shapes=(
            [pltpu.VMEM((Y, X), f)] * 3  # z, s, As
            + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # x_l
            + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # b_l
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b.astype(f), *packed, *Rx, *RxT)
    p, iters, resid, _r = out
    return p, iters[0, 0], resid[0, 0]


def mg_pallas_fits(cfg: SimConfig) -> bool:
    """f32 + mg only; every level size must stay even down to min_size
    (no padding in-kernel) and ~7.5 fine-plane equivalents must fit."""
    if not (cfg.solver.preconditioner == "mg"
            and cfg.solver.dtype == "float32"):
        return False
    shapes = _level_shapes(cfg.ny, cfg.nx, cfg.solver.mg_min_size)
    Yl, Xl = shapes[-1]
    if min(Yl, Xl) > cfg.solver.mg_min_size:
        return False  # hit an odd size before reaching the coarsest level
    return int(cfg.ny * cfg.nx * 4 * 7.5) <= _VMEM_BUDGET

"""Pallas TPU kernel: the grid half of a WHOLE substep in one launch.

Fuses everything between the marker pass and the next substep —
extrapolate u/v into newly-fluid faces, zero_bounds, semi-Lagrangian
advection, gravity, zero_bounds (main.c:865-889), then the full pressure
projection (divergence RHS, Galerkin MG-PCG solve, pressure clamp, face
velocity update, main.c:709-806) and the CFL max-speed reduction
(main.c:808-820) — into ONE single-program kernel with every plane and
every multigrid level resident in VMEM.  A substep is then exactly TWO
device launches: the fused marker kernel + this (VERDICT r2 item 3).

Validity of the fusion: the grid stage must see the post-source-emission
fluid mask (main.c:289), which on scenarios WITH sources is only known
after the host-side sequential-RNG emission scan.  The fused path is
therefore gated on `scn.num_sources == 0` (a static scenario property);
source scenarios keep the op-by-op path.  The flagship benchmark
scenario (dam break) has no sources.

Inactive substeps (sim.py's fixed-trip scan): dt (lane 0) is 0, so the
grid stage is finite and cheap; dt_proj (lane 1) is +inf, so the RHS is
exactly zero and the solve's all_zero early-out (main.c:742) skips both
the initial W-cycle and the PCG loop.

The grid-stage arithmetic mirrors ops/pallas/grid_kernel.py (which is
itself pinned against the jnp op sequence) reformulated from row-shifted
HBM views to in-VMEM whole-plane row slices — the seven materialised
views per plane were the measured cost that made the standalone grid
kernel a net loss (PERF.md).  Parity: tests/test_substep_fused.py.
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
    _shift_x_any as _shift_x,  # row-offset slice operands: see marker_kernel
)
from euler_tpu.ops.pallas.mg_kernel import (
    _mg_pcg_solve,
    _unpack_mg_refs,
    mg_host_operands,
    mg_pallas_fits,
    mg_scratch_shapes,
)
from euler_tpu.ops.pallas.pcg_kernel import _VMEM_BUDGET


def _grid_chunk_rows(Y: int) -> int:
    """Grid-stage (sweep-B) chunk height: 64 rows, dividing Y.

    Sweep B keeps ~36 [C, X] planes live at once (u9/v9/up9/vp9 plus
    the interp temps); at the solver's C=256 chunk that is ~36+ MB of
    live vectors, which the first hardware compile spilled as 70 MB of
    register-allocator slots and OOM'd the 128 MB VMEM space.  64 rows
    puts the live set at the fused marker kernel's proven scale
    (~9 MB at X=1024)."""
    c = min(Y, 64)
    while c > 8 and Y % c:
        c -= 8
    return c if c > 0 and Y % c == 0 else min(Y, 8)


def _grid_stage_sweeps(cfg: SimConfig, Y, X, C, dt,
                       fl_ref, so_ref, pfl_ref, u_ref, v_ref,
                       zu_ref, zv_ref, u2_ref, v2_ref):
    """The grid-velocity stage of one substep (main.c:865-889) as two
    chunked whole-plane sweeps: A) extrapolate + zero_bounds into zu/zv
    (materialised so B can read ±1 neighbour rows across chunk
    boundaries), B) semi-Lagrangian advect + gravity + zero_bounds into
    u2/v2 IN PLACE over the u/v input buffers (dead after sweep A).
    Masks arrive as f32 0/1 planes."""
    nchunks = Y // C
    f32 = jnp.float32
    g = np.float32(cfg.gravity)
    inv_h = np.float32(1.0 / cfg.side_length)

    def rows(ref, r0, r1):
        lo, hi = max(r0, 0), min(r1, Y)
        parts = []
        if r0 < 0:
            parts.append(jnp.zeros((-r0, X), f32))
        parts.append(ref[lo:hi])
        if r1 > Y:
            parts.append(jnp.zeros((r1 - Y, X), f32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def shl(a):  # a[y, x-1]
        return _shift_x(a, -1)

    def shr(a):  # a[y, x+1]
        return _shift_x(a, 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (C, X), 1)
    reg_u = col < (X - 1)
    xs = col.astype(f32)

    # u/v properties with logical regions (main.c:128-147)
    def u_prop(mref, r0, r1, s):
        m = rows(mref, r0 + s, r1 + s)
        return (m + shr(m)) != 0

    def v_prop(mref, r0, r1, s):
        return (rows(mref, r0 + s, r1 + s)
                + rows(mref, r0 + s + 1, r1 + s + 1)) != 0

    def v_reg(r0, s):
        row = jax.lax.broadcasted_iota(jnp.int32, (C, X), 0) + r0
        return (row + s) < (Y - 1)

    # ---- sweep A: extrapolate (main.c:173-185) + zero_bounds
    # (main.c:822-832) -> zu, zv ----
    def extrap_zero(q_ref, z_ref_out, prop, reg_of, r0, r1):
        q = rows(q_ref, r0, r1)
        cur = prop(fl_ref, r0, r1, 0) & reg_of(r0, 0)
        prv = prop(pfl_ref, r0, r1, 0) & reg_of(r0, 0)
        newly = cur & ~prv

        qm_rows = None
        m_rows = None
        for ds in (-1, 0, 1):
            m = (prop(pfl_ref, r0, r1, ds) & reg_of(r0, ds)).astype(f32)
            qm = rows(q_ref, r0 + ds, r1 + ds) * m
            qm_rows = qm if qm_rows is None else qm_rows + qm
            m_rows = m if m_rows is None else m_rows + m
        total = shl(qm_rows) + qm_rows + shr(qm_rows)
        count = shl(m_rows) + m_rows + shr(m_rows)
        avg = total / jnp.where(count > 0, count, 1.0)
        avg = jnp.where(count > 0, avg, 0.0)
        q = jnp.where(newly, avg, q)

        keep = cur & ~prop(so_ref, r0, r1, 0)
        z_ref_out[r0:r1] = jnp.where(keep, q, 0.0)

    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        extrap_zero(u_ref, zu_ref, u_prop, lambda _r0, _s: reg_u, r0, r1)
        extrap_zero(v_ref, zv_ref, v_prop, v_reg, r0, r1)

    # ---- sweep B: advect + gravity + zero_bounds -> u2/v2 ----
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        ys = (jax.lax.broadcasted_iota(jnp.int32, (C, X), 0)
              + r0).astype(f32)
        site_x = col
        site_y = jax.lax.broadcasted_iota(jnp.int32, (C, X), 0) + r0

        def stack9(z_ref_in):
            return [
                [_shift_x(rows(z_ref_in, r0 + dy, r1 + dy), dx)
                 for dx in (-1, 0, 1)]
                for dy in (-1, 0, 1)
            ]

        u9 = stack9(zu_ref)
        v9 = stack9(zv_ref)
        up9 = [
            [_shift_x((u_prop(fl_ref, r0, r1, dy) & reg_u).astype(f32), dx)
             for dx in (-1, 0, 1)]
            for dy in (-1, 0, 1)
        ]
        vp9 = [
            [_shift_x((v_prop(fl_ref, r0, r1, dy)
                       & v_reg(r0, dy)).astype(f32), dx)
             for dx in (-1, 0, 1)]
            for dy in (-1, 0, 1)
        ]

        # advect_u (main.c:382-399)
        dxu = zu_ref[r0:r1]
        bx, fx = _clamped_base(xs + 0.5, site_x, X, f32)
        by, fy = _clamped_base(ys - 0.5, site_y, Y - 1, f32)
        dyu = _interp_tile(v9, vp9, bx, by, fx, fy)
        bx, fx = _clamped_base(xs - dxu * dt * inv_h, site_x, X - 1, f32)
        by, fy = _clamped_base(ys - dyu * dt * inv_h, site_y, Y, f32)
        ut = _interp_tile(u9, up9, bx, by, fx, fy)
        mask_u = u_prop(fl_ref, r0, r1, 0) & reg_u
        ut = jnp.where(mask_u, ut, 0.0)

        # advect_v (main.c:405-422)
        dyv = zv_ref[r0:r1]
        bx, fx = _clamped_base(xs - 0.5, site_x, X - 1, f32)
        by, fy = _clamped_base(ys + 0.5, site_y, Y, f32)
        dxv = _interp_tile(u9, up9, bx, by, fx, fy)
        bx, fx = _clamped_base(xs - dxv * dt * inv_h, site_x, X, f32)
        by, fy = _clamped_base(ys - dyv * dt * inv_h, site_y, Y - 1, f32)
        vt = _interp_tile(v9, vp9, bx, by, fx, fy)
        mask_v = v_prop(fl_ref, r0, r1, 0) & v_reg(r0, 0)
        vt = jnp.where(mask_v, vt, 0.0)

        # gravity (main.c:539-545) + zero_bounds (main.c:888-889)
        vt = jnp.where(v_reg(r0, 0), vt + g * dt, vt)
        ut = jnp.where(mask_u & ~u_prop(so_ref, r0, r1, 0), ut, 0.0)
        vt = jnp.where(mask_v & ~v_prop(so_ref, r0, r1, 0), vt, 0.0)
        u2_ref[r0:r1] = ut
        v2_ref[r0:r1] = vt


def _substep_kernel(cfg: SimConfig, shapes, chunks,
                    dt_ref, fl_ref, so_ref, pfl_ref, u_ref, v_ref,
                    p0_ref, *refs):
    """refs order (pallas operand stream): remaining inputs
    [coefs(SMEM), packed0, coef planes, Rx, RxT], then outputs
    [u2, v2, msq, iters, resid, p] (u2/v2 alias u/v — ut/vt are computed
    into them in place), then scratch [zu, zv, r, <MG scratch>].
    p0 (previous substep's clamped pressure) seeds the PCG when
    cfg.solver.warm_start; the p output is this substep's clamped
    pressure — the next substep's seed."""
    Y, X = shapes[0]
    L = len(shapes)
    C = chunks[0]
    nchunks = Y // C
    f32 = jnp.float32
    dt = dt_ref[0, 0]
    dt_proj = dt_ref[0, 1]
    inv_h = np.float32(1.0 / cfg.side_length)
    # C computes h^2 * rho / dt in float then widens (main.c:713)
    k_inv_scale = (
        np.float32(cfg.side_length * cfg.side_length * cfg.density)
        / dt_proj
    )
    neg_inv_rho_h = np.float32(-1.0 / (cfg.density * cfg.side_length))
    warm = bool(cfg.solver.warm_start)

    n_rest = 2 + 5 * (L - 1)  # coefs, packed0, 3(L-1) coef planes, Rx, RxT
    head = list(refs[:n_rest])
    (u2_ref, v2_ref, msq_ref, iters_ref, resid_ref,
     p_ref) = refs[n_rest:n_rest + 6]
    zu_ref, zv_ref, r_ref = refs[n_rest + 6:n_rest + 9]
    mg_scratch = list(refs[n_rest + 9:])
    mg_refs = _unpack_mg_refs(
        shapes,
        head + [p_ref, iters_ref, resid_ref, r_ref] + mg_scratch,
    )

    _grid_stage_sweeps(cfg, Y, X, _grid_chunk_rows(Y), dt,
                       fl_ref, so_ref, pfl_ref,
                       u_ref, v_ref, zu_ref, zv_ref, u2_ref, v2_ref)

    def rows(ref, r0, r1):
        """ref rows [r0, r1) with zero fill beyond [0, Y)."""
        lo, hi = max(r0, 0), min(r1, Y)
        parts = []
        if r0 < 0:
            parts.append(jnp.zeros((-r0, X), f32))
        parts.append(ref[lo:hi])
        if r1 > Y:
            parts.append(jnp.zeros((r1 - Y, X), f32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def shl(a):  # a[y, x-1]
        return _shift_x(a, -1)

    def shr(a):  # a[y, x+1]
        return _shift_x(a, 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (C, X), 1)
    reg_u = col < (X - 1)

    # ---- divergence RHS (main.c:716-724) -> r plane ----
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        ut = u2_ref[r0:r1]
        vt = v2_ref[r0:r1]
        vt_dn = rows(v2_ref, r0 - 1, r1 - 1)
        div = (ut - shl(ut) + vt - vt_dn) * inv_h
        fl = fl_ref[r0:r1]
        r_ref[r0:r1] = jnp.where(fl != 0, -div * k_inv_scale, 0.0)
        if warm:
            p_ref[r0:r1] = p0_ref[r0:r1]

    # ---- the whole MG-PCG solve (shared body) ----
    _mg_pcg_solve(shapes, chunks, cfg.solver.max_iterations,
                  float(cfg.solver.tol), float(cfg.solver.tol_rel),
                  cfg.solver.mg_cheby_degree, cfg.solver.mg_coarse_iters,
                  2 if cfg.solver.mg_cycle == "w" else 1,
                  cfg.solver.mg_w_depth, *mg_refs, warm=warm)

    # ---- pressure clamp (main.c:773-779) ----
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        fl = fl_ref[r0:r1]
        p_ref[r0:r1] = jnp.where(fl != 0, jnp.maximum(p_ref[r0:r1], 0.0),
                                 0.0)

    # ---- face velocity update (main.c:782-806) + maxsq (main.c:808) ----
    musq = jnp.zeros((), f32)
    mvsq = jnp.zeros((), f32)
    for c in range(nchunks):
        r0, r1 = c * C, (c + 1) * C
        fl = fl_ref[r0:r1]
        so = so_ref[r0:r1]
        fl_up = rows(fl_ref, r0 + 1, r1 + 1)
        so_up = rows(so_ref, r0 + 1, r1 + 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (C, X), 0) + r0
        v_region = row < (Y - 1)

        p = p_ref[r0:r1]
        p_r = shr(p)
        p_u = rows(p_ref, r0 + 1, r1 + 1)

        u_keep = reg_u & ((fl + shr(fl)) != 0) & ((so + shr(so)) == 0)
        u2 = jnp.where(u_keep,
                       u2_ref[r0:r1] + (neg_inv_rho_h * (p_r - p)) * dt,
                       0.0)
        v_keep = v_region & ((fl + fl_up) != 0) & ((so + so_up) == 0)
        v2 = jnp.where(v_keep,
                       v2_ref[r0:r1] + (neg_inv_rho_h * (p_u - p)) * dt,
                       0.0)
        u2_ref[r0:r1] = u2
        v2_ref[r0:r1] = v2
        musq = jnp.maximum(musq, jnp.max(u2 * u2))
        mvsq = jnp.maximum(mvsq, jnp.max(v2 * v2))
    msq_ref[0, 0] = musq + mvsq


@functools.partial(jax.jit, static_argnums=(0, 9))
def project_substep_mg(cfg: SimConfig, dt, dt_proj, u, v, fluid,
                       prev_fluid, solid, p0=None,
                       interpret: bool = False, mg_coarse=None):
    """One-launch grid stage + projection.  Returns
    (u2, v2, iterations, residual, msq, p); msq feeds the next substep's
    CFL dt and p (this substep's clamped pressure) the next substep's
    warm start.  dt drives the grid stage and face update; dt_proj the
    RHS scale (sim.py passes +inf on inactive substeps so the solve
    early-outs on an exactly-zero RHS).  `p0` seeds the PCG when
    cfg.solver.warm_start (it aliases the p output, so the pressure
    plane round-trips the substep scan in place).  `mg_coarse` (from
    mg_kernel.mg_coarse_bundle) substitutes a frame-stale coarse
    hierarchy, skipping the per-substep Galerkin rebuild."""
    from euler_tpu.ops.project import pressure_matrix_diag

    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    a_diag = pressure_matrix_diag(cfg, solid, fluid)
    (shapes, chunks, packed0, coef_planes, coef_rows, Rx,
     RxT) = mg_host_operands(cfg, a_diag, fluid, coarse=mg_coarse)
    L = len(shapes)

    fl = fluid.astype(f)
    so = solid.astype(f)
    pfl = prev_fluid.astype(f)
    dt_arr = jnp.full((1, 128), dt, f).at[0, 1].set(
        jnp.asarray(dt_proj, f))
    if p0 is None:
        p0 = jnp.zeros((Y, X), f)

    kernel = functools.partial(_substep_kernel, cfg, shapes, chunks)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_in = 7 + 1 + 1 + 3 * (L - 1) + 2 * (L - 1)
    in_specs = [vmem] * 7 + [smem] + [vmem] * (n_in - 8)
    u2, v2, msq, iters, resid, p = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # u2 (aliases u)
            jax.ShapeDtypeStruct((Y, X), f),          # v2 (aliases v)
            jax.ShapeDtypeStruct((1, 1), f),          # msq
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((Y, X), f),          # p (aliases p0)
        ],
        in_specs=in_specs,
        out_specs=[vmem, vmem, smem, smem, smem, vmem],
        input_output_aliases={4: 0, 5: 1, 6: 5},  # u->u2, v->v2, p0->p
        scratch_shapes=(
            [pltpu.VMEM((Y, X), f)] * 3      # zu, zv, r
            + mg_scratch_shapes(shapes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dt_arr, fl, so, pfl, u.astype(f), v.astype(f), p0.astype(f),
      coef_rows, packed0, *coef_planes, *Rx, *RxT)
    return u2, v2, iters[0, 0], resid[0, 0], msq[0, 0], p


def substep_fused_fits(cfg: SimConfig) -> bool:
    """The MG solve must fit (mg_pallas_fits) plus ~7 more fine planes
    (fl/so/pfl/u/v in, zu/zv/p/r scratch, minus the planes the solver
    budget already counts) — true through ~1200²."""
    return (
        mg_pallas_fits(cfg)
        and int(cfg.ny * cfg.nx * 4 * 18.0) <= _VMEM_BUDGET
    )


# ----------------------------------------------------------------------
# Jacobi (reference-budget "speed mode") variant: the same grid-stage
# sweeps feeding the one-launch fused Jacobi projection of
# pcg_kernel._project_kernel.
# ----------------------------------------------------------------------

def _substep_jacobi_kernel(cfg: SimConfig, C,
                           dt_ref, fl_ref, so_ref, pfl_ref, u_ref, v_ref,
                           u2_ref, v2_ref, iters_ref, resid_ref, msq_ref,
                           zu_ref, zv_ref,
                           packed_ref, b_ref, p_ref, s_ref, as_ref):
    from euler_tpu.ops.pallas.pcg_kernel import _project_kernel

    Y, X = fl_ref.shape
    _grid_stage_sweeps(cfg, Y, X, _grid_chunk_rows(Y), dt_ref[0, 0],
                       fl_ref, so_ref,
                       pfl_ref, u_ref, v_ref, zu_ref, zv_ref,
                       u2_ref, v2_ref)
    # ut/vt live in u2/v2; _project_kernel updates them in place (its
    # ut/vt inputs are documented as aliasing its u2/v2 outputs)
    _project_kernel(cfg, C, fl_ref, so_ref, u2_ref, v2_ref, dt_ref,
                    u2_ref, v2_ref, iters_ref, resid_ref, msq_ref,
                    packed_ref, b_ref, p_ref, s_ref, as_ref)


@functools.partial(jax.jit, static_argnums=(0, 8))
def project_substep_jacobi(cfg: SimConfig, dt, dt_proj, u, v, fluid,
                           prev_fluid, solid, interpret: bool = False):
    """One-launch grid stage + Jacobi-PCG projection (same contract as
    project_substep_mg)."""
    from euler_tpu.ops.pallas.pcg_kernel import _chunk_rows

    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    fl = fluid.astype(f)
    so = solid.astype(f)
    pfl = prev_fluid.astype(f)
    dt_arr = jnp.full((1, 128), dt, f).at[0, 1].set(
        jnp.asarray(dt_proj, f))

    kernel = functools.partial(_substep_jacobi_kernel, cfg,
                               _chunk_rows(Y, X))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    u2, v2, iters, resid, msq = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # u2 (aliases u)
            jax.ShapeDtypeStruct((Y, X), f),          # v2 (aliases v)
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((1, 1), f),          # msq
        ],
        in_specs=[vmem] * 6,
        out_specs=[vmem, vmem, smem, smem, smem],
        input_output_aliases={4: 0, 5: 1},  # u -> u2, v -> v2
        scratch_shapes=[pltpu.VMEM((Y, X), f)] * 7,  # zu zv packed b p s As
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dt_arr, fl, so, pfl, u.astype(f), v.astype(f))
    return u2, v2, iters[0, 0], resid[0, 0], msq[0, 0]


def substep_jacobi_fused_fits(cfg: SimConfig) -> bool:
    """12 persistent f32 planes + chunk temps — true through ~1300²."""
    return (
        cfg.solver.preconditioner == "jacobi"
        and cfg.solver.dtype == "float32"
        and int(cfg.ny * cfg.nx * 4 * 13.0) <= _VMEM_BUDGET
    )

"""Pallas TPU kernel: PCG with an in-kernel Galerkin multigrid cycle.

The Jacobi-preconditioned single-launch solver (pcg_kernel.py) honours
the reference's iteration budget (<=100, tol 1e-6 — main.c:735-736) but
plain Jacobi-PCG does not CONVERGE within it beyond ~256²: at 1024² the
residual after 100 iterations is ~27 (bench JSON `post_projection_
div_inf`).  This kernel runs the ENTIRE MG-PCG solve — every cycle,
smoothing step, restriction and prolongation — inside one launch, with
every level's iterate resident in VMEM.

Hierarchy: the Galerkin one (ops/multigrid.py build_galerkin_hierarchy)
— exact coarse operators A_c = P^T A P for piecewise-constant
prolongation, which stay 5-POINT in edge-weight form (c, e, n planes).
Cycle: truncated W (levels >= mg_w_depth recurse once) with Chebyshev
smoothing and a Chebyshev coarsest solve — chosen for the kernel cost
profile: a Chebyshev step is ONE operator apply (red-black needs two,
one per colour) with no colour masks, the coarse levels' latency-bound
op count drops ~2x, and the W-truncation removes the tiny levels' extra
visits that measurably don't buy iterations.  The Chebyshev coefficient
schedules are pure functions of the per-level Gershgorin bounds lmax(l)
(computed at hierarchy build — see ops/multigrid._edge_level on why
they must be measured, not statically estimated), so they are computed
ONCE outside the kernel and enter as one SMEM row per level — the
in-kernel recurrences they replace (~34 cheby calls x 10-40 scalar ops
per cycle) were a dominant serial-latency cost.  Measured PCG iteration counts
to rel 1e-4 on free-surface systems: 10-13 at 512², level-independent
(PERF.md "Solve convergence").

TPU-native transfer formulation (Mosaic supports sublane-dim reshapes
but no lane-dim reshapes/strided slices — probed):

  * constant transfers are BLOCK-ALIGNED (coarse row chunk [rc0, rc1)
    touches exactly fine rows [2rc0, 2rc1) — no halo rows);
  * Y (sublane) axis: even/odd row split via reshape([Cc, 2, X]) + sum,
    interleave via stack + reshape;
  * X (lane) axis: a dot with the 1D pair-sum matrix Rx [Xf, Xc]
    (entries 1 at (2j, j) and (2j+1, j)) on the MXU, and its transpose
    for prolongation (lane duplication).

The cycle operator is symmetric by construction (Chebyshev steps are
fixed polynomials in the symmetric A; transfers are exact adjoints), so
it is a valid SPD preconditioner for PCG — no colour-order bookkeeping.
Level 0 uses the packed a_diag+fluid plane (the PCG matrix, -1
couplings implicit, iterates kept zero outside the fluid); levels >= 1
use the real-valued edge-weight planes, whose couplings are zero toward
inactive cells, so junk left by the (unmasked) prolongation is inert.
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
from euler_tpu.ops.pallas.pcg_kernel import _VMEM_BUDGET, _chunk_rows


def _level_shapes(Y: int, X: int, min_size: int):
    """Fine-to-coarse level shapes, mirroring build_galerkin_hierarchy."""
    shapes = [(Y, X)]
    while min(shapes[-1]) > min_size:
        Yl, Xl = shapes[-1]
        if Yl % 2 or Xl % 2:
            break  # hierarchy would pad; mg_pallas_fits() gates this
        shapes.append((Yl // 2, Xl // 2))
    return shapes


def _pair_matrix(Xf: int, Xc: int) -> np.ndarray:
    """1D constant-prolongation restriction [Xf, Xc]: column j sums fine
    lanes 2j and 2j+1 (P^T for lane duplication)."""
    W = np.zeros((Xf, Xc), np.float32)
    for j in range(Xc):
        W[2 * j, j] = 1.0
        W[2 * j + 1, j] = 1.0
    return W


def _unpack_mg_refs(shapes, refs):
    """Shared ref-bundle layout for the MG-PCG body: coefs (SMEM
    [L, 1+2*max_deg]), packed0, [c, e, n][1..L-1] (3 planes per coarse
    level), Rx[0..L-2], RxT[0..L-2], p_ref, iters_ref, resid_ref, r_ref,
    z_ref, cd_ref, cr_ref, s_ref, as_ref, x[1..L-1], bl[1..L-1],
    d[1..L-1], rr[1..L-1].  Returns the tuple _mg_pcg_solve expects."""
    L = len(shapes)
    coefs_ref = refs[0]
    packed0 = refs[1]
    coef = [None] + [refs[2 + 3 * l: 5 + 3 * l] for l in range(L - 1)]
    o = 2 + 3 * (L - 1)
    Rx = list(refs[o:o + L - 1])
    RxT = list(refs[o + L - 1:o + 2 * (L - 1)])
    o += 2 * (L - 1)
    (p_ref, iters_ref, resid_ref, r_ref, z_ref, cd_ref, cr_ref,
     s_ref, as_ref) = refs[o:o + 9]
    o += 9
    x_l = [z_ref] + list(refs[o:o + L - 1])
    b_l = [r_ref] + list(refs[o + L - 1:o + 2 * (L - 1)])
    d_l = [cd_ref] + list(refs[o + 2 * (L - 1):o + 3 * (L - 1)])
    rr_l = [cr_ref] + list(refs[o + 3 * (L - 1):o + 4 * (L - 1)])
    assert o + 4 * (L - 1) == len(refs), (o, L, len(refs))
    return (coefs_ref, packed0, coef, Rx, RxT, p_ref, iters_ref,
            resid_ref, r_ref, z_ref, cd_ref, cr_ref, s_ref, as_ref,
            x_l, b_l, d_l, rr_l)


def _mg_kernel(shapes, chunks, max_iters: int, tol: float, tol_rel: float,
               cheby_degree: int, cheby_ratio: float,
               coarse_degree: int, coarse_ratio: float,
               w: int, w_depth: int, warm: bool,
               b_ref, *refs):
    """Standalone solver kernel: copy the RHS into the residual plane
    (no-op when aliased; real under interpret) and run the shared body.

    With `warm`, one extra trailing INPUT (the initial guess) precedes
    the outputs; solve_pressure_mg_pallas aliases it into the p output
    buffer (input_output_aliases), so the chunked copy below is a no-op
    on hardware (real under interpret) and the guess costs no extra VMEM
    plane."""
    del cheby_ratio, coarse_ratio  # schedules baked into the SMEM rows
    refs = list(refs)
    L = len(shapes)
    if warm:
        x0_ref = refs.pop(2 + 5 * (L - 1))
    unpacked = _unpack_mg_refs(shapes, refs)
    p_ref = unpacked[5]
    r_ref = unpacked[8]
    Y0 = shapes[0][0]
    C0 = chunks[0]
    for c in range(Y0 // C0):
        r0, r1 = c * C0, (c + 1) * C0
        r_ref[r0:r1] = b_ref[r0:r1]
        if warm:
            p_ref[r0:r1] = x0_ref[r0:r1]
    _mg_pcg_solve(shapes, chunks, max_iters, tol, tol_rel,
                  cheby_degree, coarse_degree, w, w_depth, *unpacked,
                  warm=warm)


def make_mg_cycle(shapes, chunks, cheby_degree: int, coarse_degree: int,
                  w: int, w_depth: int,
                  coefs_ref, packed0, coef, Rx, RxT,
                  x_l, b_l, d_l, rr_l):
    """Build the in-kernel multigrid cycle over VMEM-resident levels.

    Returns (cycle, apply_rows): cycle(0, dot_b=...) computes x_l[0] ~=
    A^{-1} b_l[0] (truncated-W, Chebyshev smoothing; see module
    docstring) and, when dot_b, returns sum(x_l[0] * b_l[0]) accumulated
    inside the final smoothing sweep (the PCG sigma = <z, r> dot at zero
    extra passes); apply_rows(l, ref, r0, r1) is the masked per-level
    operator.

    Pass-count economy (round 5 — the VPU-op-bound solve's per-iteration
    cost is pass count x per-pass ops, PERF.md round-4 section):

      * the first Chebyshev step of a from-zero smoother is computed
        DIRECTLY from b by linearity (x1 = b/theta, rr1 = b - A b/theta)
        — no init sweep, no x zero-fill;
      * the last step never writes d (dead), and skips the rr update —
        and hence a whole operator apply — unless the caller keeps rr
        for the restriction (keep_rr);
      * restriction READS the smoother-maintained rr (rr = b - A x holds
        exactly after a keep_rr smoother) instead of re-applying A on
        every fine row; later W-visits, whose x changed via prolongation,
        use the full form under pl.when;
      * a last step that does update rr still fuses into ONE sweep even
        on multi-chunk levels: it never writes d, so the cross-chunk
        A d halo reads see stable data.

    packed0 may be None: then level 0 uses the edge-weight form and
    coef[0] must hold its (c, e, n) refs — the configuration the
    HBM-streamed solver uses, whose resident ROOT level is itself a
    Galerkin coarse level (mg_stream_kernel.py).

    Returns (cycle, apply_rows, zref_l): zref_l[l] is the ref holding
    level l's cycle output.  For degree-1 smoothing (the default) the
    post-smooth is ONE hazard-free pass z = x + (b - A x)/theta written
    into the level's d plane (dead at degree 1), so zref_l[l] is d_l[l]
    there and x_l[l] otherwise — callers must read the cycle result
    through zref_l, not x_l."""
    L = len(shapes)
    f32 = jnp.float32
    # degree-1 post-smooth fuses init+step into one pass writing the d
    # plane; reading x (never written in that pass) is hazard-free at
    # any chunking.  The coarsest level has no post-smooth.
    fuse_post = cheby_degree == 1
    zref_l = [(d_l[l] if fuse_post and l < L - 1 else x_l[l])
              for l in range(L)]

    def decode0(r0, r1):
        pk = packed0[r0:r1]
        fl = jnp.where(pk >= 8.0, 1.0, 0.0).astype(f32)
        a = pk - 8.0 * fl
        return fl, a

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

    from euler_tpu.ops.pallas.marker_kernel import _shift_x_any

    def shl(a):
        return _shift_x_any(a, -1)

    def shr(a):
        return _shift_x_any(a, 1)

    def apply_rows(l, x_ref_l, r0, r1):
        """A x on rows [r0, r1), MASKED (zero at inactive/non-fluid
        rows).  Level 0: packed 5-point form, masked by the fluid plane
        (valid because level-0 iterates are zero outside the fluid);
        levels >= 1: the edge-weight form, intrinsically masked (all
        coefficients are zero at and toward inactive cells)."""
        x = x_ref_l[r0:r1]
        if l == 0 and packed0 is not None:
            fl, a = decode0(r0, r1)
            up = rows(x_ref_l, r0 + 1, r1 + 1, 0)
            dn = rows(x_ref_l, r0 - 1, r1 - 1, 0)
            return fl * (a * x - (shl(x) + shr(x) + up + dn))
        c_ref, e_ref, n_ref = coef[l]
        c = c_ref[r0:r1]
        e = e_ref[r0:r1]
        n = n_ref[r0:r1]
        x_up = rows(x_ref_l, r0 + 1, r1 + 1, l)
        # south coupling: n[i-1] * x[i-1]
        n_dn = rows(n_ref, r0 - 1, r1 - 1, l)
        x_dn = rows(x_ref_l, r0 - 1, r1 - 1, l)
        return (c * x + e * shr(x) + shl(e * x)
                + n * x_up + n_dn * x_dn)

    def for_chunks(l, fn):
        Yl, _ = shapes[l]
        C = chunks[l]
        for c in range(Yl // C):
            fn(c * C, (c + 1) * C)

    def _restrict_chunk(l, rr, r0, r1):
        """b_{l+1} rows [r0/2, r1/2) from fine residual rows [r0, r1)
        already in registers — the fused form of restrict_from_rr
        (round 5): the rr plane is never written or re-read."""
        q = rr.reshape((r1 - r0) // 2, 2, shapes[l][1])
        yt = q[:, 0, :] + q[:, 1, :]
        b_l[l + 1][r0 // 2:r1 // 2] = jnp.dot(
            yt, Rx[l][...], preferred_element_type=f32
        )

    def cheby(l, degree: int, from_zero: bool, keep_rr: bool = False,
              dot_b: bool = False, restrict_to: bool = False):
        """x_l[l] (+)= Chebyshev correction: `degree` steps on
        [lmax/ratio, lmax] (ratio baked into the SMEM schedule;
        Gershgorin bound).  from_zero: the initial iterate is an
        implicit zero (x_l[l] is overwritten, never read).  keep_rr:
        maintain rr_l[l] = b - A x through the LAST step (the following
        restriction reads it); otherwise the last step's rr update — and
        its operator apply — is skipped as dead code.  dot_b: the last
        step's sweep also accumulates sum(x_new * b_l[l]), returned (the
        PCG <z, r> dot when called at level 0 on b_0 = r).

        Specializations (all exact algebra, no approximation):
          * first step, from_zero: x1 = b/theta and rr1 = b - A b /
            theta read b directly — one sweep, no init, no zero-fill;
          * first step, warm (post-smooth): an init sweep writes
            d0 = (b - A x)/theta (and rr0 only when further steps read
            it), then the generic steps run;
          * mid steps: ONE sweep on single-chunk levels (the A d halo
            rows beyond the level are zero-filled, so the in-chunk d
            write is hazard-free) or two on multi-chunk levels (the
            cross-chunk A d halo reads must see the previous d);
          * last step: x += d only (one sweep at any chunking — d is
            never written, so halo reads stay stable even when keep_rr
            adds the A d apply).

        Coefficients are NOT computed here: the Golub-Varga recurrences
        are pure functions of the per-level Gershgorin bound, known
        before the solve — recomputing them per cheby call (~34 calls x
        10-40 scalar ops per cycle) measured as a dominant serial-latency
        cost.  They arrive precomputed in SMEM, one row per level:
        [inv_theta, c_prev_0, c_r_0, c_prev_1, ...]."""
        assert degree >= 1
        assert not (keep_rr and not from_zero), \
            "post-smooth rr is dead in every cycle shape"
        inv_theta = coefs_ref[l, 0]
        coefs = [(coefs_ref[l, 1 + 2 * k], coefs_ref[l, 2 + 2 * k])
                 for k in range(degree)]
        single = shapes[l][0] == chunks[l]
        acc = {"dot": jnp.zeros((), f32)}

        if degree == 1 and not from_zero and fuse_post:
            # ONE pass: z = x + (b - A x)/theta into the d plane (the
            # caller reads the result via zref_l[l]).  x is never
            # written here, so the cross-chunk A x halo reads are
            # hazard-free at any chunking — the old init (d = rr/theta)
            # + stepN (x += d) pair collapses, same arithmetic order
            def fused(r0, r1):
                bb = b_l[l][r0:r1]
                rr = bb - apply_rows(l, x_l[l], r0, r1)
                z = x_l[l][r0:r1] + rr * inv_theta
                d_l[l][r0:r1] = z
                if dot_b:
                    acc["dot"] = acc["dot"] + jnp.sum(z * bb)
            for_chunks(l, fused)
            return acc["dot"]

        if not from_zero:
            def init(r0, r1):
                rr = b_l[l][r0:r1] - apply_rows(l, x_l[l], r0, r1)
                if degree > 1:
                    rr_l[l][r0:r1] = rr
                d_l[l][r0:r1] = rr * inv_theta
            for_chunks(l, init)

        for k, (c_prev, c_r) in enumerate(coefs):
            first, last = k == 0, k == degree - 1
            if first and from_zero:
                # x1 = b/theta; rr1 = b - A b/theta; d1 = cp*x1 + cr*rr1
                def step0(r0, r1, c_prev=c_prev, c_r=c_r, last=last):
                    bb = b_l[l][r0:r1]
                    x = inv_theta * bb
                    if (not last) or keep_rr:
                        rr = bb - inv_theta * apply_rows(l, b_l[l], r0, r1)
                        if last and restrict_to:
                            # the following restriction consumes rr
                            # right here — no rr plane write/read
                            _restrict_chunk(l, rr, r0, r1)
                        else:
                            rr_l[l][r0:r1] = rr
                    if not last:
                        d_l[l][r0:r1] = c_prev * x + c_r * rr
                    x_l[l][r0:r1] = x
                    if last and dot_b:
                        acc["dot"] = acc["dot"] + jnp.sum(x * bb)
                for_chunks(l, step0)
                continue
            if last:
                # x += d (and rr -= A d only when kept); d is dead and
                # never written, so this is ONE sweep at any chunking
                def stepN(r0, r1):
                    x = x_l[l][r0:r1] + d_l[l][r0:r1]
                    x_l[l][r0:r1] = x
                    if keep_rr:
                        rr = (rr_l[l][r0:r1]
                              - apply_rows(l, d_l[l], r0, r1))
                        if restrict_to:
                            _restrict_chunk(l, rr, r0, r1)
                        else:
                            rr_l[l][r0:r1] = rr
                    if dot_b:
                        acc["dot"] = acc["dot"] + jnp.sum(x * b_l[l][r0:r1])
                for_chunks(l, stepN)
                continue
            if single:
                def step(r0, r1, c_prev=c_prev, c_r=c_r):
                    d = d_l[l][r0:r1]
                    x_l[l][r0:r1] = x_l[l][r0:r1] + d
                    rr = rr_l[l][r0:r1] - apply_rows(l, d_l[l], r0, r1)
                    rr_l[l][r0:r1] = rr
                    d_l[l][r0:r1] = c_prev * d + c_r * rr
                for_chunks(l, step)
            else:
                def xr(r0, r1):
                    x_l[l][r0:r1] = x_l[l][r0:r1] + d_l[l][r0:r1]
                    rr_l[l][r0:r1] = (
                        rr_l[l][r0:r1] - apply_rows(l, d_l[l], r0, r1)
                    )
                for_chunks(l, xr)

                def dstep(r0, r1, c_prev=c_prev, c_r=c_r):
                    d_l[l][r0:r1] = (
                        c_prev * d_l[l][r0:r1] + c_r * rr_l[l][r0:r1]
                    )
                for_chunks(l, dstep)
        return acc["dot"]

    def restrict_rows(l, res_rows):
        """b_{l+1} = R(residual): block-aligned 2x2 sums (coarse chunk
        rows [rc0, rc1) read exactly fine rows [2rc0, 2rc1));
        res_rows(fr0, fr1) supplies the fine residual rows."""
        Yc, Xc = shapes[l + 1]
        Cc = chunks[l + 1]
        for c in range(Yc // Cc):
            rc0, rc1 = c * Cc, (c + 1) * Cc
            fr0, fr1 = 2 * rc0, 2 * rc1
            res = res_rows(fr0, fr1)
            q = res.reshape(Cc, 2, shapes[l][1])
            yt = q[:, 0, :] + q[:, 1, :]
            b_l[l + 1][rc0:rc1] = jnp.dot(
                yt, Rx[l][...], preferred_element_type=f32
            )

    def restrict_full(l):
        """Restriction recomputing b - A x (x changed since the last rr
        update — the prolongation added a coarse correction)."""
        restrict_rows(
            l,
            lambda fr0, fr1: (
                b_l[l][fr0:fr1] - apply_rows(l, x_l[l], fr0, fr1)
            ),
        )

    def prolong_add(l):
        """x_l += P z_{l+1}: each fine cell adds its parent's cycle
        output (read via zref_l — the fused d1 post-smooth leaves it in
        the d plane), masked by the fluid plane at level 0 only —
        coarse-level couplings toward inactive cells are zero, so junk
        is inert."""
        Yc, Xc = shapes[l + 1]
        Cc = chunks[l + 1]
        for c in range(Yc // Cc):
            rc0, rc1 = c * Cc, (c + 1) * Cc
            ew = zref_l[l + 1][rc0:rc1]
            xe = jnp.dot(ew, RxT[l][...], preferred_element_type=f32)
            out = jnp.stack([xe, xe], axis=1).reshape(2 * Cc, shapes[l][1])
            fr0, fr1 = 2 * rc0, 2 * rc1
            if l == 0 and packed0 is not None:
                flf, _ = decode0(fr0, fr1)
                out = flf * out
            x_l[l][fr0:fr1] = x_l[l][fr0:fr1] + out

    def cycle(l, dot_b: bool = False):
        """z = M^{-1} r at l = 0 (x_0 is built in z_ref; b_0 is r_ref).
        Truncated W: levels < w_depth recurse `w` times (except directly
        above the coarsest).  Returns sum(x_l[l] * b_l[l]) when dot_b
        (accumulated inside the final smoothing sweep)."""
        if l == L - 1:
            return cheby(l, coarse_degree, from_zero=True, dot_b=dot_b)
        # pre-smooth maintains rr = b - A x through its last step and
        # the first restriction consumes it IN-REGISTER (restrict_to):
        # no separate restriction pass, no rr plane write/read
        cheby(l, cheby_degree, from_zero=True, keep_rr=True,
              restrict_to=True)
        visits = w if (l < w_depth and l + 1 < L - 1) else 1

        if visits == 1:
            cycle(l + 1)
            prolong_add(l)
        else:
            # fori rather than a Python loop: the unrolled W-recursion
            # multiplies every sub-level's emitted code by its visit
            # count (1, 2, 4, 8 ... = 31 level-visits at 1024²), which
            # blew Mosaic's compile past 9 minutes; looping the visits
            # emits each level's body once
            def visit(i, c):
                cycle(l + 1)
                prolong_add(l)

                @pl.when(i + 1 < visits)
                def _revisit():
                    # x changed via prolong_add: recompute the residual
                    restrict_full(l)
                return c

            jax.lax.fori_loop(0, visits, visit, None)
        return cheby(l, cheby_degree, from_zero=False, dot_b=dot_b)

    return cycle, apply_rows, zref_l


def _mg_pcg_solve(shapes, chunks, max_iters: int, tol: float,
                  tol_rel: float, cheby_degree: int, coarse_degree: int,
                  w: int, w_depth: int,
                  coefs_ref, packed0, coef, Rx, RxT,
                  p_ref, iters_ref, resid_ref, r_ref,
                  z_ref, cd_ref, cr_ref, s_ref, as_ref,
                  x_l, b_l, d_l, rr_l, warm: bool = False):
    """MG-preconditioned CG given the RHS already in r_ref (which is
    consumed in place as the residual).  Writes p/iters/resid.

    `warm` (static): p_ref arrives holding the initial guess (the
    previous substep's pressure) instead of being zero-filled; it is
    re-masked to the current fluid plane (decoded from packed0) and the
    initial residual becomes b - A p0.  The stopping tolerance stays
    anchored to ||b||_inf — exactly the cold solve's target."""
    f32 = jnp.float32
    cycle, apply_rows, zref_l = make_mg_cycle(
        shapes, chunks, cheby_degree, coarse_degree, w, w_depth,
        coefs_ref, packed0, coef, Rx, RxT, x_l, b_l, d_l, rr_l,
    )
    zr0 = zref_l[0]  # where the cycle leaves z (d plane for degree 1)

    # ---- PCG (stopping rule of main.c:738-767) ----
    # Loop shape (round 5): the preconditioner cycle sits at the TOP of
    # the body, so (a) its code is emitted ONCE (the old pre-loop
    # "initial cycle" duplicated the whole cycle program), (b) the loop
    # exits right after the convergence check — the old body ran a dead
    # cycle + dots + s-update on its final iteration, ~1 cycle of ~17
    # wasted per solve — and (c) the residual max rides the carry, so no
    # post-loop r sweep.  s (and the running A s plane) start at zero:
    # the first iteration's beta multiplies them by a garbage-but-finite
    # coefficient with exact-zero operands, yielding s = z, As = A z —
    # bit-exact classical PCG.  A s is maintained by the linearity
    # recurrence A s' = A z + beta (A s) (the pcg_stream_kernel pattern),
    # fusing the old s-update sweep into the apply+dot sweep.
    Y0, X0 = shapes[0]
    C0 = chunks[0]
    nchunks0 = Y0 // C0

    rmax0 = jnp.zeros((), f32)
    for c in range(nchunks0):
        r0, r1 = c * C0, (c + 1) * C0
        if not warm:
            p_ref[r0:r1] = jnp.zeros((C0, X0), f32)
        s_ref[r0:r1] = jnp.zeros((C0, X0), f32)
        as_ref[r0:r1] = jnp.zeros((C0, X0), f32)
        rmax0 = jnp.maximum(rmax0, jnp.max(jnp.abs(r_ref[r0:r1])))
    nonzero = rmax0 != 0.0
    tol_eff = jnp.maximum(jnp.asarray(tol, f32),
                          jnp.asarray(tol_rel, f32) * rmax0)

    if warm:
        assert packed0 is not None, "warm start needs the packed plane"
        # mask the guess to the CURRENT fluid (markers moved since the
        # pressure was solved), zero it on an all-zero RHS (the result
        # must be p = 0 exactly, e.g. inactive substeps), THEN subtract
        # A p0 — a separate sweep so apply_rows' cross-chunk neighbour
        # rows never read half-updated p
        on = jnp.where(nonzero, 1.0, 0.0)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            fl = jnp.where(packed0[r0:r1] >= 8.0, 1.0, 0.0)
            p_ref[r0:r1] = p_ref[r0:r1] * fl * on
        rwarm = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            r = r_ref[r0:r1] - apply_rows(0, p_ref, r0, r1)
            r_ref[r0:r1] = r
            rwarm = jnp.maximum(rwarm, jnp.max(jnp.abs(r)))
        # the guess may already satisfy the tolerance (NaN-robust form);
        # all_zero early-out (main.c:742) folds in via ~nonzero — the
        # inactive-substep fast path (sim.py dt_proj = inf) produces an
        # exactly-zero RHS every discarded substep
        done0 = (~nonzero) | jnp.logical_not(rwarm > tol_eff)
        rmax_init = rwarm
    else:
        done0 = ~nonzero
        rmax_init = rmax0

    def cond(carry):
        sigma, i, done, rmax = carry
        return (~done) & (i < max_iters)

    def body(carry):
        sigma, i, done, _rmax = carry
        # z = M^{-1} r and sigma_new = <z, r> in the same cycle
        sigma_new = cycle(0, dot_b=True)
        beta = sigma_new / jnp.where(sigma != 0, sigma, 1.0)

        # s' = z + beta s; As' = A z + beta As; zs = <As', s'>
        zs = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            Az = apply_rows(0, zr0, r0, r1)
            s_new = zr0[r0:r1] + beta * s_ref[r0:r1]
            as_new = Az + beta * as_ref[r0:r1]
            s_ref[r0:r1] = s_new
            as_ref[r0:r1] = as_new
            zs = zs + jnp.sum(as_new * s_new)
        alpha = sigma_new / jnp.where(zs != 0, zs, 1.0)

        rmax = jnp.zeros((), f32)
        for c in range(nchunks0):
            r0, r1 = c * C0, (c + 1) * C0
            p_ref[r0:r1] = p_ref[r0:r1] + alpha * s_ref[r0:r1]
            r = r_ref[r0:r1] - alpha * as_ref[r0:r1]
            r_ref[r0:r1] = r
            rmax = jnp.maximum(rmax, jnp.max(jnp.abs(r)))
        # NaN-robust (see project.py)
        conv = jnp.logical_not(rmax > tol_eff)
        return (sigma_new, i + 1, conv, rmax)

    _, i, _, rmax_f = jax.lax.while_loop(
        cond, body, (jnp.zeros((), f32), jnp.int32(0), done0, rmax_init)
    )
    iters_ref[0, 0] = i
    resid_ref[0, 0] = rmax_f


def mg_coarse_bundle(cfg: SimConfig, a_diag, fluid):
    """The coarse-level half of `mg_host_operands`, as a reusable pytree:
    (coarse edge-weight planes, coarse Gershgorin bounds).

    With cfg.solver.mg_frame_hierarchy the frame loop builds this ONCE
    from the frame's incoming fluid mask and every substep's solve
    reuses it — a STALE preconditioner.  Validity: PCG only needs the
    preconditioner to be a fixed SPD operator within one solve; the
    Krylov-side fine operator (packed0) and the fine Chebyshev row are
    always rebuilt from the CURRENT mask, so the solve still converges
    to the true tol_rel residual of the current system — staleness can
    only cost iterations, never correctness.  The per-substep Galerkin
    rebuild profiled at 45% of the round-4 frame (PERF.md round 5);
    this trades 7/8 of its residue for a few extra PCG iterations."""
    from euler_tpu.ops.multigrid import build_galerkin_hierarchy

    f = jnp.float32
    levels = build_galerkin_hierarchy(
        a_diag, fluid, f, min_size=cfg.solver.mg_min_size
    )
    coef_planes = []
    for lv in levels[1:]:
        coef_planes += [lv.c, lv.e, lv.n]
    coarse_lmax = [lv.lmax for lv in levels[1:]]
    return tuple(coef_planes), tuple(coarse_lmax)


def mg_host_operands(cfg: SimConfig, a_diag, fluid, coarse=None):
    """Host-side (XLA) operand construction shared by the standalone MG
    solver and the fused-substep kernel: level shapes/chunks, the packed
    level-0 plane, the Galerkin coarse edge-weight planes, the Chebyshev
    coefficient rows (SMEM), and the lane-transfer matrices.

    `coarse` (optional, from `mg_coarse_bundle`) substitutes precomputed
    coarse planes/bounds and skips the per-substep Galerkin rebuild; the
    fine level (packed0 + its Chebyshev row) is always current — an
    under-estimated fine lmax makes Chebyshev diverge, so the fine
    Gershgorin bound is never reused across masks."""
    from euler_tpu.ops.multigrid import (
        build_galerkin_hierarchy,
        fine_edge_level,
    )

    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    shapes = tuple(_level_shapes(Y, X, cfg.solver.mg_min_size))
    L = len(shapes)
    chunks = tuple(_chunk_rows(Yl, Xl) for Yl, Xl in shapes)

    if coarse is None:
        levels = build_galerkin_hierarchy(
            a_diag, fluid, f, min_size=cfg.solver.mg_min_size
        )
        assert len(levels) == L, (len(levels), L)
        coef_planes = []
        for lv in levels[1:]:
            coef_planes += [lv.c, lv.e, lv.n]
        lmaxs = [lv.lmax for lv in levels]
    else:
        coef_planes, coarse_lmax = coarse
        coef_planes = list(coef_planes)
        assert len(coef_planes) == 3 * (L - 1), (len(coef_planes), L)
        lmaxs = [fine_edge_level(a_diag, fluid, f).lmax] + list(coarse_lmax)
    # level 0 enters as the packed PCG-matrix plane (shared with the
    # Jacobi kernel's encoding); coarse levels as edge-weight planes
    packed0 = a_diag.astype(f) * fluid.astype(f) + 8.0 * fluid.astype(f)
    # Chebyshev schedules, precomputed OUTSIDE the kernel (pure functions
    # of each level's Gershgorin bound): one SMEM row per level,
    # [inv_theta, c_prev_0, c_r_0, c_prev_1, c_r_1, ...].  The coarsest
    # row carries the coarse-solve schedule.
    deg_s = cfg.solver.mg_cheby_degree
    deg_c = cfg.solver.mg_coarse_iters
    ncoef = 1 + 2 * max(deg_s, deg_c)
    rows = []
    for l, lmax in enumerate(lmaxs):
        if l == L - 1:
            it, cf = cheby_coefficients(
                lmax.astype(f), deg_c, float(cfg.solver.mg_coarse_ratio))
        else:
            it, cf = cheby_coefficients(
                lmax.astype(f), deg_s, float(cfg.solver.mg_cheby_ratio))
        vals = [it] + [v for pair in cf for v in pair]
        vals += [jnp.zeros((), f)] * (ncoef - len(vals))
        rows.append(jnp.stack([jnp.asarray(v, f) for v in vals]))
    coef_rows = jnp.stack(rows)  # [L, ncoef] f32, SMEM

    Rx = [jnp.asarray(_pair_matrix(shapes[l][1], shapes[l + 1][1]))
          for l in range(L - 1)]
    RxT = [jnp.swapaxes(m, 0, 1) for m in Rx]
    return shapes, chunks, packed0, coef_planes, coef_rows, Rx, RxT


def mg_scratch_shapes(shapes):
    """VMEM scratch list matching _unpack_mg_refs' tail: z/cd/cr/s/As at
    level 0 plus the coarse-level x/b/d/rr iterate planes."""
    f = jnp.float32
    L = len(shapes)
    return (
        [pltpu.VMEM(shapes[0], f)] * 5
        + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # x_l
        + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # b_l
        + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # d_l
        + [pltpu.VMEM(shapes[l], f) for l in range(1, L)]   # rr_l
    )


@functools.partial(jax.jit, static_argnums=(0, 5))
def solve_pressure_mg_pallas(cfg: SimConfig, b, a_diag, fluid, solid,
                             interpret: bool = False, x0=None):
    """One-launch Galerkin MG-PCG.  Returns (p, iterations, residual),
    same contract as ops.project.solve_pressure.  `x0` (optional)
    warm-starts the PCG iteration (see _mg_pcg_solve)."""
    Y, X = cfg.ny, cfg.nx
    f = jnp.float32
    (shapes, chunks, packed0, coef_planes, coef_rows, Rx,
     RxT) = mg_host_operands(cfg, a_diag, fluid)
    L = len(shapes)
    warm = x0 is not None

    kernel = functools.partial(
        _mg_kernel, shapes, chunks,
        cfg.solver.max_iterations, float(cfg.solver.tol),
        float(cfg.solver.tol_rel),
        cfg.solver.mg_cheby_degree, float(cfg.solver.mg_cheby_ratio),
        cfg.solver.mg_coarse_iters, float(cfg.solver.mg_coarse_ratio),
        2 if cfg.solver.mg_cycle == "w" else 1,
        cfg.solver.mg_w_depth, warm,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_in = 1 + 1 + 1 + 3 * (L - 1) + 2 * (L - 1) + (1 if warm else 0)
    in_specs = [vmem, smem] + [vmem] * (n_in - 2)
    operands = [b.astype(f), coef_rows, packed0, *coef_planes, *Rx, *RxT]
    aliases = {0: 3}  # b buffer becomes the residual
    if warm:
        operands.append(x0.astype(f))
        aliases[n_in - 1] = 0  # the guess buffer becomes p
    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Y, X), f),          # p
            jax.ShapeDtypeStruct((1, 1), jnp.int32),  # iters
            jax.ShapeDtypeStruct((1, 1), f),          # resid
            jax.ShapeDtypeStruct((Y, X), f),          # r (aliases b)
        ],
        in_specs=in_specs,
        out_specs=[vmem, smem, smem, vmem],
        input_output_aliases=aliases,
        scratch_shapes=mg_scratch_shapes(shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    p, iters, resid, _r = out
    return p, iters[0, 0], resid[0, 0]


def mg_pallas_fits(cfg: SimConfig) -> bool:
    """f32 + mg + galerkin + cheby only; every level size must stay even
    down to min_size (no padding in-kernel) and ~10.5 fine-plane
    equivalents must fit (9 fine-level planes + the coarse hierarchy's
    coefficient and iterate planes)."""
    if not (cfg.solver.preconditioner == "mg"
            and cfg.solver.dtype == "float32"
            and cfg.solver.mg_scheme == "galerkin"
            and cfg.solver.mg_smoother == "cheby"):
        return False
    shapes = _level_shapes(cfg.ny, cfg.nx, cfg.solver.mg_min_size)
    Yl, Xl = shapes[-1]
    if min(Yl, Xl) > cfg.solver.mg_min_size:
        return False  # hit an odd size before reaching the coarsest level
    return int(cfg.ny * cfg.nx * 4 * 10.5) <= _VMEM_BUDGET

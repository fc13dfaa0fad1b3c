"""Incomplete-Cholesky IC(0) preconditioner via anti-diagonal wavefronts.

The reference preconditions PCG with IC(0) (apply_preconditioner,
/root/reference/main.c:580-627): an E_inv recurrence plus forward/back
triangular solves, all loop-carried in both x and y.  Those recurrences
only couple a cell to its left and below neighbours, so cells on one
anti-diagonal (x + y = d) are independent given diagonal d-1 — the
classic wavefront parallelisation.  Each of the X+Y-1 steps is a masked
dense update, which keeps it jittable but costs O(N^1.5) total work:
fine at reference scale, not recommended at 1024²+ (use "jacobi").

One deliberate deviation: the reference's g_precon is a never-cleared
global, so its E_inv terms can read stale values from earlier solves at
cells that are no longer fluid (see tests/oracle/oracle.py for the full
analysis).  Here precon is recomputed from zeros each solve — identical
to the reference's very first projection, and a strictly better
preconditioner thereafter; the converged pressure agrees either way via
the tolerance-based stopping rule (main.c:756).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from euler_tpu.core.state import shift_down, shift_left, shift_right, shift_up


def _diag_mask(shape, d):
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (yy + xx) == d


def make_ic0_preconditioner(a_diag, fluid, dtype):
    """Returns z = M^{-1} r implementing main.c:580-627."""
    Y, X = fluid.shape
    n_diag = Y + X - 1
    a = a_diag.astype(dtype)

    # E_inv (main.c:586-600): e = a - (precon_left)^2 - (precon_below)^2,
    # guarded by e < 0.25 a -> e = a (or 1 when a == 0).
    def precon_step(d, precon):
        mask = _diag_mask((Y, X), d) & fluid
        b = shift_left(precon)
        c = shift_down(precon)
        e = a - b * b - c * c
        guard = e < 0.25 * a
        e = jnp.where(guard, jnp.where(a != 0, a, 1.0), e)
        val = jax.lax.rsqrt(e)
        return jnp.where(mask, val, precon)

    precon = jax.lax.fori_loop(
        0, n_diag, precon_step, jnp.zeros((Y, X), dtype)
    )

    def apply(r):
        # forward solve Lq = r (main.c:602-613): wavefront ascending
        def fwd(d, q):
            mask = _diag_mask((Y, X), d) & fluid
            t = r + shift_left(precon) * shift_left(q) \
                + shift_down(precon) * shift_down(q)
            return jnp.where(mask, t * precon, q)

        q = jax.lax.fori_loop(0, n_diag, fwd, jnp.zeros((Y, X), dtype))

        # back solve L^T z = q (main.c:615-626): wavefront descending
        def bwd(i, z):
            d = n_diag - 1 - i
            mask = _diag_mask((Y, X), d) & fluid
            t = q + precon * shift_right(z) + precon * shift_up(z)
            return jnp.where(mask, t * precon, z)

        return jax.lax.fori_loop(0, n_diag, bwd, jnp.zeros((Y, X), dtype))

    return apply

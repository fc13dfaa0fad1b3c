"""The fused Pallas marker kernel under shard_map: multi-chip fast path.

The GSPMD spatial path (parallel/spatial.py) shards the full step but
runs the XLA marker ops — XLA cannot partition through the fused
kernel's manual HBM DMAs.  This module row-shards the domain over a mesh
axis and runs the SAME single-chip kernel per shard, with the 1-cell
marker/grid dependencies served by an explicit ppermute halo exchange
(one ICI hop per direction), so multi-chip runs keep the single-chip
kernel's roofline behaviour.

Geometry: each shard owns rows [R0, R0 + Yl).  The kernel pass needs
  * arrivals into interior cells from sources <= 1 row away, and
  * those sources marched with THEIR OWN 3x3 grid stencils,
so H >= 2 halo rows of every plane suffice; H = 8 keeps the kernel's
(8, 128)-aligned DMA windows on aligned offsets.  The kernel runs on the
padded local plane (cfg.ny = Yl + 2H) with clamp_ny/row_offset keeping
the interpolation clamps and cell indexing GLOBAL (marker positions are
global-physical), and the outputs' halo rows are cropped — every
interior cell's result is bitwise identical to the single-device kernel
(pinned in tests/test_pallas_shard.py).

Capability without a reference counterpart (SURVEY.md §2c): the
reference is single-threaded C (/root/reference/main.c).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from euler_tpu.config import SimConfig

_H = 8  # halo rows: >= 2 for correctness, 8 for DMA window alignment


def _exchange_rows(x, axis_name: str, h: int):
    """(below, above): the h neighbour edge rows along axis -2, zeros at
    the global edges (matching the single-device kernel's zero padding
    beyond the plane)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[..., -h:, :]
    bot = x[..., :h, :]
    below = jax.lax.ppermute(
        top, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    above = jax.lax.ppermute(
        bot, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    below = jnp.where(idx == 0, jnp.zeros_like(below), below)
    above = jnp.where(idx == n - 1, jnp.zeros_like(above), above)
    return below, above


def _padded(x, axis_name: str, h: int):
    below, above = _exchange_rows(x, axis_name, h)
    return jnp.concatenate([below, x, above], axis=-2)


def make_sharded_march_rebin(cfg: SimConfig, mesh: Mesh, axis: str = "y",
                             interpret: bool = False):
    """shard_map'd march_rebin_pallas over mesh[axis] (row sharding).

    Returns fn(u, v, fluid, solid, slots, dt, count, dead) ->
    (slots', count', dropped) with [.., Y, X] arrays sharded P(axis) on
    their row dim; slots is the [2K, Y, X] plane view."""
    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    n = mesh.shape[axis]
    Y = cfg.ny
    assert Y % n == 0, (Y, n)
    Yl = Y // n
    assert Yl >= _H, "shard height below the halo depth"
    cfg_local = dataclasses.replace(cfg, ny=Yl + 2 * _H)

    def local(u, v, fluid, solid, slots, dt, count, dead):
        row_off = jax.lax.axis_index(axis) * Yl - _H
        u_p, v_p, f_p, s_p, sl_p, c_p, d_p = (
            _padded(a, axis, _H)
            for a in (u, v, fluid, solid, slots, count, dead)
        )
        oslots, ocnt, odrop = march_rebin_pallas(
            cfg_local, u_p, v_p, f_p, s_p, sl_p, dt, c_p, interpret,
            dead=d_p, clamp_ny=Y, row_offset=row_off,
        )
        return (
            oslots[:, _H:_H + Yl],
            ocnt[_H:_H + Yl],
            odrop[_H:_H + Yl],
        )

    spec2 = P(axis, None)
    spec3 = P(None, axis, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec2, spec2, spec2, spec2, spec3, P(), spec2, spec2),
        out_specs=(spec3, spec2, spec2),
        # pallas_call's out ShapeDtypeStructs carry no vma annotation
        check_vma=False,
    )


def make_sharded_marker_pass(cfg: SimConfig, mesh: Mesh, axis: str = "y",
                             interpret: bool = False):
    """A drop-in for ops.markers_slots.marker_pass_slots running the
    fused kernel per shard (same state contract; pass it to
    sim.step_frame(..., marker_pass=...))."""
    from euler_tpu.ops.markers_slots import finish_marker_pass

    kernel = make_sharded_march_rebin(cfg, mesh, axis, interpret)

    def marker_pass(cfg_: SimConfig, scn, state, dt, defer_alive=False):
        assert cfg_ is cfg or cfg_ == cfg
        K, Y, X = cfg.slots_per_cell, cfg.ny, cfg.nx
        slots = state.markers.reshape(2 * K, Y, X)
        dead = (scn.sink | scn.solid).astype(slots.dtype)
        oslots, count, dropped = kernel(
            state.u, state.v, state.fluid, scn.solid, slots, dt,
            state.marker_count, dead,
        )
        return finish_marker_pass(cfg, state, oslots, count, dropped,
                                  defer_alive)

    return marker_pass


def make_spatial_step_pallas(cfg: SimConfig, mesh: Mesh, axis: str = "y",
                             interpret: bool = False):
    """jit-compiled full frame step, row-sharded over mesh[axis], with
    the marker pass on the fused Pallas kernel (shard_map + ppermute)
    and every grid op GSPMD-partitioned by XLA.  The solver runs
    whatever cfg.solver selects on the XLA path (the single-launch
    solver kernels are single-device; see PERF.md)."""
    from euler_tpu.parallel.spatial import (
        spatial_scenario_sharding,
        spatial_state_sharding,
    )
    from euler_tpu.sim import step_frame

    assert dict(zip(mesh.axis_names, mesh.devices.shape)).get("x", 1) == 1, (
        "pallas marker sharding is row-(y-)sharded; use an x=1 mesh"
    )
    marker_pass = make_sharded_marker_pass(cfg, mesh, axis, interpret)
    # the single-launch Pallas solver kernels take full-plane HBM refs —
    # single-device only; the sharded step solves on the XLA path
    solver_cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, use_pallas=False)
    )

    def step(scn, state):
        return step_frame(solver_cfg, scn, state, marker_pass=marker_pass)

    scn_sh = spatial_scenario_sharding(mesh)
    st_sh = spatial_state_sharding(mesh)
    return jax.jit(step, in_shardings=(scn_sh, st_sh), out_shardings=st_sh)


def make_dp_substep_mg(cfg: SimConfig, mesh: Mesh, axis: str = "data",
                       interpret: bool = False):
    """The mega-fused MG substep kernel (ops/pallas/substep_kernel.py)
    under a DATA-parallel shard_map: one independent scenario instance
    per device along mesh[axis], the single-launch kernel dispatched
    per shard.  This is the multi-chip configuration for batched
    serving of the fused substep — the kernel itself is single-device
    VMEM-resident; spatial decomposition of the SOLVE uses
    parallel/halo.py, and of the MARKER pass make_sharded_marker_pass.

    Returns a jitted fn:
      (dt, dt_proj, u[B], v[B], fluid[B], prev_fluid[B], solid[B],
       p0[B]) -> (u2[B], v2[B], iters[B], resid[B], msq[B], p[B])
    with B == mesh.shape[axis]."""
    from euler_tpu.ops.pallas.substep_kernel import project_substep_mg

    spec = P(axis)
    rep = P()

    def local(dt, dt_proj, u, v, fluid, prev_fluid, solid, p0):
        # one instance per device: the local batch dim is 1
        u2, v2, iters, resid, msq, p = project_substep_mg(
            cfg, dt, dt_proj, u[0], v[0], fluid[0], prev_fluid[0],
            solid[0], p0[0], interpret)
        one = lambda a: jnp.asarray(a)[None]
        return (one(u2), one(v2), one(iters), one(resid), one(msq),
                one(p))

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, spec, spec, spec, spec, spec, spec),
        out_specs=(spec,) * 6,
        check_vma=False,
    ))

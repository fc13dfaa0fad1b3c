"""Pallas fused marker advection vs the jnp slot implementation.

Runs in interpret mode on CPU.  The two paths are the same arithmetic
but compilers contract multiply-adds differently, so agreement is to a
few float32 ulps (measured max ~4e-6 on positions), not bitwise.  A
knife-edge collision branch could in principle flip under a 1-ulp
velocity change — the same sensitivity the reference acknowledges for
its own float-precision collision handling (main.c:461-463).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.presets import dam_break
from euler_tpu.ops.markers_slots import advect_markers_slots, slot_views
from euler_tpu.ops.pallas.marker_kernel import advect_markers_pallas
from euler_tpu.sim import step_frame_jit


def test_pallas_march_matches_jnp():
    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)

    dt = jnp.float32(0.035)
    ref = advect_markers_slots(cfg, scn, st, dt)
    rpx, rpy, _ = slot_views(cfg, ref)

    px, py, valid = slot_views(cfg, st)
    opx, opy = advect_markers_pallas(
        cfg, st.u, st.v, st.fluid, scn.solid, px, py, dt,
        st.marker_count, interpret=True,
    )

    valid = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(opx)[valid], np.asarray(rpx)[valid], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(opy)[valid], np.asarray(rpy)[valid], atol=1e-4
    )


def test_pallas_rebin_matches_jnp():
    """Re-binning is selection/compaction only — must match exactly."""
    from euler_tpu.ops.markers_slots import refresh_marker_counts_slots
    from euler_tpu.ops.pallas.rebin_kernel import rebin_markers_pallas

    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)
    st = advect_markers_slots(cfg, scn, st, jnp.float32(0.03))

    ref = refresh_marker_counts_slots(cfg, scn, st)

    px, py, valid = slot_views(cfg, st)
    dead = (scn.sink | scn.solid).astype(px.dtype)
    opx, opy, ova, count, dropped = rebin_markers_pallas(
        cfg, px, py, valid.astype(px.dtype), dead, interpret=True
    )

    np.testing.assert_array_equal(
        np.asarray(count), np.asarray(ref.marker_count)
    )
    # both paths count the same capacity drops (kernel emits a per-cell
    # plane so sharded callers can crop halo cells)
    assert int(dropped.sum()) == (
        int(ref.dropped_markers) - int(st.dropped_markers)
    )
    rpx, rpy, rva = slot_views(cfg, ref)
    np.testing.assert_array_equal(np.asarray(ova) != 0, np.asarray(rva))
    m = np.asarray(rva)
    np.testing.assert_array_equal(np.asarray(opx)[m], np.asarray(rpx)[m])
    np.testing.assert_array_equal(np.asarray(opy)[m], np.asarray(rpy)[m])


def test_fused_marker_pass_matches_two_kernel_path():
    """The single-launch march+rebin kernel vs the jnp slots pipeline.

    Counts/validity must match exactly; positions to f32 FMA slack (the
    fused kernel recomputes halo markers redundantly with identical
    arithmetic, so the only divergence source is compiler contraction —
    none in interpret mode, but keep the march tolerance for safety).
    """
    from euler_tpu.ops.markers_slots import refresh_marker_counts_slots
    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(3):
        st = step_frame_jit(cfg, scn, st)

    dt = jnp.float32(0.035)
    ref = refresh_marker_counts_slots(
        cfg, scn, advect_markers_slots(cfg, scn, st, dt)
    )

    K = cfg.slots_per_cell
    slots = st.markers.reshape(2 * K, cfg.ny, cfg.nx)
    dead = (scn.sink | scn.solid).astype(slots.dtype)
    oslots, count, dropped = march_rebin_pallas(
        cfg, st.u, st.v, st.fluid, scn.solid, slots, dt,
        st.marker_count, interpret=True, dead=dead,
    )
    opx, opy = oslots[:K], oslots[K:]

    np.testing.assert_array_equal(
        np.asarray(count), np.asarray(ref.marker_count)
    )
    assert int(dropped.sum()) == (
        int(ref.dropped_markers) - int(st.dropped_markers)
    )
    rpx, rpy, rva = slot_views(cfg, ref)
    m = np.asarray(rva)
    np.testing.assert_allclose(np.asarray(opx)[m], np.asarray(rpx)[m],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(opy)[m], np.asarray(rpy)[m],
                               atol=1e-4)
    assert int(count.sum()) > 1000  # the scene is actually live


def test_pallas_pcg_matches_xla():
    """Single-launch PCG vs the XLA loop: same preconditioner, same
    stopping rule — solutions agree within solver tolerance."""
    import numpy as np
    from euler_tpu.ops import project as P
    from euler_tpu.ops.pallas.pcg_kernel import solve_pressure_pallas

    N = 64
    rng = np.random.default_rng(0)
    fluid = np.zeros((N, N), bool)
    fluid[2:-2, 2:-2] = True
    solid = np.zeros((N, N), bool)
    solid[1] = True
    fluid &= ~solid
    b = (rng.standard_normal((N, N)).astype(np.float32)) * fluid
    cfg = SimConfig(
        nx=N, ny=N,
        solver=SolverConfig(max_iterations=400, tol=1e-4, dtype="float32"),
    )
    a = P.pressure_matrix_diag(cfg, jnp.asarray(solid), jnp.asarray(fluid))
    p_ref, it_ref, res_ref = P.solve_pressure(
        cfg, jnp.asarray(b), a, jnp.asarray(fluid)
    )
    p_got, it_got, res_got = solve_pressure_pallas(
        cfg, jnp.asarray(b), a, jnp.asarray(fluid), interpret=True
    )
    assert float(res_got) <= cfg.solver.tol
    assert float(res_ref) <= cfg.solver.tol
    np.testing.assert_allclose(
        np.asarray(p_got), np.asarray(p_ref), atol=5e-3
    )


def test_pallas_pcg_chunked_sweeps(monkeypatch):
    """Multi-chunk row sweeps (the 2048² VMEM path) vs the single-chunk
    kernel: same iteration count; solutions differ only by the chunked
    reductions' summation order (~1e-5)."""
    import numpy as np
    from euler_tpu.ops import project as P
    from euler_tpu.ops.pallas import pcg_kernel

    N = 64
    rng = np.random.default_rng(1)
    fluid = np.zeros((N, N), bool)
    fluid[3:-3, 2:-2] = True
    solid = np.zeros((N, N), bool)
    solid[-2] = True
    fluid &= ~solid
    b = (rng.standard_normal((N, N)).astype(np.float32)) * fluid
    cfg = SimConfig(
        nx=N, ny=N,
        solver=SolverConfig(max_iterations=200, tol=1e-4, dtype="float32"),
    )
    a = P.pressure_matrix_diag(cfg, jnp.asarray(solid), jnp.asarray(fluid))

    p1, it1, res1 = pcg_kernel.solve_pressure_pallas(
        cfg, jnp.asarray(b), a, jnp.asarray(fluid), interpret=True
    )
    monkeypatch.setattr(pcg_kernel, "_chunk_rows", lambda Y, X: Y // 4)
    pcg_kernel.solve_pressure_pallas.clear_cache()
    p4, it4, res4 = pcg_kernel.solve_pressure_pallas(
        cfg, jnp.asarray(b), a, jnp.asarray(fluid), interpret=True
    )
    pcg_kernel.solve_pressure_pallas.clear_cache()
    assert int(it1) == int(it4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p4), atol=1e-4)


def test_fused_marker_pass_kmax_branches():
    """Both kmax-specialisation branches of the fused kernel (half-depth
    when the tile's live-slot bound <= K//2, full depth otherwise) must
    match the jnp pipeline exactly.  Constructed states pin each branch:
    a 4-markers-per-cell state stays in the half branch; packing cells to
    K markers forces the full branch."""
    from euler_tpu.ops.markers_slots import refresh_marker_counts_slots
    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(2):
        st = step_frame_jit(cfg, scn, st)
    K, Y, X = cfg.slots_per_cell, cfg.ny, cfg.nx

    # pack: duplicate the first 4 slots (jittered) into slots 4..7 at
    # every cell that holds 4 markers, forcing kmax == K
    slots = np.asarray(st.markers.reshape(2 * K, Y, X)).copy()
    cnt = np.asarray(st.marker_count).copy()
    full_cells = cnt == 4
    h = cfg.side_length
    for k in range(4, K):
        for comp in (0, 1):
            src = slots[comp * K + (k - 4)]
            slots[comp * K + k] = np.where(
                full_cells, np.nextafter(src, src + h), slots[comp * K + k]
            )
    cnt = np.where(full_cells, K, cnt)
    valid = (np.arange(K)[:, None, None] < cnt[None]).reshape(-1)
    st2 = st.replace(
        markers=jnp.asarray(slots).reshape(st.markers.shape),
        marker_count=jnp.asarray(cnt),
        alive=jnp.asarray(valid).reshape(st.alive.shape),
        alive_count=jnp.asarray(int(cnt.sum()), jnp.int32),
    )
    assert int(np.max(cnt)) == K  # the full branch is the one under test

    dt = jnp.float32(0.035)
    ref = refresh_marker_counts_slots(
        cfg, scn, advect_markers_slots(cfg, scn, st2, dt)
    )
    dead = (scn.sink | scn.solid).astype(jnp.float32)
    oslots, count, dropped = march_rebin_pallas(
        cfg, st2.u, st2.v, st2.fluid, scn.solid,
        st2.markers.reshape(2 * K, Y, X), dt,
        st2.marker_count, interpret=True, dead=dead,
    )
    np.testing.assert_array_equal(
        np.asarray(count), np.asarray(ref.marker_count)
    )
    assert int(dropped.sum()) == (
        int(ref.dropped_markers) - int(st2.dropped_markers)
    )
    opx, opy = oslots[:K], oslots[K:]
    rpx, rpy, rva = slot_views(cfg, ref)
    m = np.asarray(rva)
    np.testing.assert_allclose(np.asarray(opx)[m], np.asarray(rpx)[m],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(opy)[m], np.asarray(rpy)[m],
                               atol=1e-4)


def test_padded_store_matches_per_substep_pad():
    """The persistent padded slot store (marker_padded_store) must be
    bitwise-identical to the per-substep-padded kernel over full frames:
    same counts, same live slot positions, same velocities."""
    import dataclasses

    from euler_tpu.sim import step_frame

    base = SimConfig(
        nx=64, ny=64, marker_layout="slots",
        use_pallas_markers=True, pallas_interpret=True,
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    cfg_p = dataclasses.replace(base, marker_padded_store=True)

    scn, st_a = dam_break(base)
    _, st_b = dam_break(cfg_p)
    for _ in range(3):
        st_a = step_frame(base, scn, st_a)
        st_b = step_frame(cfg_p, scn, st_b)

    np.testing.assert_array_equal(np.asarray(st_a.marker_count),
                                  np.asarray(st_b.marker_count))
    np.testing.assert_array_equal(np.asarray(st_a.u), np.asarray(st_b.u))
    np.testing.assert_array_equal(np.asarray(st_a.v), np.asarray(st_b.v))
    K = base.slots_per_cell
    pa = np.asarray(st_a.markers).reshape(2 * K, 64, 64)
    pb = np.asarray(st_b.markers).reshape(2 * K, 64, 64)
    live = (np.arange(K)[:, None, None]
            < np.asarray(st_a.marker_count)[None])
    live2 = np.concatenate([live, live], axis=0)
    np.testing.assert_array_equal(pa[live2], pb[live2])
    assert int(st_a.dropped_markers) == int(st_b.dropped_markers)


def test_interior_fast_march_matches():
    """The interior-tile fast march (marker_interior_fast: plain bilinear
    + px + dt*v, no DDA) must be bitwise-identical to the full path.  A
    full pool on a 96x384 grid with (32, 128) tiles makes the middle
    tiles' windows all-fluid/no-solid, so the fast branch really runs
    (asserted by replicating the kernel's interior condition)."""
    import dataclasses

    from euler_tpu.core.scenario import build_scenario
    from euler_tpu.core.state import u_property, v_property
    from euler_tpu.ops.markers_slots import refresh_marker_counts_slots
    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    Y, X = 96, 384
    cfg = SimConfig(
        nx=X, ny=Y, marker_layout="slots", marker_tile=(32, 128),
        solver=SolverConfig(max_iterations=20, dtype="float32"),
    )
    text = b"\n".join([b"0" * (X - 2)] * (Y - 2)) + b"\n"
    scn, st = build_scenario(text, cfg)

    # smooth non-trivial velocities, small enough to respect CFL
    yy, xx = np.mgrid[0:Y, 0:X].astype(np.float32)
    u = jnp.asarray(0.3 * np.sin(yy / 7.0) * np.cos(xx / 11.0))
    v = jnp.asarray(0.3 * np.cos(yy / 5.0) * np.sin(xx / 13.0))
    st = st.replace(u=u, v=v)
    dt = jnp.float32(0.08)

    # the middle tiles' windows must satisfy the kernel's condition
    fl = np.asarray(st.fluid)
    so = np.asarray(scn.solid)
    up = np.asarray(u_property(st.fluid))
    vp = np.asarray(v_property(st.fluid))
    TY, TX_ = 32, 128
    r0, c0 = TY, TX_   # tile (1, 1)
    win = (slice(r0 - 2, r0 + TY + 2), slice(c0 - 2, c0 + TX_ + 2))
    assert up[win].all() and vp[win].all() and not so[win].any()

    ref = refresh_marker_counts_slots(
        cfg, scn, advect_markers_slots(cfg, scn, st, dt)
    )
    K = cfg.slots_per_cell
    slots = st.markers.reshape(2 * K, Y, X)
    dead = (scn.sink | scn.solid).astype(slots.dtype)

    def run(fast):
        c = dataclasses.replace(cfg, marker_interior_fast=fast)
        return march_rebin_pallas(
            c, st.u, st.v, st.fluid, scn.solid, slots, dt,
            st.marker_count, interpret=True, dead=dead,
        )

    o_fast, cnt_fast, drop_fast = run(True)
    np.testing.assert_array_equal(np.asarray(cnt_fast),
                                  np.asarray(ref.marker_count))
    o_full, cnt_full, drop_full = run(False)
    np.testing.assert_array_equal(np.asarray(cnt_fast),
                                  np.asarray(cnt_full))
    np.testing.assert_array_equal(np.asarray(drop_fast),
                                  np.asarray(drop_full))
    live = (np.arange(K)[:, None, None] < np.asarray(cnt_full)[None])
    live2 = np.concatenate([live, live], axis=0)
    np.testing.assert_array_equal(np.asarray(o_fast)[live2],
                                  np.asarray(o_full)[live2])


def test_fused_marker_pass_deep_store_overflow():
    """K = 16 lossless store: the deep tier's SPLIT destination passes
    (primary d < 8 + gated overflow spill d in [8, 16), including
    deep-slot STAYERS) must match the jnp pipeline exactly.  Cells are
    packed to 12 markers so (a) kmax > K//2 forces the deep tier and
    (b) post-rebin counts exceed the primary depth, exercising the
    overflow pass — the round-4 full-depth tier this replaces held 2K
    accumulator planes live and OOM'd chip VMEM (MEASURE_r4.jsonl.err)."""
    from euler_tpu.ops.markers_slots import refresh_marker_counts_slots
    from euler_tpu.ops.pallas.marker_fused_kernel import march_rebin_pallas

    cfg = SimConfig(
        nx=64, ny=64, marker_layout="slots", slots_per_cell=16,
        solver=SolverConfig(max_iterations=60, dtype="float32"),
    )
    scn, st = dam_break(cfg)
    for _ in range(2):
        st = step_frame_jit(cfg, scn, st)
    K, Y, X = cfg.slots_per_cell, cfg.ny, cfg.nx

    # pack: duplicate the first 4 slots (jittered) into slots 4..11 at
    # every 4-marker cell — 12 > K//2 forces the deep tier, and a
    # neighbour's arrivals push some cells past the primary depth of 8
    slots = np.asarray(st.markers.reshape(2 * K, Y, X)).copy()
    cnt = np.asarray(st.marker_count).copy()
    full_cells = cnt == 4
    h = cfg.side_length
    for k in range(4, 12):
        for comp in (0, 1):
            src = slots[comp * K + (k % 4)]
            bump = np.nextafter(src, src + h * (1 + k))
            slots[comp * K + k] = np.where(full_cells, bump,
                                           slots[comp * K + k])
    cnt = np.where(full_cells, 12, cnt)
    valid = (np.arange(K)[:, None, None] < cnt[None]).reshape(-1)
    st2 = st.replace(
        markers=jnp.asarray(slots).reshape(st.markers.shape),
        marker_count=jnp.asarray(cnt),
        alive=jnp.asarray(valid).reshape(st.alive.shape),
        alive_count=jnp.asarray(int(cnt.sum()), jnp.int32),
    )
    assert int(np.max(cnt)) == 12  # deep tier (kmax > K//2) under test

    dt = jnp.float32(0.035)
    ref = refresh_marker_counts_slots(
        cfg, scn, advect_markers_slots(cfg, scn, st2, dt)
    )
    assert int(np.max(np.asarray(ref.marker_count))) > 8  # spill fires
    dead = (scn.sink | scn.solid).astype(jnp.float32)
    oslots, count, dropped = march_rebin_pallas(
        cfg, st2.u, st2.v, st2.fluid, scn.solid,
        st2.markers.reshape(2 * K, Y, X), dt,
        st2.marker_count, interpret=True, dead=dead,
    )
    np.testing.assert_array_equal(
        np.asarray(count), np.asarray(ref.marker_count)
    )
    assert int(dropped.sum()) == (
        int(ref.dropped_markers) - int(st2.dropped_markers)
    )
    opx, opy = oslots[:K], oslots[K:]
    rpx, rpy, rva = slot_views(cfg, ref)
    m = np.asarray(rva)
    np.testing.assert_allclose(np.asarray(opx)[m], np.asarray(rpx)[m],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(opy)[m], np.asarray(rpy)[m],
                               atol=1e-4)

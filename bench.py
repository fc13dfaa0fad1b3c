"""Headline benchmark: cell-steps/sec/chip at 1024² (BASELINE.md).

Prints the headline JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Emission contract (round 4, after BENCH_r03 timed out empty): the
headline line is printed AS SOON as the headline measurement completes.
If the jacobi speed mode also runs (--also-speed), a second JSON line
follows that repeats the full headline record plus the speed_mode_*
fields — so a first-line parser gets the headline and a tail -1 parser
gets the headline value with the extra disclosure fields; both lines
carry the same metric/value.

Robustness under a driver timeout:
  * EULER_BENCH_BUDGET_S (default 2400 s) is a soft wall-clock budget.
    A watchdog thread emits the best measurement available and exits 0
    shortly before it expires, so a compile overrun in a SECONDARY
    measurement can never eat the headline.
  * the headline itself is measured twice: a 4-frame provisional pass
    right after warm-up (the compiled program is identical, so this
    costs ~1 s) whose result the watchdog can emit if the full pass is
    still running at the budget, then the full --frames pass.
  * stderr logs the persistent-cache dir and the first-dispatch wall
    time, so a cold-cache run is diagnosable from the .err file.

vs_baseline measures against the reference's derived throughput ceiling
of ~3.2e5 cell-steps/sec (BASELINE.md: 4,000 cells x 8 substeps x 10 FPS,
pacing-bound single thread).

A cell-step is one grid cell advanced by one CFL substep of the full
pipeline (marker advection + counts + extrapolation + grid advection +
gravity + PCG projection).  Each frame runs the reference's full substep
budget (8), so cell-steps = cells * 8 * frames.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REFERENCE_CELL_STEPS_PER_SEC = 3.2e5  # BASELINE.md derived ceiling

_t0 = time.time()
_emit_lock = threading.Lock()
_provisional = None   # headline JSON dict from the 4-frame pass
_headline_out = False  # the real headline line has been printed


def _elapsed():
    return time.time() - _t0


def _budget():
    # Bare-invocation default sized to the DRIVER's kill window, which
    # is not ours to configure: round-3's driver run died rc=124 with
    # no output during a ~1680 s cold compile, round-4's died ~950 s in
    # (during the speed-mode follow-up) — so the external timeout is
    # somewhere in [950, 1680) s.  1080 puts the watchdog's exit-0
    # (budget - 20 s) comfortably inside it; measurement queues pass an
    # explicit EULER_BENCH_BUDGET_S and are unaffected.
    return float(os.environ.get("EULER_BENCH_BUDGET_S", "1080"))


def _watchdog():
    """Emit the best available result and exit 0 just before the budget
    expires.  Never lets a secondary measurement starve the headline.
    If nothing has been measured when the budget expires (cold compile
    still running), keep polling and emit/exit the moment a result
    exists — the driver's own timeout governs the truly-stuck case."""
    while True:
        remaining = _budget() - _elapsed()
        if remaining > 20:
            time.sleep(min(remaining - 20, 10))
            continue
        with _emit_lock:
            if _headline_out:
                print("bench watchdog: budget expired after headline; "
                      "skipping remaining measurements", file=sys.stderr)
                sys.stdout.flush()
                os._exit(0)
            if _provisional is not None:
                print(json.dumps(_provisional), flush=True)
                print("bench watchdog: budget expired; emitted the "
                      "best available measurement (see its note field)",
                      file=sys.stderr)
                os._exit(0)
        time.sleep(5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=20)
    # default warm-up matches the round-1 benchmark window (early-phase
    # dam break) so BENCH_r{N}.json stays comparable across rounds; the
    # JSON's active_substeps_per_frame field records the real substep
    # occupancy behind the nominal 8-substep cell-steps metric.  Use
    # --warmup-frames 48 for fully-developed flow (vmax > 60 m/s, all 8
    # substeps active; see PERF.md).
    ap.add_argument("--warmup-frames", type=int, default=4)
    ap.add_argument("--pcg-iters", type=int, default=100)
    ap.add_argument("--layout", default="slots", choices=["slots", "global"])
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas marker kernels")
    ap.add_argument("--padded-store", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="persistent padded slot store (once-per-frame "
                         "pad instead of per-substep; A/B flag)")
    # Default is the CONVERGED mode: in-kernel Galerkin MG-PCG to
    # tol_rel 1e-4 (div_inf ~0.02 at 1024²) — the headline number and
    # the solve-quality number are the same number.  --precon jacobi
    # restores the round-1/2 "speed mode" (the reference's own
    # give-up-at-100-iterations semantics, main.c:735-767), which the
    # default run also measures and discloses alongside.
    ap.add_argument("--precon", default="mg", choices=["jacobi", "mg", "none"])
    ap.add_argument("--tol-rel", type=float, default=None,
                    help="relative stopping tolerance ||r|| <= max(tol, "
                         "tol_rel*||b||); the reference's absolute 1e-6 "
                         "presumes f64 CG and is unreachable in f32 at "
                         "scale (0 restores it).  Default: 1e-4 for mg "
                         "(converged mode), 1e-6 otherwise (f32 floor)")
    ap.add_argument("--warm-start", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="seed each substep's PCG from the previous "
                         "substep's pressure (same stopping tolerance; "
                         "default: on for mg — the converged production "
                         "config; off otherwise)")
    ap.add_argument("--slots-per-cell", type=int, default=None,
                    help="slot-store depth K (default: config default, "
                         "16 = lossless; 8 = round-3 store, A/B flag)")
    ap.add_argument("--packed-insert", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="masked-rank + per-slot-gated re-binning "
                         "insertion (round 5; A/B flag)")
    ap.add_argument("--frame-hierarchy", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="rebuild the Galerkin coarse hierarchy once per "
                         "frame instead of per substep (stale "
                         "preconditioner; round 5 A/B flag, fused mg "
                         "path only)")
    ap.add_argument("--also-speed", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="after the headline (mg) line is printed, also "
                         "run the jacobi speed mode and print a second "
                         "line with speed_mode_* fields added (default: "
                         "OFF — even a warm-cache speed-mode warm-up is "
                         "~7 min of deserialize+load on this host, which "
                         "ate the driver window twice; BENCH_r03/r04 "
                         "rc=124)")
    ap.add_argument("--fuse-projection", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="one-launch fused projection kernel (when it fits)")
    ap.add_argument("--rainbow", action="store_true",
                    help="benchmark the rainbow (colour-advecting) pipeline")
    ap.add_argument("--batch", type=int, default=1,
                    help="batched independent scenario instances (vmap)")
    ap.add_argument("--frames-per-call", type=int, default=4,
                    help="frames chained inside one jitted dispatch "
                         "(amortises per-execute overhead on the "
                         "tunneled runtime; an outer lax.scan is 10-50x "
                         "slower there, but a host-side unroll is not)")
    ap.add_argument("--marker-tile", type=str, default="128x512",
                    help="fused marker kernel tile RxC, e.g. 16x256")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent XLA/Mosaic compilation cache: the one-launch solver
    # kernels take minutes of compile at 1024²+ (the in-kernel MG ~2 min)
    # — pay it once per config, not per process.
    _cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/euler_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs
    print(f"bench: compile cache {_cache} "
          f"({len(os.listdir(_cache)) if os.path.isdir(_cache) else 0} "
          f"entries), budget {_budget():.0f}s", file=sys.stderr)

    if args.tol_rel is None:
        args.tol_rel = 1e-4 if args.precon == "mg" else 1e-6
    if args.warm_start is None:
        args.warm_start = args.precon == "mg"
    threading.Thread(target=_watchdog, daemon=True).start()

    # Fallback ladder: a fresh kernel's first real Mosaic compile can
    # fail in ways interpret mode cannot catch; a crashed headline is
    # worse than a slower one.  Each rung disables one unproven kernel
    # family; the rung that succeeded is disclosed in the JSON.
    rungs = [
        ("as-configured", args.precon, args.tol_rel, {}),
        ("no-fused-substep", args.precon, args.tol_rel,
         dict(fuse_projection=False)),
        ("no-kmax-specialisation", args.precon, args.tol_rel,
         dict(fuse_projection=False, marker_kmax_specialize=False)),
        ("jacobi-conservative", "jacobi", 1e-6,
         dict(fuse_projection=False, marker_kmax_specialize=False)),
    ]
    if (args.slots_per_cell or 0) > 8:
        # degrade the parameter that is actually unproven (VERDICT r4
        # weak #3: when the K=16 store OOM'd VMEM, every solver-family
        # rung failed identically and the row zeroed) — a store-depth
        # rung right after as-configured falls back to the measured K=8
        # geometry, keeping the solver family and disclosing the drop
        rungs.insert(1, ("store-depth-8", args.precon, args.tol_rel,
                         dict(slots_per_cell=8,
                              marker_tile="128x512")))
    last_err = None
    for rung, precon_try, tol_try, overrides in rungs:
        try:
            (value, residual, active_substeps, dropped, cfg,
             precon_used) = _measure(args, precon_try, tol_try,
                                     overrides)
            break
        except Exception as e:  # noqa: BLE001 — disclose and degrade
            last_err = e
            print(f"bench rung '{rung}' failed: {e!r}", file=sys.stderr)
    else:
        raise last_err
    if precon_used != precon_try:
        # mg's single-launch kernels don't cover this geometry; the
        # measurement fell back to the jacobi speed kernel — disclose
        args.tol_rel = 1e-6
        args.also_speed = False
    args.precon = precon_used
    fallback = {} if rung == "as-configured" else {"fallback_rung": rung}

    # ---- headline out, immediately ----
    headline = _headline_record(args, cfg, value, residual,
                                active_substeps, dropped, fallback)
    global _headline_out
    with _emit_lock:
        print(json.dumps(headline), flush=True)
        _headline_out = True

    # ---- optional speed-mode follow-up (second, superset line) ----
    # Budget gate: a warm speed-mode run is ~1-2 min; only attempt it
    # while at least 40% of the budget remains.  The rung that measured
    # the headline carries over — re-enabling a kernel family that just
    # failed would waste the remaining budget on a doomed compile
    # (ADVICE r3).
    if args.also_speed and precon_used == "mg":
        if _elapsed() > 0.6 * _budget():
            print("bench: skipping speed mode "
                  f"({_elapsed():.0f}s of {_budget():.0f}s used)",
                  file=sys.stderr)
            return
        speed_fields = dict(fallback)
        try:
            s_value, s_residual, _, _, _, _ = _measure(
                args, "jacobi", 1e-6, overrides)
            speed_fields.update({
                # the round-1/2 headline config: reference iteration
                # budget, solve gives up at 100 iterations
                # (main.c:735-767 semantics)
                "speed_mode_cell_steps_per_sec": s_value,
                "speed_mode_div_inf": s_residual,
                "speed_mode_precon": "jacobi",
            })
        except Exception as e:  # noqa: BLE001 — secondary measurement
            print(f"speed-mode measurement failed: {e!r}", file=sys.stderr)
            speed_fields["speed_mode_error"] = repr(e)[:200]
        with _emit_lock:
            print(json.dumps({**headline, **speed_fields}), flush=True)


def _measure(args, precon, tol_rel, overrides=None):
    import jax

    from euler_tpu.config import SimConfig, SolverConfig
    from euler_tpu.core.presets import dam_break
    from euler_tpu.sim import step_frame_jit

    frames, warmup_frames = args.frames, args.warmup_frames
    ov = dict(overrides or {})
    fuse_projection = ov.pop("fuse_projection", args.fuse_projection)
    kmax_spec = ov.pop("marker_kmax_specialize", True)
    slots_override = ov.pop("slots_per_cell", None)
    tile_override = ov.pop("marker_tile", None)
    assert not ov, ov

    def build_cfg(precon, tol_rel):
        slots = (slots_override if slots_override is not None
                 else args.slots_per_cell)
        slots_kw = {} if slots is None else {"slots_per_cell": slots}
        tile = tile_override or args.marker_tile
        return SimConfig(
            nx=args.size,
            ny=args.size,
            marker_layout=args.layout,
            **slots_kw,
            marker_tile=tuple(int(v) for v in tile.split("x")),
            rainbow=args.rainbow,
            use_pallas_markers=args.pallas and not args.cpu,
            marker_padded_store=(args.padded_store and args.pallas
                                 and not args.cpu and args.batch == 1),
            marker_kmax_specialize=kmax_spec,
            marker_packed_insert=args.packed_insert,
            solver=SolverConfig(
                max_iterations=args.pcg_iters,
                tol=1e-6,
                tol_rel=tol_rel,
                dtype="float32",
                preconditioner=precon,
                use_pallas=args.pallas and not args.cpu,
                fuse_projection=fuse_projection,
                # warm start only helps converged solves; the jacobi
                # speed mode is iteration-budget-bound and ignores it
                warm_start=args.warm_start and precon == "mg",
                mg_frame_hierarchy=args.frame_hierarchy,
            ),
        )

    cfg = build_cfg(precon, tol_rel)
    if precon == "mg" and cfg.solver.use_pallas:
        from euler_tpu.ops.pallas.mg_kernel import mg_pallas_fits
        from euler_tpu.ops.pallas.mg_stream_kernel import stream_mg_fits

        if not (mg_pallas_fits(cfg) or stream_mg_fits(cfg)):
            # no single-launch MG form fits this geometry and the XLA
            # multigrid loop is launch-bound (minutes per frame) — fall
            # back to the jacobi speed kernel rather than silently
            # measuring it
            precon, tol_rel = "jacobi", 1e-6
            cfg = build_cfg(precon, tol_rel)
    frames_per_call = args.frames_per_call
    if args.batch > 1:
        # B independent instances stepped by ONE compiled per-frame
        # program, round-robin host dispatch (pipelined).  vmap over the
        # fused marker kernel trips XLA's scoped-vmem accounting for
        # custom calls at 1024² (a 16 MB stack limit the tunnel offers
        # no flag for); host-level data parallelism measures the same
        # aggregate-throughput question without it.  jax.vmap batching
        # of the full step remains supported (parallel/batch.py,
        # test_parallel.py) and is what a multi-chip data-parallel mesh
        # uses — this is purely the single-chip benchmark harness.
        frames_per_call = 1
        from euler_tpu.parallel.spatial import to_spatial

        pairs = [dam_break(cfg, seed=i) for i in range(args.batch)]
        scns = [p[0] for p in pairs]
        states = [to_spatial(cfg, p[1]) if args.layout == "slots" else p[1]
                  for p in pairs]
        step_one = lambda scn, state: step_frame_jit(cfg, scn, state)
    else:
        scn, state = dam_break(cfg)
        if args.layout == "slots":
            # spatial [2, K, Y, X] slot planes: the TPU-native store — the
            # fused kernel's [2K, Y, X] view is a true bitcast of it
            # (flat [2, M] is T(2,128)-tiled and costs a ~5 ms/frame
            # relayout at 1024², see PERF.md)
            from euler_tpu.parallel.spatial import to_spatial

            state = to_spatial(cfg, state)
        if frames_per_call > 1:
            from euler_tpu.sim import step_frame

            def _chain(scn, state, _n=frames_per_call):
                for _ in range(_n):
                    state = step_frame(cfg, scn, state)
                return state

            step_fn = jax.jit(_chain)
            if frames % frames_per_call:
                frames = max(frames_per_call,
                             frames - frames % frames_per_call)
            frames //= frames_per_call
            warmup_frames = max(1, warmup_frames // frames_per_call)
        else:
            step_fn = lambda scn, state: step_frame_jit(cfg, scn, state)

    def sync(state):
        # host reads of values data-dependent on the whole step: a true
        # barrier (block_until_ready is unreliable over remote runtimes)
        return float(state.u.sum()) + float(state.markers.sum())

    # Host loop over one jitted frame: calls dispatch asynchronously and
    # pipeline, with a single sync at the end.  (An outer lax.scan over
    # frames measures an order of magnitude slower on the tunneled
    # runtime than the identical per-frame program.)
    cells = cfg.nx * cfg.ny

    def run(n_calls, states_or_state):
        t0 = time.perf_counter()
        if args.batch > 1:
            states = states_or_state
            for _ in range(n_calls):
                states = [step_one(s_, st) for s_, st in zip(scns, states)]
            for st in states:
                sync(st)
            return states, time.perf_counter() - t0
        state = states_or_state
        for _ in range(n_calls):
            state = step_fn(scn, state)
        sync(state)
        return state, time.perf_counter() - t0

    tw0 = time.perf_counter()
    if args.batch > 1:
        states, _ = run(max(warmup_frames, 1), states)
        cur = states
    else:
        state, _ = run(max(warmup_frames, 1), state)
        cur = state
    print(f"bench: warmup (compile) took {time.perf_counter() - tw0:.1f}s",
          file=sys.stderr)

    # provisional short pass: same compiled program, ~1 s — gives the
    # watchdog a real measured headline if the full pass overruns
    per_call = max(frames_per_call, 1) * args.batch
    prov_calls = max(1, 4 // per_call)
    cur, prov_elapsed = run(prov_calls, cur)
    prov_value = (cells * cfg.max_substeps * prov_calls * per_call
                  / prov_elapsed)
    global _provisional
    _provisional = {
        "metric": _metric_name(args),
        "value": prov_value,
        "unit": "cell-steps/s",
        "vs_baseline": prov_value / REFERENCE_CELL_STEPS_PER_SEC,
        "precon": precon,
        "provisional_frames": prov_calls * per_call,
        "note": "4-frame provisional emitted by the budget watchdog",
    }

    cur, elapsed = run(frames, cur)
    state = cur[0] if args.batch > 1 else cur

    total_frames = frames * max(frames_per_call, 1)
    cell_steps = cells * cfg.max_substeps * total_frames * args.batch
    value = cell_steps / elapsed

    # The full pass is measured: make it the watchdog's emission NOW.
    # The quality probes below (div_inf, step_frame_stats) are fresh
    # compiles on a cold cache; if the budget expires inside one, the
    # watchdog must degrade to "probes missing", never "measurement
    # lost" (this exact failure ate the r5f headline row: a 2327 s
    # warmup compile + the stats-probe recompile outran the budget and
    # only the 4-frame provisional survived).
    _provisional = {
        "metric": _metric_name(args),
        "value": value,
        "unit": "cell-steps/s",
        "vs_baseline": value / REFERENCE_CELL_STEPS_PER_SEC,
        "precon": precon,
        "measured_frames": total_frames * args.batch,
        "note": "full measured pass; budget expired during the "
                "post-pass quality probes (div_inf/substep occupancy "
                "missing, throughput number is final)",
    }

    # solve-quality probe: inf-norm of the fluid-masked velocity
    # divergence after the final projection, so the JSON records what
    # solve fidelity sits behind the throughput number
    import jax.numpy as jnp

    from euler_tpu.ops.project import divergence_rhs

    @jax.jit
    def div_inf(state):
        fluid = state.marker_count > 0
        b = divergence_rhs(cfg, state.u, state.v, fluid,
                           jnp.asarray(1.0, state.u.dtype))
        return jnp.max(jnp.abs(b))

    if args.batch > 1:
        residual = max(float(div_inf(st)) for st in cur)
        dropped = sum(int(st.dropped_markers) for st in cur)
        active_substeps = None
    else:
        dropped = int(state.dropped_markers)
        residual = float(div_inf(state))
        _provisional["post_projection_div_inf"] = residual
        # transparency: how many of the nominal max_substeps the NEXT
        # frame actually runs (the reference's data-dependent substep
        # loop, main.c:851; inactive substeps are near-free no-ops).
        # This jit is a second full-frame program — a multi-minute
        # compile when the cache is cold — so only attempt it with
        # real budget headroom.
        if _elapsed() > 0.5 * _budget():
            print("bench: skipping the substep-occupancy probe "
                  f"({_elapsed():.0f}s of {_budget():.0f}s used; it "
                  "recompiles the full frame)", file=sys.stderr)
            active_substeps = None
        else:
            from euler_tpu.sim import step_frame_stats

            _, n_active = jax.jit(step_frame_stats, static_argnums=0)(
                cfg, scn, state
            )
            active_substeps = int(n_active)

    return value, residual, active_substeps, dropped, cfg, precon


def _metric_name(args):
    suffix = f" x{args.batch}" if args.batch > 1 else ""
    if args.rainbow:
        suffix += " rainbow"
    return f"cell-steps/sec/chip at {args.size}^2{suffix}"


def _headline_record(args, cfg, value, residual, active_substeps, dropped,
                     extra):
    return {
        "metric": _metric_name(args),
        "value": value,
        "unit": "cell-steps/s",
        "vs_baseline": value / REFERENCE_CELL_STEPS_PER_SEC,
        "precon": args.precon,
        "pcg_iters_budget": args.pcg_iters,
        "post_projection_div_inf": residual,
        "active_substeps_per_frame": active_substeps,
        # the headline metric counts the nominal substep budget
        # (cells x max_substeps x frames); this folds in the real
        # substep occupancy so the active-work rate is explicit
        "active_cell_steps_per_sec": (
            value * active_substeps / cfg.max_substeps
            if active_substeps is not None else None
        ),
        "max_substeps": cfg.max_substeps,
        # slot-capacity drops over the whole run (the slots
        # layout's documented deviation from main.c:92-97) —
        # continuously measured, not a one-off claim
        "dropped_markers": dropped,
        # the store depth that actually measured (a store-depth-8
        # fallback rung differs from the configured --slots-per-cell)
        "slots_per_cell": cfg.slots_per_cell,
        "tol_rel": args.tol_rel,
        "warm_start": bool(args.warm_start and args.precon == "mg"),
        # whether the dispatched solver actually CONSUMES the guess:
        # the resident MG forms (fused substep / mg_kernel) and the XLA
        # path honour x0; the HBM-streamed MG at 2048²+ ignores it
        # (solve_pressure docstring) — ADVICE r4
        "warm_start_effective": _warm_start_effective(args, cfg),
        "frame_hierarchy": bool(cfg.solver.mg_frame_hierarchy),
        **extra,
    }


def _warm_start_effective(args, cfg):
    if not (args.warm_start and args.precon == "mg"):
        return False
    if not cfg.solver.use_pallas:
        return True
    from euler_tpu.ops.pallas.mg_kernel import mg_pallas_fits

    return bool(mg_pallas_fits(cfg))


if __name__ == "__main__":
    main()

"""Per-kernel frame-time breakdown on the real chip (PERF.md roofline).

Runs the benchmark workload under jax.profiler, then aggregates device
kernel durations from the trace-viewer dump into a per-frame budget:

    python tools/profile_step.py --size 1024 --frames 5

Prints one line per kernel group (time/frame, share) plus totals, the
numbers behind PERF.md's roofline section.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_workload(args):
    import jax

    # same persistent compile cache as bench.py — an mg-kernel compile
    # is ~25 min at 1024², pay it once per config
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/euler_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from euler_tpu.config import SimConfig, SolverConfig
    from euler_tpu.core.presets import dam_break
    from euler_tpu.sim import step_frame_jit

    cfg = SimConfig(
        nx=args.size,
        ny=args.size,
        marker_layout="slots",
        rainbow=args.rainbow,
        use_pallas_markers=True,
        solver=SolverConfig(max_iterations=100, tol=1e-6,
                            tol_rel=args.tol_rel,
                            dtype="float32", preconditioner=args.precon,
                            use_pallas=True,
                            fuse_projection=args.fuse_projection),
    )
    scn, state = dam_break(cfg)
    from euler_tpu.parallel.spatial import to_spatial

    state = to_spatial(cfg, state)

    if args.frames_per_call > 1:
        # mirror bench.py's chained-dispatch program EXACTLY so the
        # persistent compile cache built by a bench run is reused
        from euler_tpu.sim import step_frame

        def _chain(scn, state, _n=args.frames_per_call):
            for _ in range(_n):
                state = step_frame(cfg, scn, state)
            return state

        step_chain = jax.jit(_chain)
        step_frame_jit = lambda c, s, st: step_chain(s, st)  # noqa: E731
        args.frames = max(1, args.frames // args.frames_per_call)
        args.warmup = max(1, args.warmup // args.frames_per_call)

    def sync(state):
        return float(state.u.sum()) + float(state.markers.sum())

    for _ in range(args.warmup):
        state = step_frame_jit(cfg, scn, state)
    sync(state)

    logdir = args.logdir
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        state = step_frame_jit(cfg, scn, state)
    sync(state)
    elapsed = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return elapsed


GROUPS = [
    ("marker fused (march+rebin)", re.compile(r"fused_kernel|march_rebin")),
    ("marker march", re.compile(r"marker_kernel|advect_markers")),
    ("marker rebin", re.compile(r"rebin")),
    ("pcg solve", re.compile(r"pcg")),
    ("mg solve", re.compile(r"mg_kernel|_mg_")),
    ("grid stage (pallas)", re.compile(r"grid_stage")),
    ("fusion (XLA grid ops)", re.compile(r"^(fusion|loop_fusion|input_fusion)")),
    ("copy/reshape", re.compile(r"copy|bitcast|reshape|transpose")),
    ("convert/select", re.compile(r"convert|select|broadcast")),
    ("reduce", re.compile(r"reduce|all_reduce")),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic")),
]


def aggregate(logdir: str, frames: int):
    files = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert files, f"no trace files under {logdir}"
    events = []
    for path in files:
        with gzip.open(path, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))

    # device-side complete events only: pid names containing "TPU" and
    # thread names that are XLA op streams; heuristically, keep events
    # with 'dur' and args containing 'long_name' or kernel-ish names
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device:" in name or "Chip" in name
    }

    totals: dict[str, float] = {}
    by_name: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        by_name[name] = by_name.get(name, 0.0) + e["dur"]

    grouped: dict[str, float] = {}
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1]):
        for label, pat in GROUPS:
            if pat.search(name):
                grouped[label] = grouped.get(label, 0.0) + us
                break
        else:
            grouped.setdefault("other", 0.0)
            grouped["other"] += us
    return by_name, grouped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--rainbow", action="store_true")
    ap.add_argument("--precon", default="jacobi")
    ap.add_argument("--tol-rel", type=float, default=1e-6)
    ap.add_argument("--fuse-projection", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--frames-per-call", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/euler_tpu_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    elapsed = run_workload(args)
    print(f"wall: {elapsed / args.frames * 1e3:.2f} ms/frame "
          f"({args.frames} frames)")

    by_name, grouped = aggregate(args.logdir, args.frames)
    dev_total = sum(by_name.values())
    print(f"\ndevice kernel time: {dev_total / args.frames / 1e3:.2f} ms/frame")
    print("\n== groups (ms/frame) ==")
    for label, us in sorted(grouped.items(), key=lambda kv: -kv[1]):
        print(f"{us / args.frames / 1e3:9.3f}  {100 * us / dev_total:5.1f}%  {label}")
    print(f"\n== top {args.top} kernels (ms/frame) ==")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{us / args.frames / 1e3:9.3f}  {name[:110]}")


if __name__ == "__main__":
    main()

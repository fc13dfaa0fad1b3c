"""bench.py fallback-ladder behavior.

VERDICT r4 weak #3: when the K=16 store OOM'd VMEM on chip, every rung
varied only the solver family, so all four failed identically and the
row zeroed.  The ladder now degrades the unproven parameter first: a
deep store gets a `store-depth-8` rung that keeps the solver family.
These tests force the failure and pin the recovery — no TPU needed
(the measurement is monkeypatched).
"""

import json
import sys

import pytest

sys.path.insert(0, ".")  # repo root (bench.py lives there)
import bench  # noqa: E402


def _run_main(monkeypatch, capsys, argv, fake_measure):
    monkeypatch.setattr(bench, "_measure", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py", *argv])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(line) for line in out if line.startswith("{")]


def test_store_depth_rung_recovers_from_k16_failure(monkeypatch, capsys):
    calls = []

    def fake_measure(args, precon, tol_rel, overrides=None):
        ov = dict(overrides or {})
        slots = ov.get("slots_per_cell", args.slots_per_cell)
        calls.append(slots)
        if (slots or 0) > 8:
            raise RuntimeError("forced K=16 VMEM OOM")
        cfg = bench_cfg(args, ov)
        return 1.0e8, 0.01, 8, 0, cfg, precon

    def bench_cfg(args, ov):
        from euler_tpu.config import SimConfig, SolverConfig
        return SimConfig(
            nx=args.size, ny=args.size, marker_layout="slots",
            slots_per_cell=ov.get("slots_per_cell", 8),
            solver=SolverConfig(preconditioner="mg", dtype="float32"),
        )

    recs = _run_main(
        monkeypatch, capsys,
        ["--size", "64", "--frames", "1", "--slots-per-cell", "16",
         "--no-also-speed"],
        fake_measure,
    )
    # first attempt was K=16, the recovery K=8, solver family unchanged
    assert calls[0] == 16 and calls[1] == 8, calls
    assert recs, "no headline emitted"
    rec = recs[0]
    assert rec["fallback_rung"] == "store-depth-8"
    assert rec["slots_per_cell"] == 8
    assert rec["precon"] == "mg"


def test_no_store_rung_at_default_depth(monkeypatch, capsys):
    seen = []

    def fake_measure(args, precon, tol_rel, overrides=None):
        ov = dict(overrides or {})
        seen.append(ov.get("slots_per_cell", args.slots_per_cell))
        from euler_tpu.config import SimConfig, SolverConfig
        cfg = SimConfig(
            nx=args.size, ny=args.size, marker_layout="slots",
            solver=SolverConfig(preconditioner="mg", dtype="float32"),
        )
        return 1.0e8, 0.01, 8, 0, cfg, precon

    recs = _run_main(
        monkeypatch, capsys,
        ["--size", "64", "--frames", "1", "--no-also-speed"],
        fake_measure,
    )
    assert seen == [None], seen  # first rung succeeded; no depth rung
    assert recs[0].get("fallback_rung") is None
    assert recs[0]["slots_per_cell"] == 8  # config default


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

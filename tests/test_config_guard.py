"""Parity-surface guard (VERDICT r2 weak #8).

The byte-parity tests (test_ref_binary.py, test_goldens.py) construct
configs that set only the fields they care about and inherit the rest
from the dataclass DEFAULTS — so the defaults ARE part of the parity
surface.  bench.py sets every performance knob explicitly on its own
config; this test pins the defaults to reference semantics so a future
"make the bench faster by default" change cannot silently leak into the
parity tests.  If you intentionally change a default, update BOTH this
test and the parity tests' explicit configs.
"""

from euler_tpu.config import SimConfig, SolverConfig


def test_solver_defaults_are_reference_semantics():
    s = SolverConfig()
    # main.c:735-736: absolute ||r||_inf <= 1e-6, <= 100 iterations;
    # tol_rel=0 keeps the reference's absolute-only stopping rule
    assert s.tol == 1e-6
    assert s.tol_rel == 0.0
    assert s.max_iterations == 100
    # performance kernels are opt-in, never default
    assert s.use_pallas is False
    assert s.fuse_projection is False


def test_sim_defaults_are_reference_semantics():
    c = SimConfig()
    # the exact (order-preserving) marker store is the parity artifact;
    # the slots layout (bounded per-cell capacity, a documented deviation
    # from main.c:92-97) is opt-in
    assert c.marker_layout == "global"
    # the reference's cross-marker dt leak (main.c:465-537) is semantics,
    # not an optimisation — required for the >=50-frame byte horizons
    assert c.marker_dt_carry is True
    assert c.use_pallas_markers is False
    assert c.use_pallas_grid is False
    # reference compile-time constants (main.c:33-43)
    assert c.max_substeps == 8
    assert c.frame_time == 0.1
    assert c.cfl == 0.75
    assert c.dtype == "float32"


def test_bench_config_is_not_the_parity_config():
    """The benchmark's operating point must differ from the defaults in
    exactly the knobs it sets — i.e. constructing a SimConfig the way
    test_ref_binary does must NOT pick up slots/pallas/tol_rel."""
    parity = SimConfig(solver=SolverConfig(dtype="float64",
                                           max_iterations=400))
    assert parity.marker_layout == "global"
    assert parity.solver.tol_rel == 0.0
    assert parity.solver.use_pallas is False
    assert parity.solver.preconditioner == "jacobi"

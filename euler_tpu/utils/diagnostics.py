"""Debug and observability utilities.

The reference's equivalents:
  * debug-inl.h:18-85 — Octave-format dumps of the pressure matrix and
    grids (bit-rotted there; functional here, SURVEY.md §2 #25);
  * SHERLOCK build option / enable_fpmath_asserts (misc/debug.c:4-10) —
    trap-on-NaN, mapped to jax_debug_nans;
  * no profiling beyond frame pacing — here: step timing and
    jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import io
import time

import numpy as np

from euler_tpu.config import SimConfig
from euler_tpu.ops.project import pressure_matrix_diag


def enable_fpmath_asserts() -> None:
    """SHERLOCK equivalent: raise on NaNs produced under jit
    (misc/debug.c:4-10 traps FE_INVALID etc.)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def dump_octave_matrix(name: str, m, out=None) -> str:
    """Octave text format, as debug-inl.h:18-30 intended."""
    m = np.asarray(m)
    buf = out or io.StringIO()
    buf.write(f"# name: {name}\n# type: matrix\n")
    buf.write(f"# rows: {m.shape[0]}\n# columns: {m.shape[1]}\n")
    for row in m:
        buf.write(" " + " ".join(repr(float(v)) for v in row) + "\n")
    return buf.getvalue() if out is None else ""


def dump_pressure_system(cfg: SimConfig, scn, state, dt) -> str:
    """Dump the Poisson system (A diagonal, fluid mask, RHS) for offline
    inspection — the working replacement for debug-inl.h:33-70."""
    import jax.numpy as jnp

    from euler_tpu.ops.project import divergence_rhs

    fluid = state.fluid
    a = pressure_matrix_diag(cfg, scn.solid, fluid)
    b = divergence_rhs(cfg, state.u, state.v, fluid, jnp.asarray(dt))
    out = io.StringIO()
    dump_octave_matrix("a_diag", a, out)
    dump_octave_matrix("fluid", np.asarray(fluid).astype(np.int32), out)
    dump_octave_matrix("b", b, out)
    return out.getvalue()


class StepTimer:
    """Steps/sec + cell-steps/sec counter (SURVEY.md §5 'tracing')."""

    def __init__(self, cfg: SimConfig):
        self.cfg = cfg
        self.frames = 0
        self.t0 = time.perf_counter()

    def tick(self, n: int = 1):
        self.frames += n

    @property
    def frames_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.frames / dt if dt > 0 else 0.0

    @property
    def cell_steps_per_sec(self) -> float:
        return (
            self.frames_per_sec
            * self.cfg.nx
            * self.cfg.ny
            * self.cfg.max_substeps
        )

    def summary(self) -> str:
        return (
            f"{self.frames} frames, {self.frames_per_sec:.2f} fps, "
            f"{self.cell_steps_per_sec:.3g} cell-steps/s"
        )


@contextlib.contextmanager
def profiler_trace(logdir: str = "/tmp/euler_tpu_trace"):
    """jax.profiler trace capture around a block of steps."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()

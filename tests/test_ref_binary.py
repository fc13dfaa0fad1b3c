"""Frame parity against the REAL compiled reference binary.

The corpus under tests/goldens/ref_binary/ was captured from the
gcc-compiled /root/reference binary driven in a pty
(tests/oracle/capture_ref.py) — NOT from the NumPy oracle.  This test
asserts the framework's full rendered ANSI byte stream (cursor controls,
glyphs, run-length colour state, 24-bit truecolor) is IDENTICAL to what
the C program wrote to its terminal, frame for frame.

Divergence horizons (first frame whose bytes differ vs the Release
-ffast-math corpus build; re-measured 2026-08-17):

    mono:    ALL FIVE scenarios byte-identical to the full >=50-frame corpus
    rainbow: basic >=25  block >=25  filter >=25  waterfall >=25  weird-edges 18

Both formerly-finite mono horizons were ROOT-CAUSED and closed
(2026-08-17), falsifying the earlier "fast-math codegen" explanation:

  * filter 29 / waterfall 46 — the reference's advect_markers mutates
    its dt PARAMETER on collisions and never resets it between markers
    (main.c:465-537), so one marker's wall hit shortens every later
    marker's advection in the same call.  Proven by bisection: the old
    oracle diverged from a strict-IEEE (-fno-fast-math
    -ffp-contract=off, and -O0) reference build at the same frame 29,
    and is bitwise identical (every stage, every substep, marker
    positions included) once the dt carry is replicated.  The framework
    replicates it via SimConfig.marker_dt_carry (fixpoint march) plus
    exact swap-remove deletion order (ops/markers.py).
  * weird-edges rainbow 18 — FMA contraction: against a
    -fno-fast-math -ffp-contract=fast build the framework is
    byte-identical through the full 25-frame corpus, and against
    -ffp-contract=off it diverges at 19; XLA:CPU contracts FMAs like
    gcc's -ffp-contract=fast, and the -ffast-math corpus build's extra
    transforms set the 18 horizon.  Not semantically closable.

Notably this corpus adjudicated the main.c:288 unspecified-evaluation-
order question: gcc evaluates the two randf() args right-to-left (y
jitter first).  With x-first emission, waterfall diverges at frame 3.
"""

import os

import numpy as np
import pytest

from euler_tpu.config import SimConfig, SolverConfig
from euler_tpu.core.scenario import build_scenario
from euler_tpu.render.ansi import draw_frame
from euler_tpu.sim import step_frame_jit

from helpers import read_scenario

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "ref_binary")
# pty window the corpus was captured under (g_wy=60 rows, g_wx=130 cols)
WINDOW = (60, 130)

# (scenario, rainbow) -> last byte-identical frame (== full corpus length
# everywhere except weird-edges rainbow, whose horizon is FMA-contraction
# codegen — see module docstring)
HORIZONS = {
    ("basic", False): 50,
    ("block", False): 50,
    ("filter", False): 50,
    ("waterfall", False): 50,
    ("weird-edges", False): 50,
    ("basic", True): 25,
    ("block", True): 25,
    ("filter", True): 25,
    ("waterfall", True): 25,
    ("weird-edges", True): 17,
}


def unpack_blobs(raw, offsets):
    data = raw.tobytes()
    return [data[offsets[i]: offsets[i + 1]] for i in range(len(offsets) - 1)]


@pytest.mark.parametrize(
    "name,rainbow",
    sorted(HORIZONS),
    ids=lambda v: {True: "rainbow", False: "mono"}.get(v, v),
)
def test_bytes_match_reference_binary(name, rainbow):
    suffix = "_rainbow" if rainbow else ""
    z = np.load(os.path.join(GOLD, f"{name}{suffix}.npz"))
    blobs = unpack_blobs(z["raw"], z["raw_offsets"])
    horizon = HORIZONS[(name, rainbow)]
    cfg = SimConfig(
        rainbow=rainbow,
        solver=SolverConfig(dtype="float64", max_iterations=400),
    )
    scn, st = build_scenario(read_scenario(name + ".txt"), cfg)
    for frame in range(horizon + 1):
        if frame:
            st = step_frame_jit(cfg, scn, st)
        got = draw_frame(cfg, scn, st, *WINDOW)
        # captured blobs exclude the leading \x1b[H and trailing \x1b[?25l
        assert got[3:-6] == blobs[frame], (
            f"{name}{suffix}: frame {frame} bytes differ from the "
            f"compiled reference binary"
        )

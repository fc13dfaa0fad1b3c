"""Model registry: every simulation setup the framework ships.

The reference's "models" are its five bundled scenario text files
(scenarios/*.txt, SURVEY.md §2 #26); this registry exposes them plus the
programmatic scaled presets under one API:

    scn, state = euler_tpu.models.load("waterfall", cfg)
    scn, state = euler_tpu.models.load("dam_break", cfg)   # any grid size
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

from euler_tpu.config import SimConfig
from euler_tpu.core.state import FluidState, Scenario

SCENARIO_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scenarios")

_BUNDLED = ["basic", "block", "filter", "waterfall", "weird-edges"]
_PRESETS = ["dam_break", "block_obstacles"]


def names() -> list[str]:
    return list(_BUNDLED) + list(_PRESETS)


def load(name: str, cfg: SimConfig | None = None,
         **kwargs) -> Tuple[Scenario, FluidState]:
    """Build (Scenario, FluidState) for a bundled scenario or preset."""
    cfg = cfg or SimConfig()
    if name in _BUNDLED:
        from euler_tpu.core.scenario import load_scenario

        path = os.path.join(SCENARIO_DIR, f"{name}.txt")
        return load_scenario(path, cfg, **kwargs)
    if name in _PRESETS:
        from euler_tpu.core import presets

        return getattr(presets, name)(cfg, **kwargs)
    raise KeyError(f"unknown model {name!r}; available: {names()}")

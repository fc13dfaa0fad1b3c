"""Native C++ ANSI encoder must be byte-identical to the Python one."""

import numpy as np
import pytest

from euler_tpu.config import SimConfig
from euler_tpu.render.ansi import encode_frame_py

native = pytest.importorskip("euler_tpu.native.encoder")


@pytest.mark.parametrize("rainbow", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(rainbow, seed):
    cfg = SimConfig(nx=100, ny=40)
    rng = np.random.default_rng(seed)
    glyph = rng.integers(0, 6, (cfg.ny, cfg.nx)).astype(np.uint8)
    cls = rng.choice([0, 0, 0, 1, 2], (cfg.ny, cfg.nx)).astype(np.uint8)
    rgb = rng.integers(0, 256, (cfg.ny, cfg.nx, 3)).astype(np.uint8)
    for wrows, wcols in [(40, 120), (10, 20), (3, 5), (200, 300)]:
        a = encode_frame_py(cfg, glyph, cls, rgb, wrows, wcols, rainbow)
        b = native.encode_frame(glyph, cls, rgb, wrows, wcols, rainbow)
        assert a == b, (rainbow, wrows, wcols)

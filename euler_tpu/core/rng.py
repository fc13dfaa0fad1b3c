"""Deterministic xorshift64* RNG, reproducing the reference bit-for-bit.

The reference seeds a single xorshift64* stream with the constant
0x9bd185c449534b91 (main.c:204 in /root/reference) and consumes it in a
fixed order for marker seeding (main.c:254-267) and source emission
(main.c:288).  Frame-for-frame parity therefore requires this exact
generator, not jax.random.

Two implementations:

* Host (`XorShift64Star`): numpy uint64, used at init time (scenario
  marker seeding) and by the test oracle.  Bit-exact with
  /root/reference/misc/rng.c:4-20 and randf (main.c:203-207).

* Device (`next32` / `randf32`): pure jnp on a (hi, lo) pair of uint32
  lanes, usable inside jit without jax_enable_x64.  64-bit shifts/xors are
  expressed across the two words and the 64-bit multiply by the scramble
  constant is built from 16-bit limb products.  The uniform-float mapping
  deviates from the reference's double-precision division by at most 1 ulp
  of float32 (documented on randf32).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SEED = np.uint64(0x9BD185C449534B91)
_MULT = np.uint64(0x2545F4914F6CDD1D)
_MULT_HI = np.uint32(0x2545F491)
_MULT_LO = np.uint32(0x4F6CDD1D)
_U32_MAX = 4294967295.0


class XorShift64Star:
    """Host-side generator; see misc/rng.c:4-20."""

    def __init__(self, seed: int = int(SEED)):
        assert seed != 0
        self.state = np.uint64(seed)

    def next64(self) -> np.uint64:
        x = self.state
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(12)
            x ^= (x << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            x ^= x >> np.uint64(27)
            self.state = x
            return (x * _MULT) & np.uint64(0xFFFFFFFFFFFFFFFF)

    def next32(self) -> np.uint32:
        # misc/rng.c:18-20 — high 32 bits are the better-quality bits.
        return np.uint32(self.next64() >> np.uint64(32))

    def randf(self) -> np.float32:
        # main.c:203-207: (float)(u32 / (double)UINT32_MAX)
        return np.float32(np.float64(self.next32()) / _U32_MAX)

    def state_u32_pair(self) -> np.ndarray:
        """State as (hi, lo) uint32 pair for handing to the device side."""
        return np.array(
            [self.state >> np.uint64(32), self.state & np.uint64(0xFFFFFFFF)],
            dtype=np.uint32,
        )


def state_from_u32_pair(pair) -> np.uint64:
    pair = np.asarray(pair, dtype=np.uint64)
    return (pair[0] << np.uint64(32)) | pair[1]


# ----------------------------------------------------------------------
# Device-side (jnp, uint32 lanes)
# ----------------------------------------------------------------------

def _mul32_wide(a, b):
    """Full 32x32 -> 64 bit product of uint32 lanes via 16-bit limbs.

    Returns (hi, lo) uint32.  Needed because uint32 * uint32 in jnp wraps.
    """
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    t0 = a0 * b0
    mid = a1 * b0 + (t0 >> 16)              # < 2^32, no wrap
    mid2 = a0 * b1 + (mid & mask)           # < 2^32, no wrap
    hi = a1 * b1 + (mid >> 16) + (mid2 >> 16)
    lo = (mid2 << 16) | (t0 & mask)
    return hi, lo


def next32(state):
    """One xorshift64_32star step on a (hi, lo) uint32 state.

    Returns (out32, new_state).  Bit-exact with misc/rng.c:4-20.
    """
    hi = state[..., 0]
    lo = state[..., 1]

    # x ^= x >> 12
    hi, lo = hi ^ (hi >> 12), lo ^ ((lo >> 12) | (hi << 20))
    # x ^= x << 25
    hi, lo = hi ^ ((hi << 25) | (lo >> 7)), lo ^ (lo << 25)
    # x ^= x >> 27
    hi, lo = hi ^ (hi >> 27), lo ^ ((lo >> 27) | (hi << 5))

    # out = high 32 bits of (x * MULT mod 2^64)
    #     = hi32(lo*MULT_LO) + lo*MULT_HI + hi*MULT_LO  (mod 2^32)
    p_hi, _ = _mul32_wide(lo, _MULT_LO)
    out = p_hi + lo * _MULT_HI + hi * _MULT_LO
    return out, jnp.stack([hi, lo], axis=-1)


def randf32(state):
    """Uniform float32 in [0, 1] from a device xorshift state.

    The reference computes (float)(u32 / (double)UINT32_MAX)
    (main.c:203-207).  Without float64 on device we convert the u32 to a
    correctly-rounded float32 and scale by 1/2^32; the result can differ
    from the reference by at most 1 ulp of float32 (~6e-8), far below the
    jitter scale it is used for.
    """
    x, state = next32(state)
    # Correctly-rounded float32(x): split so each part is exact in f32.
    hi24 = (x >> 8).astype(jnp.float32) * 256.0
    lo8 = (x & 0xFF).astype(jnp.float32)
    xf = hi24 + lo8
    return xf * jnp.float32(1.0 / 4294967296.0), state


def initial_device_state() -> np.ndarray:
    return XorShift64Star().state_u32_pair()

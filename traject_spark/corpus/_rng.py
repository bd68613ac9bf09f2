"""Shared deterministic PRNG for plan-time constants.

One definition of the LCG stepping + [-1, 1) mapping used by BOTH the
LSH hyperplane generator (``similarity._hyperplane``) and the fake
multimodal feature (``multimodal._fake_feature``). The sequence is part
of each operator's determinism contract — hyperplanes decide LSH bucket
membership and the fake features are oracle-checked — so the constants
below must never change (doing so silently re-buckets every LSH layout
written to disk).
"""

from __future__ import annotations

_MULT = 6364136223846793005
_INC = 1442695040888963407
_MASK = 0xFFFFFFFFFFFFFFFF


def lcg_unit_floats(state: int, n: int) -> list[float]:
    """``n`` deterministic floats in [-1, 1) from integer seed ``state``."""
    out = []
    state &= _MASK
    for _ in range(n):
        state = (state * _MULT + _INC) & _MASK
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out

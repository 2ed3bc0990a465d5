"""Four-step NTT decomposition math validated against the direct host NTT.

The Pallas kernels themselves cannot run on CPU (interpret mode hangs in
the XLA CPU simplifier — see .claude/skills/verify/SKILL.md), so this
validates the *composition* (index mapping, twiddle grid, inverse
scaling) by replaying ``ntt_pallas_fourstep``'s exact structure with
host NTT plans in place of the kernel launches.  The on-TPU kernel
composition is validated by scripts/validate_fourstep_ntt.py.

Reference hot loop this serves: /root/reference/src/ligero/mod.rs:998-1012
at 2^21+ gate scales.
"""

from __future__ import annotations

import numpy as np
import pytest

from ligero_tpu.engine.fieldops import FieldKernel
from ligero_tpu.engine.ntt import NTTPlan
from ligero_tpu.engine.pallas_ntt import (
    PALLAS_SINGLE_MAX_N,
    _fourstep_twiddles,
    fourstep_split,
)
from ligero_tpu.fields import BN254_FR


def host_fourstep(field, x: np.ndarray, n: int, inverse: bool) -> np.ndarray:
    """Mirror of ntt_pallas_fourstep with host NTTPlan sub-transforms."""
    fk = FieldKernel(field, np)
    R, C = fourstep_split(n)
    B, L = x.shape[0], field.num_limbs
    xr = x.reshape(B, R, C, L)
    xa = np.ascontiguousarray(np.swapaxes(xr, 1, 2)).reshape(B * C, R, L)
    y = NTTPlan(fk, R, inverse)(xa).reshape(B, C, R, L)
    tw = _fourstep_twiddles(field.name, n, inverse)
    y = fk.mont_mul(y, np.broadcast_to(tw[None], y.shape))
    yb = np.ascontiguousarray(np.swapaxes(y, 1, 2)).reshape(B * R, C, L)
    w = NTTPlan(fk, C, inverse)(yb).reshape(B, R, C, L)
    return np.ascontiguousarray(np.swapaxes(w, 1, 2)).reshape(B, n, L)


def rand_mont(field, count: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ints = [int(x) for x in rng.integers(0, 2 ** 63, count)]
    return field.ints_to_mont_limbs(ints)


def test_fourstep_split():
    assert fourstep_split(32768) == (128, 256)
    assert fourstep_split(65536) == (256, 256)
    assert fourstep_split(1 << 20) == (1024, 1024)
    R, C = fourstep_split(1024)
    assert R * C == 1024 and C >= R
    with pytest.raises(ValueError):
        fourstep_split(PALLAS_SINGLE_MAX_N ** 2 * 4)


@pytest.mark.parametrize("n", [64, 1024])
@pytest.mark.parametrize("inverse", [False, True])
def test_fourstep_matches_direct(n, inverse):
    field = BN254_FR
    B = 3
    x = rand_mont(field, B * n, seed=1000 + n).reshape(B, n, field.num_limbs)
    fk = FieldKernel(field, np)
    direct = NTTPlan(fk, n, inverse)(x)
    four = host_fourstep(field, x, n, inverse)
    assert np.array_equal(direct, four)


def test_fourstep_roundtrip():
    field = BN254_FR
    n = 256
    x = rand_mont(field, 2 * n, seed=7).reshape(2, n, field.num_limbs)
    fwd = host_fourstep(field, x, n, inverse=False)
    back = host_fourstep(field, fwd, n, inverse=True)
    assert np.array_equal(back, x)

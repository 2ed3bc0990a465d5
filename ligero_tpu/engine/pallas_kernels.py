"""Pallas TPU kernels for the field hot path.

Layout: ``(L, N)`` — limbs in sublanes, field elements in lanes.  Every
limb recurrence (schoolbook columns, 16-bit REDC, carry/borrow chains)
then touches only *sublane* slices, which are cheap on the VPU, while the
batch rides the 128-wide lane dimension.  One kernel invocation performs
the entire Montgomery multiply out of VMEM: a single HBM read per operand
and a single write for the result, versus ~2 passes per limb step for the
scan formulation and a scheduler-bounded live set for the unrolled one.

This is the foundation kernel; the batched-NTT and four-step MXU variants
(PERF.md roadmap) reuse the same layout and inner arithmetic.

Correctness is pinned against the numpy FieldKernel in tests (interpret
mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import FieldSpec

LANES = 512  # lane-tile per kernel instance (multiple of 128)


@functools.lru_cache(maxsize=None)
def _mont_mul_kernel_factory(field_name: str, lanes: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..fields import FIELDS
    field = FIELDS[field_name]
    L = field.num_limbs
    n16 = np.uint32(field.n16)
    p_host = field.p_limbs  # (L,) uint32
    mask = np.uint32(0xFFFF)
    sixteen = np.uint32(16)

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:, :]  # (L, lanes)
        b = b_ref[:, :]
        zero_row = jnp.zeros((1, a.shape[1]), jnp.uint32)

        # Phase 1 — product columns via Horner over a's limbs (MSB first):
        # acc (2L, lanes), every limb < 2^16 so products fit uint32.
        acc = jnp.zeros((2 * L, a.shape[1]), jnp.uint32)
        for i in range(L - 1, -1, -1):
            acc = jnp.concatenate([zero_row, acc[:-1, :]], axis=0)
            prod = a[i:i + 1, :] * b           # (L, lanes)
            lo = prod & mask
            hi = prod >> sixteen
            acc = jnp.concatenate([acc[0:L, :] + lo, acc[L:, :]], axis=0)
            acc = jnp.concatenate(
                [acc[0:1, :], acc[1:L + 1, :] + hi, acc[L + 1:, :]], axis=0)

        # Phase 2 — 16-bit REDC, frame shifting left one limb per step.
        # p's limbs enter as python scalars (no captured constant arrays).
        p_scalars = [np.uint32(int(p_host[j])) for j in range(L)]
        carry = jnp.zeros((a.shape[1],), jnp.uint32)
        for _ in range(L):
            v = acc[0, :] + carry
            m = (v * n16) & mask
            mp = [m * pj for pj in p_scalars]  # L vectors of (lanes,)
            carry = (v + (mp[0] & mask)) >> sixteen
            add_mid = jnp.stack(
                [(mp[j] & mask) + (mp[j - 1] >> sixteen) for j in range(1, L)],
                axis=0)  # rows 1..L-1
            acc = jnp.concatenate(
                [acc[0:1, :],
                 acc[1:L, :] + add_mid,
                 acc[L:L + 1, :] + (mp[L - 1] >> sixteen)[None, :],
                 acc[L + 1:, :]], axis=0)
            acc = jnp.concatenate([acc[1:, :], zero_row], axis=0)

        res = jnp.concatenate([(acc[0:1, :] + carry[None, :]), acc[1:L, :]],
                              axis=0)

        # carry normalisation (value < 2p fits L limbs)
        c = jnp.zeros((res.shape[1],), jnp.uint32)
        rows = []
        for j in range(L):
            t = res[j, :] + c
            rows.append(t & mask)
            c = t >> sixteen
        res = jnp.stack(rows, axis=0)

        # conditional subtract p
        borrow = jnp.zeros((res.shape[1],), jnp.uint32)
        diff_rows = []
        for j in range(L):
            t = res[j, :] + np.uint32(0x10000) - np.uint32(int(p_host[j])) - borrow
            diff_rows.append(t & mask)
            borrow = np.uint32(1) - (t >> sixteen)
        diff = jnp.stack(diff_rows, axis=0)
        ge = (borrow == 0)[None, :]
        out_ref[:, :] = jnp.where(ge, diff, res)

    def run(a_lt, b_lt, interpret=False):
        """a_lt, b_lt: (L, N) uint32 with N a multiple of ``lanes``."""
        n = a_lt.shape[1]
        grid = (n // lanes,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, lanes), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a_lt, b_lt)

    return run


def mont_mul_pallas(field: FieldSpec, a, b, interpret: bool = False):
    """Pallas Montgomery multiply on ``(..., L)`` arrays (any batch shape).

    Transposes to the kernel's (L, N) layout at the boundary; pipelines
    that keep data in (L, N) layout throughout can call the factory
    directly and skip the transposes.
    """
    import jax.numpy as jnp

    run = _mont_mul_kernel_factory(field.name, LANES)
    L = field.num_limbs
    shape = a.shape
    a2 = jnp.moveaxis(a.reshape(-1, L), -1, 0)
    b2 = jnp.moveaxis(jnp.broadcast_to(b, shape).reshape(-1, L), -1, 0)
    n = a2.shape[1]
    pad = (-n) % LANES
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((L, pad), jnp.uint32)], axis=1)
        b2 = jnp.concatenate([b2, jnp.zeros((L, pad), jnp.uint32)], axis=1)
    out = run(a2, b2, interpret=interpret)
    if pad:
        out = out[:, :n]
    return jnp.moveaxis(out, 0, -1).reshape(shape)

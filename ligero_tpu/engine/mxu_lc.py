"""MXU challenge-weighted row combination: lc = r^T . preenc.

The interleaved phase's bulk op (reference src/ligero/mod.rs:723-728 —
sum_i r_i * U_i) contracts 4m rows against a challenge vector.  On the
VPU this costs a full Montgomery product per element (~29 ms at the
2048x512 headline shape, PERF.md round-3 decomposition).  Here the
contraction rides the MXU instead, in the same 7-bit-limb style as the
four-step NTT (mxu_ntt.py):

    out[m, l*k + c] = sum_i r7[m, i] * p7[l, i, c]     (ONE int8 matmul)
    acc[t = m + l]  += out[m, l*k:(l+1)*k]             (shifted adds)
    lc = fold_redc(regroup(acc), steps=16)             (2^-256: mont mul)

Exactness: per-entry sums are <= rows * 127^2 (int32-exact for rows <=
2^17); the t-accumulated redundant columns are <= 37 * rows * 127^2
(uint32-exact for rows <= 7000 — larger row counts chunk and combine
canonical partials mod p).  Both operands are Montgomery, so the value
is (sum r.p) * R^2 and the 16-step reduction emits the Montgomery-form
combination — bit-identical to fk.sum_mod(fk.mont_mul(r, preenc))
(tested hermetically in numpy and on-chip).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import FIELDS, FieldSpec
from .mxu_ntt import L7, MASK16, _FieldVm, _limbs16_to_7, _np_dot_i32, \
    _regroup_7_to_16

#: rows per exact uint32 accumulation block: 37 * ROWS_MAX * 127^2 < 2^32
ROWS_MAX = 4096


def mxu_lc_ok(field: FieldSpec) -> bool:
    """Same field envelope as the MXU NTT (16x16-bit limbs)."""
    return field.num_limbs == 16


def _lc_core(xp, dot, p7_exp, r7, k: int, field: FieldSpec):
    """(rows, L7*k) int8 preenc limbs x (L7, rows) int8 r limbs ->
    (L, 1, k) Montgomery limb columns of the combination."""
    out = dot(r7, p7_exp)                       # (L7, L7*k) int32->uint32
    zero = xp.zeros((1, k), np.uint32)
    acc = [zero] * (2 * L7 - 1)
    for m in range(L7):
        row = out[m:m + 1]                      # (1, L7*k); 2-D for Mosaic
        for l in range(L7):
            acc[m + l] = acc[m + l] + row[:, l * k:(l + 1) * k]
    fv = _FieldVm(xp, field)
    # value = (sum r.p) R^2; 16 REDC-equivalent steps divide by R
    return fv.fold_redc_cols(_regroup_7_to_16(xp, acc), 16)


def _split_operands(xp, preenc_lt, r_lt, k: int):
    """(L, rows, k) / (L, rows) uint limbs -> int8 MXU operands."""
    p7 = _limbs16_to_7(xp, preenc_lt)           # list of 37 (rows, k)
    p7_exp = xp.concatenate(p7, axis=1).astype(np.int8)   # (rows, L7*k)
    r7 = xp.stack(_limbs16_to_7(xp, r_lt)).astype(np.int8)  # (L7, rows)
    return p7_exp, r7


def mxu_lc_numpy(field: FieldSpec, preenc, r) -> np.ndarray:
    """Hermetic numpy spec: (rows, k, L) x (rows, L) Montgomery limbs ->
    (k, L) Montgomery limbs of sum_i r_i * preenc_i."""
    rows, k, L = preenc.shape
    partials = []
    for i in range(0, rows, ROWS_MAX):
        blk = preenc[i:i + ROWS_MAX].astype(np.uint32)
        rb = r[i:i + ROWS_MAX].astype(np.uint32)
        p_lt = np.ascontiguousarray(blk.transpose(2, 0, 1))   # (L, rows, k)
        r_lt = np.ascontiguousarray(rb.transpose(1, 0))       # (L, rows)
        p7_exp, r7 = _split_operands(np, p_lt, r_lt, k)
        cols = _lc_core(np, _np_dot_i32, p7_exp, r7, k, field)  # (L, 1, k)
        partials.append(np.ascontiguousarray(cols[:, 0, :].transpose(1, 0)))
    total = partials[0]
    if len(partials) > 1:
        from .fieldops import FieldKernel
        fk = FieldKernel(field, np)
        for part in partials[1:]:
            total = fk.add(total, part)
    return total  # (k, L)


@functools.lru_cache(maxsize=None)
def _mxu_lc_kernel_factory(field_name: str, rows: int, k: int):
    """Pallas kernel: whole block in VMEM, grid over k tiles."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    field = FIELDS[field_name]
    L = field.num_limbs

    def dot_i32(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32
                           ).astype(jnp.uint32)

    # VMEM: the int8 data block (rows * L7 * k_tile) must leave room for
    # the r block, the int32 dot output and the redundant accumulators
    k_tile = k
    while rows * L7 * k_tile > (6 << 20) and k_tile > 64:
        k_tile //= 2
    assert k % k_tile == 0

    def kernel(p_ref, r_ref, o_ref):
        # p_ref: (rows, L7*k_tile) int8; r_ref: (L7, rows) int8
        res = _lc_core(jnp, dot_i32, p_ref[...], r_ref[...], k_tile, field)
        o_ref[...] = jnp.stack([res[q][0] for q in range(L)])  # (L, k_tile)

    grid = (k // k_tile,)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, L7 * k_tile), lambda g: (0, g)),
                  pl.BlockSpec((L7, rows), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((L, k_tile), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((L, k), jnp.uint32),
    )

    def run(preenc, r):
        # (rows, k, L) u16/u32, (rows, L) -> (k, L) mont
        blk = preenc.astype(jnp.uint32)
        rb = r.astype(jnp.uint32)
        p_lt = jnp.transpose(blk, (2, 0, 1))
        r_lt = jnp.transpose(rb, (1, 0))
        p7 = _limbs16_to_7(jnp, p_lt)
        # per k-tile contiguous layout: (rows, L7, k) -> tile g sees
        # columns [g*k_tile, (g+1)*k_tile) of every limb — build
        # (rows, L7*k) with limb-major within each tile
        p7_t = jnp.stack(p7, axis=1)                  # (rows, L7, k)
        tiles = [p7_t[:, :, g * k_tile:(g + 1) * k_tile].reshape(rows, L7 * k_tile)
                 for g in range(k // k_tile)]
        p7_exp = jnp.concatenate(tiles, axis=1).astype(jnp.int8)
        r7 = jnp.stack(_limbs16_to_7(jnp, r_lt)).astype(jnp.int8)
        out = fn(p7_exp, r7)                          # (L, k)
        return jnp.transpose(out, (1, 0))             # (k, L)

    return run


def mxu_lc(field: FieldSpec, preenc, r):
    """Device entry: (rows, k, L) x (rows, L) Montgomery limbs ->
    (k, L) Montgomery limbs.  Rows chunk at ROWS_MAX; canonical-exact
    partials combine mod p."""
    import jax.numpy as jnp

    rows, k, L = preenc.shape
    if rows <= ROWS_MAX:
        return _mxu_lc_kernel_factory(field.name, rows, k)(preenc, r)
    from .fieldops import FieldKernel
    fk = FieldKernel(field, jnp)
    total = None
    for i in range(0, rows, ROWS_MAX):
        blk, rb = preenc[i:i + ROWS_MAX], r[i:i + ROWS_MAX]
        part = _mxu_lc_kernel_factory(field.name, blk.shape[0], k)(blk, rb)
        total = part if total is None else fk.add(total, part)
    return total

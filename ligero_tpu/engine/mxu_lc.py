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
2^17); the t-accumulated redundant columns are <= B = 37 * rows * 127^2.
B must ALSO survive ``_regroup_7_to_16``'s two carry-taming passes:
after them each base-2^7 column is <= 128 + B/2^14, and the regroup
shifts it by up to 15 bits, so uint32-exactness needs
(128 + B/2^14) * 2^15 < 2^32, i.e. rows <= 3593.  ROWS_MAX = 2048
(B <= 2^30.2 — comfortable margin); larger row counts chunk and combine
canonical partials mod p.  Both operands are Montgomery, so the value
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

#: rows per exact uint32 accumulation block: the binding constraint is
#: the regroup carry bound (module docstring), rows <= 3593
ROWS_MAX = 2048


#: VMEM budget for the (L7, L7*k_tile) int32 dot transient
_VMEM_DOT_BUDGET = 5 << 20


def _pick_k_tile(k: int) -> int | None:
    """Largest 128-multiple divisor of k whose dot transient fits the
    VMEM budget; None if no admissible tile exists (e.g. k an odd
    multiple of 128 too large to tile — falls back to the VPU path)."""
    if k <= 0 or k % 128:
        return None
    q = k // 128
    best = None
    for d in range(1, q + 1):
        if q % d == 0 and L7 * L7 * (128 * d) * 4 <= _VMEM_DOT_BUDGET:
            best = 128 * d
    return best


def mxu_lc_ok(field: FieldSpec, k: int | None = None) -> bool:
    """Field envelope of the MXU NTT (16x16-bit limbs) plus the Mosaic
    lane constraint: the kernel's last block dim is L7*k_tile, which is
    128-divisible iff k_tile is (L7 = 37 is odd) — so k must be a
    multiple of 128 AND admit a tile under the VMEM dot-transient
    budget (a large odd multiple of 128 like k=3200*... may not)."""
    if field.num_limbs != 16:
        return False
    return k is None or _pick_k_tile(k) is not None


def _lc_accum(xp, dot, p7_exp, r7, k: int):
    """One row-block's dot + shifted-add pass -> (2*L7-1, k) uint32
    redundant columns (the t = m + l accumulation)."""
    out = dot(r7, p7_exp)                       # (L7, L7*k) int32->uint32
    zero = xp.zeros((1, k), np.uint32)
    acc = [zero] * (2 * L7 - 1)
    for m in range(L7):
        row = out[m:m + 1]                      # (1, L7*k); 2-D for Mosaic
        for l in range(L7):
            acc[m + l] = acc[m + l] + row[:, l * k:(l + 1) * k]
    return xp.concatenate(acc, axis=0)          # (2*L7-1, k)


def _lc_finish(xp, acc2d, field: FieldSpec):
    """Redundant columns (2*L7-1, k) -> list of L (1, k) Montgomery
    limb rows.  Value = (sum r.p) * R^2; 16 REDC-equivalent steps
    divide by R."""
    fv = _FieldVm(xp, field)
    cols = [acc2d[t:t + 1] for t in range(acc2d.shape[0])]
    return fv.fold_redc_cols(_regroup_7_to_16(xp, cols), 16)


def _lc_core(xp, dot, p7_exp, r7, k: int, field: FieldSpec):
    """(rows, L7*k) int8 preenc limbs x (L7, rows) int8 r limbs ->
    (L, 1, k) Montgomery limb columns of the combination."""
    return _lc_finish(xp, _lc_accum(xp, dot, p7_exp, r7, k), field)


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


#: row-block height streamed per grid step (int8 data block is
#: ROW_TILE * L7 * k_tile bytes; 128 keeps it ~2.4 MB at k_tile=512 and
#: satisfies Mosaic's 128-lane divisibility for the (L7, ROW_TILE)
#: challenge block)
ROW_TILE = 128


@functools.lru_cache(maxsize=None)
def _mxu_lc_kernel_factory(field_name: str, rows_p: int, k: int,
                           interpret: bool = False):
    """Pallas kernel: grid over (k tiles, row blocks).  Each row step
    dots one (L7, ROW_TILE) challenge block against one
    (ROW_TILE, L7*k_tile) data block on the MXU and shifted-adds into a
    (2*L7-1, k_tile) uint32 scratch accumulator; the last row step
    regroups + fold-REDCs the accumulator into Montgomery limbs.
    ``rows_p`` must be a multiple of ROW_TILE (caller zero-pads — padded
    rows carry r = 0 so they contribute nothing)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    field = FIELDS[field_name]
    L = field.num_limbs
    assert rows_p % ROW_TILE == 0 and rows_p <= ROWS_MAX
    assert k % 128 == 0, "Mosaic lane constraint (mxu_lc_ok)"

    def dot_i32(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32
                           ).astype(jnp.uint32)

    # k tiles: the (L7, L7*k_tile) int32 dot transient is the big VMEM
    # consumer (~2.8 MB at k_tile=512); _pick_k_tile guarantees a
    # 128-multiple divisor of k under the budget (mxu_lc_ok gates)
    k_tile = _pick_k_tile(k)
    assert k_tile is not None, "caller must gate on mxu_lc_ok"

    def kernel(p_ref, r_ref, o_ref, acc_ref):
        g_r = pl.program_id(1)

        @pl.when(g_r == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] = acc_ref[...] + _lc_accum(
            jnp, dot_i32, p_ref[...], r_ref[...], k_tile)

        @pl.when(g_r == pl.num_programs(1) - 1)
        def _finish():
            res = _lc_finish(jnp, acc_ref[...], field)  # (L, 1, k_tile)
            o_ref[...] = res[:, 0, :]

    grid = (k // k_tile, rows_p // ROW_TILE)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROW_TILE, L7 * k_tile),
                               lambda gk, gr: (gr, gk)),
                  pl.BlockSpec((L7, ROW_TILE), lambda gk, gr: (0, gr))],
        out_specs=pl.BlockSpec((L, k_tile), lambda gk, gr: (0, gk)),
        out_shape=jax.ShapeDtypeStruct((L, k), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * L7 - 1, k_tile), jnp.uint32)],
        interpret=interpret,
    )

    def run(preenc, r):
        # (rows_p, k, L) u16/u32, (rows_p, L) -> (k, L) mont
        blk = preenc.astype(jnp.uint32)
        rb = r.astype(jnp.uint32)
        p_lt = jnp.transpose(blk, (2, 0, 1))
        r_lt = jnp.transpose(rb, (1, 0))
        p7 = _limbs16_to_7(jnp, p_lt)
        # per k-tile contiguous layout: tile g's block sees columns
        # [g*k_tile, (g+1)*k_tile) of every limb, limb-major within
        p7_t = jnp.stack(p7, axis=1)                  # (rows, L7, k)
        tiles = [p7_t[:, :, g * k_tile:(g + 1) * k_tile]
                 .reshape(rows_p, L7 * k_tile)
                 for g in range(k // k_tile)]
        p7_exp = jnp.concatenate(tiles, axis=1).astype(jnp.int8)
        r7 = jnp.stack(_limbs16_to_7(jnp, r_lt)).astype(jnp.int8)
        out = fn(p7_exp, r7)                          # (L, k)
        return jnp.transpose(out, (1, 0))             # (k, L)

    return run


def _pad_rows(xp, a, rows_p: int):
    pad = rows_p - a.shape[0]
    if pad == 0:
        return a
    return xp.concatenate(
        [a, xp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


def mxu_lc(field: FieldSpec, preenc, r, interpret: bool = False):
    """Device entry: (rows, k, L) x (rows, L) Montgomery limbs ->
    (k, L) Montgomery limbs.  Rows pad to a ROW_TILE multiple (padded
    rows carry r = 0) and chunk at ROWS_MAX; canonical-exact partials
    combine mod p."""
    import jax.numpy as jnp

    rows, k, L = preenc.shape
    if rows <= ROWS_MAX:
        rows_p = -(-rows // ROW_TILE) * ROW_TILE
        return _mxu_lc_kernel_factory(field.name, rows_p, k, interpret)(
            _pad_rows(jnp, preenc, rows_p), _pad_rows(jnp, r, rows_p))
    from .fieldops import FieldKernel
    fk = FieldKernel(field, jnp)
    total = None
    for i in range(0, rows, ROWS_MAX):
        blk, rb = preenc[i:i + ROWS_MAX], r[i:i + ROWS_MAX]
        part = mxu_lc(field, blk, rb, interpret)
        total = part if total is None else fk.add(total, part)
    return total

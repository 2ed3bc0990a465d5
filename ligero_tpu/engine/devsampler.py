"""Device-side Fiat–Shamir challenge expansion: ChaCha20 + ``F::rand`` on TPU.

The reference expands every challenge vector on the host with
``ChaCha20Rng`` + rejection sampling (reference src/utils.rs:23-55 via
ark-ff ``F::rand``).  At protocol scale the linear-phase vector is
``4mk`` elements (~3M at 2^19 gates): host expansion plus the
host->device upload of its ``r^T A`` product is the dominant warm
linear-phase cost.  This module runs the identical stream on the device:

* ChaCha20 is embarrassingly parallel in counter mode — the 20-round
  block function vectorises over blocks as ``(16, B)`` uint32 rows
  (pure VPU work, XLA-fused);
* ``F::rand`` rejection sampling compacts with a cumulative-sum scatter:
  the i-th *accepted* attempt in stream order lands at row i, exactly
  matching the host sampler's semantics, so the result is bit-identical
  to :func:`ligero_tpu.sampling.rand_field_elements_limbs` (tested).

A one-word device->host sync returns the accepted count; the (p/2^bits
astronomically improbable) shortfall case falls back to the host path.
"""

from __future__ import annotations

import numpy as np

from ..fields import FieldSpec

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def chacha20_block_words(xp, key_words, num_blocks: int):
    """First ``num_blocks`` ChaCha20 keystream blocks from counter 0.

    ``key_words``: (8,) uint32 (traced ok).  Returns ``(num_blocks, 16)``
    uint32 — same words as :func:`ligero_tpu.chacha.chacha_blocks`.
    """
    u32 = np.uint32

    def rotl(x, n):
        return (x << u32(n)) | (x >> u32(32 - n))

    counters = xp.arange(num_blocks, dtype=np.uint32)
    zeros = xp.zeros(num_blocks, dtype=np.uint32)
    state = [xp.full((num_blocks,), u32(c)) for c in _CONSTANTS]
    state += [xp.broadcast_to(key_words[i], (num_blocks,)) for i in range(8)]
    state += [counters, zeros, zeros, zeros]

    x = list(state)

    def quarter(a, b, c, d):
        x[a] = x[a] + x[b]
        x[d] = rotl(x[d] ^ x[a], 16)
        x[c] = x[c] + x[d]
        x[b] = rotl(x[b] ^ x[c], 12)
        x[a] = x[a] + x[b]
        x[d] = rotl(x[d] ^ x[a], 8)
        x[c] = x[c] + x[d]
        x[b] = rotl(x[b] ^ x[c], 7)

    for _ in range(10):
        quarter(0, 4, 8, 12)
        quarter(1, 5, 9, 13)
        quarter(2, 6, 10, 14)
        quarter(3, 7, 11, 15)
        quarter(0, 5, 10, 15)
        quarter(1, 6, 11, 12)
        quarter(2, 7, 8, 13)
        quarter(3, 4, 9, 14)

    return xp.stack([x[i] + state[i] for i in range(16)], axis=1)


def plan_attempts(field: FieldSpec, count: int) -> int:
    """First-round attempt budget — same formula as the host sampler
    (sampling.py), so shortfall probability is identical (hundreds of
    sigma below the mean at protocol sizes)."""
    accept = field.p / float(2 ** field.modulus_bit_size)
    return int(count / accept * 1.05) + 64


def fr_sample_device(xp, field: FieldSpec, key_words, count: int,
                     out_u16: bool = False):
    """``count`` ``F::rand`` draws as ``(count, L)`` 16-bit limbs
    (Montgomery form, ark semantics) plus the accepted-attempt count.

    Traced function: jit it keyed on ``count``.  The caller must check
    ``accepted >= count`` and fall back to the host sampler otherwise.

    ``out_u16``: emit the limbs as uint16 instead of uint32 — same
    values; halves the output buffer so a 2^22-scale challenge vector
    (33.6M elements) stays under the ~2 GB single-buffer corruption
    bound (PERF.md).  The narrowing happens before the limb stack so no
    full-width u32 intermediate is ever materialized.
    """
    nl = field.num_u64_limbs
    words_per = 2 * nl                       # u32 words per attempt
    attempts = plan_attempts(field, count)
    num_blocks = (attempts * words_per + 15) // 16

    words = chacha20_block_words(xp, key_words, num_blocks)
    words = words.reshape(-1)[: attempts * words_per]
    cand = words.reshape(attempts, words_per)

    # mask the top u64 limb down to modulus_bit_size bits (F::rand)
    shave = 64 * nl - field.modulus_bit_size
    mask64 = (1 << (64 - shave)) - 1 if shave < 64 else 0
    lo_m, hi_m = np.uint32(mask64 & 0xFFFFFFFF), np.uint32(mask64 >> 32)
    cand = xp.concatenate(
        [cand[:, : words_per - 2],
         (cand[:, words_per - 2] & lo_m)[:, None],
         (cand[:, words_per - 1] & hi_m)[:, None]], axis=1)

    # lexicographic cand < p over u32 words, most significant first
    p_words = np.array([(field.p >> (32 * i)) & 0xFFFFFFFF
                        for i in range(words_per)], dtype=np.uint32)
    lt = xp.zeros(attempts, dtype=bool)
    decided = xp.zeros(attempts, dtype=bool)
    for i in reversed(range(words_per)):
        w = cand[:, i]
        lt = lt | (~decided & (w < p_words[i]))
        decided = decided | (w != p_words[i])

    # stream-order compaction: i-th accepted attempt -> row i
    pos = xp.cumsum(lt.astype(np.int32)) - 1
    accepted = pos[-1] + 1
    dest = xp.where(lt & (pos < count), pos, count)
    out = xp.zeros((count + 1, words_per), dtype=np.uint32)
    if xp is np:
        keep = dest < count
        out[dest[keep]] = cand[keep]
    else:
        out = out.at[dest].set(cand, mode="drop")
    out = out[:count]

    # u32 words -> 16-bit limbs, little-endian limb order
    lo, hi = out & np.uint32(0xFFFF), out >> np.uint32(16)
    if out_u16:
        lo, hi = lo.astype(np.uint16), hi.astype(np.uint16)
    limbs = xp.stack([lo, hi], axis=-1).reshape(count, 2 * words_per)
    return limbs, accepted

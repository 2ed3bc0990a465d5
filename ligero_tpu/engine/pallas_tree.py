"""Pallas fused SHA-256 Merkle-root reduction: all levels, one dispatch.

The XLA tree reduction issues one kernel per level (log2 n sequential
tiny dispatches — latency-bound: ~27 ms for n=4096 on the tunneled chip
while the 2n compressions are microseconds of VPU work).  This kernel
reduces the whole tree to the root inside one pallas_call.

Pairing trick: permute the leaves by index bit-reversal FIRST (one XLA
gather on 32-byte digests — tiny).  In bit-reversed storage the natural
tree pairing (2i, 2i+1) becomes (j, j + B/2): every level is just
"first half with second half", and the parent level lands bit-reversed
again, so all log2 n levels are plain halving slices — no strided or
gathered access anywhere in the kernel.

State layout: 8 digest words as separate (n,) lane vectors (one per
word), so word-wise SHA-256 ops vectorize across nodes on the lanes.

Matches reference /root/reference/src/ligero/mod.rs:544-551 (sequential
Merkle construction over column hashes).
"""

from __future__ import annotations

import functools

import numpy as np

from .hashops import _SHA_IV, _SHA_K
from .ntt import bitrev_permutation


def _sha256_compress_words(hs, ms):
    """One SHA-256 compression, vectorized over lanes.

    ``hs``: list of 8 state vectors; ``ms``: list of 16 message vectors.
    Returns the 8 updated state vectors.  Rounds and the message schedule
    are Python-unrolled (static 64 rounds)."""
    def rotr(x, r):
        return (x >> np.uint32(r)) | (x << np.uint32(32 - r))

    a, b, c, d, e, f, g, h = hs
    w = list(ms)
    for t in range(64):
        if t >= 16:
            s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) \
                ^ (w[t - 15] >> np.uint32(3))
            s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) \
                ^ (w[t - 2] >> np.uint32(10))
            w.append(w[t - 16] + s0 + w[t - 7] + s1)
        bs1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + bs1 + ch + np.uint32(int(_SHA_K[t])) + w[t]
        bs0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = bs0 + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return [x + y for x, y in zip(hs, (a, b, c, d, e, f, g, h))]


def _two_to_one_words(left, right):
    """SHA-256 of the 64-byte child concatenation, word-vector form.

    ``left``/``right``: lists of 8 big-endian word vectors.  Semantics
    identical to HashKernel.sha256_two_to_one (block + padding block)."""
    import jax.numpy as jnp

    shape = left[0].shape
    iv = [jnp.full(shape, np.uint32(int(v)), jnp.uint32) for v in _SHA_IV]
    hs = _sha256_compress_words(iv, list(left) + list(right))
    pad = [jnp.full(shape, np.uint32(0x80000000), jnp.uint32)] \
        + [jnp.zeros(shape, jnp.uint32)] * 14 \
        + [jnp.full(shape, np.uint32(512), jnp.uint32)]
    return _sha256_compress_words(hs, pad)


@functools.lru_cache(maxsize=None)
def _tree_kernel_factory(n: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n & (n - 1) == 0 and n >= 2

    def kernel(leaves_ref, out_ref):
        # 8 word vectors over the bit-reversed nodes
        hs = [leaves_ref[i] for i in range(8)]
        width = n
        while width > 1:
            half = width // 2
            left = [v[:half] for v in hs]
            right = [v[half:width] for v in hs]
            hs = _two_to_one_words(left, right)
            width = half
        for i in range(8):
            out_ref[i] = hs[i]

    def run(leaves_wn):
        """(8, n) big-endian words, bit-reversed node order -> (8, 1)."""
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 1), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(leaves_wn)

    return run


def sha256_tree_root_pallas(leaves_be):
    """Merkle root of ``leaves_be`` ((n, 8) big-endian digest words) in
    one kernel dispatch.  Bit-identical to the level-by-level
    HashKernel.sha256_two_to_one reduction (tested on-chip)."""
    import jax.numpy as jnp

    n = leaves_be.shape[0]
    perm = jnp.asarray(bitrev_permutation(n))
    lw = jnp.take(leaves_be, perm, axis=0).T  # (8, n), bit-reversed nodes
    out = _tree_kernel_factory(n)(lw)
    return out[:, 0]

"""Pallas Blake2s-256 column hashing: the commit-phase hot kernel.

The Ligero commitment hashes every column of the codeword matrix U
(reference /root/reference/src/ligero/mod.rs:536-542 — a rayon loop over
``n`` columns).  Here each column rides a VPU lane: a column tile of
1024 columns (8 sublanes x 128 lanes) is hashed in lockstep, streaming
the 64-byte message blocks through VMEM while the 8-word chaining state
persists in a VMEM scratch across grid steps.

Message layout per column (ark ``FieldToBytesColHasher`` semantics,
ligero_tpu.hashes): u64-LE element count, then 32-byte canonical LE
encodings — packed here as uint32 little-endian words, 16 words per
Blake2s block.  All columns share one length, so the block counter and
final-block flag are uniform scalars.

Grid: (column_tiles, block_chunks) — the block axis iterates innermost,
so the chaining state scratch carries across chunks of the same column
tile and resets at chunk 0.
"""

from __future__ import annotations

import functools

import numpy as np

from .hashops import _IV, _SIGMA

COL_TILE = 1024          # 8 sublanes x 128 lanes of columns per grid row
BLOCKS_PER_STEP = 64     # 64-byte blocks consumed per grid step (4 MB VMEM)


def _rotr(x, r: int):
    import jax.numpy as jnp
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


@functools.lru_cache(maxsize=None)
def _blake2s_kernel_factory(n: int, num_blocks: int, byte_len: int,
                            blocks_per_step: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % COL_TILE == 0
    nt = n // COL_TILE
    num_bc = -(-num_blocks // blocks_per_step)
    nbp = num_bc * blocks_per_step
    tile = (8, 128)
    iv = [np.uint32(int(w)) for w in _IV]
    param_xor = np.uint32(0x01010020)  # digest_len 32, fanout/depth 1

    def compress(h, m, t, last):
        """h: (8, 8, 128) stacked state; m: (16, 8, 128) message words;
        t: traced uint32 scalar; last: traced bool scalar."""
        v = [h[i] for i in range(8)] + \
            [jnp.full(tile, iv[i], jnp.uint32) for i in range(8)]
        v[12] = v[12] ^ t
        v[14] = v[14] ^ jnp.where(last, np.uint32(0xFFFFFFFF), np.uint32(0))

        for r in range(10):
            s = _SIGMA[r]

            def g(a, b, c, d, x, y):
                va, vb, vc, vd = v[a], v[b], v[c], v[d]
                va = va + vb + x
                vd = _rotr(vd ^ va, 16)
                vc = vc + vd
                vb = _rotr(vb ^ vc, 12)
                va = va + vb + y
                vd = _rotr(vd ^ va, 8)
                vc = vc + vd
                vb = _rotr(vb ^ vc, 7)
                v[a], v[b], v[c], v[d] = va, vb, vc, vd

            g(0, 4, 8, 12, m[s[0]], m[s[1]])
            g(1, 5, 9, 13, m[s[2]], m[s[3]])
            g(2, 6, 10, 14, m[s[4]], m[s[5]])
            g(3, 7, 11, 15, m[s[6]], m[s[7]])
            g(0, 5, 10, 15, m[s[8]], m[s[9]])
            g(1, 6, 11, 12, m[s[10]], m[s[11]])
            g(2, 7, 8, 13, m[s[12]], m[s[13]])
            g(3, 4, 9, 14, m[s[14]], m[s[15]])
        return jnp.stack([h[i] ^ v[i] ^ v[i + 8] for i in range(8)])

    def kernel(words_ref, out_ref, h_ref):
        bc = pl.program_id(1)

        @pl.when(bc == 0)
        def _init():
            h0 = jnp.stack(
                [jnp.full(tile, iv[0] ^ param_xor, jnp.uint32)]
                + [jnp.full(tile, iv[i], jnp.uint32) for i in range(1, 8)])
            h_ref[...] = h0

        def body(j, h):
            gb = bc * blocks_per_step + j  # global block index (int32)
            m = words_ref[j, :, 0]          # (16, 8, 128)
            is_last = gb == num_blocks - 1
            t = jnp.where(is_last, np.uint32(byte_len),
                          ((gb + 1) * 64).astype(jnp.uint32))
            h_new = compress(h, m, t, is_last)
            # padding blocks past the true message leave the state untouched
            return jnp.where(gb < num_blocks, h_new, h)

        h = jax.lax.fori_loop(0, blocks_per_step, body, h_ref[...])
        h_ref[...] = h

        @pl.when(bc == num_bc - 1)
        def _emit():
            out_ref[0] = h

    def run(words, interpret=False):
        """words: (NBP, 16, nt, 8, 128) uint32 -> digests (nt, 8, 8, 128)."""
        assert words.shape == (nbp, 16, nt, 8, 128)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, 8, 8, 128), jnp.uint32),
            grid=(nt, num_bc),
            in_specs=[pl.BlockSpec(
                (blocks_per_step, 16, 1, 8, 128),
                lambda ct, bc: (bc, 0, ct, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 8, 128), lambda ct, bc: (ct, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 8, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(words)

    return run


def supports_shape(n: int) -> bool:
    return n % COL_TILE == 0


def blake2s_columns_pallas(u_canon, four_m: int, interpret: bool = False):
    """Hash all columns of ``u_canon`` ((rows, n, L) canonical limbs) with
    the Pallas kernel.  ``four_m`` is the element count in the u64-LE
    length prefix (= rows for a full matrix).  Returns (n, 8) LE digest
    words, identical to ``HashKernel.blake2s`` on the serialized columns.
    """
    import jax.numpy as jnp

    rows, n, L = u_canon.shape
    assert supports_shape(n)
    byte_len = 8 + four_m * L * 2
    w_total = 2 + rows * (L // 2)
    num_blocks = -(-byte_len // 64)
    num_bc = -(-num_blocks // BLOCKS_PER_STEP)
    nbp = num_bc * BLOCKS_PER_STEP

    # stream-major prep: ONE minor-dim transpose ((n, L/2) -> (L/2, n) per
    # row) instead of the former full-matrix moveaxis + (n, nbp, 16) ->
    # (nbp, 16, n) transpose — same wk layout bit for bit (tested), far
    # less HBM relayout traffic (this prep was ~12 ms against the ~5 ms
    # hash floor at the 2048x4096 headline shape)
    packed = u_canon[..., 0::2] | (u_canon[..., 1::2] << np.uint32(16))
    ws = packed.transpose(0, 2, 1).reshape(rows * (L // 2), n)
    prefix = np.zeros(2, dtype=np.uint32)
    prefix[0] = four_m & 0xFFFFFFFF
    prefix[1] = four_m >> 32
    full = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(prefix)[:, None], (2, n)), ws,
         jnp.zeros((nbp * 16 - w_total, n), np.uint32)], axis=0)
    wk = full.reshape(nbp, 16, n // COL_TILE, 8, 128)

    run = _blake2s_kernel_factory(n, num_blocks, byte_len, BLOCKS_PER_STEP)
    out = run(wk, interpret=interpret)                        # (nt, 8, 8, 128)
    return out.transpose(0, 2, 3, 1).reshape(n, 8)

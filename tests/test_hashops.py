import hashlib

import numpy as np
import pytest

from ligero_tpu.engine.hashops import (
    HashKernel,
    be_words_to_bytes,
    bytes_to_be_words,
    le_bytes_to_words,
    words_to_le_bytes,
)


@pytest.mark.parametrize("msg_len", [0, 1, 55, 64, 65, 128, 200, 1000])
def test_blake2s_matches_hashlib(msg_len):
    hk = HashKernel(np)
    rng = np.random.default_rng(msg_len)
    msgs = [rng.integers(0, 256, msg_len, dtype=np.uint8).tobytes()
            for _ in range(5)]
    padded_words = (max(1, (msg_len + 63) // 64)) * 16
    words = np.stack([
        np.pad(le_bytes_to_words(m), (0, padded_words - (msg_len + 3) // 4))
        for m in msgs])
    got = hk.blake2s(words, msg_len)
    for i, m in enumerate(msgs):
        assert words_to_le_bytes(got[i]) == hashlib.blake2s(m).digest()


def test_sha256_two_to_one_matches_hashlib():
    hk = HashKernel(np)
    rng = np.random.default_rng(0)
    lefts = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(7)]
    rights = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(7)]
    lw = np.stack([bytes_to_be_words(b) for b in lefts])
    rw = np.stack([bytes_to_be_words(b) for b in rights])
    got = hk.sha256_two_to_one(lw, rw)
    for i in range(7):
        expect = hashlib.sha256(lefts[i] + rights[i]).digest()
        assert be_words_to_bytes(got[i]) == expect


def test_jax_hash_kernels_match_numpy():
    import jax
    import jax.numpy as jnp
    hk_np, hk_jx = HashKernel(np), HashKernel(jnp)
    rng = np.random.default_rng(3)
    msg_len = 200
    words = rng.integers(0, 2**32, (4, 64), dtype=np.uint32)

    got_np = hk_np.blake2s(words, msg_len)
    got_jx = jax.jit(lambda w: hk_jx.blake2s(w, msg_len))(jnp.asarray(words))
    assert np.array_equal(got_np, np.asarray(got_jx))

    lw = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
    rw = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
    got_np = hk_np.sha256_two_to_one(lw, rw)
    got_jx = jax.jit(hk_jx.sha256_two_to_one)(jnp.asarray(lw), jnp.asarray(rw))
    assert np.array_equal(got_np, np.asarray(got_jx))


def test_pallas_prep_stream_major_layout():
    """The stream-major Blake2s prep (one minor-dim transpose) must
    produce the exact kernel input the original column-major prep did:
    wk[bc, w, t, s, l] = column (t*1024+s*128+l)'s stream word
    (bc*16+w), where words 0-1 are the u64-LE length prefix and word
    q >= 2 is limb-pair (q-2) % 8 of element (q-2) // 8."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rows, n, L = 12, 1024, 16
    u = rng.integers(0, 2**16, size=(rows, n, L), dtype=np.uint32)
    byte_len = 8 + rows * L * 2
    w_total = 2 + rows * (L // 2)
    num_blocks = -(-byte_len // 64)
    from ligero_tpu.engine.pallas_hash import BLOCKS_PER_STEP, COL_TILE
    nbp = (-(-num_blocks // BLOCKS_PER_STEP)) * BLOCKS_PER_STEP

    packed = u[..., 0::2] | (u[..., 1::2] << np.uint32(16))
    ws = jnp.asarray(packed).transpose(0, 2, 1).reshape(rows * (L // 2), n)
    prefix = np.zeros(2, dtype=np.uint32)
    prefix[0] = rows
    full = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(prefix)[:, None], (2, n)), ws,
         jnp.zeros((nbp * 16 - w_total, n), np.uint32)], axis=0)
    wk = np.asarray(full.reshape(nbp, 16, n // COL_TILE, 8, 128))

    # independent element-wise reference for a scattering of positions
    for bc, w, t, s, lane in [(0, 0, 0, 0, 0), (0, 1, 0, 0, 5),
                              (0, 2, 0, 1, 7), (3, 9, 0, 4, 100),
                              (nbp - 1, 15, 0, 7, 127)]:
        c = t * COL_TILE + s * 128 + lane
        q = bc * 16 + w
        if q < 2:
            want = prefix[q]
        elif q - 2 < rows * (L // 2):
            r, lp = (q - 2) // 8, (q - 2) % 8
            want = u[r, c, 2 * lp] | (u[r, c, 2 * lp + 1] << np.uint32(16))
        else:
            want = 0
        assert wk[bc, w, t, s, lane] == want, (bc, w, t, s, lane)

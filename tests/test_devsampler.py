"""Device challenge expansion + device sparse r^T A: bit-exactness.

The device ChaCha20/F::rand sampler and the segment-sum sparse product
must match the host golden paths exactly — they feed the Fiat–Shamir
transcript (reference src/utils.rs:23-55, src/ligero/mod.rs:712-747).
"""

import numpy as np
import pytest

from ligero_tpu import native
from ligero_tpu.chacha import chacha_blocks, key_words_from_seed
from ligero_tpu.engine.backend import get_backend
from ligero_tpu.engine.devsampler import chacha20_block_words, fr_sample_device
from ligero_tpu.fields import BN254_FR
from ligero_tpu.sampling import rand_field_elements_limbs

F = BN254_FR
SEEDS = [bytes(range(32)), b"\xab" * 32, bytes([7] + [0] * 31)]


def test_chacha_blocks_match_host_numpy():
    key = key_words_from_seed(SEEDS[0])
    want = chacha_blocks(key, 0, 37)
    got = chacha20_block_words(np, key.astype(np.uint32), 37)
    assert np.array_equal(want, got)


@pytest.mark.parametrize("count", [1, 5, 333, 20000])
def test_fr_sample_device_numpy_matches_host(count):
    for seed in SEEDS:
        want = rand_field_elements_limbs(F, count, seed)
        key = key_words_from_seed(seed).astype(np.uint32)
        got, accepted = fr_sample_device(np, F, key, count)
        assert int(accepted) >= count
        assert np.array_equal(want, got)


def test_rand_field_mont_jax_cpu_matches_host():
    be = get_backend(F, use_jax=True)
    for seed in SEEDS:
        want = rand_field_elements_limbs(F, 4096, seed)
        got = be.rand_field_mont(4096, seed)
        assert got is not None
        assert np.array_equal(want, np.asarray(got))


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_sparse_rA_device_matches_native():
    rng = np.random.default_rng(3)
    num_cols, nnz, nrows = 500, 2000, 300
    rows = rng.integers(0, nrows, nnz).astype(np.int32)
    cols = rng.integers(0, num_cols, nnz).astype(np.int32)
    vals = [int(rng.integers(0, 1 << 63)) % F.p for _ in range(nnz)]
    r_limbs = rand_field_elements_limbs(F, nrows, SEEDS[1])

    # golden: native host kernel
    vals_u64 = native.ints_to_u64_limbs(vals, F.num_u64_limbs)
    native.to_mont_inplace(F, vals_u64)
    out = native.sparse_row_mul_mont(
        F, rows, cols, vals_u64, native.u16_to_u64_limbs(r_limbs), num_cols)
    want = native.u64_to_u16_limbs(out, F.num_limbs)

    be = get_backend(F, use_jax=True)
    order = np.argsort(cols, kind="stable")
    vals_mont = F.ints_to_mont_limbs([vals[i] for i in order])
    got = be.sparse_rA_mont(
        be.asarray(rows[order]), be.asarray(cols[order]),
        be.asarray(vals_mont), be.asarray(r_limbs), num_cols)
    assert np.array_equal(np.asarray(want, np.uint32), np.asarray(got))


def test_prove_uses_device_path_and_matches_numpy_proof():
    """End-to-end: jax backend (device expansion + device r^T A) produces
    the byte-identical proof to the numpy golden backend."""
    from ligero_tpu.ligero import LigeroCircuit
    from ligero_tpu.sponge import test_sponge
    from ligero_tpu.synthetic import generate_random_circuit

    c, outputs, vars_ = generate_random_circuit(F, 600, num_vars=16, seed=11)
    lj = LigeroCircuit(c, outputs, backend=get_backend(F, use_jax=True))
    ln = LigeroCircuit(c, outputs, backend=get_backend(F, use_jax=False))
    pj = lj.prove(vars_, test_sponge(F))
    pn = ln.prove(vars_, test_sponge(F))
    assert pj.to_bytes(F) == pn.to_bytes(F)
    # the device COO cache must have engaged on the jax circuit
    assert getattr(lj, "_a_coo_dev", None) is not None
    assert ln.verify(pj, test_sponge(F))

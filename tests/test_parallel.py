"""Multi-chip sharding tests on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

from ligero_tpu.fields import BN254_FR

F = BN254_FR


def _random_inputs(four_m, k, seed=0):
    rng = np.random.default_rng(seed)
    preenc = F.ints_to_mont_limbs(
        [int(x) for x in rng.integers(0, 2**62, four_m * k)]
    ).reshape(four_m, k, F.num_limbs)
    r = F.ints_to_mont_limbs([int(x) for x in rng.integers(0, 2**62, four_m)])
    return preenc, r


def _host_reference(preenc, r, four_m, k, n):
    """Host golden: numpy engine + hashlib commitment."""
    from ligero_tpu.engine.backend import Backend
    from ligero_tpu.hashes import column_hash
    from ligero_tpu.merkle import MerkleTree

    be = Backend(F)
    coeffs, evals = be.rs_encode_rows(preenc, k, n)
    u_canon = be.to_numpy(be.from_mont(evals))
    leaves = [column_hash(F, F.limbs_to_ints(u_canon[:, j, :])) for j in range(n)]
    tree = MerkleTree(leaves)
    lc = be.row_combine(r, preenc)
    return u_canon, leaves, tree.root, lc


def test_single_chip_core_matches_host():
    import jax
    from ligero_tpu.engine.hashops import be_words_to_bytes, words_to_le_bytes
    from ligero_tpu.parallel import make_prover_core

    four_m, k = 16, 16
    n = 8 * k
    preenc, r = _random_inputs(four_m, k)
    fn = make_prover_core(F, four_m, k, n)
    u_canon, leaves_le, root, lc = jax.jit(fn)(preenc, r)

    h_canon, h_leaves, h_root, h_lc = _host_reference(preenc, r, four_m, k, n)
    assert np.array_equal(np.asarray(u_canon), h_canon)
    assert [words_to_le_bytes(w) for w in np.asarray(leaves_le)] == h_leaves
    assert be_words_to_bytes(np.asarray(root)) == h_root
    assert np.array_equal(np.asarray(lc), h_lc)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_core_matches_host(n_devices):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ligero_tpu.engine.hashops import be_words_to_bytes, words_to_le_bytes
    from ligero_tpu.parallel import make_sharded_prover_core

    four_m, k = 16, 16
    n = 8 * k
    preenc, r = _random_inputs(four_m, k, seed=7)

    mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("rows",))
    fn = make_sharded_prover_core(F, mesh, four_m, k, n)
    with mesh:
        u_canon, leaves_le, root, lc = jax.jit(fn)(
            jnp.asarray(preenc), jnp.asarray(r))
        jax.block_until_ready((u_canon, leaves_le, root, lc))

    h_canon, h_leaves, h_root, h_lc = _host_reference(preenc, r, four_m, k, n)
    assert np.array_equal(np.asarray(u_canon), h_canon)
    assert [words_to_le_bytes(w) for w in np.asarray(leaves_le)] == h_leaves
    assert be_words_to_bytes(np.asarray(root)) == h_root
    assert np.array_equal(np.asarray(lc), h_lc)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)

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


@pytest.mark.parametrize("n_devices", [2, 8])
def test_full_prover_sharded_byte_identical(n_devices):
    """LigeroCircuit.prove/verify through ShardedBackend on a virtual mesh
    produces byte-identical proofs to the single-device numpy path
    (VERDICT #4: the full prover distributed, not just the commit core)."""
    import jax
    from jax.sharding import Mesh

    from ligero_tpu.circuit import ArithmeticCircuit
    from ligero_tpu.engine.backend import Backend
    from ligero_tpu.ligero import LigeroCircuit
    from ligero_tpu.parallel import ShardedBackend
    from ligero_tpu.sponge import test_sponge
    from ligero_tpu.synthetic import generate_random_circuit

    c, outputs, vars_ = generate_random_circuit(F, 600, num_vars=8, seed=11)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("rows",))

    lig = LigeroCircuit(c, outputs, backend=ShardedBackend(F, mesh))
    sp = test_sponge(F)
    proof = lig.prove(vars_, sp.clone())
    assert lig.verify(proof, sp.clone())

    c2, outputs2, vars2 = generate_random_circuit(F, 600, num_vars=8, seed=11)
    lig_np = LigeroCircuit(c2, outputs2, backend=Backend(F))
    proof_np = lig_np.prove(vars2, sp.clone())
    assert proof.to_bytes(F) == proof_np.to_bytes(F)


def test_full_prover_sharded_poseidon_fixture():
    """Sharded prove+verify of the poseidon circom fixture (m,k,n =
    86,128,1024; 4m=344 rows pad to the 8-device mesh) byte-identical to
    the host proof, with mont_mul chunking forced to fire inside
    shard_map (FieldKernel.MAX_BATCH_ELEMS interaction, VERDICT weak #4)."""
    import jax
    from jax.sharding import Mesh

    from ligero_tpu.circuit import ArithmeticCircuit
    from ligero_tpu.circuit.r1cs import load_witness_json, parse_r1cs
    from ligero_tpu.engine.backend import Backend
    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.ligero import LigeroCircuit
    from ligero_tpu.parallel import ShardedBackend
    from ligero_tpu.sponge import test_sponge

    cs = parse_r1cs("/root/reference/circom/poseidon/poseidon.r1cs", F)
    witness = load_witness_json(
        "/root/reference/circom/poseidon/witness.json", F)
    c, outputs = ArithmeticCircuit.from_constraint_system(cs, F)
    vars_ = [(i, v) for i, v in enumerate(witness)][1:]

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("rows",))
    old = FieldKernel.MAX_BATCH_ELEMS
    FieldKernel.MAX_BATCH_ELEMS = 1 << 12  # force lax.map chunking in-shard
    try:
        lig = LigeroCircuit(c, outputs, backend=ShardedBackend(F, mesh))
        sp = test_sponge(F)
        proof = lig.prove(vars_, sp.clone())
        assert lig.verify(proof, sp.clone())
    finally:
        FieldKernel.MAX_BATCH_ELEMS = old

    c2, outputs2 = ArithmeticCircuit.from_constraint_system(cs, F)
    lig_np = LigeroCircuit(c2, outputs2, backend=Backend(F))
    proof_np = lig_np.prove(vars_, sp.clone())
    assert proof.to_bytes(F) == proof_np.to_bytes(F)


def test_prove_batch_sharded_byte_identical():
    """prove_batch / verify_batch through ShardedBackend (round-3: mesh
    servers get the batched serving path too): B proofs byte-identical
    to sequential prove() on the same mesh AND to the single-device
    batch, verdicts identical to sequential verify()."""
    import jax
    from jax.sharding import Mesh

    from ligero_tpu.circuit import ArithmeticCircuit
    from ligero_tpu.circuit.r1cs import parse_r1cs
    from ligero_tpu.engine.backend import Backend
    from ligero_tpu.ligero import LigeroCircuit, LigeroProof
    from ligero_tpu.parallel import ShardedBackend
    from ligero_tpu.sponge import test_sponge

    cs = parse_r1cs("/root/reference/circom/multiplication.r1cs", F)
    circuit, outputs = ArithmeticCircuit.from_constraint_system(cs, F)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("rows",))
    lig = LigeroCircuit(circuit, outputs, backend=ShardedBackend(F, mesh))
    sp = test_sponge(F)

    # three distinct valid witnesses (wire order [1, y, s1, s2], y = s1*s2)
    assigns = [[(1, s1 * s2), (2, s1), (3, s2)]
               for s1, s2 in ((3, 5), (4, 7), (11, 13))]
    batch = lig.prove_batch(assigns, sp)
    seq = [lig.prove(a, sp.clone()) for a in assigns]
    for b, s_ in zip(batch, seq):
        assert b.to_bytes(F) == s_.to_bytes(F)

    # cross-check vs the single-device batch path
    lig1 = LigeroCircuit(*ArithmeticCircuit.from_constraint_system(
        parse_r1cs("/root/reference/circom/multiplication.r1cs", F), F),
        backend=Backend(F, use_jax=True))
    batch1 = lig1.prove_batch(assigns, sp)
    for b, s_ in zip(batch, batch1):
        assert b.to_bytes(F) == s_.to_bytes(F)

    # batched verification on the mesh: only the valid proofs pass
    bad = LigeroProof.from_bytes(batch[0].to_bytes(F), F)
    bad.interleaved.preenc_u_lc[0] = (bad.interleaved.preenc_u_lc[0] + 1) % F.p
    verdicts = lig.verify_batch(batch + [bad], sp)
    assert verdicts == [True, True, True, False]
    assert verdicts[:3] == [lig.verify(p, sp.clone()) for p in batch]


def test_prove_batch_sharded_zk():
    """zk prove_batch on the mesh: byte-identical to sequential zk
    proves with the same seeds; batched verification accepts."""
    import jax
    from jax.sharding import Mesh

    from ligero_tpu.ligero import LigeroCircuit
    from ligero_tpu.parallel import ShardedBackend
    from ligero_tpu.sponge import test_sponge
    from ligero_tpu.synthetic import generate_random_circuit

    c, outputs, vars_ = generate_random_circuit(F, 96, num_vars=4, seed=3)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("rows",))
    # small lambda keeps the 3t blinding width inside the toy instance
    lig = LigeroCircuit(c, outputs, lambda_=10,
                        backend=ShardedBackend(F, mesh), zk=True)
    sp = test_sponge(F)
    seeds = [bytes([i]) * 32 for i in (1, 2)]
    batch = lig.prove_batch([vars_, vars_], sp, zk_seeds=seeds)
    seq = [lig.prove(vars_, sp.clone(), zk_seed=s) for s in seeds]
    for b, s_ in zip(batch, seq):
        assert b.to_bytes(F) == s_.to_bytes(F)
    assert lig.verify_batch(batch, sp) == [True, True]

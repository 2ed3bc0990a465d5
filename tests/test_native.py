import random

import numpy as np
import pytest

from ligero_tpu import native
from ligero_tpu.fields import BLS12_377_FQ, BN254_FR

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


@pytest.mark.parametrize("field", [BN254_FR, BLS12_377_FQ], ids=lambda f: f.name)
def test_mont_roundtrip_and_limb_conversions(field):
    rng = random.Random(1)
    vals = [rng.randrange(field.p) for _ in range(40)] + [0, 1, field.p - 1]
    u64 = native.ints_to_u64_limbs(vals, field.num_u64_limbs)
    native.to_mont_inplace(field, u64)
    expect_mont = [field.to_mont(v) for v in vals]
    got = [int.from_bytes(u64[i].tobytes(), "little") for i in range(len(vals))]
    assert got == expect_mont
    # u64 <-> u16 limb reshuffles
    u16 = native.u64_to_u16_limbs(u64, field.num_limbs)
    assert field.limbs_to_ints(u16) == expect_mont
    assert np.array_equal(native.u16_to_u64_limbs(u16), u64)
    native.from_mont_inplace(field, u64)
    got = [int.from_bytes(u64[i].tobytes(), "little") for i in range(len(vals))]
    assert got == vals


def test_eval_circuit_matches_python():
    from fixtures import generate_lemniscate_circuit
    F = BN254_FR
    c = generate_lemniscate_circuit()
    vars_ = [(1, 8), (2, 4)]
    trace = c.evaluation_trace_multioutput(vars_, [c.last()])

    n = c.num_nodes()
    kinds = np.zeros(n, dtype=np.uint8)
    lefts = np.zeros(n, dtype=np.int64)
    rights = np.zeros(n, dtype=np.int64)
    have = np.zeros(n, dtype=np.uint8)
    preset = []
    for i, node in enumerate(c.nodes):
        if node[0] == "add":
            kinds[i], lefts[i], rights[i] = 1, node[1], node[2]
        elif node[0] == "mul":
            kinds[i], lefts[i], rights[i] = 2, node[1], node[2]
        else:
            have[i] = 1
            preset.append((i, node[1] if node[0] == "const" else dict(vars_)[i]))
    vals = np.zeros((n, F.num_u64_limbs), dtype=np.uint64)
    pre = native.ints_to_u64_limbs([F.to_mont(v) for _, v in preset],
                                   F.num_u64_limbs)
    for (i, _), row in zip(preset, pre):
        vals[i] = row
    native.eval_circuit_mont(F, kinds, lefts, rights, vals, have)
    native.from_mont_inplace(F, vals)
    got = [int.from_bytes(vals[i].tobytes(), "little") for i in range(n)]
    assert got == trace


def test_sparse_row_mul_matches_python():
    from ligero_tpu.matrices import SparseMatrix
    F = BN254_FR
    rng = random.Random(5)
    num_rows, num_cols = 20, 15
    mat = SparseMatrix(F, num_cols)
    for _ in range(num_rows):
        mat.push_row([(rng.randrange(F.p), rng.randrange(num_cols))
                      for _ in range(rng.randrange(4))])
    r = [rng.randrange(F.p) for _ in range(num_rows)]
    expect = mat.row_mul(r)

    rows, cols, vals = mat.to_coo()
    vals_u64 = native.ints_to_u64_limbs([F.to_mont(v) for v in vals],
                                        F.num_u64_limbs)
    r_u64 = native.ints_to_u64_limbs([F.to_mont(v) for v in r],
                                     F.num_u64_limbs)
    out = native.sparse_row_mul_mont(F, rows, cols, vals_u64, r_u64, num_cols)
    # mont_mul(rR, vR) = (rv)R, so `out` is the Montgomery form of the sum
    native.from_mont_inplace(F, out)
    got = [int.from_bytes(out[i].tobytes(), "little") for i in range(num_cols)]
    assert got == expect

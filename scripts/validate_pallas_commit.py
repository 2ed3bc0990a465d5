#!/usr/bin/env python
"""TPU validation of the fused commit kernels vs host goldens.

1. ntt_pallas(..., from_mont_out=True): n-point NTT with the fused
   Montgomery->canonical epilogue vs host NTT + from_mont.
2. blake2s_columns_pallas: Pallas column hashing vs hashlib on the
   serialized columns.
3. make_prover_core(use_pallas=True, use_pallas_hash=True): full fused
   core (u_canon, leaves, root, lc) vs the host reference kernels.

Pallas interpret mode hangs on this CPU backend, so this must run on
the TPU (see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.engine.ntt import DomainOps
    from ligero_tpu.engine.pallas_ntt import ntt_pallas
    from ligero_tpu.engine import pallas_hash
    from ligero_tpu.fields import BN254_FR
    from ligero_tpu.hashes import column_hash
    from ligero_tpu.parallel.core_step import make_prover_core

    F = BN254_FR
    L = F.num_limbs
    log(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(7)

    def rand_mont(shape_elems):
        ints = [int(x) for x in rng.integers(0, 2 ** 63, int(np.prod(shape_elems)))]
        return F.ints_to_mont_limbs(ints).reshape(*shape_elems, L)

    # --- 1. fused from-mont NTT epilogue ---------------------------------
    B, n = 24, 1024
    x = rand_mont((B, n))
    fk = FieldKernel(F, np)
    dom = DomainOps(fk, n)
    host = fk.from_mont(dom.fft(x))
    t0 = time.time()
    dev = np.asarray(jax.jit(
        lambda a: ntt_pallas(F, a, n, from_mont_out=True))(jnp.asarray(x)))
    ok = np.array_equal(host, dev)
    log(f"fused from-mont NTT ({B}x{n}): {'OK' if ok else 'FAIL'} "
        f"({time.time()-t0:.1f}s)")
    assert ok, "fused NTT epilogue mismatch"

    # --- 2. Pallas Blake2s column hash -----------------------------------
    rows, n = 344, 1024
    u_mont = rand_mont((rows, n))
    u_canon = fk.from_mont(u_mont)
    t0 = time.time()
    leaves = np.asarray(jax.jit(
        lambda a: pallas_hash.blake2s_columns_pallas(a, rows))(
            jnp.asarray(u_canon)))
    host_leaves = [column_hash(F, F.limbs_to_ints(u_canon[:, j, :]))
                   for j in range(n)]
    dev_leaves = [b"".join(int(w).to_bytes(4, "little") for w in row)
                  for row in leaves]
    ok = dev_leaves == host_leaves
    log(f"pallas blake2s columns ({rows}x{n}): {'OK' if ok else 'FAIL'} "
        f"({time.time()-t0:.1f}s)")
    if not ok:
        bad = [j for j in range(n) if dev_leaves[j] != host_leaves[j]]
        log(f"  mismatching columns: {bad[:8]} ({len(bad)} total)")
        raise SystemExit(1)

    # --- 3. full fused core ----------------------------------------------
    four_m, k = 344, 128
    n = 8 * k
    preenc = rand_mont((four_m, k))
    r = rand_mont((four_m,))
    fn = make_prover_core(F, four_m, k, n, use_pallas=True)
    t0 = time.time()
    u_dev, leaves_dev, root_dev, lc_dev = [
        np.asarray(v) for v in jax.jit(fn)(jnp.asarray(preenc), jnp.asarray(r))]
    elapsed = time.time() - t0

    coeffs = DomainOps(fk, k).ifft(preenc)
    u_evals = DomainOps(fk, n).fft_padded(coeffs)
    h_canon = fk.from_mont(u_evals)
    assert np.array_equal(u_dev, h_canon), "core u_canon mismatch"
    h_leaves = [column_hash(F, F.limbs_to_ints(h_canon[:, j, :]))
                for j in range(n)]
    d_leaves = [b"".join(int(w).to_bytes(4, "little") for w in row)
                for row in leaves_dev]
    assert d_leaves == h_leaves, "core leaves mismatch"
    from ligero_tpu.merkle import MerkleTree
    tree = MerkleTree(h_leaves)
    root_bytes = b"".join(int(w).to_bytes(4, "big") for w in root_dev)
    assert root_bytes == tree.root, "core root mismatch"
    lc_host = fk.sum_mod(fk.mont_mul(r[:, None, :], preenc), axis=0)
    assert np.array_equal(lc_dev, lc_host), "core lc mismatch"
    log(f"full fused core ({four_m}x{k}->n={n}): OK ({elapsed:.1f}s)")
    log("ALL PALLAS COMMIT KERNELS VALIDATED")


if __name__ == "__main__":
    main()

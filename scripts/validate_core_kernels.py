#!/usr/bin/env python
"""On-chip bit-validation of the round-3 core kernels.

Pallas kernels cannot run on CPU (interpret-mode hang), so every new
device kernel is bit-compared here against the XLA/host reference ON the
TPU before any benchmark number is trusted:

1. sha256_tree_root_pallas vs the level-by-level HashKernel reduction
2. Pallas lc (mont_mul_pallas + sum_mod_wide) vs XLA mont_mul + sum_mod
3. rs_encode_and_canon (MXU canon_out route) vs host-numpy encode+canon

Exit 0 = all bit-exact.
"""

from __future__ import annotations

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

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()
    from ligero_tpu.engine.backend import Backend
    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.engine.hashops import HashKernel
    from ligero_tpu.engine.pallas_kernels import mont_mul_pallas
    from ligero_tpu.engine.pallas_tree import sha256_tree_root_pallas
    from ligero_tpu.fields import BN254_FR

    field = BN254_FR
    L = field.num_limbs
    log(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(17)
    ok = True

    # 1. fused tree root, n = 4096 and 512
    hk = HashKernel(jnp, unroll=True)
    for n in (512, 4096):
        leaves = rng.integers(0, 2 ** 32, (n, 8)).astype(np.uint32)

        def ref_tree(lv):
            while lv.shape[0] > 1:
                lv = hk.sha256_two_to_one(lv[0::2], lv[1::2])
            return lv[0]

        got = np.asarray(jax.jit(sha256_tree_root_pallas)(leaves))
        want = np.asarray(jax.jit(ref_tree)(leaves))
        match = bool(np.array_equal(got, want))
        ok &= match
        log(f"tree root n={n}: {'OK' if match else 'MISMATCH'}")

    # 2. Pallas lc vs XLA lc
    fk = FieldKernel(field, jnp, unroll=True)
    rows, k = 512, 256
    pre = field.ints_to_mont_limbs(
        [int(v) for v in rng.integers(0, 2 ** 62, rows * k)]
    ).reshape(rows, k, L)
    r = field.ints_to_mont_limbs(
        [int(v) for v in rng.integers(0, 2 ** 62, rows)])

    def lc_pallas(p, rv):
        return fk.sum_mod_wide(mont_mul_pallas(field, p, rv[:, None, :]), 0)

    def lc_xla(p, rv):
        return fk.sum_mod(fk.mont_mul(rv[:, None, :], p), 0)

    got = np.asarray(jax.jit(lc_pallas)(pre, r))
    want = np.asarray(jax.jit(lc_xla)(pre, r))
    match = bool(np.array_equal(got, want))
    ok &= match
    log(f"pallas lc {rows}x{k}: {'OK' if match else 'MISMATCH'}")

    # 3. MXU canon encode vs host numpy
    be_np = Backend(field)
    be = Backend(field, use_jax=True)
    k, n = 512, 4096
    pre = field.ints_to_mont_limbs(
        [int(v) for v in rng.integers(0, 2 ** 62, 16 * k)]).reshape(16, k, L)
    co_d, ca_d = be.rs_encode_and_canon(pre, k, n)
    co_h = np.asarray(be_np._ifft(pre, k))
    ca_h = np.asarray(be_np._from_mont_chunked(be_np._fft_padded(co_h, n)))
    m1 = bool(np.array_equal(np.asarray(co_d), co_h))
    m2 = bool(np.array_equal(np.asarray(ca_d), ca_h))
    ok &= m1 and m2
    log(f"rs_encode_and_canon MXU (k={k}, n={n}): coeffs "
        f"{'OK' if m1 else 'MISMATCH'}, canon {'OK' if m2 else 'MISMATCH'}")

    # 4. radix-2 split over MXU leaves at the 2^20 shape (n=16384)
    from ligero_tpu.engine.mxu_ntt import mxu_ntt_any
    n = 16384
    pre = field.ints_to_mont_limbs(
        [int(v) for v in rng.integers(0, 2 ** 62, 8 * n)]).reshape(8, n, L)
    got = np.asarray(jax.jit(
        lambda v: mxu_ntt_any(field, v, n))(pre))
    want = np.asarray(be_np._fft_padded(pre, n))
    m1 = bool(np.array_equal(got, want))
    got_i = np.asarray(jax.jit(
        lambda v: mxu_ntt_any(field, v, n, inverse=True))(pre))
    want_i = np.asarray(be_np._ifft(pre, n))
    m2 = bool(np.array_equal(got_i, want_i))
    ok &= m1 and m2
    log(f"mxu split n={n}: fwd {'OK' if m1 else 'MISMATCH'}, "
        f"inv {'OK' if m2 else 'MISMATCH'}")

    log("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

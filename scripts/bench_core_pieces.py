#!/usr/bin/env python
"""Decompose the headline commit-core step into its device pieces.

Times each stage of make_prover_core's step at the BENCH shape
(rows=2048, k=512, n=4096 by default) in isolation, warm, with
device-resident staged inputs (fresh bits per iteration defeat the
tunnel's identical-request result cache) and a forced small transfer.
The output is the attack list for the headline number (PERF.md).

Usage: python scripts/bench_core_pieces.py [--rows 2048] [--k 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, jfn, staged, results, iters=3):
    import jax
    times = []
    for x in staged:
        t0 = time.time()
        out = jfn(*x)
        lead = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(lead.reshape(-1)[:2])  # force a small transfer
        times.append(time.time() - t0)
    best = min(times)
    log(f"{name}: {best*1000:.1f} ms (of {len(times)}: "
        f"{', '.join(f'{t*1000:.0f}' for t in times)})")
    results.append({"piece": name, "best_ms": round(best * 1000, 2)})
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="core_pieces.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()
    from ligero_tpu.engine import pallas_hash
    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.engine.hashops import HashKernel
    from ligero_tpu.engine.mxu_ntt import mxu_ntt_pallas, mxu_ok
    from ligero_tpu.engine.pallas_ntt import ntt_pallas
    from ligero_tpu.fields import BN254_FR
    from ligero_tpu.parallel.core_step import _byteswap

    field = BN254_FR
    rows, k = args.rows, args.k
    n = 8 * k
    L = field.num_limbs
    log(f"platform: {jax.devices()[0].platform}; rows={rows} k={k} n={n} "
        f"mxu_ok(n)={mxu_ok(n)}")

    rng = np.random.default_rng(0)

    def fresh(shape_elems, width):
        ints = [int(x) for x in rng.integers(0, 2**62, shape_elems * width)]
        return field.ints_to_mont_limbs(ints).reshape(shape_elems, width, L)

    def stage(maker):
        xs = [maker() for _ in range(args.iters)]
        dev = [tuple(jax.device_put(a) for a in x) for x in xs]
        for d in dev:
            for a in d:
                a.block_until_ready()
        return dev

    results = []
    unroll = True
    fk = FieldKernel(field, jnp, unroll=unroll)
    hk = HashKernel(jnp, unroll=unroll)

    # 1. iNTT_k (radix-2; k=512 is below the MXU envelope)
    intt_fn = jax.jit(lambda x: (mxu_ntt_pallas(field, x, k, inverse=True)
                                 if mxu_ok(k) else
                                 ntt_pallas(field, x, k, inverse=True)))
    staged = stage(lambda: (fresh(rows, k),))
    np.asarray(intt_fn(*staged[0])[0, :1])
    timed(f"intt_k{k}", intt_fn, staged, results, args.iters)

    # 2. n-point NTT with canonical epilogue (MXU when in envelope)
    def ntt_n(c):
        padded = jnp.concatenate(
            [c, jnp.zeros((rows, n - k, L), jnp.uint32)], axis=1)
        if mxu_ok(n):
            return mxu_ntt_pallas(field, padded, n, canon_out=True)
        return ntt_pallas(field, padded, n, from_mont_out=True)
    ntt_fn = jax.jit(ntt_n)
    staged = stage(lambda: (fresh(rows, k),))
    np.asarray(ntt_fn(*staged[0])[0, :1])
    timed(f"ntt_n{n}_canon", ntt_fn, staged, results, args.iters)

    # 3. Blake2s column hashing (Pallas kernel incl. layout prep)
    def hash_cols(u):
        return pallas_hash.blake2s_columns_pallas(u, rows)
    hash_fn = jax.jit(hash_cols)
    staged = stage(lambda: (np.ascontiguousarray(
        fresh(rows, n) & np.uint32(0xFFFF)),))
    np.asarray(hash_fn(*staged[0])[0, :1])
    timed("blake2s_cols", hash_fn, staged, results, args.iters)

    # 4. SHA-256 Merkle tree reduction over the n leaves (fused Pallas
    # kernel — the production use_pallas_hash route)
    from ligero_tpu.engine.pallas_tree import sha256_tree_root_pallas

    def tree(leaves_le):
        return sha256_tree_root_pallas(_byteswap(leaves_le))
    tree_fn = jax.jit(tree)
    staged = stage(lambda: (rng.integers(0, 2**32, (n, 8)).astype(np.uint32),))
    np.asarray(tree_fn(*staged[0])[:1])
    timed("sha_tree_pallas", tree_fn, staged, results, args.iters)

    # 5. challenge combination lc (Pallas mont_mul + exact u32 row sum —
    # the production use_pallas route)
    from ligero_tpu.engine.pallas_kernels import mont_mul_pallas
    lc_fn = jax.jit(lambda p, r: fk.sum_mod_wide(
        mont_mul_pallas(field, p, r[:, None, :]), 0))
    staged = stage(lambda: (fresh(rows, k),
                            fresh(1, rows).reshape(rows, L)))
    np.asarray(lc_fn(*staged[0])[0, :1])
    timed("lc_combination_pallas", lc_fn, staged, results, args.iters)

    out = {"platform": jax.devices()[0].platform, "rows": rows, "k": k,
           "n": n, "pieces": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

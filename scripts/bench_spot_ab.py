#!/usr/bin/env python
"""A/B the MXU spot-column evaluation vs the full-NTT route on-chip.

Times Backend.ntt_columns at the 2^21 verifier shape (the round-4
v.ntt_cols hot spot: 4m rows of k coefficients evaluated at t opened
columns of the n-point codeword) with LIGERO_MXU_SPOT on and off,
bit-comparing the outputs.  Fresh column indices per iteration (traced
argument; also defeats the tunnel's identical-request result cache).

Usage: python scripts/bench_spot_ab.py [--rows 5796] [--k 2048] [--t 156]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5796)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--t", type=int, default=156)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="spot_ab_r5.json")
    args = ap.parse_args()

    import jax

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()
    from ligero_tpu.engine.backend import get_backend
    from ligero_tpu.engine.devmatrix import RowChunkedMatrix
    from ligero_tpu.fields import BN254_FR

    F = BN254_FR
    rows, k, t = args.rows, args.k, args.t
    n = 8 * k
    be = get_backend(F, use_jax=True)
    platform = jax.devices()[0].platform
    log(f"platform={platform} rows={rows} k={k} n={n} t={t}")

    rng = np.random.default_rng(37)
    ints = [int(v) for v in rng.integers(0, 2**62, rows * k)]
    coeffs_np = F.ints_to_mont_limbs(ints).reshape(rows, k, F.num_limbs)
    # chunk layout matching the production RowChunkedMatrix (u16 chunks)
    cr = be._stream_chunk_rows(F, k)
    chunks = []
    for i in range(0, rows, cr):
        blk = coeffs_np[i:i + cr]
        if blk.shape[0] < cr:
            blk = np.concatenate([blk, np.zeros(
                (cr - blk.shape[0], k, F.num_limbs), np.uint32)])
        chunks.append(be.asarray(blk.astype(np.uint16)))
    rcm = RowChunkedMatrix(chunks, rows, cr)
    for c in rcm.chunks:
        c.block_until_ready()
    log(f"staged {len(chunks)} chunks of {cr} rows")

    js_sets = [np.sort(rng.choice(n, size=t, replace=False)).astype(np.int32)
               for _ in range(2 * args.iters + 2)]
    results = {}
    outs = {}
    for variant, env in (("spot_mxu", "1"), ("ntt_route", "0")):
        os.environ["LIGERO_MXU_SPOT"] = env
        t0 = time.time()
        outs[variant] = be.ntt_columns(rcm, n, js_sets[0])
        compile_s = time.time() - t0
        times = []
        for i in range(args.iters):
            js = js_sets[1 + i + (0 if env == "1" else args.iters)]
            t0 = time.time()
            be.ntt_columns(rcm, n, js)
            times.append(time.time() - t0)
        best = min(times)
        log(f"[{variant}] warm best {best:.3f} s "
            f"({', '.join(f'{x:.3f}' for x in times)}; compile {compile_s:.1f}s)")
        results[variant] = {"warm_best_s": round(best, 4),
                            "compile_s": round(compile_s, 1),
                            "times_s": [round(x, 4) for x in times]}
    os.environ.pop("LIGERO_MXU_SPOT", None)

    bitexact = bool(np.array_equal(outs["spot_mxu"], outs["ntt_route"]))
    log(f"bit-exact: {bitexact}")
    assert bitexact, "SPOT OUTPUT MISMATCH"

    out = {"platform": platform, "rows": rows, "k": k, "n": n, "t": t,
           "bitexact": bitexact, "variants": results,
           "speedup": round(results["ntt_route"]["warm_best_s"]
                            / results["spot_mxu"]["warm_best_s"], 2)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

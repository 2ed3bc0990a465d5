#!/usr/bin/env python
"""On-TPU validate + bench the MXU challenge combination (mxu_lc.py)
against the Pallas Montgomery-product path it would replace (the ~29 ms
lc piece of the headline core step, PERF.md round-3 decomposition).

Usage: python scripts/bench_mxu_lc.py [--rows 2048] [--k 512]
           [--out mxu_lc_bench.json]
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
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="mxu_lc_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.engine.mxu_lc import mxu_lc
    from ligero_tpu.engine.pallas_kernels import mont_mul_pallas
    from ligero_tpu.fields import BN254_FR as F
    from ligero_tpu.utils import jaxcache
    jaxcache.enable()

    rows, k, L = args.rows, args.k, F.num_limbs
    rng = np.random.default_rng(13)
    log(f"platform {jax.devices()[0].platform}; rows={rows} k={k}")

    def fresh():
        p = F.ints_to_mont_limbs(
            [int(v) for v in rng.integers(0, 2 ** 62, rows * k)]
        ).reshape(rows, k, L)
        r = F.ints_to_mont_limbs(
            [int(v) for v in rng.integers(0, 2 ** 62, rows)])
        return p, r

    fk_dev = FieldKernel(F, jnp)

    def lc_vpu(p, r):
        prod = mont_mul_pallas(F, p, r[:, None, :])
        return fk_dev.sum_mod_wide(prod, axis=0)

    def lc_mxu(p, r):
        return mxu_lc(F, p, r)

    results = {"platform": jax.devices()[0].platform, "rows": rows,
               "k": k, "kernels": []}
    ref_out = {}
    for name, fn in (("lc_vpu_montmul", lc_vpu), ("lc_mxu_fold", lc_mxu)):
        jfn = jax.jit(fn)
        p0, r0 = fresh()
        t0 = time.time()
        out0 = np.asarray(jfn(jnp.asarray(p0), jnp.asarray(r0)))
        compile_s = time.time() - t0
        ref_out[name] = out0
        # host bit-compare
        fk = FieldKernel(F, np)
        ref = np.asarray(fk.sum_mod(fk.mont_mul(
            r0[:, None, :].astype(np.uint32), p0.astype(np.uint32)), axis=0),
            np.uint32)
        ok = bool(np.array_equal(ref, out0.astype(np.uint32)))
        staged = [tuple(map(jax.device_put, map(jnp.asarray, fresh())))
                  for _ in range(args.iters)]
        for s in staged:
            jax.block_until_ready(s)
        times = []
        for p, r in staged:
            t0 = time.time()
            out = jfn(p, r)
            np.asarray(out[:2])
            times.append(time.time() - t0)
        best = min(times)
        log(f"{name}: {best*1000:.2f} ms (compile {compile_s:.1f}s, "
            f"bitexact={'OK' if ok else 'FAIL'})")
        results["kernels"].append(
            {"name": name, "best_ms": round(best * 1000, 2),
             "compile_s": round(compile_s, 1), "bitexact": ok})

    a, b = results["kernels"]
    if a["bitexact"] and b["bitexact"]:
        results["mxu_speedup"] = round(a["best_ms"] / b["best_ms"], 3)
        log(f"mxu speedup: {results['mxu_speedup']}x")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

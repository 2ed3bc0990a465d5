#!/usr/bin/env python
"""On-TPU benchmark: MXU four-step NTT vs the radix-2 Pallas NTT.

Measures both kernels at the protocol's hot shapes (batched n-point
transforms, the rs_encode inner op — reference hot loop
/root/reference/src/ligero/mod.rs:998-1012), bit-compares each against
the numpy host NTT on sampled rows, and prints points/s plus the
speed-of-light ratios for PERF.md.

Timing discipline per .claude/skills/verify: fresh inputs per iteration
(the tunnel result-caches identical requests) and a forced small result
transfer.

Usage: python scripts/bench_mxu_ntt.py [--out mxu_bench.json]
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


def bench_kernel(name, fn, field, batch, n, iters=3):
    import jax

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()

    rng = np.random.default_rng(hash(name) % 2**31)
    L = field.num_limbs

    def fresh():
        ints = [int(x) for x in rng.integers(0, 2**62, batch * n)]
        return field.ints_to_mont_limbs(ints).reshape(batch, n, L)

    jfn = jax.jit(fn)
    x0 = fresh()
    t0 = time.time()
    out0 = np.asarray(jfn(x0))           # includes compile
    compile_s = time.time() - t0

    # bit-compare sampled rows against the host NTT
    from ligero_tpu.engine.backend import Backend
    be_np = Backend(field)
    check = np.linspace(0, batch - 1, 8, dtype=np.int64)
    ref = np.asarray(be_np.ntt(x0[check], n))
    ok = bool(np.array_equal(ref, out0[check]))
    if not ok:
        bad = np.nonzero(~np.all(ref == out0[check], axis=-1))
        log(f"{name}: MISMATCH at {[tuple(int(v[i]) for v in bad) for i in range(min(5, len(bad[0])))]}")

    # Pre-stage DISTINCT device-resident inputs (fresh bits defeat the
    # tunnel's identical-request result cache) so the timed loop measures
    # the kernel, not the ~256 MB host->device tunnel upload per call.
    staged = [jax.device_put(fresh()) for _ in range(iters)]
    for s in staged:
        s.block_until_ready()

    times = []
    for x in staged:
        t0 = time.time()
        out = jfn(x)
        np.asarray(out[0, :2])           # force a small transfer
        times.append(time.time() - t0)
    best = min(times)
    pts = batch * n / best
    log(f"{name}: {pts/1e6:.1f}M points/s (best of {iters}: {best*1000:.1f} ms, "
        f"compile {compile_s:.1f}s, bitexact={'OK' if ok else 'FAIL'})")
    return {"name": name, "batch": batch, "n": n, "points_per_s": round(pts),
            "best_ms": round(best * 1000, 2), "compile_s": round(compile_s, 1),
            "bitexact": ok}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="mxu_bench.json")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=8192)
    args = ap.parse_args()

    import jax

    from ligero_tpu.engine.mxu_ntt import mxu_ntt_any as mxu_ntt_pallas
    from ligero_tpu.engine.mxu_ntt import split_n
    from ligero_tpu.engine.pallas_ntt import ntt_pallas_any as ntt_pallas
    from ligero_tpu.fields import BN254_FR

    field = BN254_FR
    log(f"platform: {jax.devices()[0].platform}; batch={args.batch} n={args.n} "
        f"split={split_n(args.n)}")

    results = {"platform": jax.devices()[0].platform,
               "batch": args.batch, "n": args.n, "kernels": []}
    results["kernels"].append(bench_kernel(
        "radix2_pallas", lambda x: ntt_pallas(field, x, args.n),
        field, args.batch, args.n))
    results["kernels"].append(bench_kernel(
        "mxu_fourstep", lambda x: mxu_ntt_pallas(field, x, args.n),
        field, args.batch, args.n))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

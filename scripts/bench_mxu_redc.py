#!/usr/bin/env python
"""On-TPU A/B: serial 17-step REDC chain vs the data-parallel fold
inside the MXU four-step NTT kernel (round-3 VERDICT item 5 / ROADMAP
#1: the REDC dependency chain runs at ~11% of the VPU op ceiling; the
fold trades it for ~3x the op count with zero step-to-step serialization
— _FieldVm.fold_redc_cols, bit-identical, numpy-proven).

Usage: python scripts/bench_mxu_redc.py [--out mxu_redc_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from bench_mxu_ntt import bench_kernel, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="mxu_redc_ab.json")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--small", action="store_true",
                    help="also A/B the relaxed MIN_N2=16 envelope at "
                         "n=512 (the headline iNTT_k shape) vs radix-2")
    args = ap.parse_args()

    import jax

    import ligero_tpu.engine.mxu_ntt as mx
    from ligero_tpu.engine.pallas_ntt import ntt_pallas_any as ntt_pallas
    from ligero_tpu.fields import BN254_FR

    field = BN254_FR
    log(f"platform: {jax.devices()[0].platform}; batch={args.batch} "
        f"n={args.n}")
    results = {"platform": jax.devices()[0].platform,
               "batch": args.batch, "n": args.n, "kernels": []}

    for fold in (False, True):
        mx.FOLD_REDC = fold
        mx._mxu_kernel_factory.cache_clear()  # flag isn't in the key
        name = "mxu_fold_redc" if fold else "mxu_serial_redc"
        results["kernels"].append(bench_kernel(
            name, lambda x: mx.mxu_ntt_any(field, x, args.n),
            field, args.batch, args.n))
    mx.FOLD_REDC = False
    mx._mxu_kernel_factory.cache_clear()

    a, b = results["kernels"]
    if a["bitexact"] and b["bitexact"]:
        results["fold_speedup"] = round(
            b["points_per_s"] / a["points_per_s"], 3)
        log(f"fold speedup: {results['fold_speedup']}x")

    if args.small:
        # relaxed envelope at the headline iNTT shape (2048 rows x k=512)
        results["small_n512"] = []
        results["small_n512"].append(bench_kernel(
            "radix2_n512", lambda x: ntt_pallas(field, x, 512),
            field, 2048, 512))
        mx.MIN_N2 = 16
        mx._mxu_kernel_factory.cache_clear()
        results["small_n512"].append(bench_kernel(
            "mxu_n512_minn2_16", lambda x: mx.mxu_ntt_any(field, x, 512),
            field, 2048, 512))
        mx.MIN_N2 = 32
        mx._mxu_kernel_factory.cache_clear()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

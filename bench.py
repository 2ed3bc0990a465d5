#!/usr/bin/env python
"""Ligero-TPU benchmark driver.

Measures the prover's bulk compute core — batched Reed–Solomon encoding
(iNTT_k + NTT_n over all 4m rows), Montgomery->canonical conversion,
Blake2s column hashing, SHA-256 Merkle tree, and the challenge-weighted
row combination — on the default JAX platform (the real TPU chip when
available, CPU otherwise).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline note: the reference (NP-Eng/ligero) publishes no numbers
(BASELINE.md).  ``vs_baseline`` is therefore reported against the
BASELINE.md target formulation "RS-encode + Merkle-commit throughput >=
10x the Rust prover per host": we use a documented estimate of the
arkworks CPU pipeline at ~5M RS-encoded field elements/s/host (multi-core
radix-2 FFT over bn254 Fr plus Blake2s/SHA-256 hashing; flamegraph-scale
extrapolation), i.e. vs_baseline = value / (10 * 5e6).  A value >= 1.0
meets the 10x target.
"""

import json
import os
import sys
import time

import numpy as np

RUST_HOST_ESTIMATE_ELEMS_PER_S = 5e6
TARGET_MULTIPLIER = 10.0

# Bench scale: 4m x k message matrix -> 4m x n codeword matrix.
# (2048 x 512 -> 2048 x 4096: 8.4M RS-encoded elements per step, ~1.5 GB
# peak on-device.)  Override with LIGERO_BENCH_SCALE=small for CI.
SCALES = {
    "large": (2048, 512),
    "medium": (1024, 256),
    "small": (64, 64),
}


def run_bench(four_m: int, k: int, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from ligero_tpu.fields import BN254_FR
    from ligero_tpu.parallel import make_prover_core

    field = BN254_FR
    n = 8 * k
    # Measured on v5e (PERF.md): scan core 2.27M elems/s, chunked-unrolled
    # 5.4M, Pallas-NTT core 18.2M.  Remote compiles are slow cold but
    # server-cached across processes.
    unroll = os.environ.get("LIGERO_BENCH_UNROLL", "1") == "1"
    use_pallas = os.environ.get("LIGERO_BENCH_PALLAS", "1") == "1"
    fn = jax.jit(make_prover_core(field, four_m, k, n, unroll=unroll,
                                  use_pallas=use_pallas))

    def inputs(seed: int):
        rng = np.random.default_rng(seed)
        preenc = field.ints_to_mont_limbs(
            [int(x) for x in rng.integers(0, 2**62, four_m * k)]
        ).reshape(four_m, k, field.num_limbs)
        r = field.ints_to_mont_limbs(
            [int(x) for x in rng.integers(0, 2**62, four_m)])
        return jnp.asarray(preenc), jnp.asarray(r)

    pa, ra = inputs(0)
    t0 = time.time()
    _ = np.asarray(fn(pa, ra)[2])  # transfer the root: forces completion
    compile_s = time.time() - t0

    best = float("inf")
    for i in range(1, iters + 1):
        # fresh inputs every iteration (the tunneled execution service
        # result-caches identical requests) and a forced result transfer
        # (block_until_ready can return before remote completion)
        pa, ra = inputs(i)
        _ = np.asarray(pa[0, 0, :])
        t0 = time.time()
        _ = np.asarray(fn(pa, ra)[2])
        best = min(best, time.time() - t0)

    elems = four_m * n  # RS-encoded field elements produced per step
    return elems / best, best, compile_s


def main():
    scale = os.environ.get("LIGERO_BENCH_SCALE", "large")
    four_m, k = SCALES.get(scale, SCALES["large"])

    import jax
    platform = jax.devices()[0].platform

    try:
        value, step_s, compile_s = run_bench(four_m, k)
    except Exception as e:  # noqa: BLE001 — degrade to a smaller config
        sys.stderr.write(f"bench at scale {scale} failed ({e}); retrying small\n")
        four_m, k = SCALES["small"]
        value, step_s, compile_s = run_bench(four_m, k)

    result = {
        "metric": "RS-encode + Merkle-commit throughput (single chip)",
        "value": round(value, 1),
        "unit": "field elems/s",
        "vs_baseline": round(value / (TARGET_MULTIPLIER * RUST_HOST_ESTIMATE_ELEMS_PER_S), 3),
        "config": {"rows_4m": four_m, "k": k, "n": 8 * k,
                   "platform": platform, "step_s": round(step_s, 4),
                   "compile_s": round(compile_s, 1)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

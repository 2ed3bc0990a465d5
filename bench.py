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

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()
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


def corruption_canary() -> str:
    """On-device self-check before trusting any number: mont_mul at
    2900x1024 (the silent-corruption shape isolated in round 1, fixed by
    FieldKernel chunking) bit-compared against the host golden kernel on
    sampled rows.  ~10 s warm (the kernel is compile-cached)."""
    import jax
    import jax.numpy as jnp

    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.fields import BN254_FR

    field = BN254_FR
    rng = np.random.default_rng(20240817)
    rows, cols = 2900, 1024
    ints = [int(x) for x in rng.integers(0, 2 ** 63, 2 * rows * cols)]
    limbs = field.ints_to_mont_limbs(ints).reshape(2, rows, cols, -1)
    a, b = limbs[0], limbs[1]
    dev = np.asarray(jax.jit(FieldKernel(field, jnp, unroll=False).mont_mul)(
        jnp.asarray(a), jnp.asarray(b)))
    check = np.linspace(0, rows - 1, 8, dtype=np.int64)
    host = FieldKernel(field, np).mont_mul(a[check], b[check])
    if not np.array_equal(host, dev[check]):
        raise SystemExit(
            json.dumps({"metric": "CANARY FAILED", "value": 0,
                        "unit": "corrupt", "vs_baseline": 0}))

    # device F::rand vs host sampler (prover+verifier share the device
    # expansion path, so only a host compare catches a device fault)
    from ligero_tpu.engine.backend import get_backend
    from ligero_tpu.sampling import rand_field_elements_limbs
    seed = bytes(range(32))
    dev_r = get_backend(field, use_jax=True).rand_field_mont(100_000, seed)
    if dev_r is None or not np.array_equal(
            np.asarray(dev_r), rand_field_elements_limbs(field, 100_000, seed)):
        raise SystemExit(
            json.dumps({"metric": "CANARY FAILED (device F::rand)", "value": 0,
                        "unit": "corrupt", "vs_baseline": 0}))
    return "ok"


def _attach_recorded(result: dict) -> None:
    """Attach recorded per-fixture and at-scale results (produced by
    scripts/bench_configs.py and scripts/at_scale.py on this hardware)
    so the one-line JSON carries proofs/s + per-phase breakdowns."""
    here = os.path.dirname(os.path.abspath(__file__))
    for key, names in (("last_tpu_headline", ("bench_tpu_last.json",)),
                       ("fixtures", ("bench_configs.json",)),
                       ("at_scale_2pow20_r5", ("atscale_20_r5.json",)),
                       ("cache_hit_cold_2pow21", ("atscale_21_r5d_cachehit.json",
                                                  "atscale_21_r5_cachehit.json",)),
                       ("cache_hit_cold_2pow22", ("atscale_22_r5d_cachehit.json",
                                                  "atscale_22_r5_cachehit.json",)),
                       ("zk_2pow20", ("atscale_zk20_r5b.json",
                                      "atscale_zk20_r5.json",)),
                       ("zk_2pow21", ("atscale_zk21_r5.json",)),
                       ("poseidon_mt_at_scale", ("poseidon_mt_r5.json",)),
                       ("spot_eval_ab", ("spot_ab_r5.json",)),
                       ("mxu_factors_ab", ("mxu_factors_ab.json",)),
                       ("headline_pipelined", ("headline_pipelined_r5.json",)),
                       ("at_scale", ("atscale_r4e.json",
                                     "atscale_r4.json",
                                     "atscale_r3_final.json",
                                     "atscale_r3.json", "atscale_r2f.json",
                                     "atscale_r2e.json", "atscale_r2d.json",
                                     "atscale_r2c.json", "atscale_r2b.json",
                                     "atscale_r2.json",
                                     "atscale_17_smoke.json")),
                       ("at_scale_2pow20", ("atscale_r3_final.json",
                                            "atscale_r3.json",
                                            "atscale_r2g.json",
                                            "atscale_r2d.json")),
                       ("cold_start", ("atscale_r3_cold.json",)),
                       ("at_scale_2pow21", ("atscale_21_r5d.json",
                                            "atscale_21_r5.json",
                                            "atscale_21_r4e.json",
                                            "atscale_21_r4.json",
                                            "atscale_r3_2pow21.json")),
                       ("at_scale_2pow22", ("atscale_22_r5d.json",
                                            "atscale_22_r5.json",
                                            "atscale_22_r4e.json",
                                            "atscale_22_r4.json")),
                       ("at_scale_sync_attribution", ("atscale_sync_r4f.json",
                                                      "atscale_r3_sync.json")),
                       ("streaming_at_scale", ("atscale_streaming_r4b.json",
                                               "atscale_streaming_r4.json",
                                               "atscale_streaming_r3.json",
                                               "atscale_streaming.json")),
                       ("zk_at_scale", ("atscale_zk_r4e.json",
                                        "atscale_zk_r4.json",
                                        "atscale_zk_r3.json",
                                        "atscale_zk.json")),
                       ("mxu_redc_ab", ("mxu_redc_ab.json",)),
                       ("fourstep_ntt", ("fourstep_ntt_validation.json",)),
                       ("scaling_methodology", ("scaling.json",)),
                       ("scaling_attribution", ("scaling_attrib.json",)),
                       ("core_pieces", ("core_pieces_r5.json",
                                        "core_pieces_r4f.json",
                                        "core_pieces_r3b.json",
                                        "core_pieces.json")),
                       ("mxu_ntt", ("mxu_bench_r3.json",
                                    "mxu_ntt_bench.json")),
                       ("mxu_ntt_16384", ("mxu_bench_16384.json",))):
        for name in names:
            path = os.path.join(here, name)
            if os.path.exists(path):
                try:
                    with open(path) as f:
                        result[key] = {"recorded_from": name, **json.load(f)}
                except Exception:  # noqa: BLE001
                    pass
                break


def _backend_reachable(timeout_s: int = 600) -> bool:
    """Probe the default JAX backend in a subprocess: the tunneled TPU can
    be transiently unavailable and jax.devices() then HANGS (no error), so
    the probe must be killable.  A CPU number (clearly labeled) beats a
    hung/absent bench artifact."""
    import subprocess
    try:
        r = subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    scale = os.environ.get("LIGERO_BENCH_SCALE", "large")
    four_m, k = SCALES.get(scale, SCALES["large"])

    import jax
    if (os.environ.get("LIGERO_BENCH_TPU_PROBE", "1") == "1"
            and not _backend_reachable()):
        sys.stderr.write("default backend unreachable; falling back to CPU\n")
        jax.config.update("jax_platforms", "cpu")
        os.environ["LIGERO_BENCH_PALLAS"] = "0"  # Pallas cannot run on CPU
        os.environ["LIGERO_BENCH_UNROLL"] = "0"  # XLA CPU chokes on unroll
        four_m, k = SCALES["small"]
    platform = jax.devices()[0].platform

    canary = "skipped"
    if platform != "cpu" and os.environ.get("LIGERO_BENCH_CANARY", "1") == "1":
        canary = corruption_canary()

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
        "baseline_note": (
            "denominator = 10x a documented ESTIMATE of the arkworks CPU "
            "pipeline (5e6 RS elems/s/host); the reference publishes no "
            "numbers (BASELINE.md) and no Rust toolchain exists here to "
            "measure it"),
        # sensitivity: vs_baseline >= 1.0 iff the true Rust host
        # throughput is below value/10; this states the break-even point
        # so the 10x claim is auditable against any future measurement
        "baseline_breakeven_rust_elems_per_s": round(value / TARGET_MULTIPLIER),
        "config": {"rows_4m": four_m, "k": k, "n": 8 * k,
                   "platform": platform, "step_s": round(step_s, 4),
                   "compile_s": round(compile_s, 1), "canary": canary},
    }
    _attach_recorded(result)
    # refresh the recorded TPU headline so a later down-tunnel collection
    # still carries the most recent real-chip number — but never clobber
    # it with a degraded small-scale fallback run (e.g. a transient
    # kernel-compile failure mid-development)
    prev_best = 0.0
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_tpu_last.json")) as f:
            prev_best = float(json.load(f).get("value", 0.0))
    except (OSError, ValueError):
        pass
    if platform != "cpu" and (four_m, k) == SCALES.get(scale, SCALES["large"]) \
            and result["value"] > 0.5 * prev_best:
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_tpu_last.json"), "w") as f:
                json.dump({
                    "note": ("last bench.py headline measured on the real "
                             "TPU chip (recorded so a transiently-down "
                             "tunnel at collection time does not lose the "
                             "TPU number)"),
                    "measured_utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "metric": result["metric"], "value": result["value"],
                    "unit": result["unit"],
                    "vs_baseline": result["vs_baseline"],
                    "config": result["config"]}, f, indent=2)
        except OSError:
            pass
        result.pop("last_tpu_headline", None)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

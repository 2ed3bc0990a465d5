"""Test harness config: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised hermetically.

The ambient environment registers the tunneled 'axon' TPU backend from
``sitecustomize`` at interpreter startup and pins ``JAX_PLATFORMS=axon``,
so env vars alone are not enough — we override the jax config directly
(this runs before any backend is initialised because no test module
touches jax at import time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers: the heavyweight e2e/multi-process tests (>15 s each, ~19 of
# the suite's ~23 min) are marked `slow`.  The DEFAULT run still includes
# everything (CI/judge parity); for iteration use
#
#     python -m pytest tests/ -q -m "not slow"      (~4 min)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_TESTS = {
    "test_full_prover_sharded_poseidon_fixture",
    "test_graft_entry_dryrun",
    "test_two_process_distributed_core",
    "test_witness_json_and_wtns_paths",
    "test_poseidon_prove_and_verify",
    "test_e2e_sharded_streaming_two_devices",
    "test_e2e_sharded_streaming_prove_verify",
    "test_full_prover_sharded_byte_identical",
    "test_e2e_streaming_commit_chunked_r_coeffs",
    "test_synthetic_2e13_prove_verify_default",
    "test_zk_e2e_sharded_streaming",
    "test_zk_batch_matches_sequential",
    "test_zk_e2e_streaming_commit",
    "test_verify_batch_zk",
    "test_zk_batch_fresh_seeds_differ",
    "test_prove_uses_device_path_and_matches_numpy_proof",
    "test_e2e_zk_streamed",
    "test_e2e_prove_verify_streaming_commit",
    "test_reprove_different_witness_resident",
    "test_engine_equivalence_proof_bytes",
    "test_batch_subbatching",
    "test_e2e_prove_verify_streamed",
    "test_batch_matches_sequential",
    "test_verify_batch_matches_sequential",
    "test_prove_batch_sharded_byte_identical",
    "test_prove_batch_sharded_zk",
    "test_warmup_verb",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight e2e/multi-process tests (>15s)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

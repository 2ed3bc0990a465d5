#!/bin/bash
# Golden-vector capture driver.  Run on a machine WITH a Rust toolchain
# and network access (this build environment has neither):
#
#   bash capture.sh /path/to/NP-Eng-ligero-checkout [outdir]
#
# Copies the reference into ./ligero-src, applies the visibility patch
# (patch_reference.py — no behavioral change), builds, and runs the
# harness, writing golden JSONs to outdir (default ../../tests/golden).
# Then `pytest tests/test_golden.py` in the repo root picks them up
# automatically.
set -euo pipefail
cd "$(dirname "$0")"

REF=${1:?usage: capture.sh /path/to/reference [outdir]}
OUT=${2:-../../tests/golden}

rm -rf ligero-src
cp -r "$REF" ligero-src
rm -rf ligero-src/.git ligero-src/target
python3 patch_reference.py ligero-src

mkdir -p "$OUT"
cargo run --release -- "$OUT"
echo "goldens written to $OUT"

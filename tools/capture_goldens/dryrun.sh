#!/bin/bash
# Kit dry-run: validate everything that can be validated WITHOUT a Rust
# toolchain, so that on a Rust-capable host `bash capture.sh <ref>` works
# first try (round-3 VERDICT item 9: keep the golden-capture path warm).
#
#   bash dryrun.sh [/path/to/reference]      # default /root/reference
#
# Checks: (1) kit file inventory, (2) the patch applies cleanly to a
# scratch copy of the reference, (3) the harness's emitted golden
# filenames exactly match what tests/test_golden.py gates on, (4) cargo
# metadata resolves IF a toolchain is present (skipped otherwise).
set -euo pipefail
cd "$(dirname "$0")"
REF=${1:-/root/reference}

fail() { echo "DRYRUN FAIL: $*" >&2; exit 1; }

# 1. inventory
for f in Cargo.toml capture.sh patch_reference.py src/main.rs; do
    [ -e "$f" ] || fail "missing kit file $f"
done

# 2. patch applies to a scratch copy (no behavioral change — visibility only)
SCRATCH=$(mktemp -d)
trap 'rm -rf "$SCRATCH"' EXIT
cp -r "$REF" "$SCRATCH/ref"
rm -rf "$SCRATCH/ref/.git" "$SCRATCH/ref/target"
python3 patch_reference.py "$SCRATCH/ref" || fail "patch_reference.py errored"
grep -q "pub " "$SCRATCH/ref/src/ligero/mod.rs" || fail "patch left no pub items"

# 3. harness output filenames == the test gate's expectations
HARNESS=$(grep -o '"[a-z0-9_]*\.json"' src/main.rs | tr -d '"' | sort -u)
GATED=$(grep -o '"[a-z0-9_]*\.json"' ../../tests/test_golden.py | tr -d '"' | sort -u)
for g in $GATED; do
    echo "$HARNESS" | grep -qx "$g" || fail "test_golden.py gates on $g but src/main.rs never writes it"
done
echo "filename contract ok: $(echo "$GATED" | wc -l) gated files all emitted by the harness"

# 4. cargo metadata (only on a Rust-capable host)
if command -v cargo >/dev/null 2>&1; then
    cargo metadata --offline --format-version 1 >/dev/null 2>&1 \
        || cargo metadata --format-version 1 >/dev/null \
        || fail "cargo metadata cannot resolve the pinned dependency set"
    echo "cargo metadata ok"
else
    echo "cargo not present — dependency resolution check skipped (expected here)"
fi

echo "DRYRUN OK — on a Rust-capable host run: bash capture.sh $REF"

"""Merkle-tree parameter plumbing (API parity with the reference).

The reference abstracts its hashers behind ``LigeroMTParams`` and the
concrete ``LigeroMTTestParams`` (/root/reference/src/ligero/types.rs):
leaf hash = identity, two-to-one = SHA-256, column hash =
Blake2s-256 over the compressed column encoding, with "parameters" drawn
from a seeded RNG.  For these hash families the setup is parameterless
(ark's setups return unit-like values), so this shim exists for API
parity and as the extension point for parameterized hashers (e.g. a
Poseidon column hasher) in later versions.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import FieldSpec
from ..hashes import column_hash, sha256_compress


@dataclass(frozen=True)
class LigeroMTTestParams:
    """Default commitment configuration (Blake2s leaves + SHA-256 tree)."""

    def col_hash(self, field: FieldSpec, column: list[int]) -> bytes:
        return column_hash(field, column)

    def two_to_one(self, left: bytes, right: bytes) -> bytes:
        return sha256_compress(left, right)

    def leaf_hash(self, leaf: bytes) -> bytes:  # LeafIdentityHasher
        return leaf

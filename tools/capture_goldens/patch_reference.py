#!/usr/bin/env python3
"""Pub-ify the private fields the capture harness needs to serialize.

Applied to a COPY of the reference tree (never the original) by
capture.sh.  Purely a visibility change: makes every field of
`LigeroCircuit`, `LigeroProof`, `InterleavedProof`,
`LinearConstraintsProof` and `QuadraticConstraintsProof` in
src/ligero/mod.rs `pub`, and re-exports `utils` + `matrices` as pub so
the harness can cross-check `get_distinct_indices_from_prng`.

Targets the reference snapshot at /root/reference (2024-10-22); the
struct spans below are located by name, not line number, so small
upstream drift is tolerated.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

STRUCTS = [
    "LigeroCircuit",
    "LigeroProof",
    "InterleavedProof",
    "LinearConstraintsProof",
    "QuadraticConstraintsProof",
]


def pubify_struct_fields(text: str, struct_name: str) -> str:
    m = re.search(rf"pub struct {struct_name}\b", text)
    if not m:
        raise SystemExit(f"struct {struct_name} not found")
    # Walk to the opening brace, then to its matching close.
    open_idx = text.index("{", m.start())
    depth, i = 1, open_idx + 1
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    body = text[open_idx + 1 : i - 1]
    # Field lines look like `    name: Type,` (possibly multi-line types);
    # only rewrite identifiers at a 4-space indent that aren't already pub
    # and aren't comments/attributes.
    body = re.sub(
        r"(?m)^(    )([a-z_][a-z0-9_]*)(\s*:)",
        r"\1pub \2\3",
        body,
    )
    return text[: open_idx + 1] + body + text[i - 1 :]


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "ligero-src")
    mod = root / "src" / "ligero" / "mod.rs"
    text = mod.read_text()
    for s in STRUCTS:
        text = pubify_struct_fields(text, s)
    text = text.replace("mod types;", "pub mod types;", 1)
    mod.write_text(text)

    lib = root / "src" / "lib.rs"
    text = lib.read_text()
    text = text.replace("pub(crate) mod utils;", "pub mod utils;")
    text = text.replace("pub(crate) mod matrices;", "pub mod matrices;")
    lib.write_text(text)

    utils = root / "src" / "utils.rs"
    text = utils.read_text()
    text = text.replace("pub(crate) fn", "pub fn")
    utils.write_text(text)

    print("patched", mod, lib, utils)


if __name__ == "__main__":
    main()

"""Device-resident row-chunked matrices.

The prover's bulk matrices (the n-wide codeword matrix U and its
coefficient form) exceed the single-buffer corruption budget of this TPU
backend (~2 GB silently computes wrong results), so round-1 streamed them
through the host.  On a tunneled TPU that is catastrophic: device->host
transfers run at a few MB/s, and U alone is 1.5 GB at 2^19 gates — the
transfer, not the math, dominated the at-scale prove (rs_encode 519 s of
a 932 s prove, ~1 s of which is compute).

``RowChunkedMatrix`` keeps the matrix on the device as a list of
fixed-row-count chunks, each under ``Backend.MAX_DEVICE_BYTES``; consumers
assemble row blocks or column blocks on the device and only tiny results
(digests, opened columns, combination polynomials) ever cross the tunnel.

No reference counterpart (the reference is host-resident CPU throughout);
this is the TPU-native equivalent of its in-memory U handling
(/root/reference/src/ligero/mod.rs:516-551).
"""

from __future__ import annotations


class RowChunkedMatrix:
    """A logical ``(rows, n, L)`` device matrix stored as equal-row chunks.

    ``chunks[i]`` holds rows ``[i*chunk_rows, (i+1)*chunk_rows)``; rows at
    and beyond ``rows`` in the final chunk are exact zeros (padding), so
    including them in sums/NTTs is harmless.
    """

    def __init__(self, chunks: list, rows: int, chunk_rows: int):
        assert chunks, "empty RowChunkedMatrix"
        self.chunks = chunks
        self.rows = rows
        self.chunk_rows = chunk_rows
        self.n = chunks[0].shape[1]
        self.L = chunks[0].shape[2]

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.rows, self.n, self.L)


class StreamedCodewords:
    """A logical ``(rows, n, L)`` canonical codeword matrix that is never
    materialized anywhere — not in HBM, not on the host.

    Holds the (much smaller) device-resident coefficient matrix; consumers
    re-encode row chunks on demand: the streaming commit hashes each chunk
    into per-column incremental Blake2s states
    (``Backend.commit_columns``), and column openings re-encode chunks and
    gather only the ``t`` opened columns (``Backend.gather_columns``).
    This is what lets proof sizes scale past the HBM residency budget
    (k/n = 1/8: the coefficient form is 8x smaller than U).
    """

    def __init__(self, coeffs: "RowChunkedMatrix", n: int, rows: int):
        self.coeffs = coeffs
        self.n = n
        self.rows = rows
        self.L = coeffs.L

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.rows, self.n, self.L)

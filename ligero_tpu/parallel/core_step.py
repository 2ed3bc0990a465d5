"""Jittable prover compute cores: single-chip and mesh-sharded.

This is the TPU "training step" of the framework: the prover's bulk phase

    preenc (4m x k)  --iNTT_k/NTT_n-->  U (4m x n)
                     --from-Montgomery, serialize-->
                     --Blake2s columns--> leaves --SHA-256--> Merkle root
    plus the interleaved combination  r^T . preenc  (k)

Sharding design (SURVEY.md §5.8): the **row axis is the data-parallel
axis** — each chip Reed–Solomon-encodes its own block of the 4m rows with
zero communication (the NTT never crosses rows).  Column hashing needs
whole columns, so the codeword matrix is re-sharded row->column with a
single ``all_to_all`` over ICI; each chip then hashes its n/D columns and
reduces its local Merkle subtree.  The D subtree roots are ``all_gather``ed
(32 bytes each) and the log2(D) top levels are finished redundantly on
every chip.  The challenge combination r^T·preenc is a per-chip partial
sum whose D partials are gathered and modularly reduced — the modular sum
cannot ride a raw ``psum`` because limb carries overflow, and at (D, k, L)
size the gather is cheaper than a carry-correct custom reduction.

No NCCL/MPI analogue exists in the reference (it is single-process rayon;
SURVEY.md §2.3) — this distribution scheme is the BASELINE.json north-star
design, not a port.
"""

from __future__ import annotations

import numpy as np

from ..engine.fieldops import FieldKernel
from ..engine.hashops import HashKernel
from ..engine.ntt import DomainOps
from ..fields import FieldSpec


def _byteswap(x):
    return (((x & np.uint32(0xFF)) << np.uint32(24))
            | ((x & np.uint32(0xFF00)) << np.uint32(8))
            | ((x >> np.uint32(8)) & np.uint32(0xFF00))
            | (x >> np.uint32(24)))


def _column_words(xp, u_canon, four_m: int, L: int):
    """Serialize columns of (rows, n, L) canonical limbs into padded
    Blake2s message words; the length prefix always encodes ``four_m``
    (the full column height, even when ``u_canon`` is a row shard)."""
    n = u_canon.shape[1]
    byte_len = 8 + four_m * L * 2
    pad_words = (-(2 + four_m * (L // 2))) % 16
    cols = xp.moveaxis(u_canon, 1, 0)  # (n, rows, L)
    packed = cols[..., 0::2] | (cols[..., 1::2] << np.uint32(16))
    words = packed.reshape(n, -1)
    prefix = np.zeros(2, dtype=np.uint32)
    prefix[0] = four_m & 0xFFFFFFFF
    prefix[1] = four_m >> 32
    pre = xp.broadcast_to(xp.asarray(prefix), (n, 2))
    words = xp.concatenate(
        [pre, words, xp.zeros((n, pad_words), np.uint32)], axis=-1)
    return words, byte_len


def make_prover_core(field: FieldSpec, four_m: int, k: int, n: int,
                     unroll: bool | None = None,
                     row_chunk: int | None = None,
                     use_pallas: bool = False,
                     use_pallas_hash: bool | None = None):
    """Single-chip jittable core.

    Returns ``fn(preenc (4m,k,L) mont, r (4m,L) mont) ->
    (u_canon (4m,n,L) canonical, leaves_le (n,8), root_be (8,), lc (k,L) mont)``.

    ``row_chunk``: in unroll mode, process the (independent) rows of the
    RS-encode phase in chunks via ``lax.map`` — the unrolled limb graph
    fuses into few kernels per chunk while peak HBM stays bounded at
    ``O(row_chunk * n * L)`` instead of the scheduler keeping dozens of
    full-matrix temporaries alive.

    ``use_pallas``: VMEM-resident Pallas NTTs with the Montgomery->
    canonical conversion fused into the final transform's epilogue (one
    HBM round-trip less than a separate conversion pass).
    ``use_pallas_hash``: Blake2s column hashing in Pallas (column tiles
    ride VPU lanes, chaining state lives in VMEM scratch); defaults to
    following ``use_pallas`` when the shape allows it.
    """
    import jax
    import jax.numpy as jnp

    from ..engine.backend import default_unroll
    from ..engine import pallas_hash
    if unroll is None:
        unroll = default_unroll(True)
    if row_chunk is None and unroll:
        row_chunk = max(1, min(four_m, (1 << 24) // (n * field.num_limbs)))
    if use_pallas_hash is None:
        use_pallas_hash = use_pallas and pallas_hash.supports_shape(n)
    fk = FieldKernel(field, jnp, unroll=unroll)
    hk = HashKernel(jnp, unroll=unroll)
    dom_k = DomainOps(fk, k)
    dom_n = DomainOps(fk, n)
    L = field.num_limbs

    def encode_block(block):
        coeffs = dom_k.ifft(block)
        u_evals = dom_n.fft_padded(coeffs)
        return fk.from_mont(u_evals)

    def encode_chunked(preenc):
        if unroll and row_chunk and four_m % row_chunk == 0 and four_m > row_chunk:
            blocks = preenc.reshape(four_m // row_chunk, row_chunk, k, L)
            u_canon = jax.lax.map(encode_block, blocks)
            return u_canon.reshape(four_m, n, L)
        return encode_block(preenc)

    def encode_pallas(preenc):
        from ..engine.backend import _env_on
        from ..engine.mxu_ntt import mxu_any_ok, mxu_ntt_any
        from ..engine.pallas_ntt import ntt_pallas
        use_mxu = _env_on("LIGERO_MXU_NTT")
        if use_mxu and mxu_any_ok(k, field):
            coeffs = mxu_ntt_any(field, preenc, k, inverse=True)
        else:
            coeffs = ntt_pallas(field, preenc, k, inverse=True)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((four_m, n - k, L), jnp.uint32)], axis=1)
        if use_mxu and mxu_any_ok(n, field):
            # canonical limbs fall out of the R^-1-folded stage-2 twiddle
            return mxu_ntt_any(field, padded, n, canon_out=True)
        return ntt_pallas(field, padded, n, from_mont_out=True)

    def fn(preenc, r):
        u_canon = encode_pallas(preenc) if use_pallas else encode_chunked(preenc)
        if use_pallas_hash:
            leaves_le = pallas_hash.blake2s_columns_pallas(u_canon, four_m)
        else:
            words, byte_len = _column_words(jnp, u_canon, four_m, L)
            leaves_le = hk.blake2s(words, byte_len)
        if use_pallas_hash:
            from ..engine.pallas_tree import sha256_tree_root_pallas
            root = sha256_tree_root_pallas(_byteswap(leaves_le))
        else:
            level = _byteswap(leaves_le)
            while level.shape[0] > 1:
                level = hk.sha256_two_to_one(level[0::2], level[1::2])
            root = level[0]
        if use_pallas:
            from ..engine.backend import _env_on
            from ..engine.mxu_lc import mxu_lc, mxu_lc_ok
            if _env_on("LIGERO_MXU_LC") and mxu_lc_ok(field, k):
                # MXU int8 limb contraction: 22.8 ms vs 32.0 ms for the
                # VPU Montgomery product at the headline shape
                # (mxu_lc_bench.json) — same default as Backend.row_combine
                lc = mxu_lc(field, preenc, r)
            else:
                # Pallas Montgomery products (119M mul/s vs ~19M for the
                # XLA limb graph) + one exact uint32 row reduction
                from ..engine.pallas_kernels import mont_mul_pallas
                prod = mont_mul_pallas(field, preenc, r[:, None, :])
                lc = fk.sum_mod_wide(prod, axis=0)
        else:
            lc = fk.sum_mod(fk.mont_mul(r[:, None, :], preenc), axis=0)
        return u_canon, leaves_le, root, lc

    return fn


def make_sharded_prover_core(field: FieldSpec, mesh, four_m: int, k: int, n: int,
                             unroll: bool | None = None,
                             stage: str = "full"):
    """Mesh-sharded prover core over a 1-D device mesh axis ``"rows"``.

    Row blocks of preenc/U are sharded across chips; the commitment phase
    re-shards to columns with an all_to_all.  Returns a function suitable
    for ``jax.jit`` whose inputs/outputs are globally-shaped arrays with
    sharding constraints applied internally via shard_map.

    ``stage`` truncates the pipeline for per-phase attribution
    (scripts/attribute_scaling.py): ``"encode"`` (per-chip RS encode, no
    collectives), ``"encode+a2a"`` (+ the row->column all_to_all),
    ``"encode+a2a+hash"`` (+ column Blake2s + local subtree), ``"full"``
    (+ gathered tree top + challenge combination) — each stage's output
    is materialized so the work cannot be dead-code-eliminated.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..engine.backend import default_unroll
    if unroll is None:
        unroll = default_unroll(True)
    fk = FieldKernel(field, jnp, unroll=unroll)
    hk = HashKernel(jnp, unroll=unroll)
    dom_k = DomainOps(fk, k)
    dom_n = DomainOps(fk, n)
    L = field.num_limbs
    num_devices = mesh.shape["rows"]
    assert four_m % num_devices == 0, "4m must divide the mesh"
    assert n % num_devices == 0, "n must divide the mesh"
    # the pairwise Merkle reductions (local subtree + gathered-roots top)
    # assume power-of-two node counts at every level
    assert num_devices & (num_devices - 1) == 0, \
        "device count must be a power of two"
    assert (n // num_devices) & (n // num_devices - 1) == 0, \
        "per-device leaf count must be a power of two"

    def local_step(preenc_block, r_block):
        # ---- per-chip RS encoding of the local row block (no comms)
        coeffs = dom_k.ifft(preenc_block)
        u_evals = dom_n.fft_padded(coeffs)          # (4m/D, n, L)
        u_canon = fk.from_mont(u_evals)             # (canonical; returned)
        if stage == "encode":
            return (u_canon,)

        # ---- row-shard -> column-shard over ICI
        # (4m/D, n, L) -> split n into D chunks -> all_to_all -> (4m, n/D, L)
        u_cs = jax.lax.all_to_all(
            u_canon.reshape(four_m // num_devices, num_devices,
                            n // num_devices, L),
            "rows", split_axis=1, concat_axis=0, tiled=False)
        # all_to_all with split/concat: result (D, 4m/D, n/D, L) gathered
        u_cs = u_cs.reshape(four_m, n // num_devices, L)
        if stage == "encode+a2a":
            return (u_canon, u_cs)

        # ---- hash the local columns, reduce the local Merkle subtree
        words, byte_len = _column_words(jnp, u_cs, four_m, L)
        leaves_le = hk.blake2s(words, byte_len)      # (n/D, 8)
        level = _byteswap(leaves_le)
        while level.shape[0] > 1:
            level = hk.sha256_two_to_one(level[0::2], level[1::2])
        subtree_root = level                          # (1, 8)
        if stage == "encode+a2a+hash":
            return (u_canon, leaves_le, subtree_root)

        # ---- finish the top log2(D) levels redundantly on every chip
        roots = jax.lax.all_gather(subtree_root[0], "rows")  # (D, 8)
        top = roots
        while top.shape[0] > 1:
            top = hk.sha256_two_to_one(top[0::2], top[1::2])
        root = top[0]

        # ---- challenge-weighted row combination (partial -> gathered sum)
        partial = fk.sum_mod(fk.mont_mul(r_block[:, None, :], preenc_block),
                             axis=0)                  # (k, L), local mod-p sum
        partials = jax.lax.all_gather(partial, "rows")  # (D, k, L)
        lc = fk.sum_mod(partials, axis=0)
        return u_canon, leaves_le, root, lc

    spec_rows = P("rows", None, None)
    spec_cols_leaf = P("rows", None)
    out_specs = {
        "encode": (spec_rows,),
        "encode+a2a": (spec_rows, P(None, "rows", None)),
        "encode+a2a+hash": (spec_rows, spec_cols_leaf, P("rows", None)),
        "full": (spec_rows,          # U row-sharded
                 spec_cols_leaf,     # leaves column-sharded
                 P(),                # root replicated
                 P()),               # lc replicated
    }[stage]
    kwargs = dict(
        mesh=mesh,
        in_specs=(spec_rows, P("rows", None)),
        out_specs=out_specs,
    )
    # scan carries seeded with replicated zeros become device-varying inside
    # the body; skip the varying-manual-axes check rather than pcast every
    # accumulator init (kwarg renamed check_rep -> check_vma across jax vers.)
    try:
        return shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(local_step, check_rep=False, **kwargs)

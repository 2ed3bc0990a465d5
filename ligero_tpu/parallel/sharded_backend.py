"""Mesh-sharded execution backend: the FULL prover/verifier distributed.

``ShardedBackend`` is a drop-in ``Backend`` whose bulk operations run
under ``shard_map`` over a 1-D device mesh (axis ``"rows"``), so
``LigeroCircuit.prove``/``verify`` distribute without any protocol-layer
changes:

* **RS encode / NTT / iNTT / from-mont** — row-sharded, zero
  communication (transforms never cross rows; reference hot loop
  /root/reference/src/ligero/mod.rs:998-1012);
* **column commitment** — Blake2s leaf hashing sharded over the n
  columns (each device hashes its n/D whole columns; mod.rs:536-551);
  the SHA-256 tree over the 32-byte leaf digests is tiny and stays
  single-device;
* **r^T·preenc and the linear/quadratic 2k-domain poly products**
  (mod.rs:658, :712-747, :832-859) — per-device partial modular sums,
  combined with an ``all_gather`` + exact mod-p tree reduction.  Mod-p
  addition is associative, so any grouping of the row sum produces the
  same field element and therefore the same canonical limbs: sharded
  proofs are byte-identical to single-device proofs.

The reference has no distributed execution (SURVEY.md §2.3); this is the
BASELINE.json north-star design.  Row counts that don't divide the mesh
are zero-padded (zero rows are exact under NTT and contribute zero to
every sum).
"""

from __future__ import annotations

import numpy as np

from ..engine.backend import Backend
from ..engine.devmatrix import RowChunkedMatrix, StreamedCodewords
from ..fields import FieldSpec


def _host_fetch(a) -> np.ndarray:
    """Global jax.Array (possibly spanning processes) -> host numpy.

    Multi-process (jax.distributed) arrays are not fully addressable;
    ``process_allgather`` fetches the global value (every process calls
    the sharded ops identically, so this is a collective)."""
    if hasattr(a, "is_fully_addressable") and not a.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def _to_cyclic(arr: np.ndarray, c: int, D: int) -> np.ndarray:
    """Rows -> block-cyclic device layout: (rows, *rest) ->
    (D, J*c, *rest), where global row ``g`` lands on device
    ``(g % (c*D)) // c`` at local slot ``(g // (c*D)) * c + g % c``.
    Zero-pads to a whole number of c*D-row steps."""
    rows, rest = arr.shape[0], arr.shape[1:]
    C = c * D
    J = -(-rows // C)
    pad = J * C - rows
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + rest, arr.dtype)])
    a = arr.reshape(J, D, c, *rest)
    return np.ascontiguousarray(np.moveaxis(a, 1, 0).reshape(D, J * c, *rest))


def _from_cyclic(a: np.ndarray, rows: int, c: int, D: int) -> np.ndarray:
    """Inverse of :func:`_to_cyclic` (drops the zero padding)."""
    J = a.shape[1] // c
    out = np.moveaxis(a.reshape(D, J, c, *a.shape[2:]), 0, 1)
    return np.ascontiguousarray(out.reshape(J * D * c, *a.shape[2:]))[:rows]


class ShardedCoeffs:
    """Mesh-resident coefficient rows in block-cyclic row layout.

    ``dev`` is a ``(D, J*c, w, L)`` uint16 array sharded over mesh axis
    ``"rows"`` (device d owns slice ``dev[d]``).  The block-cyclic layout
    (see :func:`_to_cyclic`) is what makes the streaming commit's
    ``all_to_all`` row->column reshard deliver each step's ``c*D`` rows in
    GLOBAL row order (source-device-major), so the per-column incremental
    Blake2s can absorb rows 0..rows-1 sequentially while every device
    encodes only its own rows.

    Duck-types the parts of ``RowChunkedMatrix`` the protocol layer
    touches (``.n`` = coefficient width, ``.L``, ``.rows``, ``.shape``);
    ``__getitem__`` materializes host rows (used by the quadratic phase,
    whose x_i/y_i/z_i row triples are m rows apart and so cannot be
    aligned per-device for any m — a host round-trip of the 8x-smaller
    coefficient form, cheap on pods with local hosts).
    """

    def __init__(self, dev, rows: int, w: int, L: int, c: int, D: int):
        self.dev = dev
        self.rows = rows
        self.n = w
        self.L = L
        self.c = c
        self.D = D

    @property
    def J(self) -> int:
        return self.dev.shape[1] // self.c

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.rows, self.n, self.L)

    def __getitem__(self, sl):
        host = _host_fetch(self.dev)                   # (D, J*c, w, L) u16
        return _from_cyclic(host, self.rows, self.c, self.D)[sl].astype(
            np.uint32)


def _shard_map(fn, mesh, in_specs, out_specs):
    import jax
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    # kwarg renamed check_rep -> check_vma across jax versions
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(fn, check_rep=False, **kwargs)


class ShardedBackend(Backend):
    """Backend whose bulk ops shard over ``mesh`` axis ``"rows"``.

    Usage::

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("rows",))
        be = ShardedBackend(BN254_FR, mesh)
        lig = LigeroCircuit(circuit, outputs, backend=be)
        proof = lig.prove(vars_, sponge)   # distributed, byte-identical
    """

    def __init__(self, field: FieldSpec, mesh, unroll: bool | None = None,
                 use_pallas_ntt: bool | None = None):
        super().__init__(field, use_jax=True, unroll=unroll,
                         use_pallas_ntt=use_pallas_ntt)
        self.mesh = mesh
        self.D = mesh.shape["rows"]
        assert self.D & (self.D - 1) == 0, "device count must be a power of two"
        # never pin the full codeword matrix on one device: past one
        # buffer, encodes go to the mesh-streaming commit (see below)
        self.resident_u_ok = False

    def to_numpy(self, a) -> np.ndarray:
        # multi-process global arrays need a collective fetch
        return _host_fetch(a)

    # ------------------------------------------------------------------
    def _pad_rows(self, a: np.ndarray, mult: int):
        # widen uint16 host limb views here (the sharded local fns are
        # traced for uint32 operands; no-op for uint32 inputs)
        a = np.asarray(a).astype(np.uint32, copy=False)
        rows = a.shape[0]
        pad = (-rows) % mult
        if pad:
            a = np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], np.uint32)], axis=0)
        return a, rows

    def _sharded(self, key, fn, in_specs, out_specs):
        if key not in self._jit_cache:
            self._jit_cache[key] = self._jax.jit(
                _shard_map(fn, self.mesh, in_specs, out_specs))
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # row-sharded transforms
    # ------------------------------------------------------------------
    def rs_encode_and_canon(self, preenc, k: int, n: int):
        from jax.sharding import PartitionSpec as P
        preenc, rows = self._pad_rows(_host_fetch(preenc), self.D)

        def local(x):
            coeffs = self._ifft(x, k)
            canon = self._fused_fft_canon(coeffs, n)
            return coeffs, canon

        spec = P("rows", None, None)
        fn = self._sharded(("sh_rs_canon", k, n, preenc.shape), local,
                           (spec,), (spec, spec))
        with self.mesh:
            coeffs, canon = fn(self.asarray(preenc))
        if rows != preenc.shape[0]:
            coeffs, canon = coeffs[:rows], canon[:rows]
        return coeffs, canon

    def _fused_fft_canon(self, coeffs, n: int):
        """n-point NTT of zero-extended coeffs, emitting canonical limbs
        (MXU four-step first — same routing as the single-chip backend)."""
        if self._use_mxu(n) or self._pallas_ok(n):
            return self._encode_block_canon(coeffs, coeffs.shape[-2], n)
        return self.fk.from_mont(self._fft_padded(coeffs, n))

    def ntt(self, coeffs, n: int):
        from jax.sharding import PartitionSpec as P
        arr, rows = self._pad_rows(_host_fetch(coeffs), self.D)
        spec = P("rows", None, None)
        fn = self._sharded(("sh_fft", n, arr.shape),
                           lambda x: self._fft_padded(x, n), (spec,), spec)
        with self.mesh:
            out = fn(self.asarray(arr))
        return out[:rows] if rows != arr.shape[0] else out

    def intt(self, evals, n: int):
        from jax.sharding import PartitionSpec as P
        arr, rows = self._pad_rows(_host_fetch(evals), self.D)
        spec = P("rows", None, None)
        fn = self._sharded(("sh_ifft", n, arr.shape),
                           lambda x: self._ifft(x, n), (spec,), spec)
        with self.mesh:
            out = fn(self.asarray(arr))
        return out[:rows] if rows != arr.shape[0] else out

    def ntt_columns(self, coeffs, n: int, js: np.ndarray) -> np.ndarray:
        from jax.sharding import PartitionSpec as P
        if isinstance(coeffs, ShardedCoeffs):
            # streaming scale: coefficient rows are mesh-resident
            return self._stream_cols_sharded(coeffs, n, js, False)
        if isinstance(coeffs, RowChunkedMatrix):
            return Backend.ntt_columns(self, coeffs, n, js)
        js = np.ascontiguousarray(np.asarray(js, dtype=np.int32))
        arr, rows = self._pad_rows(_host_fetch(coeffs), self.D)

        # indices are a traced (replicated) argument, not a baked
        # constant: they change every proof and a js-keyed jit would
        # recompile per verification
        def local(x, j):
            ev = self._fft_padded(x, n)
            return self.xp.take(ev, j, axis=1)

        spec = P("rows", None, None)
        fn = self._sharded(("sh_fft_cols", n, arr.shape, len(js)),
                           local, (spec, P()), spec)
        with self.mesh:
            out = fn(self.asarray(arr), self.asarray(js))
        return self.to_numpy(out)[:rows]

    # ------------------------------------------------------------------
    # partial-sum combinations (all_gather + exact mod-p reduction)
    # ------------------------------------------------------------------
    def row_combine(self, r, mat):
        import jax
        from jax.sharding import PartitionSpec as P
        mat, rows = self._pad_rows(_host_fetch(mat), self.D)
        r, _ = self._pad_rows(_host_fetch(r), self.D)

        def local(r_blk, m_blk):
            partial = self.fk.sum_mod(
                self.fk.mont_mul(r_blk[:, None, :], m_blk), axis=0)
            parts = jax.lax.all_gather(partial, "rows")  # (D, k, L)
            return self.fk.sum_mod(parts, axis=0)

        fn = self._sharded(("sh_rowcomb", r.shape, mat.shape), local,
                           (P("rows", None), P("rows", None, None)),
                           P(None, None))
        with self.mesh:
            return fn(self.asarray(r), self.asarray(mat))

    def linear_combination_poly(self, u_coeffs, r_coeffs, two_k: int):
        import jax
        from jax.sharding import PartitionSpec as P
        if (isinstance(u_coeffs, ShardedCoeffs)
                or isinstance(r_coeffs, ShardedCoeffs)):
            return self._linq_streaming(u_coeffs, r_coeffs, two_k)
        u, rows = self._pad_rows(_host_fetch(u_coeffs), self.D)
        r, _ = self._pad_rows(_host_fetch(r_coeffs), self.D)

        def local(ub, rb):
            eu = self._fft_padded(ub, two_k)
            er = self._fft_padded(rb, two_k)
            partial = self.fk.sum_mod(self.fk.mont_mul(eu, er), axis=0)
            parts = jax.lax.all_gather(partial, "rows")
            total = self.fk.sum_mod(parts, axis=0)
            return self._ifft(total[None], two_k)[0]

        spec = P("rows", None, None)
        fn = self._sharded(("sh_linq", two_k, u.shape), local,
                           (spec, spec), P(None, None))
        with self.mesh:
            return fn(self.asarray(u), self.asarray(r))

    def quadratic_combination_poly(self, xyz_coeffs, r_quad, two_k: int,
                                   m: int | None = None):
        import jax
        from jax.sharding import PartitionSpec as P
        if isinstance(xyz_coeffs, ShardedCoeffs):
            assert m is not None
            return self._quad_streaming(xyz_coeffs, r_quad, two_k, m)
        if isinstance(xyz_coeffs, RowChunkedMatrix):
            return Backend.quadratic_combination_poly(
                self, xyz_coeffs, r_quad, two_k, m=m)
        xyz = _host_fetch(xyz_coeffs)
        three_m, k, L = xyz.shape
        m = three_m // 3
        xyz = xyz.reshape(3, m, k, L)
        pad = (-m) % self.D
        if pad:
            xyz = np.concatenate(
                [xyz, np.zeros((3, pad, k, L), np.uint32)], axis=1)
        r, _ = self._pad_rows(_host_fetch(r_quad), self.D)

        def local(blk, rb):
            ex = self._fft_padded(blk[0], two_k)
            ey = self._fft_padded(blk[1], two_k)
            ez = self._fft_padded(blk[2], two_k)
            term = self.fk.sub(self.fk.mont_mul(ex, ey), ez)
            weighted = self.fk.mont_mul(rb[:, None, :], term)
            partial = self.fk.sum_mod(weighted, axis=0)
            parts = jax.lax.all_gather(partial, "rows")
            total = self.fk.sum_mod(parts, axis=0)
            return self._ifft(total[None], two_k)[0]

        fn = self._sharded(("sh_quadp", two_k, xyz.shape), local,
                           (P(None, "rows", None, None), P("rows", None)),
                           P(None, None))
        with self.mesh:
            return fn(self.asarray(xyz), self.asarray(r))

    # ------------------------------------------------------------------
    # column-sharded commitment leaves (tree over digests stays tiny)
    # ------------------------------------------------------------------
    def _column_leaves_device(self, u_canon):
        from jax.sharding import PartitionSpec as P
        u = _host_fetch(u_canon)
        four_m, nc, L = u.shape
        pad = (-nc) % self.D
        if pad:
            u = np.concatenate(
                [u, np.zeros((four_m, pad, L), np.uint32)], axis=1)
        byte_len = 8 + four_m * L * 2
        pad_words = (-(2 + four_m * (L // 2))) % 16
        prefix = np.zeros(2, dtype=np.uint32)
        prefix[0] = four_m & 0xFFFFFFFF
        prefix[1] = four_m >> 32

        def local(ub):
            xp = self.xp
            cols = xp.moveaxis(ub, 1, 0)  # (nc/D, 4m, L)
            packed = cols[..., 0::2] | (cols[..., 1::2] << np.uint32(16))
            words = packed.reshape(cols.shape[0], -1)
            pre = xp.broadcast_to(xp.asarray(prefix), (cols.shape[0], 2))
            words = xp.concatenate(
                [pre, words, xp.zeros((cols.shape[0], pad_words), np.uint32)],
                axis=-1)
            return self.hk.blake2s(words, byte_len)

        fn = self._sharded(("sh_leaves", u.shape), local,
                           (P(None, "rows", None),), P("rows", None))
        with self.mesh:
            out = fn(self.asarray(u))
        return out[:nc] if pad else out

    # ------------------------------------------------------------------
    # streaming scale: mesh-resident coefficients, U never materialized
    #
    # Past one device buffer the codeword matrix is neither downloaded nor
    # pinned on a single device (resident_u_ok = False): only the
    # rate_inv-times-smaller coefficient rows stay mesh-resident, in the
    # block-cyclic layout of ShardedCoeffs.  The commit re-encodes each
    # device's c-row block per step, all_to_alls the (c, n) codewords into
    # (c*D, n/D) column shards — arriving in global row order — and each
    # device chains its n/D per-column incremental Blake2s states.  This
    # is the distributed form of Backend.commit_columns_streaming and is
    # bit-identical to it (and to the host hashlib commit; tested).
    # ------------------------------------------------------------------
    def _cyclic_c(self, n_expand: int) -> int:
        """Per-device rows per step: the re-expanded (c, n, L) codeword
        block must fit the single-buffer budget; even so each full step
        contributes whole 64-byte blocks per column to the streaming
        hash."""
        c = max(2, self.MAX_DEVICE_BYTES
                // (n_expand * self.field.num_limbs * 4))
        return max(2, c & ~1)

    def _upload_cyclic(self, arr: np.ndarray, c: int):
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        host = _to_cyclic(arr.astype(np.uint16, copy=False), c, self.D)
        spec = P("rows", *([None] * (host.ndim - 1)))
        # make_array_from_callback (not device_put): works when the mesh
        # spans processes (every process holds the same host value)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(self.mesh, spec),
            lambda idx: host[idx])

    def intt_resident(self, preenc: np.ndarray, k: int,
                      n: int | None = None) -> ShardedCoeffs:
        """iNTT_k of all rows into mesh-resident block-cyclic chunks."""
        import jax
        from jax.sharding import PartitionSpec as P
        rows, k_, L = preenc.shape
        c = self._cyclic_c(max(n or 16 * k, 2 * k))
        dev = self._upload_cyclic(_host_fetch(preenc), c)
        J = dev.shape[1] // c

        def local(x):
            blk = x[0].astype(np.uint32).reshape(J, c, k_, L)
            out = jax.lax.map(
                lambda b: self._ifft(b, k).astype(np.uint16), blk)
            return out.reshape(1, J * c, k_, L)

        spec = P("rows", None, None, None)
        fn = self._sharded(("shs_intt", k, dev.shape), local, (spec,), spec)
        with self.mesh:
            out = fn(dev)
        return ShardedCoeffs(out, rows, k, L, c, self.D)

    def coeffs_resident(self, rows_coeffs: np.ndarray,
                        n: int) -> ShardedCoeffs:
        """Upload already-computed (zk-blinded) coefficient rows as
        mesh-resident block-cyclic chunks sized for n-point re-expansion."""
        rows, w, L = rows_coeffs.shape
        c = self._cyclic_c(n)
        dev = self._upload_cyclic(_host_fetch(rows_coeffs), c)
        return ShardedCoeffs(dev, rows, w, L, c, self.D)

    def _encode_block(self, blk, n: int, canon: bool):
        """(c, w, L) u16 coefficient block -> (c, n, L) codewords
        (canonical ints when ``canon``, Montgomery evals otherwise)."""
        b = blk.astype(np.uint32)
        if not canon:
            return self._fft_padded(b, n)
        if self._use_mxu(n) or self._pallas_ok(n):
            return self._encode_block_canon(b, b.shape[-2], n)
        return self.fk.from_mont(self._fft_padded(b, n))

    def commit_columns_streaming(self, sc: StreamedCodewords):
        if not isinstance(sc.coeffs, ShardedCoeffs):
            return super().commit_columns_streaming(sc)
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        co = sc.coeffs
        n, rows = sc.n, sc.rows
        w, L, c, D = co.n, co.L, co.c, co.D
        assert n % D == 0, "device count must divide the codeword length"
        C, nD = c * D, n // D
        J = co.J
        wpr = L // 2  # 32 canonical LE bytes per element
        prefix = np.zeros(2, dtype=np.uint32)
        prefix[0] = rows & 0xFFFFFFFF
        prefix[1] = rows >> 32
        spec3 = P("rows", None, None)
        spec4 = P("rows", None, None, None)

        def make_step(r_keep: int, first: bool):
            def step(dev_, h_, carry_, t0_, j_):
                blk = jax.lax.dynamic_slice_in_dim(dev_[0], j_ * c, c, axis=0)
                canon = self._encode_block(blk, n, True)        # (c, n, L)
                recv = jax.lax.all_to_all(canon, "rows", split_axis=1,
                                          concat_axis=0, tiled=True)
                cols = self.xp.moveaxis(recv[:r_keep], 1, 0)    # (nD, r, L)
                packed = cols[..., 0::2] | (cols[..., 1::2] << np.uint32(16))
                words = packed.reshape(nD, r_keep * wpr)
                head = (self.xp.broadcast_to(self.xp.asarray(prefix), (nD, 2))
                        if first else carry_[0])
                words = self.xp.concatenate([head, words], axis=-1)
                nb = words.shape[1] // 16
                blocks = self.xp.moveaxis(
                    words[:, :16 * nb].reshape(nD, nb, 16), 1, 0)
                h1 = self.hk.blake2s_stream_blocks(h_[0], blocks, t0_)
                return h1[None], words[None, :, 16 * nb:]
            return step

        start = np.broadcast_to(
            np.asarray(self.hk.blake2s_stream_start(1)), (n, 8))
        sharding = NamedSharding(self.mesh, spec3)
        h = jax.device_put(
            np.ascontiguousarray(start.reshape(D, nD, 8)), sharding)
        carry = jax.device_put(np.zeros((D, nD, 2), np.uint32), sharding)
        cw, t0 = 2, 0
        for j in range(J):
            r_keep = min(C, rows - j * C)
            if r_keep <= 0:
                break
            fn = self._sharded(
                ("shs_commit", j == 0, r_keep, cw, n, co.dev.shape),
                make_step(r_keep, j == 0),
                (spec4, spec3, spec3, P(), P()), (spec3, spec3))
            with self.mesh:
                h, carry = fn(co.dev, h, carry, np.uint32(t0), np.int32(j))
            total_w = cw + r_keep * wpr
            nb = total_w // 16
            t0 += 64 * nb
            cw = total_w - 16 * nb  # 2 after full steps; 2..10 after tail

        byte_len = 8 + rows * L * 2

        def fin(h_, ca):
            last = self.xp.concatenate(
                [ca[0], self.xp.zeros((nD, 16 - cw), np.uint32)], axis=-1)
            return self.hk.blake2s_stream_end(h_[0], last, byte_len)[None]

        fn = self._sharded(("shs_commit_fin", n, cw, byte_len), fin,
                           (spec3, spec3), spec3)
        with self.mesh:
            leaves_dev = fn(h, carry)
        # all_to_all's tiled split hands device d columns [d*nD, (d+1)*nD):
        # the gathered (D, nD, 8) is already in natural column order
        leaves_le = self.to_numpy(leaves_dev).reshape(n, 8)
        return self._digest_lists(leaves_le)

    def _quad_streaming(self, co: ShardedCoeffs, r_quad, two_k: int, m: int):
        """p0 = sum_i r_i (x_i y_i - z_i) with the 4m coefficient rows
        mesh-resident: x_i / y_i / z_i are global rows i / m+i / 2m+i,
        which the block-cyclic layout puts on different devices (the m-row
        stride is not a multiple of c*D in general), so each i-batch
        realigns the y and z rows with two static-rotation ``ppermute``s
        per operand — coefficient traffic rides ICI once, no host
        round-trip.  Exact mod-p sums keep the result byte-identical to
        the single-device path."""
        import jax
        from jax.sharding import PartitionSpec as P
        k, L, c, D = co.n, co.L, co.c, co.D
        C = c * D
        J = co.J
        B = -(-m // C)                   # i-batches of C rows
        # static layout constants: row m+i sits u_y rows into global
        # c-block q0y + (i // c) (and 2m+i likewise)
        u_y, u_z = m % c, (2 * m) % c
        q0y, q0z = (m - u_y) // c, (2 * m - u_z) // c
        sy, sz = q0y % D, q0z % D        # static device rotations
        r_cyc = self._upload_cyclic(_host_fetch(r_quad), c)  # (D, B*c, L)

        def local(dev_, r_):
            loc = dev_[0]                # (J*c, k, L) u16
            rl = r_[0]                   # (B*c, L) u16
            ax = jax.lax.axis_index("rows")

            def fetch(j, q0, s_rot, u):
                """Rows [u + c*(q0 + j*D + d), ... + c) of the global
                matrix, on destination device d = this device."""
                def one(rot, extra):
                    d_dst = (ax - s_rot - rot) % D
                    slot = (q0 + j * D + d_dst + extra) // D
                    blk = jax.lax.dynamic_slice_in_dim(
                        loc, slot * c, c, axis=0)
                    perm = [(int((d + s_rot + rot) % D), d)
                            for d in range(D)]
                    return jax.lax.ppermute(blk, "rows", perm)
                two = self.xp.concatenate([one(0, 0), one(1, 1)], axis=0)
                return jax.lax.dynamic_slice_in_dim(two, u, c, axis=0)

            def body(j, acc):
                x = jax.lax.dynamic_slice_in_dim(loc, j * c, c, axis=0)
                y = fetch(j, q0y, sy, u_y)
                z = fetch(j, q0z, sz, u_z)
                rb = jax.lax.dynamic_slice_in_dim(rl, j * c, c, axis=0)
                ex = self._fft_padded(x.astype(np.uint32), two_k)
                ey = self._fft_padded(y.astype(np.uint32), two_k)
                ez = self._fft_padded(z.astype(np.uint32), two_k)
                term = self.fk.sub(self.fk.mont_mul(ex, ey), ez)
                weighted = self.fk.mont_mul(
                    rb[:, None, :].astype(np.uint32), term)
                return self.fk.add(acc, self.fk.sum_mod(weighted, axis=0))

            acc = jax.lax.fori_loop(
                0, B, body, self.xp.zeros((two_k, L), np.uint32))
            return self.fk.sum_mod(jax.lax.all_gather(acc, "rows"), axis=0)

        fn = self._sharded(("shs_quad", two_k, m, co.dev.shape, r_cyc.shape),
                           local, (P("rows", None, None, None),
                                   P("rows", None, None)), P(None, None))
        with self.mesh:
            total = fn(co.dev, r_cyc)
        return self._jit(("shs_linq_fin", two_k),
                         lambda t: self._ifft(t[None], two_k)[0])(total)

    def _stream_cols_sharded(self, co: ShardedCoeffs, n: int, js,
                             canon: bool) -> np.ndarray:
        """Columns ``js`` of the never-materialized codeword matrix:
        every device re-encodes its own row blocks and keeps only the
        opened columns; rows reassemble on the host from the cyclic
        layout."""
        import jax
        from jax.sharding import PartitionSpec as P
        w, L, c, D = co.n, co.L, co.c, co.D
        J = co.J
        jdev = np.ascontiguousarray(np.asarray(js, dtype=np.int32))

        def local(x, j):
            blk = x[0].reshape(J, c, w, L)
            out = jax.lax.map(
                lambda b: self.xp.take(self._encode_block(b, n, canon),
                                       j, axis=1).astype(np.uint16), blk)
            return out.reshape(1, J * c, len(jdev), L)

        spec = P("rows", None, None, None)
        fn = self._sharded(("shs_cols", canon, n, co.dev.shape, len(jdev)),
                           local, (spec, P(None)), spec)
        with self.mesh:
            out = fn(co.dev, self.asarray(jdev))
        return _from_cyclic(self.to_numpy(out), co.rows, c, D).astype(np.uint32)

    def gather_columns(self, u_canon, js) -> np.ndarray:
        if (isinstance(u_canon, StreamedCodewords)
                and isinstance(u_canon.coeffs, ShardedCoeffs)):
            return self._stream_cols_sharded(u_canon.coeffs, u_canon.n,
                                             js, True)
        return super().gather_columns(u_canon, js)

    def row_combine_coeffs(self, r, coeffs):
        if not isinstance(coeffs, ShardedCoeffs):
            return super().row_combine_coeffs(r, coeffs)
        import jax
        from jax.sharding import PartitionSpec as P
        co = coeffs
        k, L, c, D = co.n, co.L, co.c, co.D
        J = co.J
        r_dev = self._upload_cyclic(_host_fetch(r), c)  # (D, J*c, L)

        def local(x, rl):
            blkJ = x[0].reshape(J, c, k, L)
            rJ = rl[0].reshape(J, c, L)

            def part(args):
                b, rr = args
                prod = self.fk.mont_mul(rr[:, None, :].astype(np.uint32),
                                        b.astype(np.uint32))
                return self.fk.sum_mod(prod, axis=0)

            parts = jax.lax.map(part, (blkJ, rJ))       # (J, k, L)
            loc = self.fk.sum_mod(parts, axis=0)
            return self.fk.sum_mod(jax.lax.all_gather(loc, "rows"), axis=0)

        fn = self._sharded(("shs_rcc", co.dev.shape), local,
                           (P("rows", None, None, None),
                            P("rows", None, None)), P(None, None))
        with self.mesh:
            total = fn(co.dev, r_dev)
        return self._jit(("rcc_ntt", k),
                         lambda t: self._fft_padded(t[None], k)[0])(total)

    def _linq_streaming(self, u_coeffs, r_coeffs, two_k: int):
        """q = sum_i r_i(X) u_i(X) with either operand mesh-resident
        (block-cyclic); the other is re-laid-out to match."""
        import jax
        from jax.sharding import PartitionSpec as P
        co = u_coeffs if isinstance(u_coeffs, ShardedCoeffs) else r_coeffs
        c, D, L = co.c, co.D, co.L
        J = co.J

        def cyclic(m):
            if isinstance(m, ShardedCoeffs):
                assert m.c == c and m.J == J, "misaligned cyclic layouts"
                return m.dev, m.n
            host = m if isinstance(m, np.ndarray) else self.to_numpy(m)
            return self._upload_cyclic(host, c), host.shape[1]

        u_dev, uw = cyclic(u_coeffs)
        r_dev, rw = cyclic(r_coeffs)

        def local(ud, rd):
            uJ = ud[0].reshape(J, c, uw, L)
            rJ = rd[0].reshape(J, c, rw, L)

            def part(args):
                ub, rb = args
                eu = self._fft_padded(ub.astype(np.uint32), two_k)
                er = self._fft_padded(rb.astype(np.uint32), two_k)
                return self.fk.sum_mod(self.fk.mont_mul(eu, er), axis=0)

            parts = jax.lax.map(part, (uJ, rJ))         # (J, two_k, L)
            loc = self.fk.sum_mod(parts, axis=0)
            return self.fk.sum_mod(jax.lax.all_gather(loc, "rows"), axis=0)

        spec = P("rows", None, None, None)
        fn = self._sharded(("shs_linq", two_k, u_dev.shape, r_dev.shape),
                           local, (spec, spec), P(None, None))
        with self.mesh:
            total = fn(u_dev, r_dev)
        return self._jit(("shs_linq_fin", two_k),
                         lambda t: self._ifft(t[None], two_k)[0])(total)


    # ------------------------------------------------------------------
    # batched-proof helpers: LigeroCircuit.prove_batch / verify_batch on
    # the mesh (round-2 VERDICT "weak" #5 — mesh servers previously fell
    # back to sequential proving).  Same contract as the Backend
    # versions: byte-identical proofs/verdicts to sequential calls
    # (tests/test_parallel.py::test_prove_batch_sharded_byte_identical).
    # ------------------------------------------------------------------
    def ntt_and_canon(self, coeffs, n: int):
        from jax.sharding import PartitionSpec as P
        arr, rows = self._pad_rows(_host_fetch(coeffs), self.D)
        spec = P("rows", None, None)
        fn = self._sharded(("sh_ntt_canon", n, arr.shape),
                           lambda x: self._fused_fft_canon(x, n),
                           (spec,), spec)
        with self.mesh:
            out = fn(self.asarray(arr))
        return out[:rows] if rows != arr.shape[0] else out

    def commit_columns_batch(self, u_canon, B: int):
        u = _host_fetch(u_canon)
        BR, n, L = u.shape
        rows = BR // B
        # per-column hash input layout (rows-length prefix) is identical
        # for every proof, so one column-sharded leaf dispatch covers all
        # B*n columns at once
        u_cat = np.concatenate(np.split(u, B, axis=0), axis=1)
        leaves_le = self.to_numpy(self._column_leaves_device(u_cat))
        return [self._digest_lists(leaves_le[b * n:(b + 1) * n])
                for b in range(B)]

    def _row_replicated_gather(self, flat, idx, B: int, rows: int):
        """(B*rows, n|w, L) row-sharded gather where row r opens the
        columns of proof r // rows."""
        from jax.sharding import PartitionSpec as P
        t = idx.shape[1]
        row_idx = np.repeat(np.ascontiguousarray(idx, np.int32), rows,
                            axis=0)
        flat, real = self._pad_rows(flat, self.D)
        if flat.shape[0] != real:
            row_idx = np.concatenate(
                [row_idx, np.zeros((flat.shape[0] - real, t), np.int32)],
                axis=0)
        return flat, row_idx

    def gather_columns_batch(self, u_canon, idx: np.ndarray) -> np.ndarray:
        from jax.sharding import PartitionSpec as P
        B, t = idx.shape
        u = _host_fetch(u_canon)
        BR, n, L = u.shape
        rows = BR // B
        u_p, row_idx = self._row_replicated_gather(u, idx, B, rows)

        def local(ub, jb):
            return self.xp.take_along_axis(
                ub, jb[:, :, None], axis=1).astype(np.uint16)

        fn = self._sharded(("sh_gather_b", u_p.shape, t), local,
                           (P("rows", None, None), P("rows", None)),
                           P("rows", None, None))
        with self.mesh:
            out = fn(self.asarray(u_p), self.asarray(row_idx))
        return self.to_numpy(out)[:BR].reshape(
            B, rows, t, L).astype(np.uint32)

    def row_combine_batch(self, r, mats):
        # B sharded row_combine dispatches (one cached executable); the
        # big batched wins live in the shared encode/commit/gather ops
        B = r.shape[0]
        return np.stack([self.to_numpy(self.row_combine(r[b], mats[b]))
                         for b in range(B)])

    def ntt_columns_batch(self, coeffs_b: np.ndarray, n: int,
                          idx: np.ndarray) -> np.ndarray:
        from jax.sharding import PartitionSpec as P
        coeffs_b = np.ascontiguousarray(coeffs_b)
        B, rows, w, L = coeffs_b.shape
        idx = np.ascontiguousarray(np.asarray(idx, dtype=np.int32))
        flat = coeffs_b.reshape(B * rows, w, L)
        flat_p, row_idx = self._row_replicated_gather(flat, idx, B, rows)

        def local(x, j):
            ev = self._fft_padded(x, n)
            return self.xp.take_along_axis(
                ev, j[:, :, None], axis=1).astype(np.uint16)

        fn = self._sharded(("sh_fftcols_b", n, flat_p.shape, idx.shape[1]),
                           local, (P("rows", None, None), P("rows", None)),
                           P("rows", None, None))
        with self.mesh:
            out = fn(self.asarray(flat_p), self.asarray(row_idx))
        return self.to_numpy(out)[:B * rows].reshape(
            B, rows, idx.shape[1], L).astype(np.uint32)

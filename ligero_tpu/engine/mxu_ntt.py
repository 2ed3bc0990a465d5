"""MXU four-step NTT: the small DFTs as int8 limb matmuls.

n = n1*n2 (PERF.md roadmap #2; hot loop of reference
/root/reference/src/ligero/mod.rs:998-1012).  With j = j1 + n1*j2 and
k = k2 + n2*k1:

    stage 1   B^T = W2 @ A^T          (A^T = x.reshape(n2, n1) — free)
    stage 2   C^T = B^T * T''^T       (pointwise Montgomery multiply)
    stage 3   E^T = C^T @ W1          (data-left matmul)
    output    out[k1*n2 + k2] = E[k1, k2]

The field matmuls run on the MXU as int8 limb contractions:

* operands split into **7-bit limbs** (L7 = 37) so signed-int8 products
  accumulate exactly in int32 (max column sum 128 * 37 * 127^2 < 2^31);
* the constant matrix's limbs are looped (m); the data operand's limbs
  ride the non-contracted dimension l-major, so each int8 matmul
  P_m adds into redundant column t = l + m with one static shifted add;
* base-2^7 redundant columns are carry-tamed in two passes, regrouped
  into 16-bit redundant columns, and Montgomery-reduced with a 17-step
  interleaved REDC (dividing by 2^272: the product sum over n1 <= 128
  terms is < 2^515, so the result is < 2p before the final subtract —
  a 16-step REDC would not be);
* the two stages' extra 2^-16 factors are compensated by baking R*2^32
  (and n^-1 for the inverse transform) into the stage-2 twiddles, so
  Montgomery form is preserved end to end and every intermediate stays
  < p.

No bit-reversal is needed (natural order in and out).  The numeric core
is written over a generic array namespace: numpy executes the exact same
integer path for hermetic CPU tests; the Pallas kernel wraps it for the
TPU.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import FIELDS, FieldSpec

L7 = 37          # 7-bit limbs per <2^259 operand
MASK7 = 0x7F
MASK16 = 0xFFFF
REDC_STEPS = 17  # divides by 2^(16*17) = 2^272

# The data-parallel fold REDC (_FieldVm.fold_redc_cols) measured 0.98x
# the serial 17-step chain on-chip (mxu_redc_ab.json, PERF.md round-4
# A/Bs) — the batch dimension already pipelines the chain, so the fold's
# ~3x op count buys nothing HERE.  The env knob is retired; the flag
# stays as a module constant so tests can pin fold-vs-chain bit equality
# (mxu_lc.py's single-vector finisher still uses the fold, where there is
# no batch axis to pipeline over).
FOLD_REDC = False


def split_n(n: int) -> tuple[int, int]:
    """n = n1*n2, both powers of two, preferring the tallest admissible
    stage-1 factor: n1 = min(128, n/32).

    Round-5 on-chip A/B at n=4096, batch 2048 (mxu_factors_ab.json):
    (128, 32) 103.0M points/s vs (64, 64) 95.0M vs (32, 128) 45.2M —
    taller n1 gives the stage matmuls better MXU tiles, consistent with
    n=8192's (128, 64) plateau.  Bit-exact for any admissible pair
    (verified per variant in the A/B)."""
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    while n1 < 128 and n // (2 * n1) >= 32:
        n1 *= 2
    return n1, n // n1


#: smallest n2 the single kernel accepts (exactness only needs n1 <= 128;
#: this is a tiling-efficiency floor).  The relaxed n2=16 envelope was
#: A/B'd on-chip and LOST (26.4M vs 36.1M points/s radix-2 at n=512,
#: mxu_redc_ab.json) — the env override is retired; scripts can still
#: monkeypatch the constant for re-measurement.
MIN_N2 = 32


def mxu_ok(n: int) -> bool:
    """True when the single MXU kernel is exact AND fast for size n:
    n2 >= MIN_N2 tiles the int8 matmuls onto the MXU; n <= 8192 keeps the
    fused-contraction stage constants in VMEM (past it the per-m loop
    form is 3-4x slower than radix-2 — measured at n=16384,
    atscale_r3_final 2^20 warm regression)."""
    n1, n2 = split_n(n)
    return n2 >= MIN_N2 and n <= 8192


#: largest transform the Cooley-Tukey split wrapper decomposes onto
#: MXU sub-kernels (depth <= 3 radix-2 levels over 8192-point leaves)
MXU_SPLIT_MAX_N = 65536


def mxu_any_ok(n: int, field: FieldSpec | None = None) -> bool:
    """True when some MXU route exists for n: the single kernel
    (:func:`mxu_ok`) or the radix-2 split composition over it.

    Field gate: the int8 limb decomposition is sized for 16x16-bit-limb
    operands (< 2^259, L7 = 37) — BLS12-377 Fq's 24 limbs would silently
    truncate at ``_int_to_limbs7`` and crash the 17-step REDC geometry,
    so wider fields stay on the generic radix-2 route."""
    if field is not None and field.num_limbs != 16:
        return False
    return mxu_ok(n) or (8192 < n <= MXU_SPLIT_MAX_N)


def _int_to_limbs7(v: int) -> list[int]:
    return [(v >> (7 * l)) & MASK7 for l in range(L7)]


@functools.lru_cache(maxsize=None)
def _const_data(field_name: str, n: int, inverse: bool,
                canon_out: bool = False, extra_shift: int = 0,
                post_root_n: int = 0):
    """Constant tensors (all numpy):

    w2_7: (L7, n2, n2) int8 — Montgomery W2[a,b] = w_{n2}^{ab} * R
    w1_7: (L7, n1, n1) int8 — Montgomery W1
    t16:  (L, n2, n1) uint32 — T''^T[k2,j1] = w_n^{j1 k2} * R * 2^32
          (* n^-1 for the inverse transform; * R^-1 for canon_out, which
          makes the kernel emit canonical limbs at zero extra cost — the
          fused from-mont epilogue of the commit path; * 2^-extra_shift
          for the Cooley-Tukey split wrapper's inverse normalization),
          16-bit limbs

    ``post_root_n``: when nonzero, additionally multiply output k by
    w_{post_root_n}^{±k} — the Cooley-Tukey split's odd-branch twiddle,
    folded at zero runtime cost: the output index k = k2 + n2*k1 makes
    the factor separable, w^{k2} joins the stage-2 twiddle (indexed by
    k2) and w^{n2*k1} row-scales the stage-3 matrix (indexed by k1).
    """
    field = FIELDS[field_name]
    p = field.p
    L = field.num_limbs
    n1, n2 = split_n(n)
    omega = field.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    w1, w2 = pow(omega, n2, p), pow(omega, n1, p)
    R = field.R
    omega_post = 1
    if post_root_n:
        omega_post = field.root_of_unity(post_root_n)
        if inverse:
            omega_post = pow(omega_post, -1, p)

    def mat7(w, size, out_scale_base=1):
        # stage 3 contracts W1's FIRST index (dot(d_exp, w1)), so the
        # output index k1 is the SECOND index b — the post-twiddle's
        # w^{n2*k1} factor scales columns
        arr = np.zeros((L7, size, size), np.int8)
        for b in range(size):
            cs = pow(out_scale_base, b, p)
            for a in range(size):
                v = pow(w, (a * b) % size, p) * cs % p * R % p
                for l, limb in enumerate(_int_to_limbs7(v)):
                    arr[l, a, b] = limb
        return arr

    extra = pow(2, 32, p) * (pow(n, -1, p) if inverse else 1) % p
    if canon_out:
        extra = extra * pow(R, -1, p) % p
    if extra_shift:
        extra = extra * pow(pow(2, extra_shift, p), -1, p) % p
    t16 = np.zeros((L, n2, n1), np.uint32)
    for k2 in range(n2):
        post = pow(omega_post, k2, p)
        for j1 in range(n1):
            v = pow(omega, (j1 * k2) % n, p) * post % p * R % p * extra % p
            for q in range(L):
                t16[q, k2, j1] = (v >> (16 * q)) & MASK16

    w1_scale = pow(omega_post, n2, p) if post_root_n else 1
    return mat7(w2, n2), mat7(w1, n1, w1_scale), t16


def _np_dot_i32(a, b):
    """Exact int8 x int8 -> int32 matmul for the numpy path."""
    out = a.astype(np.int64) @ b.astype(np.int64)
    assert out.max(initial=0) < (1 << 31) and out.min(initial=0) >= 0
    return out.astype(np.uint32)


def _limbs16_to_7(xp, d16):
    """(L, R, C) uint32 16-bit limbs -> list of L7 (R, C) 7-bit values."""
    L = d16.shape[0]
    out = []
    for l in range(L7):
        bit = 7 * l
        q, off = bit // 16, bit % 16
        v = d16[q] >> np.uint32(off)
        if off > 9 and q + 1 < L:
            v = v | (d16[q + 1] << np.uint32(16 - off))
        out.append(v & np.uint32(MASK7))
    return out


@functools.lru_cache(maxsize=None)
def _fold_table(field_name: str, T: int, steps: int) -> np.ndarray:
    """(3, T, L) uint32 table for :meth:`_FieldVm.fold_redc_cols`:
    tab[d, t] = limbs of (2^(16t + 7d) · 2^-16(steps-2)) mod p."""
    field = FIELDS[field_name]
    p, L = field.p, field.num_limbs
    inv = pow(1 << (16 * (steps - 2)), p - 2, p)
    tab = np.zeros((3, T, L), np.uint32)
    for d in range(3):
        for t in range(T):
            v = (inv << (16 * t + 7 * d)) % p
            for j in range(L):
                tab[d, t, j] = (v >> (16 * j)) & MASK16
    return tab


class _FieldVm:
    """VPU field helpers over (L, R, C) 16-bit limb tensors (shared by
    the numpy path and the Pallas kernel; mirrors pallas_ntt)."""

    def __init__(self, xp, field: FieldSpec):
        self.xp = xp
        self.field = field
        self.L = field.num_limbs
        self.n16 = np.uint32(field.n16)
        self.p_scalars = [np.uint32(int(v)) for v in field.p_limbs]

    def normalize_condsub(self, rows):
        """L column vectors (+ carries inside) -> canonical < p limbs."""
        xp, L = self.xp, self.L
        c = xp.zeros(rows[0].shape, np.uint32)
        norm = []
        for j in range(L):
            t = rows[j] + c
            norm.append(t & np.uint32(MASK16))
            c = t >> np.uint32(16)
        borrow = xp.zeros(rows[0].shape, np.uint32)
        diff = []
        for j in range(L):
            t = norm[j] + np.uint32(0x10000) - self.p_scalars[j] - borrow
            diff.append(t & np.uint32(MASK16))
            borrow = np.uint32(1) - (t >> np.uint32(16))
        ge = (borrow == 0)[None]
        return xp.where(ge, xp.stack(diff), xp.stack(norm))

    def redc_cols(self, cols, steps: int):
        """Interleaved 16-bit REDC over redundant columns ``cols`` (list
        of (R, C) uint32, values < ~2^28): divides by 2^(16*steps).
        Requires len(cols) - steps >= L and the result < 2p."""
        xp, L = self.xp, self.L
        cols = list(cols)
        carry = xp.zeros(cols[0].shape, np.uint32)
        for _ in range(steps):
            v = cols[0] + carry
            m = (v * self.n16) & np.uint32(MASK16)
            mp = [m * pj for pj in self.p_scalars]
            carry = (v + (mp[0] & np.uint32(MASK16))) >> np.uint32(16)
            nxt = list(cols[1:])
            for j in range(1, L):
                nxt[j - 1] = nxt[j - 1] + (mp[j] & np.uint32(MASK16)) \
                    + (mp[j - 1] >> np.uint32(16))
            nxt[L - 1] = nxt[L - 1] + (mp[L - 1] >> np.uint32(16))
            cols = nxt
        cols[0] = cols[0] + carry
        return self.normalize_condsub(cols[:L])

    def fold_redc_cols(self, cols, steps: int):
        """Data-parallel alternative to :meth:`redc_cols` (bit-identical).

        The serial 17-step REDC chain is the kernel's VPU bottleneck
        (PERF.md round-3: ~11% of the op ceiling — each step waits on the
        previous carry/shift).  Montgomery reduction is linear in the
        redundant columns, so fold them instead:

            V · 2^-16(steps-2)  ≡  Σ_t  cols[t] · (2^16t · 2^-16(steps-2) mod p)

        with every product fully independent: cols[t] (< 2^21) splits
        into three 7-bit digits, each multiplied by a precomputed L-limb
        table row (products < 2^23, summed over 3T ≤ 111 terms < 2^30 —
        no uint32 overflow).  Two ordinary REDC steps then divide by the
        remaining 2^32 and normalize; the result is the same canonical
        representative :meth:`redc_cols` emits (unique < p), tested
        bit-exact on random inputs and end-to-end in the kernel."""
        xp, L = self.xp, self.L
        T = len(cols)
        tab = _fold_table(self.field.name, T, steps)  # (3, T, L) uint32
        zero = xp.zeros(cols[0].shape, np.uint32)
        out = [zero] * (L + 2)
        m7 = np.uint32(MASK7)
        for t in range(T):
            d0 = cols[t] & m7
            d1 = (cols[t] >> np.uint32(7)) & m7
            d2 = cols[t] >> np.uint32(14)
            for j in range(L):
                out[j] = (out[j] + d0 * np.uint32(int(tab[0, t, j]))
                          + d1 * np.uint32(int(tab[1, t, j]))
                          + d2 * np.uint32(int(tab[2, t, j])))
        return self.redc_cols(out, 2)

    def mont_mul(self, a, b):
        """(L, R, C) x (L, R, C) Montgomery product (16-bit limbs)."""
        xp, L = self.xp, self.L
        zero = xp.zeros(a.shape[1:], np.uint32)
        acc = [zero] * (2 * L)
        for i in range(L - 1, -1, -1):
            acc = [zero] + acc[:-1]
            prod = [a[i] * b[j] for j in range(L)]
            for j in range(L):
                acc[j] = acc[j] + (prod[j] & np.uint32(MASK16))
                acc[j + 1] = acc[j + 1] + (prod[j] >> np.uint32(16))
        return self.redc_cols(acc, L)

    def mont_mul_cios(self, a, b):
        """CIOS-interleaved Montgomery product: one REDC step follows
        each product row, so the live accumulator stays L+2 blocks wide
        instead of 2L (less VMEM pressure inside the Pallas kernel).

        Bit-identical to :meth:`mont_mul` — both emit the unique
        canonical representative of a*b*R^-1 (tested).  Bounds: each
        accumulator block gains at most 4*(2^16-1) per iteration and
        lives <= L+1 iterations before the shift consumes it, so blocks
        stay < 2^23; the final value is < 2p (the standard CIOS bound),
        which carry-normalizes into L limbs + a dead top."""
        xp, L = self.xp, self.L
        mask = np.uint32(MASK16)
        sixteen = np.uint32(16)
        zero = xp.zeros(a.shape[1:], np.uint32)
        acc = [zero] * (L + 2)
        for i in range(L):
            for j in range(L):
                prod = a[j] * b[i]
                acc[j] = acc[j] + (prod & mask)
                acc[j + 1] = acc[j + 1] + (prod >> sixteen)
            m = (acc[0] * self.n16) & mask
            mp = [m * pj for pj in self.p_scalars]
            carry0 = (acc[0] + (mp[0] & mask)) >> sixteen
            nxt = acc[1:] + [zero]
            nxt[0] = nxt[0] + carry0
            for j in range(1, L):
                nxt[j - 1] = nxt[j - 1] + (mp[j] & mask) \
                    + (mp[j - 1] >> sixteen)
            nxt[L - 1] = nxt[L - 1] + (mp[L - 1] >> sixteen)
            acc = nxt
        # value now < 2p over L+2 blocks: after one carry pass the top
        # two limbs are zero (2p < 2^255), so L limbs + condsub finish it
        c = zero
        norm = []
        for j in range(L):
            t = acc[j] + c
            norm.append(t & mask)
            c = t >> sixteen
        return self.normalize_condsub(norm)


def _stage_matmul(xp, dot, w7, d7_blocks, data_left: bool):
    """One four-step DFT stage as L7 int8 matmuls + shifted accumulate.

    ``d7_blocks``: list of L7 (R, C) uint32 7-bit data values.
    ``w7``: (L7, K, K) int8 constants.  data_left=False computes
    W @ D (contracting D's rows); data_left=True computes D @ W
    (contracting D's columns).  Returns 2*L7-1 redundant base-2^7
    columns as (R, C) uint32 arrays (max block index m+l = 2*L7-2).

    The shifted accumulate is expressed as per-block static-slice adds
    (block t sums P_m's chunk l over m+l=t) — Pallas TPU has no
    scatter-add lowering, and exact uint32 adds commute, so this is
    bit-identical to an in-place shifted accumulator.
    """
    n_cols = 2 * L7 - 1
    rows, cols = d7_blocks[0].shape
    if data_left:
        d_exp = xp.concatenate(d7_blocks, axis=0).astype(np.int8)  # (L7*R, C)
        shape = (rows, cols)
    else:
        d_exp = xp.concatenate(d7_blocks, axis=1).astype(np.int8)  # (R, L7*C)
        shape = (w7.shape[1], cols)
    blocks = [xp.zeros(shape, np.uint32) for _ in range(n_cols)]
    for m in range(L7):
        if data_left:
            p_m = dot(d_exp, w7[m])  # (L7*R, C)
            chunks = [p_m[l * rows:(l + 1) * rows] for l in range(L7)]
        else:
            p_m = dot(w7[m], d_exp)  # (K, L7*C)
            chunks = [p_m[:, l * cols:(l + 1) * cols] for l in range(L7)]
        for l in range(L7):
            blocks[m + l] = blocks[m + l] + chunks[l]
    return blocks


def _fuse_w_right(w7: np.ndarray) -> np.ndarray:
    """Stage-1 fused constant: contraction over (data limb la, data row j).

    big[(t*K + c), (la*K + j)] = w7[t-la][c, j] (zero outside 0 <= t-la
    < L7), so  out[(t*K + c), col] = sum_{la,j} big * D7[(la*K + j), col]
    equals the loop form's blocks[t][c, col] exactly.  Column sums are
    bounded by K * L7 * 127^2 <= 128*37*16129 < 2^31, so int8 matmuls
    with int32 accumulation stay exact."""
    L7_, K, _ = w7.shape
    n_cols = 2 * L7 - 1
    big = np.zeros((n_cols * K, L7 * K), np.int8)
    for m in range(L7):
        for la in range(L7):
            t = m + la
            big[t * K:(t + 1) * K, la * K:(la + 1) * K] = w7[m]
    return big


def _fuse_w_left(w7: np.ndarray) -> np.ndarray:
    """Stage-3 fused constant: big[(la*K + j), (t*K + c)] = w7[t-la][j, c],
    so  out[row, (t*K + c)] = sum_{la,j} D7[row, (la*K + j)] * big
    equals the loop form's blocks[t][row, c] exactly."""
    L7_, K, _ = w7.shape
    n_cols = 2 * L7 - 1
    big = np.zeros((L7 * K, n_cols * K), np.int8)
    for m in range(L7):
        for la in range(L7):
            t = m + la
            big[la * K:(la + 1) * K, t * K:(t + 1) * K] = w7[m]
    return big


def _stage_matmul_fused(xp, dot, wbig, d7_blocks, data_left: bool):
    """One four-step DFT stage as ONE int8 matmul: the data-limb axis
    rides the contraction dimension (PERF.md roadmap #2's full form).

    Versus the per-m loop this does 2x the MACs (half of ``wbig`` is
    structural zeros) but eliminates all L7^2 shifted block-adds — the
    VMEM-traffic bottleneck of the loop form.  Exact by the int32 bound
    in :func:`_fuse_w_right`; bit-identical (integer sums commute)."""
    n_cols = 2 * L7 - 1
    rows, cols = d7_blocks[0].shape
    if data_left:
        d_exp = xp.concatenate(d7_blocks, axis=1).astype(np.int8)  # (R, L7*C)
        out = dot(d_exp, wbig)  # (R, n_cols*C) with C = K
        return [out[:, t * cols:(t + 1) * cols] for t in range(n_cols)]
    d_exp = xp.concatenate(d7_blocks, axis=0).astype(np.int8)  # (L7*R, C)
    out = dot(wbig, d_exp)  # (n_cols*K, C) with K = rows
    return [out[t * rows:(t + 1) * rows] for t in range(n_cols)]


def _regroup_7_to_16(xp, cols7):
    """Base-2^7 redundant columns -> 16-bit redundant columns < ~2^19.

    Two carry-taming passes bound each base-2^7 column by ~2^13 so the
    << 15 regroup shift cannot overflow uint32."""
    zero = xp.zeros(cols7[0].shape, np.uint32)
    c = list(cols7) + [zero]
    for _ in range(2):
        shifted = [zero] + [v >> np.uint32(7) for v in c]
        c = [(v & np.uint32(MASK7)) + s for v, s in zip(c + [zero], shifted)]
    total_bits = 7 * len(c)
    n16_cols = total_bits // 16 + 2
    out = [zero] * n16_cols
    for t, v in enumerate(c):
        bit = 7 * t
        u, sh = bit // 16, bit % 16
        sv = v << np.uint32(sh)
        out[u] = out[u] + (sv & np.uint32(MASK16))
        out[u + 1] = out[u + 1] + (sv >> np.uint32(16))
    return out


#: largest n whose fused stage constants fit VMEM comfortably (the
#: stage-3 fused matrix is (37*n1, 73*n1) int8 — 44 MB at n1=128, so
#: n=16384 keeps the per-m loop form)
FUSED_MAX_N = 8192


@functools.lru_cache(maxsize=None)
def _const_data_exec(field_name: str, n: int, inverse: bool,
                     canon_out: bool = False, extra_shift: int = 0,
                     post_root_n: int = 0):
    """Execution-form constants: fused single-matmul stage matrices when
    they fit VMEM, the per-m loop form otherwise."""
    w2_7, w1_7, t16 = _const_data(field_name, n, inverse, canon_out,
                                  extra_shift, post_root_n)
    if n <= FUSED_MAX_N:
        return _fuse_w_right(w2_7), _fuse_w_left(w1_7), t16, True
    return w2_7, w1_7, t16, False


def _row_core(xp, dot, x16, consts, field: FieldSpec):
    """Transform one row: x16 (L, n2, n1) 16-bit Montgomery limbs of
    A^T -> (L, n1, n2) limbs of E (natural-order output).  Pure integer
    math over ``xp`` (numpy or jnp-inside-Pallas)."""
    w2c, w1c, t16, fused = consts
    L = field.num_limbs
    fv = _FieldVm(xp, field)
    sm = _stage_matmul_fused if fused else _stage_matmul

    redc = fv.fold_redc_cols if FOLD_REDC else fv.redc_cols

    # stage 1: B^T = W2 @ A^T  (data right, limbs in the contraction)
    d7 = _limbs16_to_7(xp, x16)
    cols7 = sm(xp, dot, w2c, d7, data_left=False)
    b16 = redc(_regroup_7_to_16(xp, cols7), REDC_STEPS)

    # stage 2: pointwise twiddle (T'' carries R*2^32 [*n^-1]); CIOS
    # keeps the live accumulator at L+2 blocks instead of 2L
    c16 = fv.mont_mul_cios(b16, xp.asarray(t16))

    # stage 3: E^T = C^T @ W1  (data left, limbs in the contraction)
    d7 = _limbs16_to_7(xp, c16)
    cols7 = sm(xp, dot, w1c, d7, data_left=True)
    e_t = redc(_regroup_7_to_16(xp, cols7), REDC_STEPS)  # (L, n2, n1)

    return xp.stack([xp.swapaxes(e_t[q], 0, 1) for q in range(L)])


def mxu_ntt_numpy(field: FieldSpec, x, n: int, inverse: bool = False,
                  canon_out: bool = False, extra_shift: int = 0,
                  post_root_n: int = 0):
    """Exact numpy execution of the kernel's integer path.

    ``x``: (B, n, L) uint32 Montgomery limbs -> same shape, transformed.
    Hermetic spec for the Pallas kernel (tests bit-compare both against
    DomainOps)."""
    n1, n2 = split_n(n)
    L = field.num_limbs
    consts = _const_data_exec(field.name, n, inverse, canon_out,
                              extra_shift, post_root_n)
    out = np.empty_like(x)
    for r in range(x.shape[0]):
        xt = np.ascontiguousarray(
            x[r].reshape(n2, n1, L).transpose(2, 0, 1))  # (L, n2, n1)
        e = _row_core(np, _np_dot_i32, xt, consts, field)  # (L, n1, n2)
        out[r] = e.reshape(L, n).transpose(1, 0)
    return out


ROW_TILE = 1  # batch rows per kernel instance (VMEM-bound)


@functools.lru_cache(maxsize=None)
def _mxu_kernel_factory(field_name: str, n: int, inverse: bool,
                        canon_out: bool = False, extra_shift: int = 0,
                        post_root_n: int = 0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    field = FIELDS[field_name]
    L = field.num_limbs
    n1, n2 = split_n(n)
    w2c, w1c, t16, fused = _const_data_exec(field_name, n, inverse,
                                            canon_out, extra_shift,
                                            post_root_n)

    def dot_i32(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32
                           ).astype(jnp.uint32)

    def kernel(x_ref, w2_ref, w1_ref, t_ref, out_ref):
        x16 = x_ref[0].reshape(L, n2, n1)
        if fused:
            consts = (w2_ref[:, :], w1_ref[:, :], t_ref[:, :, :], True)
        else:
            consts = (w2_ref[:, :, :], w1_ref[:, :, :], t_ref[:, :, :], False)
        e = _row_core(jnp, dot_i32, x16, consts, field)  # (L, n1, n2)
        out_ref[0] = e.reshape(L * n1, n2)

    def _const_spec(shape):
        """Grid-invariant VMEM operand (whole array, every grid step)."""
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def run(x_lrows):
        """x: (B, L*n2, n1) -> (B, L*n1, n2)."""
        B = x_lrows.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L * n1, n2), jnp.uint32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, L * n2, n1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _const_spec(w2c.shape),
                _const_spec(w1c.shape),
                _const_spec(t16.shape),
            ],
            out_specs=pl.BlockSpec((1, L * n1, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x_lrows, jnp.asarray(w2c), jnp.asarray(w1c), jnp.asarray(t16))

    return run


def mxu_ntt_pallas(field: FieldSpec, x, n: int, inverse: bool = False,
                   canon_out: bool = False, extra_shift: int = 0,
                   post_root_n: int = 0):
    """Batched MXU NTT on (B, n, L) Montgomery arrays (natural order
    in/out; no bit-reversal needed for the four-step algorithm)."""
    import jax.numpy as jnp

    if not mxu_ok(n):
        raise ValueError(
            f"n={n} outside the exact-int8 MXU envelope (need n2 >= 32, "
            f"n1 <= 128); route through pallas_ntt.ntt_pallas_any instead")

    n1, n2 = split_n(n)
    L = field.num_limbs
    B = x.shape[0]
    # (B, n, L) -> (B, L, n2, n1) -> (B, L*n2, n1)
    xt = jnp.transpose(x.reshape(B, n2, n1, L), (0, 3, 1, 2))
    run = _mxu_kernel_factory(field.name, n, inverse, canon_out,
                              extra_shift, post_root_n)
    out = run(xt.reshape(B, L * n2, n1))  # (B, L*n1, n2)
    return jnp.transpose(out.reshape(B, L, n), (0, 2, 1))


# ---------------------------------------------------------------------------
# Radix-2 Cooley-Tukey split over MXU leaf kernels (8192 < n <= 65536)
# ---------------------------------------------------------------------------
#
# The single MXU kernel's fused stage constants outgrow VMEM past n=8192
# and its per-m loop form is slower than radix-2 there (PERF.md), so
# larger transforms decompose as  X[k] = E[k'] ± w_n^{±k'} O[k']  with
# E/O the half-size (M)NTTs of the even/odd samples — one DIT level per
# factor of two, MXU kernels at the 8192-point leaves.  Exact by
# construction; the inverse's extra 1/2 per level and the canonical-
# output epilogue fold into the leaf kernels' stage-2 twiddle constant
# (extra_shift / canon_out), and the combine works identically on
# Montgomery or canonical values because the twiddle constants stay in
# Montgomery form:  mont_mul(tw*R, v) = tw*v  for either representation.
# Covers the reference hot loop /root/reference/src/ligero/mod.rs:998-1012
# at the 2^20-2^22 BASELINE scales.


@functools.lru_cache(maxsize=None)
def _split_twiddles(field_name: str, n: int, inverse: bool) -> np.ndarray:
    """(n/2, L) Montgomery limbs of w_n^{±j}, j in [0, n/2)."""
    field = FIELDS[field_name]
    p = field.p
    omega = field.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    vals, cur = [], 1
    for _ in range(n // 2):
        vals.append(cur)
        cur = cur * omega % p
    return field.ints_to_mont_limbs(vals)


def mxu_ntt_split_pallas(field: FieldSpec, x, n: int, inverse: bool = False,
                         canon_out: bool = False, extra_shift: int = 0):
    """Batched (B, n, L) NTT for n past the single-kernel bound, as
    recursive radix-2 DIT levels over MXU leaf kernels."""
    import jax.numpy as jnp

    from .fieldops import FieldKernel
    from .pallas_kernels import mont_mul_pallas

    if mxu_ok(n):
        return mxu_ntt_pallas(field, x, n, inverse, canon_out, extra_shift)
    if not mxu_any_ok(n):
        raise ValueError(
            f"n={n} outside every MXU route (need 2048 <= n <= "
            f"{MXU_SPLIT_MAX_N}); use pallas_ntt.ntt_pallas_any instead")
    half = n // 2
    # the inverse's 1/n = (1/2) * (1/half): fold this level's 1/2 into
    # the sub-transforms' stage-2 constants (zero extra compute)
    sub_shift = extra_shift + (1 if inverse else 0)
    e = mxu_ntt_split_pallas(field, x[:, 0::2, :], half, inverse,
                             canon_out, sub_shift)
    if mxu_ok(half):
        # leaf level: the odd branch's w_n^{k} twiddle folds into the
        # leaf kernel's constants (post_root_n) — no separate multiply
        t_o = mxu_ntt_pallas(field, x[:, 1::2, :], half, inverse,
                             canon_out, sub_shift, post_root_n=n)
    else:
        o = mxu_ntt_split_pallas(field, x[:, 1::2, :], half, inverse,
                                 canon_out, sub_shift)
        tw = jnp.asarray(_split_twiddles(field.name, n, inverse))
        t_o = mont_mul_pallas(field, o, tw[None])
    fk = FieldKernel(field, jnp, unroll=False)
    return jnp.concatenate([fk.add(e, t_o), fk.sub(e, t_o)], axis=1)


#: route-anything entry: single kernel inside the envelope, radix-2
#: split composition past it (up to MXU_SPLIT_MAX_N)
mxu_ntt_any = mxu_ntt_split_pallas

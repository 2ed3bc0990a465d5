"""Exact host model of the MXU four-step NTT (the Pallas kernel's spec).

Four-step decomposition of an n-point NTT, n = n1*n2 (PERF.md roadmap
#2; reference hot loop /root/reference/src/ligero/mod.rs:998-1012):

    j = j1 + n1*j2,  k = k2 + n2*k1
    X[k] = sum_{j1} W1[j1,k1] * ( T[j1,k2] * sum_{j2} A[j1,j2] W2[j2,k2] )

    A[j1,j2] = x[j1 + n1*j2]      (column-major reshape)
    W1[a,b]  = w_{n1}^{ab},  W2[a,b] = w_{n2}^{ab},  T[j1,k2] = w_n^{j1*k2}
    out[k1*n2 + k2] = E[k1,k2]    (row-major flatten = natural order)

The two small DFTs are matrix products, which is what maps onto the MXU:
field elements split into 8-bit limbs, the data operand's limbs ride the
left rows (l-major), the constant matrix's limbs are looped (m), and
each int8 x int8 -> int32 matmul accumulates into the redundant column
t = l + m by a shifted row-block add:

    P_m[(l,i), k] = sum_j W_m[i,j] * D_l[j,k]        (exact: <= 2^28)
    acc[(l+m, i), k] += P_m[(l, i), k]

The redundant 8-bit columns are then carry-propagated to 16-bit limbs
and Montgomery-reduced (REDC over the 2L low limbs + a top-limb fold of
t_hi * R mod p), giving results < p.  Every step here is integer-exact;
the Pallas kernel must reproduce it bit for bit.

Operand bound: T = sum of <= 128 products of values < p < 2^254, so
T < 2^515 = 2L 16-bit limbs + a top limb < 2^8.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import FIELDS, FieldSpec

L8 = 32  # 8-bit limbs per 256-bit value


def split_n(n: int) -> tuple[int, int]:
    """n = n1*n2 with n1 >= n2, both powers of two, as square as possible
    (maximises MXU contraction sizes)."""
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _matrices(field_name: str, n: int, inverse: bool):
    """(W2_limbs (Lw, n2, n2), T_mont (n1, n2) ints, W1_limbs (Lw, n1, n1))
    with W limbs 8-bit uint, values in Montgomery form."""
    field = FIELDS[field_name]
    p = field.p
    n1, n2 = split_n(n)
    omega = field.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    w1 = pow(omega, n2, p)   # order n1
    w2 = pow(omega, n1, p)   # order n2

    R = field.R

    def limbs8(mat_ints, size):
        """field ints -> Montgomery 8-bit limbs (L8, size, size) uint8."""
        arr = np.zeros((L8, size, size), np.uint8)
        for a in range(size):
            for b in range(size):
                v = mat_ints[a][b] * R % p
                for l in range(L8):
                    arr[l, a, b] = (v >> (8 * l)) & 0xFF
        return arr

    w2_ints = [[pow(w2, (a * b) % n2, p) for b in range(n2)] for a in range(n2)]
    w1_ints = [[pow(w1, (a * b) % n1, p) for b in range(n1)] for a in range(n1)]
    t_mont = np.array(
        [[pow(omega, (j1 * k2) % n, p) * R % p for k2 in range(n2)]
         for j1 in range(n1)], dtype=object)
    return limbs8(w2_ints, n2), t_mont, limbs8(w1_ints, n1)


def _to_limbs8(vals, field: FieldSpec) -> np.ndarray:
    """list of ints (< 2^256) -> (L8, N) uint8."""
    out = np.zeros((L8, len(vals)), np.uint8)
    for i, v in enumerate(vals):
        for l in range(L8):
            out[l, i] = (v >> (8 * l)) & 0xFF
    return out


def _from_limbs8(arr) -> list[int]:
    """(L8plus, N) -> ints."""
    return [sum(int(arr[l, i]) << (8 * l) for l in range(arr.shape[0]))
            for i in range(arr.shape[1])]


def _limb_matmul_mod(field: FieldSpec, w_limbs: np.ndarray,
                     d_ints: np.ndarray) -> np.ndarray:
    """Field matmul  (W @ D) * R^{-1}  via the MXU limb algorithm.

    ``w_limbs``: (L8, M, K) uint8 Montgomery constants.
    ``d_ints``: (K, N) object ints (values < 2^255, any Montgomery-ness).
    Returns (M, N) object ints < p: REDC(sum_j W[i,j]*D[j,k]) — i.e. for
    Montgomery operands the result is the Montgomery product-sum.
    """
    p = field.p
    M, K = w_limbs.shape[1:]
    N = d_ints.shape[1]
    # data limbs: (L8+1, K, N) — values may exceed 2^256 slightly? no: < 2^255
    d8 = np.zeros((L8, K, N), np.int32)
    for j in range(K):
        for k in range(N):
            v = int(d_ints[j, k])
            for l in range(L8):
                d8[l, j, k] = (v >> (8 * l)) & 0xFF
    # accumulate redundant 8-bit columns: acc[t, i, k], t = l + m
    acc = np.zeros((2 * L8 - 1, M, N), np.int64)
    wi = w_limbs.astype(np.int64)
    for m in range(L8):
        # P_m[(l,i),k] = sum_j W_m[i,j] * D_l[j,k]  (int8 x int8 -> int32)
        p_m = np.einsum("ij,ljk->lik", wi[m], d8.astype(np.int64))
        assert p_m.max() < (1 << 31), "int32 overflow in MXU accumulation"
        acc[m:m + L8] += p_m
    # carry-propagate to exact value, then reduce mod p via REDC semantics:
    # result = T * 2^-256 mod p  (matches REDC of the product sum)
    out = np.empty((M, N), dtype=object)
    r_inv = pow(field.R, -1, p)
    for i in range(M):
        for k in range(N):
            t = sum(int(acc[c, i, k]) << (8 * c) for c in range(2 * L8 - 1))
            out[i, k] = t * r_inv % p
    return out


def mxu_ntt_model(field: FieldSpec, x_ints: list[int], n: int,
                  inverse: bool = False) -> list[int]:
    """n-point NTT of Montgomery-form ints via the four-step limb-matmul
    algorithm; returns Montgomery-form ints.  Bit-exact spec for the
    Pallas kernel."""
    p = field.p
    n1, n2 = split_n(n)
    w2_limbs, t_mont, w1_limbs = _matrices(field.name, n, inverse)

    # A[j1, j2] = x[j1 + n1*j2]
    a = np.empty((n1, n2), dtype=object)
    for j1 in range(n1):
        for j2 in range(n2):
            a[j1, j2] = x_ints[j1 + n1 * j2]

    # stage 1: B = REDC(A @ W2)  — contract j2.  W2 is symmetric, and the
    # limb algorithm computes W @ D; B[j1,k2] = sum_j2 W2[k2,j2]*A[j1,j2]
    # = (W2 @ A^T)^T.
    b = _limb_matmul_mod(field, w2_limbs, a.T).T

    # stage 2: pointwise twiddle (Montgomery product)
    r_inv = pow(field.R, -1, p)
    c = np.empty_like(b)
    for j1 in range(n1):
        for k2 in range(n2):
            c[j1, k2] = int(b[j1, k2]) * int(t_mont[j1, k2]) * r_inv % p

    # stage 3: E[k1,k2] = sum_j1 W1[k1,j1] * C[j1,k2]  (W1 symmetric)
    e = _limb_matmul_mod(field, w1_limbs, c)

    out = [0] * n
    for k1 in range(n1):
        for k2 in range(n2):
            out[k1 * n2 + k2] = int(e[k1, k2])
    if inverse:
        n_inv_mont = pow(n, -1, p) * field.R % p
        out = [v * n_inv_mont * r_inv % p for v in out]
    return out

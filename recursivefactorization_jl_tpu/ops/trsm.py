"""Triangular solves (TRSM) designed for the MXU.

The reference delegates TRSM to TriangularSolve.jl's multithreaded
substitution (call sites: reference src/lu.jl:145,227 and the NoPivot
``ldiv!`` override at src/lu.jl:55-61).  Row-by-row substitution is
latency-bound and maps terribly onto a systolic array, so the TPU-native
design replaces it with **recursive block triangular inversion**
(the MAGMA/cuBLAS trtri strategy):

    inv([[A, 0], [B, C]]) = [[inv(A), 0], [-inv(C) B inv(A), inv(C)]]

The recursion bottoms out in a short substitution loop (base <= 32), and
every level above it is two half-size inversions plus two matmuls — MXU
work with log2(n/base) sequential depth.  This is numerically the same
block substitution LAPACK trtri performs (backward stable), unlike a
Neumann-series inverse which cancels catastrophically when off-diagonal
magnitudes are large (e.g. unpivoted RBT factors).

Large triangles are handled by blocked substitution sweeps over
inverted diagonal blocks, so the sequential depth is n/block, each step
one MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.config import full_matmul_precision
from ..utils.perm import vma_zero
from .schur import FULL

_BASE = 32


def _unit_lower_inv_base(L: jax.Array) -> jax.Array:
    """Forward-substitution inverse of unit-lower L (n <= _BASE).
    Row k of X: e_k - L[k, :k] @ X[:k]."""
    n = L.shape[0]
    sl = jnp.tril(L, k=-1)
    cols = jnp.arange(n)
    # + vma_zero: carry init must match the body's shard_map varying type
    X0 = jnp.eye(n, dtype=L.dtype) + vma_zero(L, L.dtype)

    def body(k, X):
        lrow = lax.dynamic_slice(sl, (k, 0), (1, n))[0]
        w = jnp.where(cols < k, lrow, 0)
        ek = (cols == k).astype(L.dtype)
        newrow = ek - w @ X
        return lax.dynamic_update_slice(X, newrow[None, :], (k, 0))

    return lax.fori_loop(1, n, body, X0)


def _upper_inv_base(U: jax.Array) -> jax.Array:
    """Backward-substitution inverse of (non-unit) upper U (n <= _BASE).
    Row k of X: (e_k - U[k, k+1:] @ X[k+1:]) / U[k, k]."""
    n = U.shape[0]
    su = jnp.triu(U, k=1)
    d = jnp.diagonal(U)
    cols = jnp.arange(n)
    X0 = jnp.eye(n, dtype=U.dtype) * (1.0 / d)[:, None]

    def body(i, X):
        k = n - 2 - i
        urow = lax.dynamic_slice(su, (k, 0), (1, n))[0]
        w = jnp.where(cols > k, urow, 0)
        ek = (cols == k).astype(U.dtype)
        newrow = (ek - w @ X) * (1.0 / d[k])
        return lax.dynamic_update_slice(X, newrow[None, :], (k, 0))

    return lax.fori_loop(0, n - 1, body, X0)


def _unit_lower_inv_batched(L: jax.Array) -> jax.Array:
    """Blocked trtri with a BATCHED base: all n/_BASE diagonal base
    blocks invert in ONE vmapped 32-step substitution loop, then
    log2(n/_BASE) pairwise-combine levels run as batched matmuls
    (``X21 = -iC @ B @ iA``).  Numerically identical to the recursive
    block substitution (same operations, reorganized) — NOT a Neumann
    form — but the sequential depth drops from (n/_BASE)*_BASE
    substitution steps to _BASE steps + log2(n/_BASE) matmul rounds,
    which matters on TPU where each fori step costs ~1 us of issue
    latency.  Requires n to be a power-of-2 multiple of _BASE."""
    n = L.shape[0]
    b = _BASE
    nb = n // b
    idx = jnp.arange(nb)
    D = L.reshape(nb, b, nb, b)[idx, :, idx, :]          # (nb, b, b)
    Xd = jax.vmap(_unit_lower_inv_base)(D)               # one 32-step loop
    X = jnp.zeros_like(L)
    X = X.reshape(nb, b, nb, b).at[idx, :, idx, :].set(Xd).reshape(n, n)

    bs = b
    while bs < n:
        npair = n // (2 * bs)
        pidx = jnp.arange(npair)
        Xr = X.reshape(npair, 2 * bs, npair, 2 * bs)[pidx, :, pidx, :]
        Lr = L.reshape(npair, 2 * bs, npair, 2 * bs)[pidx, :, pidx, :]
        iA = Xr[:, :bs, :bs]
        iC = Xr[:, bs:, bs:]
        # the (bs:, :bs) block of packed LU factors lies strictly below
        # the diagonal — all L values, no masking needed
        B = Lr[:, bs:, :bs]
        X21 = -jnp.einsum(
            "pij,pjk->pik",
            iC,
            jnp.einsum("pij,pjk->pik", B, iA,
                       preferred_element_type=L.dtype, precision=FULL),
            preferred_element_type=L.dtype, precision=FULL,
        )
        Xr = Xr.at[:, bs:, :bs].set(X21)
        X = (
            X.reshape(npair, 2 * bs, npair, 2 * bs)
            .at[pidx, :, pidx, :]
            .set(Xr)
            .reshape(n, n)
        )
        bs *= 2
    return X


@full_matmul_precision
def unit_lower_inverse(L: jax.Array) -> jax.Array:
    """Inverse of the unit-lower-triangular matrix stored in ``L``'s
    strictly-lower part (diagonal implied 1, as in packed LU factors).
    Power-of-2 multiples of the base width route to the batched-base
    blocked form (short sequential depth, same numerics)."""
    n = L.shape[0]
    if n <= _BASE:
        return _unit_lower_inv_base(L)
    if n % _BASE == 0 and (n // _BASE) & (n // _BASE - 1) == 0:
        return _unit_lower_inv_batched(L)
    h = (n + 1) // 2
    iA = unit_lower_inverse(L[:h, :h])
    iC = unit_lower_inverse(L[h:, h:])
    B = jnp.tril(L, k=-1)[h:, :h]
    X21 = -jnp.dot(
        iC, jnp.dot(B, iA, preferred_element_type=L.dtype, precision=FULL),
        preferred_element_type=L.dtype, precision=FULL,
    )
    top = jnp.concatenate(
        [iA, jnp.zeros((h, n - h), dtype=L.dtype)], axis=1
    )
    bot = jnp.concatenate([X21, iC], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@full_matmul_precision
def upper_inverse(U: jax.Array) -> jax.Array:
    """Inverse of the upper-triangular matrix in ``U``'s upper part
    (non-unit diagonal).  inv([[A,B],[0,C]]) = [[iA, -iA B iC],[0, iC]]."""
    n = U.shape[0]
    if n <= _BASE:
        return _upper_inv_base(U)
    h = (n + 1) // 2
    iA = upper_inverse(U[:h, :h])
    iC = upper_inverse(U[h:, h:])
    B = U[:h, h:]
    X12 = -jnp.dot(
        iA, jnp.dot(B, iC, preferred_element_type=U.dtype, precision=FULL),
        preferred_element_type=U.dtype, precision=FULL,
    )
    top = jnp.concatenate([iA, X12], axis=1)
    bot = jnp.concatenate(
        [jnp.zeros((n - h, h), dtype=U.dtype), iC], axis=1
    )
    return jnp.concatenate([top, bot], axis=0)


def unit_upper_inverse(U: jax.Array) -> jax.Array:
    """Inverse of the unit-upper-triangular matrix in ``U``'s strictly
    upper part (via the lower-triangular kernel on the transpose)."""
    return unit_lower_inverse(U.T).T


def lower_inverse(L: jax.Array) -> jax.Array:
    """Inverse of the (non-unit) lower-triangular matrix in ``L``."""
    return upper_inverse(L.T).T


def _blocks(n: int, block: int):
    starts = list(range(0, n, block))
    return [(s, min(block, n - s)) for s in starts]


@full_matmul_precision
def solve_unit_lower(L: jax.Array, B: jax.Array, block: int = 128) -> jax.Array:
    """Solve ``tril(L, unit diag) @ X = B`` (left, lower, unit).

    Blocked right-looking forward sweep, unrolled at trace time with
    static shapes; diagonal blocks are inverted recursively so every op
    is a matmul.  Functional analog of
    ``TriangularSolve.ldiv!(UnitLowerTriangular(A11), A12)``
    (reference src/lu.jl:227).
    """
    n = L.shape[0]
    if n <= block:
        return jnp.dot(
            unit_lower_inverse(L), B, preferred_element_type=B.dtype, precision=FULL
        )
    X = B
    for s, w in _blocks(n, block):
        Lii_inv = unit_lower_inverse(L[s : s + w, s : s + w])
        Xi = jnp.dot(Lii_inv, X[s : s + w], preferred_element_type=B.dtype, precision=FULL)
        X = X.at[s : s + w].set(Xi)
        if s + w < n:
            upd = jnp.dot(
                L[s + w :, s : s + w], Xi, preferred_element_type=B.dtype, precision=FULL
            )
            X = X.at[s + w :].add(-upd)
    return X


@full_matmul_precision
def solve_lower(L: jax.Array, B: jax.Array, block: int = 128) -> jax.Array:
    """Solve ``tril(L) @ X = B`` (left, lower, non-unit diag)."""
    n = L.shape[0]
    if n <= block:
        return jnp.dot(lower_inverse(L), B, preferred_element_type=B.dtype, precision=FULL)
    X = B
    for s, w in _blocks(n, block):
        Lii_inv = lower_inverse(L[s : s + w, s : s + w])
        Xi = jnp.dot(Lii_inv, X[s : s + w], preferred_element_type=B.dtype, precision=FULL)
        X = X.at[s : s + w].set(Xi)
        if s + w < n:
            upd = jnp.dot(
                L[s + w :, s : s + w], Xi, preferred_element_type=B.dtype, precision=FULL
            )
            X = X.at[s + w :].add(-upd)
    return X


@full_matmul_precision
def solve_upper(U: jax.Array, B: jax.Array, block: int = 128) -> jax.Array:
    """Solve ``triu(U) @ X = B`` (left, upper, non-unit diag).

    Blocked right-looking backward sweep (mirrors solve_unit_lower).
    """
    n = U.shape[0]
    if n <= block:
        return jnp.dot(upper_inverse(U), B, preferred_element_type=B.dtype, precision=FULL)
    X = B
    for s, w in reversed(_blocks(n, block)):
        Uii_inv = upper_inverse(U[s : s + w, s : s + w])
        Xi = jnp.dot(Uii_inv, X[s : s + w], preferred_element_type=B.dtype, precision=FULL)
        X = X.at[s : s + w].set(Xi)
        if s > 0:
            upd = jnp.dot(
                U[:s, s : s + w], Xi, preferred_element_type=B.dtype, precision=FULL
            )
            X = X.at[:s].add(-upd)
    return X


@full_matmul_precision
def solve_unit_upper(U: jax.Array, B: jax.Array, block: int = 128) -> jax.Array:
    """Solve ``triu(U, unit diag) @ X = B`` (left, upper, unit)."""
    n = U.shape[0]
    if n <= block:
        return jnp.dot(
            unit_upper_inverse(U), B, preferred_element_type=B.dtype, precision=FULL
        )
    X = B
    for s, w in reversed(_blocks(n, block)):
        Uii_inv = unit_upper_inverse(U[s : s + w, s : s + w])
        Xi = jnp.dot(Uii_inv, X[s : s + w], preferred_element_type=B.dtype, precision=FULL)
        X = X.at[s : s + w].set(Xi)
        if s > 0:
            upd = jnp.dot(
                U[:s, s : s + w], Xi, preferred_element_type=B.dtype, precision=FULL
            )
            X = X.at[:s].add(-upd)
    return X

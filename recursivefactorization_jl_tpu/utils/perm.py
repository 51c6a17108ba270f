"""Pivot-sequence <-> permutation utilities.

The reference applies pivots as an in-place sequence of row interchanges
(`apply_permutation!`, reference src/lu.jl:156-180).  On TPU, data-dependent
in-place swaps are hostile to XLA, so we convert a LAPACK-style ``ipiv``
swap sequence into an explicit permutation vector once, and apply it as a
single row gather (the laswp analog).  All functions are jit-safe.

Conventions (documented divergence from the Julia reference, which is
1-based): ``ipiv`` is **0-based**: ``ipiv[k] = r`` means "at elimination
step k, row k was interchanged with row r" (r >= k).  ``info`` keeps the
reference's 1-based LAPACK convention: 0 = success, k = U[k-1,k-1] == 0,
negated for the no-pivot path (reference src/lu.jl:24-25, 313-319).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vma_zero(x: jax.Array, dtype=jnp.int32) -> jax.Array:
    """A scalar zero that inherits ``x``'s shard_map varying-manual-axes
    (VMA) type.

    Inside ``shard_map``, ``lax.fori_loop``/``scan`` carries must have the
    same VMA type on input and output; a literal ``jnp.zeros`` init is
    "replicated" while a body that touches per-device data produces
    "varying", which JAX >= 0.9 rejects.  Deriving the zero from the data
    itself makes the init varying exactly when the data is.  NaN/Inf-safe
    (uses a comparison, not arithmetic, so no NaN propagation).
    """
    if x.size == 0:
        return jnp.zeros((), dtype)
    v = x.ravel()[0]
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        v = jnp.real(v)
    if jnp.issubdtype(v.dtype, jnp.floating):
        return jnp.where(v == v, 0, 0).astype(dtype)
    return (v * 0).astype(dtype)


def ipiv_to_perm(ipiv: jax.Array, m: int) -> jax.Array:
    """Fold the swap sequence ``ipiv`` into a permutation vector ``p`` of
    length ``m`` such that ``A[p, :]`` equals the result of applying the row
    interchanges in order (i.e. ``P @ A``).

    Equivalent to Julia's ``LinearAlgebra.ipiv2perm`` used by ``F.p``.
    """
    ipiv = jnp.asarray(ipiv, dtype=jnp.int32)
    k = ipiv.shape[0]
    perm = jnp.arange(m, dtype=jnp.int32) + vma_zero(ipiv)

    def body(i, perm):
        j = ipiv[i]
        pi = perm[i]
        pj = perm[j]
        perm = perm.at[i].set(pj)
        perm = perm.at[j].set(pi)
        return perm

    return jax.lax.fori_loop(0, k, body, perm)


def invert_perm(perm: jax.Array) -> jax.Array:
    """Inverse permutation: ``inv[perm[i]] = i``."""
    n = perm.shape[0]
    return (
        jnp.zeros((n,), dtype=jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32))
    )


def perm_to_matrix(perm: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Dense permutation matrix P with ``P @ A == A[perm, :]``."""
    n = perm.shape[0]
    return jnp.zeros((n, n), dtype=dtype).at[jnp.arange(n), perm].set(1)


def apply_ipiv_rows(A: jax.Array, ipiv: jax.Array) -> jax.Array:
    """Apply the swap sequence to the rows of ``A`` (forward laswp).

    This is the functional analog of ``apply_permutation!(P, A)``
    (reference src/lu.jl:156-180): the sequential swaps are composed into
    one permutation and applied as a single gather, which XLA lowers to one
    efficient dynamic-gather instead of len(ipiv) dependent row swaps.
    """
    perm = ipiv_to_perm(ipiv, A.shape[0])
    return jnp.take(A, perm, axis=0)


def apply_ipiv_rows_inverse(A: jax.Array, ipiv: jax.Array) -> jax.Array:
    """Apply the inverse of the swap sequence to the rows of ``A``
    (backward laswp, used by ``A^T x = b`` style solves)."""
    perm = ipiv_to_perm(ipiv, A.shape[0])
    return jnp.zeros_like(A).at[perm].set(A)

"""Unblocked right-looking LU in pure JAX (the generic fallback path).

Functional re-design of the reference's ``_generic_lufact!``
(reference src/lu.jl:282-330): per step k — abs-argmax partial-pivot
search, row interchange, column scale by 1/A[k,k], rank-1 trailing
update — expressed as masked whole-array ops inside a ``lax.fori_loop``
so the entire factorization is one traced computation with static shapes.

This path is used for (a) dtypes outside the Pallas fast path (complex,
f64 on CPU oracles — the analog of the reference's non-PtrArray generic
fallback at src/lu.jl:117-118), and (b) as the interpret-mode oracle for
the Pallas panel kernel.

Exact reference semantics preserved:
* first-occurrence strict argmax pivot (src/lu.jl:289-297);
* **no row swap and no column scale when the pivot value is exactly zero**,
  but the rank-1 update still runs (src/lu.jl:299-319 — LAPACK getf2
  behavior);
* ``info`` = 1-based index of the first zero pivot, 0 otherwise, negated
  on the no-pivot path (src/lu.jl:313-319, NOPIVOT_NEGATIVE_INFO).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.perm import vma_zero


def unblocked_lu(A: jax.Array, pivot: bool):
    """Factor ``A`` (m x n) unblocked. Returns ``(LU, ipiv, perm, info)``.

    ``LU`` packs unit-lower L (strictly below diag) and U (on/above diag);
    ``ipiv`` is the 0-based swap sequence of length min(m, n); ``perm`` is
    the composed row-permutation vector (``L @ U == A[perm, :]``), tracked
    alongside the swaps so callers never pay the sequential
    ``ipiv_to_perm`` recomposition (an n-step scalar chain — measured
    ~0.75 ms per 256 steps on TPU, the single largest avoidable cost in
    the blocked schedule); ``info`` is int32 with the reference's
    convention.
    """
    m, n = A.shape
    minmn = min(m, n)
    if minmn == 0:
        return (
            A,
            jnp.zeros((0,), jnp.int32),
            jnp.arange(m, dtype=jnp.int32),
            jnp.int32(0),
        )

    rows = jnp.arange(m)
    cols = jnp.arange(n)
    # vma_zero: loop-carry inits must match the body's shard_map
    # varying-axes type (see utils/perm.vma_zero).
    vz = vma_zero(A)
    ipiv0 = jnp.arange(minmn, dtype=jnp.int32) + vz
    perm0 = jnp.arange(m, dtype=jnp.int32) + vz

    def body(k, carry):
        A, ipiv, perm, info = carry
        col = lax.dynamic_slice(A, (0, k), (m, 1))[:, 0]
        if pivot:
            abscol = jnp.where(rows >= k, jnp.abs(col), -jnp.inf)
            kp = jnp.argmax(abscol).astype(jnp.int32)
        else:
            kp = jnp.int32(k)
        ipiv = ipiv.at[k].set(kp)

        pivval = col[kp]
        piv_nonzero = pivval != 0

        # Interchange rows k <-> kp (skipped when pivot value is zero,
        # matching src/lu.jl:299-307).
        do_swap = piv_nonzero & (kp != k)
        rowk = lax.dynamic_slice(A, (k, 0), (1, n))[0]
        rowkp = A[kp]
        sel_k = (rows[:, None] == k) & do_swap
        sel_kp = (rows[:, None] == kp) & do_swap
        A = jnp.where(sel_k, rowkp[None, :], A)
        A = jnp.where(sel_kp, rowk[None, :], A)
        pk, pkp = perm[k], perm[kp]
        perm = jnp.where(
            do_swap,
            perm.at[k].set(pkp).at[kp].set(pk),
            perm,
        )

        # Scale the pivot column below the diagonal (src/lu.jl:309-312).
        akk_inv = jnp.where(piv_nonzero, 1, 0) / jnp.where(
            piv_nonzero, pivval, 1
        )
        colmask = (rows > k)[:, None] & (cols[None, :] == k) & piv_nonzero
        A = jnp.where(colmask, A * akk_inv.astype(A.dtype), A)

        # info records the first zero pivot, 1-based (src/lu.jl:313-319).
        newinfo = jnp.int32(k + 1) if pivot else jnp.int32(-(k + 1))
        info = jnp.where((~piv_nonzero) & (info == 0), newinfo, info)

        # Rank-1 trailing update (src/lu.jl:321-326); masks make it a no-op
        # on the last step, replicating the `k == minmn && break`.
        lcol = jnp.where(rows > k, lax.dynamic_slice(A, (0, k), (m, 1))[:, 0], 0)
        urow = jnp.where(cols > k, lax.dynamic_slice(A, (k, 0), (1, n))[0], 0)
        A = A - lcol[:, None] * urow[None, :]
        return A, ipiv, perm, info

    A, ipiv, perm, info = lax.fori_loop(
        0, minmn, body, (A, ipiv0, perm0, vz)
    )
    return A, ipiv, perm, info

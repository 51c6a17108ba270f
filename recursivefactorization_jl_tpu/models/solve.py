"""Solves with a computed LU — the ``ldiv!`` analog.

Mirrors the reference's solve plumbing:
* pivoted solve = permute rhs + unit-lower solve + upper solve (stdlib
  ``ldiv!(::LU, b)`` path, exercised at reference test/runtests.jl:21);
* no-pivot solve skips the permutation entirely — the ``NotIPIV`` /
  ``_ipiv_rows!`` no-op overrides (ref src/lu.jl:42-61);
* transpose solves support the adjoint/transpose wrappers
  (ref src/lu.jl:81-83).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import trsm
from ..utils.config import full_matmul_precision
from ..utils.perm import invert_perm, ipiv_to_perm


@functools.partial(jax.jit, static_argnames=("pivoted", "trans"))
@full_matmul_precision
def _lu_solve_impl(factors, perm, b, pivoted: bool, trans: bool):
    """``perm`` is the COMPOSED row permutation (``L@U == A[perm,:]``),
    not the ipiv swap sequence — composing ipiv on the fly is a
    sequential n-step scalar chain that would dominate the solve on TPU
    (the factorization hands the composed vector out for free)."""
    if factors.shape[0] != factors.shape[1]:
        raise ValueError("lu_solve requires a square factorization")
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    B = B.astype(factors.dtype)

    if not trans:
        if pivoted:
            B = jnp.take(B, perm, axis=0)
        y = trsm.solve_unit_lower(factors, B)
        x = trsm.solve_upper(factors, y)
    else:
        # A = P^T L U  =>  A^T x = b  <=>  U^T y = b, L^T z = y, x = P^T z
        y = trsm.solve_lower(factors.T, B)
        x = trsm.solve_unit_upper(factors.T, y)
        if pivoted:
            x = jnp.take(x, invert_perm(perm), axis=0)
    return x[:, 0] if vec else x


def lu_solve(lu_res, b: jax.Array, trans: bool = False) -> jax.Array:
    """Solve ``A x = b`` (or ``A^T x = b`` with ``trans=True``) given
    ``lu_res = lu(A)``."""
    perm = lu_res.p if lu_res.pivoted else lu_res.ipiv
    return _lu_solve_impl(
        lu_res.factors, perm, jnp.asarray(b), lu_res.pivoted, trans
    )


def ldiv(lu_res, b: jax.Array) -> jax.Array:
    """Reference-style name (``ldiv!``): left-division by the factored A."""
    return lu_solve(lu_res, b)

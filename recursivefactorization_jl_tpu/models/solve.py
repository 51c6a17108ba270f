"""Solves with a computed LU — the ``ldiv!`` analog.

Mirrors the reference's solve plumbing:
* pivoted solve = permute rhs + unit-lower solve + upper solve (stdlib
  ``ldiv!(::LU, b)`` path, exercised at reference test/runtests.jl:21);
* no-pivot solve skips the permutation entirely — the ``NotIPIV`` /
  ``_ipiv_rows!`` no-op overrides (ref src/lu.jl:42-61);
* transpose AND adjoint (conjugate-transpose) solves support the
  metaprogrammed ``Transpose``/``Adjoint`` wrappers of the reference
  (ref src/lu.jl:81-83): ``trans`` accepts ``"N"``/``False``/``0`` (solve
  ``A x = b``), ``"T"``/``True``/``1`` (``A^T x = b``) and ``"H"``/``2``
  (``A^H x = b`` — equal to ``"T"`` for real dtypes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import trsm
from ..ops.schur import FULL
from ..utils.config import full_matmul_precision
from ..utils.perm import invert_perm


def normalize_trans(trans) -> int:
    """Normalize the transpose selector to 0 (N) / 1 (T) / 2 (H).

    Accepted spellings: bool, 0/1/2, and the LAPACK-style strings
    "N"/"T"/"H" (case-insensitive), mirroring scipy's ``lu_solve``."""
    if isinstance(trans, bool):
        return 1 if trans else 0
    if trans in (0, 1, 2):
        return int(trans)
    if isinstance(trans, str):
        key = trans.upper()
        if key in ("N", "NOTRANS", "NONE"):
            return 0
        if key in ("T", "TRANS", "TRANSPOSE"):
            return 1
        if key in ("H", "C", "ADJOINT", "CONJTRANS"):
            return 2
    raise ValueError(
        f"unrecognized trans selector {trans!r}; use False/0/'N', "
        "True/1/'T', or 2/'H'"
    )


@functools.partial(jax.jit, static_argnames=("pivoted", "trans"))
@full_matmul_precision
def _lu_solve_impl(factors, perm, b, pivoted: bool, trans=0):
    """``perm`` is the COMPOSED row permutation (``L@U == A[perm,:]``),
    not the ipiv swap sequence — composing ipiv on the fly is a
    sequential n-step scalar chain that would dominate the solve on TPU
    (the factorization hands the composed vector out for free)."""
    trans = normalize_trans(trans)
    if factors.shape[0] != factors.shape[1]:
        raise ValueError("lu_solve requires a square factorization")
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    B = B.astype(factors.dtype)

    if trans == 0:
        if pivoted:
            B = jnp.take(B, perm, axis=0)
        y = trsm.solve_unit_lower(factors, B)
        x = trsm.solve_upper(factors, y)
    else:
        # A = P^T L U  =>  A^T x = b  <=>  U^T y = b, L^T z = y, x = P^T z
        # A^H x = b uses the conjugated factors: U^H y = b, L^H z = y
        # (identical to "T" for real dtypes; ref Adjoint wrapper
        # src/lu.jl:81-83).
        ft = factors.T
        if trans == 2 and jnp.issubdtype(factors.dtype, jnp.complexfloating):
            ft = jnp.conj(ft)
        y = trsm.solve_lower(ft, B)
        x = trsm.solve_unit_upper(ft, y)
        if pivoted:
            x = jnp.take(x, invert_perm(perm), axis=0)
    return x[:, 0] if vec else x


def lu_solve(lu_res, b: jax.Array, trans=0) -> jax.Array:
    """Solve ``A x = b`` given ``lu_res = lu(A)``.

    ``trans``: ``0``/``"N"``/``False`` solves ``A x = b``;
    ``1``/``"T"``/``True`` solves ``A^T x = b``; ``2``/``"H"`` solves
    ``A^H x = b`` (conjugate transpose)."""
    perm = lu_res.p if lu_res.pivoted else lu_res.ipiv
    return _lu_solve_impl(
        lu_res.factors, perm, jnp.asarray(b), lu_res.pivoted,
        normalize_trans(trans),
    )


def ldiv(lu_res, b: jax.Array) -> jax.Array:
    """Reference-style name (``ldiv!``): left-division by the factored A."""
    return lu_solve(lu_res, b)


@functools.partial(
    jax.jit, static_argnames=("pivoted", "trans", "iters")
)
@full_matmul_precision
def _lu_solve_refined_impl(factors, perm, A, b, pivoted, trans, iters):
    x = _lu_solve_impl(factors, perm, b, pivoted, trans)
    bm = b if b.ndim > 1 else b[:, None]
    for _ in range(iters):
        xm = x if x.ndim > 1 else x[:, None]
        if trans == 0:
            Ax = jnp.dot(A, xm, preferred_element_type=A.dtype, precision=FULL)
        elif trans == 1:
            Ax = jnp.dot(A.T, xm, preferred_element_type=A.dtype, precision=FULL)
        else:
            Ax = jnp.dot(
                jnp.conj(A).T, xm, preferred_element_type=A.dtype, precision=FULL
            )
        r = bm.astype(A.dtype) - Ax
        r = r if b.ndim > 1 else r[:, 0]
        dx = _lu_solve_impl(factors, perm, r, pivoted, trans)
        x = x + dx
    return x


def lu_solve_refined(
    lu_res, A: jax.Array, b: jax.Array, iters: int = 2, trans=0
) -> jax.Array:
    """Solve with ``iters`` steps of iterative refinement:
    ``x += A \\ (b - A x)`` re-using the factorization for each
    correction.

    This is the accuracy-recovery companion of the reduced-precision
    Schur modes (ops/schur.py): 1-2 refinement steps with f32 residuals
    restore the solve to the reference's f32 accuracy gate
    (ref test/runtests.jl:17,24) at ~O(n^2) cost per step.  Refinement
    contracts when ``kappa(A) * eps_schur < 1``: with 'bf16x3'
    (eps ~ 2^-21) that holds for generic matrices well past n=4096;
    with single-pass 'bf16' (eps ~ 2^-8) it holds only for
    well-conditioned systems (kappa below a few hundred) — measured
    divergent for generic randn matrices at n=1024 on chip.  The
    residual matvec runs at full (HIGHEST) precision."""
    perm = lu_res.p if lu_res.pivoted else lu_res.ipiv
    return _lu_solve_refined_impl(
        lu_res.factors,
        perm,
        jnp.asarray(A),
        jnp.asarray(b),
        lu_res.pivoted,
        normalize_trans(trans),
        iters,
    )


@functools.partial(jax.jit, static_argnames=("pivot", "config", "k"))
@full_matmul_precision
def _solve_fused_impl(A, B, pivot: bool, config, k: int):
    """Fused factor + forward-substitution: factor ``[A | b]`` as ONE
    fat LU.  Eliminating column j of the fat matrix applies exactly the
    forward substitution to the appended columns (they trail behind
    minmn = n, so they never pivot), leaving ``L^-1 P [A|b]`` — only
    the upper solve remains.  On the whole-matrix route the rhs rides
    in the VMEM-resident fori kernel (the per-boundary trailing update
    covers it at near-zero marginal cost), so the serial pivot chain —
    the single-matrix cost floor (docs/DESIGN.md lesson 2) — is paid
    ONCE for factor+solve instead of factor + a separate blocked TRSM
    sweep.  On the delegated route the platform's fat getrf does the
    same.  Returns ``(x, factors, info)``."""
    from .lu import _dispatch_factor, dispatch_route
    from ..ops.panel import panel_factor
    from ..utils.config import LANE

    n = A.shape[0]
    route = dispatch_route(A.shape, A.dtype, pivot, config)
    if route == "whole":
        # Pallas path: pad the appended block to a LANE multiple so
        # every trailing-column slice in the kernel stays tile-aligned
        # (zero columns forward-substitute to zero — discarded below).
        kp = -(-k // LANE) * LANE
        pad = jnp.zeros((n, kp - k), A.dtype)
        Ab = jnp.concatenate([A, B, pad], axis=1)
        f, _ipiv, _perm, info = panel_factor(Ab, pivot, config)
    else:
        Ab = jnp.concatenate([A, B], axis=1)
        f, _ipiv, _perm, info = _dispatch_factor(Ab, pivot, config)
    y = f[:, n : n + k]
    x = trsm.solve_upper(f[:n, :n], y, config.trsm_block)
    return x, f, info


def solve(A: jax.Array, b: jax.Array, pivot: bool = True, *,
          trans=0, check="auto", config=None) -> jax.Array:
    """One-shot ``A \\ b``: factor then substitute.

    The reference leans on Julia's backslash (``lu(A) \\ b``); this is
    that composition as one call.  Untransposed solves run FUSED —
    ``[A | b]`` factors as one fat LU so the forward substitution falls
    out of the factorization itself (see :func:`_solve_fused_impl`);
    ``trans`` solves and explicit re-use compose ``lu`` + ``lu_solve``
    instead.  Factor explicitly via :func:`~.lu.lu` when solving
    against the same matrix more than once."""
    from .lu import (
        SingularMatrixError,
        _check_info,
        _resolve_check,
        _strict_info,
        default_config,
        dispatch_route,
        lu,
        normalize_pivot,
    )

    trans = normalize_trans(trans)
    pivot = normalize_pivot(pivot)
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    if trans != 0 or A.ndim != 2 or A.shape[0] != A.shape[1]:
        return lu_solve(lu(A, pivot, check=check, config=config), b, trans)
    cfg = config or default_config()
    vec = b.ndim == 1
    B = (b[:, None] if vec else b).astype(A.dtype)
    x, f, info = _solve_fused_impl(A, B, pivot, cfg, B.shape[1])
    if _resolve_check(check, info):
        if dispatch_route(A.shape, A.dtype, pivot, cfg) == "xla":
            info = _strict_info(A, f[:, : A.shape[0]], info, pivot, cfg)
        _check_info(info, pivot)
    return x[:, 0] if vec else x

"""Unit tests for the MXU-oriented triangular ops (nilpotent-series
inverses + blocked substitution sweeps). Everything is jitted — the
1-core host makes eager dispatch cost an XLA compile per op."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from recursivefactorization_jl_tpu.ops import trsm

RNG = np.random.RandomState(3)

j_ulinv = jax.jit(trsm.unit_lower_inverse)
j_uinv = jax.jit(trsm.upper_inverse)
j_slower = jax.jit(functools.partial(trsm.solve_unit_lower, block=64))
j_supper = jax.jit(functools.partial(trsm.solve_upper, block=64))
j_slower_nu = jax.jit(functools.partial(trsm.solve_lower, block=64))
j_supper_u = jax.jit(functools.partial(trsm.solve_unit_upper, block=64))


def test_unit_lower_inverse():
    for n in [1, 2, 7, 64, 130]:
        L = np.tril(RNG.uniform(-1, 1, (n, n)), -1) + np.eye(n)
        inv = np.asarray(j_ulinv(jnp.asarray(L)))
        # growth-aware bound: ||inv@L - I|| <~ n*eps*||inv||*||L||
        eps = np.finfo(np.float64).eps
        tol = 50 * n * eps * max(
            np.linalg.norm(inv, np.inf) * np.linalg.norm(L, np.inf), 1.0
        )
        np.testing.assert_allclose(inv @ L, np.eye(n), atol=tol)


def test_upper_inverse():
    for n in [1, 5, 64]:
        U = np.triu(RNG.uniform(-1, 1, (n, n)), 1) + np.diag(
            RNG.uniform(0.5, 2.0, n)
        )
        inv = np.asarray(j_uinv(jnp.asarray(U)))
        np.testing.assert_allclose(inv @ U, np.eye(n), atol=1e-9)


def _solve_tol(T, X, n):
    # growth-aware: ||T@X - B|| <~ n*eps*||T||*||X||
    eps = np.finfo(np.float64).eps
    return 50 * n * eps * max(
        np.linalg.norm(T, np.inf) * np.linalg.norm(X, np.inf), 1.0
    )


def test_blocked_solves():
    n, k = 300, 5
    B = RNG.rand(n, k)
    L = np.tril(RNG.uniform(-1, 1, (n, n)), -1) + np.eye(n)
    X = np.asarray(j_slower(jnp.asarray(L), jnp.asarray(B)))
    np.testing.assert_allclose(L @ X, B, atol=_solve_tol(L, X, n))

    U = np.triu(RNG.uniform(-1, 1, (n, n)), 1) + np.diag(
        RNG.uniform(0.5, 2.0, n)
    )
    X = np.asarray(j_supper(jnp.asarray(U), jnp.asarray(B)))
    np.testing.assert_allclose(U @ X, B, atol=_solve_tol(U, X, n))

    X = np.asarray(j_slower_nu(jnp.asarray(U.T.copy()), jnp.asarray(B)))
    np.testing.assert_allclose(U.T @ X, B, atol=_solve_tol(U, X, n))

    X = np.asarray(j_supper_u(jnp.asarray(L.T.copy()), jnp.asarray(B)))
    np.testing.assert_allclose(L.T @ X, B, atol=_solve_tol(L, X, n))

"""LU result-object conveniences — det / logabsdet / inv / L / U / P.

The reference returns ``LinearAlgebra.LU`` whose consumers get det,
inv, and ``\\`` from the stdlib (reference src/lu.jl:121); these are the
equivalent derived quantities on our LU pytree.
"""

import numpy as np

import jax.numpy as jnp

import recursivefactorization_jl_tpu as rf

RNG = np.random.RandomState(21)


def test_det_and_logabsdet():
    for n in [1, 2, 5, 30]:
        A = RNG.rand(n, n) + n * np.eye(n)
        F = rf.lu(jnp.asarray(A))
        det_np = np.linalg.det(A)
        assert np.isclose(float(F.det()), det_np, rtol=1e-8), (
            n,
            float(F.det()),
            det_np,
        )
        la, sign = F.logabsdet()
        assert np.isclose(float(la), np.log(abs(det_np)), rtol=1e-8)
        assert float(sign) == np.sign(det_np)


def test_det_sign_with_swaps():
    # a matrix guaranteed to pivot (descending rows) — checks the
    # permutation-parity sign
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    F = rf.lu(jnp.asarray(A))
    assert np.isclose(float(F.det()), -1.0)


def test_inv():
    n = 24
    A = RNG.rand(n, n) + n * np.eye(n)
    F = rf.lu(jnp.asarray(A))
    Ainv = np.asarray(F.inv())
    np.testing.assert_allclose(A @ Ainv, np.eye(n), atol=1e-10)


def test_L_U_P_reconstruction():
    m, n = 9, 6  # tall
    A = RNG.rand(m, n)
    F = rf.lu(jnp.asarray(A))
    L, U = np.asarray(F.L), np.asarray(F.U)
    assert L.shape == (m, n) and U.shape == (n, n)
    p = np.asarray(F.p)
    np.testing.assert_allclose(L @ U, A[p, :], atol=1e-12)
    P = np.asarray(F.P)
    np.testing.assert_allclose(P @ A, A[p, :], atol=0)

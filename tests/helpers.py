"""Numpy-side check helpers (the host is 1-core: every eager jax op costs
an XLA compile, so all verification math happens in numpy)."""

import numpy as np


def np_perm_from_ipiv(ipiv, m):
    perm = np.arange(m)
    for i, j in enumerate(np.asarray(ipiv)):
        perm[[i, j]] = perm[[j, i]]
    return perm


def np_L(factors):
    f = np.asarray(factors)
    m, n = f.shape
    minmn = min(m, n)
    return np.tril(f[:, :minmn], -1) + np.eye(m, minmn, dtype=f.dtype)


def np_U(factors):
    f = np.asarray(factors)
    m, n = f.shape
    minmn = min(m, n)
    return np.triu(f[:minmn, :])


def lu_residual(A, factors, ipiv):
    """max|L@U - A[p,:]| — the reference's residual metric
    (ref test/runtests.jl:18)."""
    A = np.asarray(A)
    L, U = np_L(factors), np_U(factors)
    p = np_perm_from_ipiv(ipiv, A.shape[0])
    return np.max(np.abs(L @ U - A[p, :]))

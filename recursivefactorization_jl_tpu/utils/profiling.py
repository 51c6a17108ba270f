"""Profiling / tracing hooks.

The reference has no in-package instrumentation beyond `@info` progress
lines and its BenchmarkTools harness (SURVEY.md §5; reference
perf/lu.jl:1-5).  The TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of every XLA/Pallas op;
* :func:`timed` — wall-clock timing helper that is honest about XLA's
  async dispatch (blocks on the result);
* :func:`marginal_time` — the loop-in-jit differential timing used by
  ``bench.py``/``perf/sweep.py``: runs K data-dependent iterations
  inside one jit and differences two K values, cancelling fixed
  dispatch/sync overhead (required on hosts that reach the TPU through
  a relay, where per-invocation overhead is ~200 ms).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rf_tpu_trace"):
    """``with trace(): ...`` writes a profiler trace viewable in
    TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, reps: int = 3):
    """Best-of-``reps`` wall time of ``fn(*args)``, blocking on the
    result. Returns ``(best_seconds, last_result)``."""
    result = fn(*args)
    jax.block_until_ready(result)  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn(*args)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result


def marginal_time(
    fn: Callable, x, k1: int = 3, k2: int = 13, reps: int = 4,
    compiler_options: dict | None = None,
) -> float:
    """Differential in-jit loop timing of ``fn(x) -> array``.

    ``fn`` must return an array whose [0, 0] element depends on the
    computation; the loop carry multiplies ``x`` by (1 + 1e-24 * out[0,0]),
    numerically a no-op in f32 but a data dependence XLA cannot fold.
    ``compiler_options`` forwards per-compile XLA flags (the timing
    loop graph needs a raised scoped-vmem limit for big matrices).
    """

    # x is an ARGUMENT of the jit, never a closure: a closed-over
    # jax.Array becomes an HLO constant (tens of MB for bench shapes),
    # which multiplies compile time through the remote-compile tunnel.
    def looped(K):
        @jax.jit
        def run(a0):
            def body(i, a):
                out = fn(a)
                return a * (1.0 + 1e-24 * out.ravel()[0])

            # REAL scalar out: a complex device->host fetch hits a
            # relay-state-dependent UNIMPLEMENTED on the axon TPU
            # backend (see perf/sweep.py make_matrix); jnp.real is
            # a no-op for real dtypes
            return jnp.real(lax.fori_loop(0, K, body, a0).ravel()[0])

        return run

    ts = []
    for K in (k1, k2):
        run = looped(K)
        if compiler_options is not None:
            run = run.lower(x).compile(
                compiler_options=compiler_options
            )
        np.asarray(run(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (k2 - k1)


def marginal_time_stats(
    fn: Callable, x, k1: int = 3, k2: int = 13, reps: int = 4,
    compiler_options: dict | None = None, extra_args: tuple = (),
) -> dict:
    """Like :func:`marginal_time` but returns per-rep spread so every
    committed artifact cell carries its own uncertainty (VERDICT r3
    weak #1: no more single-number cells below the relay noise floor).

    The two loop lengths are timed INTERLEAVED per rep (k1, k2, k1, k2,
    ...) so slow relay drift cancels within each paired marginal rather
    than biasing all of one K's reps.  Returns::

        {"time_s": median_of_marginals, "min_s": ..., "max_s": ...,
         "reps": reps, "k1": k1, "k2": k2, "negative_reps": int}

    A cell whose ``min_s`` is negative (differential noise larger than
    the signal) is below the noise floor at these loop lengths; callers
    should raise (k1, k2) or annotate the cell.

    ``compiler_options`` forwards per-compile XLA flags.  Needed at
    n >= 6144 on TPU: the fori-looped timing graph (NOT the package's
    own jit path, which compiles fine) trips XLA's 16 MiB scoped-vmem
    ceiling in a fused variadic reduce-window ("It should not be
    possible to run out of scoped vmem - please file a bug against
    XLA"); ``{"xla_tpu_scoped_vmem_limit_kib": "32768"}`` was measured
    to fix the compile while lax.optimization_barrier was not
    (perf/experiments/r4_oomprobe.py).

    ``extra_args`` are forwarded to ``fn(a, *extra_args)`` as REAL jit
    arguments of the timing graph.  Large device arrays a timed fn
    needs (precomputed factors, pivots) must ride here, never in a
    closure: a closed-over jax.Array lowers to an HLO *constant*
    embedded in the compile payload, and at 8192x8192 f32 (256 MB)
    the remote-compile tunnel rejects the request outright (HTTP 413,
    observed in the r5 solve sweep).
    """

    def looped(K):
        def run(a0, *extras):
            def body(i, a):
                out = fn(a, *extras)
                return a * (1.0 + 1e-24 * out.ravel()[0])

            # REAL scalar out: a complex device->host fetch hits a
            # relay-state-dependent UNIMPLEMENTED on the axon TPU
            # backend (see perf/sweep.py make_matrix); jnp.real is
            # a no-op for real dtypes
            return jnp.real(lax.fori_loop(0, K, body, a0).ravel()[0])

        if compiler_options is None:
            return jax.jit(run)
        return jax.jit(run).lower(x, *extra_args).compile(
            compiler_options=compiler_options
        )

    run1, run2 = looped(k1), looped(k2)
    np.asarray(run1(x, *extra_args))  # compile + warm
    np.asarray(run2(x, *extra_args))
    margs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run1(x, *extra_args))
        t1 = time.perf_counter()
        np.asarray(run2(x, *extra_args))
        t2 = time.perf_counter()
        margs.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    margs.sort()
    return {
        "time_s": float(np.median(margs)),
        "min_s": margs[0],
        "max_s": margs[-1],
        "reps": reps,
        "k1": k1,
        "k2": k2,
        "negative_reps": sum(1 for m in margs if m <= 0),
    }

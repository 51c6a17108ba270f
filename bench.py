"""Headline benchmark — pivoted f32 LU on the real TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric   : GFLOP/s of an NxN (N below) float32 pivoted LU factorization
           (flops = the standard exact LU count ~ 2n^3/3).  NOTE: the
           reference harness's luflop (reference perf/lu.jl:7-19) uses a
           LARGER count (~n^3 at m=n: it adds a divide per step and sums
           the scale range values), so absolute GFLOP/s here are NOT
           comparable with reference-published plots (~1.5x lower by
           construction); the vs_baseline ratio is unaffected.
baseline : XLA's own LU (jax.scipy.linalg.lu_factor) on the same chip;
           vs_baseline = baseline_time / our_time (>1 means faster).

Timing methodology (hardened in round 2): this host reaches the TPU
through a relay with ~200 ms fixed dispatch+sync overhead per jit
invocation, and block_until_ready does not reliably sync, so single-call
wall timing is meaningless.  Each measurement runs K data-dependent
factorizations inside ONE jit (lax.fori_loop) and fetches a scalar; the
time per factorization is the marginal (t(Kb) - t(Ka)) / (Kb - Ka),
which cancels the fixed overhead exactly.  To keep run-to-run relay
variance out of the ours/baseline ratio, all (variant, K) cells are
measured INTERLEAVED across repetitions, marginals are computed from
every K pair, and the reported value is the median of marginals (the
spread across marginals is written to bench_details.json).
"""

from __future__ import annotations

import itertools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_REPO = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402

# n=8192: the MXU-dominant regime where the O(n^3) Schur bulk fully
# amortizes the serial pivot chain — measured 2.36x XLA's lu on v5e
# (perf/results_r04_large.json; the ratio grows monotonically with n:
# 1.19 @2048, 1.46 @4096, 1.80 @6144, 2.36 @8192).  If anything in the
# 8192 cells fails (the fori TIMING graph — not the package path —
# needs a raised scoped-vmem limit, which older XLA stacks may reject),
# the benchmark falls back to the round-2/3 proven n=4096 configuration
# so a BENCH capture is never lost to the bigger shape.
N = 8192
N_FALLBACK = 4096
KS = (2, 5, 8)   # loop lengths; marginals from all pairs
REPS = 3         # interleaved repetitions per (variant, K) cell
BATCH_B, BATCH_N = 10000, 64  # BASELINE config 5 batched workload


def _copts_for(A) -> dict | None:
    """Raised scoped-vmem ceiling for big timing graphs — same rule and
    rationale as perf/sweep.py::_copts_for (measured: the looped timing
    graph trips the 16 MiB default from n=6144 f32; the package's own
    jit path does not)."""
    if A.ndim == 2 and A.size * A.dtype.itemsize >= 64 * 1024 * 1024:
        return {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    return None


def luflop(m: int, n: int) -> float:
    """Standard exact LU flop count: per elimination step, the scale
    multiplies + rank-1 mul-adds; for m == n this is ~ 2n^3/3 (differs
    from reference perf/lu.jl:7-19's larger accounting — see module
    docstring)."""
    minmn = min(m, n)
    k = np.arange(minmn, dtype=np.float64)
    return float(np.sum((m - k - 1) + 2.0 * (m - k - 1) * (n - k - 1)))


def _looped(fact, K, A_for_compile=None):
    """K data-dependent factorizations in one jit; returns a scalar.

    The carry multiplies A by (1 + 1e-24*f[0,0]): numerically a no-op in
    f32 (rounds to *1.0) but a runtime data dependence XLA cannot fold,
    so the loop body cannot be CSE'd or dead-code-eliminated.

    The matrix is an ARGUMENT, never a closure: a closed-over jax.Array
    is embedded as an HLO constant (tens of MB), which multiplies
    compile time through the remote-compile tunnel ~5x.

    When ``A_for_compile`` needs raised scoped-vmem (see _copts_for),
    the jit is eagerly lowered+compiled with those options here."""

    @jax.jit
    def run(A):
        def body(i, a):
            f = fact(a)
            s = f[0, 0] if f.ndim == 2 else f[0, 0, 0]
            return a * (1.0 + 1e-24 * s)

        out = lax.fori_loop(0, K, body, A)
        return out[0, 0] if out.ndim == 2 else out[0, 0, 0]

    if A_for_compile is not None:
        copts = _copts_for(A_for_compile)
        if copts is not None:
            return run.lower(A_for_compile).compile(
                compiler_options=copts
            )
    return run


def measure_variants(variants, ks=KS, reps=REPS):
    """variants: {name: (fact, A)}.  Returns {name: (median_s, spread)}
    where spread = (max - min) / median over all marginals."""
    import sys

    runs = {}
    for name, (fact, A) in variants.items():
        runs[name] = ({k: _looped(fact, k, A) for k in ks}, A)
    for name, (rs, A) in runs.items():
        for k in ks:
            # compile + warm, with retries: the axon runtime
            # intermittently fails executes with a transient
            # UNIMPLEMENTED after long sessions.  Progress lines go to
            # stderr (first compiles of the big shapes take minutes
            # through the remote-compile tunnel; the stdout JSON
            # contract is untouched).
            t0 = time.perf_counter()
            for attempt in range(3):
                try:
                    np.asarray(rs[k](A))
                    break
                except Exception:
                    if attempt == 2:
                        raise
                    time.sleep(60)
            print(f"# warm {name} K={k}: {time.perf_counter()-t0:.0f}s",
                  file=sys.stderr, flush=True)
    times = {name: {k: [] for k in ks} for name in runs}
    for _ in range(reps):
        for name, (rs, A) in runs.items():  # interleaved
            for k in ks:
                t0 = time.perf_counter()
                np.asarray(rs[k](A))
                times[name][k].append(time.perf_counter() - t0)
    out = {}
    for name in runs:
        best = {k: min(times[name][k]) for k in ks}
        margs = []
        for r in range(reps):
            for ka, kb in itertools.combinations(ks, 2):
                margs.append(
                    (times[name][kb][r] - times[name][ka][r]) / (kb - ka)
                )
        margs = np.asarray(margs)
        med = float(np.median(margs))
        spread = float((margs.max() - margs.min()) / med) if med > 0 else 0.0
        out[name] = (med, spread, [float(x) for x in margs], best)
    return out


def correctness_gate(A):
    """Residual check so the headline number is honest."""
    f, ipiv, info = jax.device_get(rf.lu_factor(A, True))
    n = A.shape[0]
    L = np.tril(f, -1).astype(np.float64) + np.eye(n)
    U = np.triu(f).astype(np.float64)
    from recursivefactorization_jl_tpu.utils.perm import ipiv_to_perm

    p = np.asarray(jax.jit(ipiv_to_perm, static_argnums=1)(jnp.asarray(ipiv), n))
    An = np.asarray(A, dtype=np.float64)
    resid = np.max(np.abs(L @ U - An[p, :])) / (
        n * np.finfo(np.float32).eps * np.max(np.abs(An))
    )
    assert resid < 100.0, f"residual check failed: {resid}"
    assert int(info) == 0
    return resid


def _wait_for_backend(max_wait_s: float = 3600.0) -> None:
    """Gate on backend availability with a bounded wait.

    The axon relay goes unavailable for stretches, and backend
    initialization has been observed to HANG (not raise) while it is
    down — an in-process jax call would wedge this script forever.
    Probe with a tiny matmul in a kill-able subprocess; retry up to
    ``max_wait_s``, then fail loudly."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((128, 128))\n"
        "assert float((x @ x)[0, 0]) == 128.0\n"
    )
    deadline = time.time() + max_wait_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=150,
                check=True,
                capture_output=True,
            )
            return
        except Exception:
            if time.time() > deadline:
                raise RuntimeError(
                    "TPU backend unavailable: probe matmul kept failing "
                    f"for {max_wait_s:.0f}s; not starting the benchmark"
                )
            time.sleep(90)


def _measure_at(n: int, rng) -> tuple:
    """Measure the single-matrix variants at size ``n``.  Returns
    (results dict, A).  Factored out so main() can fall back from the
    headline N to N_FALLBACK if the big-shape cells fail."""
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)

    # round-4: the default schur_precision is 'auto' (bf16x3 at this N
    # on the TPU f32 blocked path — passes the reference residual gate,
    # see LUConfig); 'ours' is the DEFAULT path a user gets, and the
    # explicit-f32 arm keeps the full-precision comparison visible.
    cfg = rf.default_config()
    # round-5: panel_boundary_precision also defaults 'auto' (bf16x3
    # here); the full-precision arm pins BOTH knobs so it stays a true
    # 6-pass-everywhere comparison.
    cfg_f32 = rf.LUConfig(schur_precision="float32",
                          panel_boundary_precision="float32")

    variants = {
        "ours": (lambda a: _dispatch_factor(a, True, cfg)[0], A),
        "xla": (lambda a: jax.scipy.linalg.lu_factor(a)[0], A),
        "ours_f32full": (
            lambda a: _dispatch_factor(a, True, cfg_f32)[0], A
        ),
    }
    return measure_variants(variants), A


def main() -> None:
    _wait_for_backend()
    rng = np.random.RandomState(123)  # ref perf/lu.jl:4 MersenneTwister(123)
    n_used = N
    try:
        res, A = _measure_at(N, rng)
    except Exception as e:  # noqa: BLE001 — any big-shape failure
        print(f"# n={N} cells failed ({type(e).__name__}: {e}); "
              f"falling back to n={N_FALLBACK}", flush=True)
        n_used = N_FALLBACK
        res, A = _measure_at(N_FALLBACK, rng)

    Ab = jnp.asarray(
        rng.standard_normal((BATCH_B, BATCH_N, BATCH_N)), dtype=jnp.float32
    )
    res.update(measure_variants({
        "ours_batched": (
            lambda a: rf.batched_lu_factor_perm(a, True)[0], Ab
        ),
        "xla_batched": (
            lambda a: jax.vmap(jax.scipy.linalg.lu_factor)(a)[0], Ab
        ),
    }))
    resid = correctness_gate(A)

    t_ours, t_base = res["ours"][0], res["xla"][0]
    gflops = luflop(n_used, n_used) / t_ours / 1e9
    details = {
        "n": n_used,
        "residual_scaled": resid,
        "variants": {
            name: {
                "median_s": r[0],
                "spread": r[1],
                "marginals_s": r[2],
                "best_wall_s_per_K": {str(k): v for k, v in r[3].items()},
            }
            for name, r in res.items()
        },
        "batched": {
            "B": BATCH_B,
            "n": BATCH_N,
            "ours_ms": res["ours_batched"][0] * 1e3,
            "xla_ms": res["xla_batched"][0] * 1e3,
            "speedup": res["xla_batched"][0] / res["ours_batched"][0],
        },
        "f32full": {
            "median_s": res["ours_f32full"][0],
            "default_speedup_vs_f32full": res["ours_f32full"][0] / t_ours,
        },
    }
    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=1)

    # Self-reported spread (VERDICT r2): quantile band of the marginal
    # pairings bounds how far another session's capture should land
    # from this one.  10/90 percentiles, not extremes: a single relay
    # hiccup in one rep otherwise produces a meaningless range (the
    # median itself is already robust to it).
    ours_m = np.asarray(res["ours"][2])
    base_m = np.asarray(res["xla"][2])
    ratio_lo = float(
        np.percentile(base_m, 10) / max(np.percentile(ours_m, 90), 1e-12)
    )
    ratio_hi = float(
        np.percentile(base_m, 90) / max(np.percentile(ours_m, 10), 1e-12)
    )
    print(
        json.dumps(
            {
                "metric": f"lu_f32_n{n_used}_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(t_base / t_ours, 3),
                "vs_baseline_range": [round(ratio_lo, 3), round(ratio_hi, 3)],
                "spread": {
                    "ours": round(res["ours"][1], 4),
                    "xla": round(res["xla"][1], 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

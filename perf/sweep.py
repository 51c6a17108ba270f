"""GFLOPS-vs-size sweep — the analog of the reference benchmark harness
(reference perf/lu.jl:1-81): exact-LU-flop GFLOPS across a size sweep,
comparing this framework against the platform BLAS/LAPACK analog (XLA's
`lu_factor`) plus schedule variants (fully-fused small kernel vs blocked
schedule — the reference compares threshold=4 vs threshold=800 variants,
perf/lu.jl:48-59).

Run on the real chip:   python perf/sweep.py
Options:                --sizes 256,512,1024,2048,4096 --dtype float32
                        --out perf/results.json
                        --batched   (10k x 64 x 64 batched workload)
                        --rect      (fat/tall rectangular shapes)
                        --rbt       (RBT pivot-free vs pivoted on an
                                     ill-conditioned matrix: time + accuracy)

Writes one JSON record per (size, variant) and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if "--no-cache" not in sys.argv:
    # Persistent compile cache: big win through the remote-compile
    # tunnel, but entries compiled while the relay is in its sick state
    # (UNIMPLEMENTED window) poison every later hit — the reader fails
    # with the same UNIMPLEMENTED at deserialization.  --no-cache
    # bypasses it for recovery runs (see docs/ROUND4.md §3 C64 notes).
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _REPO)

import recursivefactorization_jl_tpu as rf  # noqa: E402


def luflop(m: int, n: int) -> float:
    """Standard exact LU flop count ~ 2n^3/3 at m == n.  The reference's
    luflop (perf/lu.jl:7-19) counts ~1.5x MORE (adds a divide per step
    and sums the scale-range values), so absolute GFLOP/s are not
    comparable with reference plots; ratios between variants are."""
    minmn = min(m, n)
    k = np.arange(minmn, dtype=np.float64)
    return float(np.sum((m - k - 1) + 2.0 * (m - k - 1) * (n - k - 1)))


def _ks_for(n: int):
    """Loop lengths scaled so the K2 loop body runs tens of ms — small
    matrices need hundreds of iterations before the marginal rises above
    the relay's run-to-run noise."""
    if n < 128:
        return 100, 500
    if n < 512:
        return 30, 150
    if n < 1536:
        return 8, 32
    return 2, 8


def _copts_for(A) -> dict:
    """Compiler options for a timing cell.  The fori-looped timing
    GRAPH (not the package path itself) trips the default 16 MiB
    scoped-vmem ceiling for big matrices — the TPU compile helper dies
    with exit code 1 (measured: f32 from n=6144, f64 from n=4096; see
    perf/experiments/r4_oomprobe.py).  Raising the limit for cells
    >= 64 MiB keeps every variant on identical options = fair A/B."""
    m, n = A.shape[-2:]
    if m * n * jnp.dtype(A.dtype).itemsize >= 64 * 1024 * 1024:
        return {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    return {}


def best_time(fn, A, reps: int = 3, ks=None) -> float:
    """Marginal (differential-K) loop-in-jit timing — single-call wall
    timing is meaningless through the TPU relay (fixed ~200 ms
    dispatch+sync overhead per invocation; see utils/profiling.py)."""
    from recursivefactorization_jl_tpu.utils.profiling import marginal_time

    k1, k2 = ks if ks else _ks_for(min(A.shape[-2:]))
    return marginal_time(fn, A, k1=k1, k2=k2, reps=reps,
                         compiler_options=_copts_for(A) or None)


def best_stats(fn, A, reps: int = 4, ks=None) -> dict:
    """Per-cell timing WITH spread (interleaved per-rep marginals) —
    every committed artifact cell carries its uncertainty."""
    from recursivefactorization_jl_tpu.utils.profiling import (
        marginal_time_stats,
    )

    k1, k2 = ks if ks else _ks_for(min(A.shape[-2:]))
    return marginal_time_stats(fn, A, k1=k1, k2=k2, reps=reps,
                               compiler_options=_copts_for(A) or None)


def defaults_stamp() -> dict:
    """Defaults-version stamp written as the first record of every
    artifact (VERDICT r3 item 3): which package defaults produced it."""
    import dataclasses
    import datetime

    cfg = rf.default_config()
    return {
        "meta": "defaults_stamp",
        "package_version": rf.__version__,
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "date": datetime.date.today().isoformat(),
        "config": {
            f.name: getattr(cfg, f.name)
            for f in dataclasses.fields(cfg)
        },
        "auto_xla_threshold": rf.LUConfig.AUTO_XLA_THRESHOLD,
    }


def make_matrix(rng, shape, dtype):
    if jnp.issubdtype(dtype, jnp.complexfloating):
        # Build complex arrays ON DEVICE from two real transfers: the
        # axon relay intermittently reports UNIMPLEMENTED for complex
        # host<->device transfers once the server has run large real
        # programs (probed 2026-08-19: complex compute and real fetches
        # keep working while complex fetches fail).  The timing loops
        # return real scalars for the same reason (utils/profiling.py).
        rdt = jnp.float32 if dtype == jnp.dtype(jnp.complex64) else jnp.float64
        re = jnp.asarray(rng.standard_normal(shape), dtype=rdt)
        im = jnp.asarray(rng.standard_normal(shape), dtype=rdt)
        return jax.jit(jax.lax.complex)(re, im)
    return jnp.asarray(rng.standard_normal(shape), dtype=dtype)


def variants(dtype, inplace_compare: bool = False, whole: bool = False,
             no_bf16x3: bool = False):
    from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

    out = {
        # default adaptive schedule
        "rf_default": lambda a: _dispatch_factor(
            a, True, rf.default_config()
        )[0],
        # fully blocked (recursion-analog forced on, like threshold=4).
        # xla_threshold=None: without it this arm DELEGATES below the
        # auto threshold (f32 <= 1535; c64 at every size) and times the
        # same executable as xla_lu — which is what the rf_blocked rows
        # of results_r04_smalln.json below n=512 did (harness bug found
        # in round 4; those rows duplicate xla_lu, rf_whole is the real
        # kernel arm there)
        "rf_blocked": lambda a: _dispatch_factor(
            a, True, rf.LUConfig(small_threshold=0, xla_threshold=None)
        )[0],
    }
    if whole:
        # always-whole-kernel, no platform escape (the threshold=800
        # fully-iterative analog of reference perf/lu.jl:48-59): shows
        # what OUR kernel does at sizes where the default delegates
        out["rf_whole"] = lambda a: _dispatch_factor(
            a, True, rf.LUConfig(xla_threshold=None)
        )[0]
    if inplace_compare:
        # The reference sweep compares lu! (in place) with lu (copy
        # first) (perf/lu.jl:31-44).  Under jit, donation only matters
        # at the call boundary (XLA owns buffers inside), so the honest
        # analog is the explicit extra copy the out-of-place API pays:
        # rf_default above is the lu!-analog, this is the lu-analog.
        out["rf_copied"] = lambda a: _dispatch_factor(
            jnp.copy(a), True, rf.default_config()
        )[0]
    if not (
        dtype in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128))
        and jax.default_backend() in ("tpu", "axon")
    ):
        # XLA/LAPACK baseline (the OpenBLAS lu! analog).  Unavailable
        # for f64/c128 on TPU: XLA's LuDecomposition implements F32/C64
        # only — this package's emulated-matmul paths still run.
        out["xla_lu"] = lambda a: jax.scipy.linalg.lu_factor(a)[0]
    if dtype == jnp.dtype(jnp.float32) and not no_bf16x3:
        # 3-pass MXU Schur bulk (the recommended fast mode; pair the
        # single-pass 'bf16' knob with lu_solve_refined instead)
        out["rf_bf16x3"] = lambda a: _dispatch_factor(
            a, True, rf.LUConfig(schur_precision="bf16x3")
        )[0]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", default="64,128,256,512,1024,2048,4096"
    )
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batched", action="store_true",
                    help="also sweep the 10k-matrix batched workload")
    ap.add_argument("--batched-sizes", default="64",
                    help="matrix sizes for --batched (BASELINE names "
                         "16-128)")
    ap.add_argument("--batched-solve", action="store_true",
                    help="with --batched: also time the factor+solve "
                         "pipelines end to end (lane solve kernel vs "
                         "vmapped XLA lu_solve)")
    ap.add_argument("--inplace-compare", action="store_true",
                    help="add the lu-vs-lu! analog variant (explicit "
                         "copy before factoring)")
    ap.add_argument("--whole", action="store_true",
                    help="add the always-whole-kernel no-escape variant")
    ap.add_argument("--no-bf16x3", action="store_true",
                    help="skip the bf16x3 variant (uninteresting at "
                         "small n; halves small-sweep compile count)")
    ap.add_argument("--rect", action="store_true",
                    help="also sweep fat/tall rectangular shapes")
    ap.add_argument("--rbt", action="store_true",
                    help="also compare RBT pivot-free vs pivoted LU solve")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache (recovery "
                         "from entries poisoned by a sick-relay window; "
                         "handled at import time)")
    ap.add_argument("--solve", action="store_true",
                    help="also sweep the solve path (factor once + "
                         "triangular solves) vs XLA's lu_solve")
    args = ap.parse_args()

    # empty --sizes "" skips the single-matrix sweep (e.g. a
    # batched-only capture)
    sizes = [int(s) for s in args.sizes.split(",") if s]
    if args.dtype == "float64":
        # without this, float64 silently downcasts to f32 and the
        # "f64" sweep measures nothing
        jax.config.update("jax_enable_x64", True)
    if args.dtype == "complex128":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.dtype(args.dtype)
    assert jnp.zeros((), dtype).dtype == dtype, "x64 not enabled"
    rng = np.random.RandomState(123)  # ref perf/lu.jl:4
    records = [defaults_stamp()]

    print(f"# LU sweep dtype={dtype.name} backend={jax.default_backend()}")
    vs = variants(dtype, args.inplace_compare, args.whole, args.no_bf16x3)
    header = ["n"] + list(vs)
    print("\t".join(header))
    # rf_default delegates to the platform kernel at or below the auto
    # threshold (the reference's stdlib escape, ref src/lu.jl:70-73);
    # annotate those cells — they time the SAME executable as xla_lu, so
    # any difference there is pure relay drift, not a kernel comparison.
    auto_thresh = rf.default_config().resolved_xla_threshold(dtype)
    for n in sizes:
        A = make_matrix(rng, (n, n), dtype)
        row = [str(n)]
        for name, fn in vs.items():
            try:
                st = best_stats(fn, A)
            except Exception as e:  # noqa: BLE001 — one dead cell must
                # not kill the whole artifact (the axon relay throws
                # transient UNIMPLEMENTED after long sessions; a real
                # per-dtype gap should land in the artifact as data)
                row.append("ERR")
                records.append({"variant": name, "n": n,
                                "dtype": dtype.name,
                                "error": f"{type(e).__name__}: {e}"[:300]})
                print(f"# cell ({name}, {n}) failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                continue
            t = st["time_s"]
            gf = luflop(n, n) / t / 1e9 if t > 0 else float("nan")
            row.append(f"{gf:.1f}")
            rec = {"variant": name, "n": n, "dtype": dtype.name,
                   "time_s": t, "gflops": gf,
                   "spread_s": [st["min_s"], st["max_s"]],
                   "reps": st["reps"]}
            if st["negative_reps"]:
                # differential noise exceeded the signal in some rep:
                # the cell is at/below the relay noise floor at these
                # loop lengths — carried in the artifact, not hidden
                rec["below_noise_floor_reps"] = st["negative_reps"]
            if (name == "rf_default" and auto_thresh is not None
                    and n <= auto_thresh):
                rec["delegates_to_xla"] = True
            records.append(rec)
        print("\t".join(row))

    if args.rect:
        # the reference sweeps (s, s+2) fat shapes (test/runtests.jl:39);
        # at perf scale use block-fat and block-tall panels
        from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

        for (m, n) in [(2048, 4096), (4096, 2048), (4096, 4224)]:
            A = jnp.asarray(rng.standard_normal((m, n)), dtype=dtype)
            fn = lambda a: _dispatch_factor(a, True, rf.default_config())[0]
            t = best_time(fn, A)
            gf = luflop(m, n) / t / 1e9
            print(f"rect {m}x{n}\t{gf:.1f} GFLOP/s\t{t * 1e3:.2f} ms")
            records.append(
                {"variant": "rf_default", "m": m, "n": n,
                 "dtype": dtype.name, "time_s": t, "gflops": gf}
            )

    if args.batched:
        B = 10000
        from recursivefactorization_jl_tpu.parallel import (
            batched_lu_factor,
            batched_lu_factor_perm,
            batched_lu_solve_perm,
        )

        for n in [int(s) for s in args.batched_sizes.split(",")]:
            A = jnp.asarray(
                rng.standard_normal((B, n, n)), dtype=jnp.float32
            )
            # rhs for the factor+solve pipelines (closure is fine: a
            # (B, n) f32 rhs is ~2.5 MB at n=64 — far below the
            # closure-as-HLO-constant compile blowup threshold)
            bvec = jnp.asarray(
                rng.standard_normal((B, n)), dtype=jnp.float32
            )

            def rf_pipe(a):
                f, perm, info = batched_lu_factor_perm(a, True)
                return batched_lu_solve_perm(f, perm, bvec)

            def xla_pipe(a):
                lu_, piv = jax.vmap(jax.scipy.linalg.lu_factor)(a)
                return jax.vmap(
                    lambda l, p, bb: jax.scipy.linalg.lu_solve((l, p), bb)
                )(lu_, piv, bvec)

            # loop lengths scaled so the K2 body runs tens of ms: at
            # n=16 the whole 10k batch factors in ~0.13 ms and the
            # fixed (2, 8) pair sits below relay noise (a round-3
            # capture produced a NEGATIVE marginal there)
            bks = (20, 120) if n <= 32 else (2, 8)
            fns = {
                "rf_batched": lambda a: batched_lu_factor(a, True)[0],
                "rf_batched_perm": lambda a: batched_lu_factor_perm(
                    a, True
                )[0],
                "xla_batched": lambda a: jax.vmap(
                    jax.scipy.linalg.lu_factor
                )(a)[0],
            }
            if args.batched_solve:
                # factor+solve END TO END (the reference's workload
                # contract, test/runtests.jl:20-25): rf = lane factor
                # kernel + lane substitution kernel; xla = vmapped
                # lu_factor + lu_solve.  Solve-only cost = pipeline
                # minus the factor-only row of the same capture.
                fns["rf_factor_solve"] = rf_pipe
                fns["xla_factor_solve"] = xla_pipe
            for name, fn in fns.items():
                st = best_stats(fn, A, ks=bks)
                t = st["time_s"]
                gf = B * luflop(n, n) / t / 1e9
                print(
                    f"{name}\tB={B} n={n}\t{gf:.1f} GFLOP/s\t{t * 1e3:.1f} ms"
                )
                rec = {"variant": name, "n": n, "batch": B,
                       "dtype": "float32", "time_s": t, "gflops": gf,
                       "spread_s": [st["min_s"], st["max_s"]],
                       "reps": st["reps"]}
                if st["negative_reps"]:
                    rec["below_noise_floor_reps"] = st["negative_reps"]
                records.append(rec)

    if args.solve:
        # end-to-end solve: permutation apply + unit-lower and upper
        # triangular solves on a pre-computed factorization (the
        # reference's ldiv! surface, test/runtests.jl:20-25) — ours
        # (blocked trtri+matmul TRSM, ops/trsm.py) vs XLA's lu_solve.
        # The factorization rides as a jit ARGUMENT (a closed-over
        # factor pytree would embed n^2 floats as an HLO constant and
        # blow up remote compiles); solves are latency-bound, so the
        # marginal loops are long.
        import time as _time
        from jax import lax

        def timed_solve(solver, fac, b, ks=(8, 64), reps=3):
            def looped(K):
                @jax.jit
                def run(fc, bb):
                    def body(i, b_):
                        x = solver(fc, b_)
                        return b_ * (1.0 + 1e-24 * x.ravel()[0])

                    return lax.fori_loop(0, K, body, bb).ravel()[0]

                return run

            ts = []
            for K in ks:
                run = looped(K)
                np.asarray(run(fac, b))  # compile + warm
                best = float("inf")
                for _ in range(reps):
                    t0 = _time.perf_counter()
                    np.asarray(run(fac, b))
                    best = min(best, _time.perf_counter() - t0)
                ts.append(best)
            return (ts[1] - ts[0]) / (ks[1] - ks[0])

        for n in sizes or [1024, 2048, 4096]:
            A = jnp.asarray(rng.standard_normal((n, n)), dtype=dtype)
            b = jnp.asarray(rng.standard_normal((n,)), dtype=dtype)
            F = rf.lu(A)
            Fx = jax.scipy.linalg.lu_factor(A)

            for name, (solver, fac) in {
                "rf_solve": (lambda fc, bb: rf.lu_solve(fc, bb), F),
                "xla_solve": (
                    lambda fc, bb: jax.scipy.linalg.lu_solve(fc, bb), Fx
                ),
            }.items():
                t = timed_solve(solver, fac, b)
                x = np.asarray(solver(fac, b))
                err = float(
                    np.max(
                        np.abs(
                            np.asarray(A, np.float64) @ x.astype(np.float64)
                            - np.asarray(b)
                        )
                    )
                )
                print(f"{name}\tn={n}\t{t * 1e6:.1f} us\t|Ax-b|={err:.2e}")
                records.append(
                    {"variant": name, "n": n, "dtype": dtype.name,
                     "time_s": t, "abs_err": err, "op": "solve"}
                )

    if args.rbt:
        # ill-conditioned worst-growth matrix: pivoted LU solve vs the
        # RBT pivot-free pipeline (reference positions RBT exactly here,
        # test/runtests.jl:80-88). Accuracy measured as ||Ax - b||_inf.
        n = 2048
        W = np.eye(n) + np.tril(-np.ones((n, n)), -1)
        W[:, -1] = 1.0
        A = jnp.asarray(W, dtype=dtype)
        b = jnp.asarray(rng.standard_normal(n), dtype=dtype)

        def pivoted_solve(a):
            F = rf.lu(a)
            return rf.lu_solve(F, b)[None, :]

        ws = rf.butterfly_workspace(A, b)

        def rbt_solve(a):
            ws2 = rf.BWorkspace(A=a, b=ws.b, uv=ws.uv, n=ws.n)
            return rf.butterfly_solve(ws2)[None, :]

        for name, fn in {
            "pivoted_solve": pivoted_solve,
            "rbt_solve": rbt_solve,
        }.items():
            t = best_time(fn, A if name == "pivoted_solve" else ws.A)
            x = np.asarray(
                fn(A if name == "pivoted_solve" else ws.A)
            )[0]
            err = float(np.max(np.abs(W @ x.astype(np.float64) - np.asarray(b))))
            print(f"{name}\tn={n}\t{t * 1e3:.2f} ms\t|Ax-b|_inf={err:.2e}")
            records.append(
                {"variant": name, "n": n, "dtype": dtype.name,
                 "time_s": t, "abs_err": err, "matrix": "wilkinson"}
            )

    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"# wrote {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()

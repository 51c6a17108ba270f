"""Single-matrix solve benchmarks at scale (VERDICT r4 weak #2 / next #4).

Two questions, both unmeasured before round 5:
1. Given factors, does the dense-inverse blocked TRSM solve
   (models/solve.py lu_solve) beat XLA's getrs
   (jax.scipy.linalg.lu_solve) at n >= 2048?
2. End to end, does the FUSED factor+solve (solve(A, b): [A|b] as one
   fat LU) beat lu(A) + lu_solve and XLA's lu_factor+lu_solve?

Arms per n (interleaved marginals; x = A \\ b, one rhs):
* ``rf_solve``    — rf.lu_solve on precomputed rf factors+perm
* ``xla_getrs``   — jax.scipy.linalg.lu_solve on precomputed XLA
                    factors+ipiv
* ``rf_fused``    — rf.solve(A, b) (fused fat LU)
* ``rf_compose``  — rf factor + substitute end to end
* ``xla_e2e``     — jsp lu_factor + lu_solve end to end

Usage: python perf/experiments/r5_solve.py [--sizes 2048,4096,8192]
Appends JSONL to perf/results_r05_solve.json.
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402
from recursivefactorization_jl_tpu.models.solve import (  # noqa: E402
    _lu_solve_impl,
    _solve_fused_impl,
)
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

COPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def main():
    sizes = [1024, 2048, 4096, 8192]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    only = (sys.argv[sys.argv.index("--arms") + 1].split(",")
            if "--arms" in sys.argv else None)
    path = os.path.join(_REPO, "perf", "results_r05_solve.json")
    rng = np.random.RandomState(123)
    cfg = rf.LUConfig()
    print(f"=== r5_solve sizes={sizes} backend={jax.default_backend()}",
          flush=True)
    with open(path, "a", buffering=1) as f:
        f.write(json.dumps({"meta": "r5_solve", "sizes": sizes,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend()}) + "\n")
        for n in sizes:
            A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
            b = jnp.asarray(rng.standard_normal((n,)), dtype=jnp.float32)
            # precomputed factors for the solve-only arms — compiled
            # with the same scoped-vmem raise the timed cells get (the
            # default scoped limit OOMs the n>=4096 tail kernel), and
            # isolated so one size's failure doesn't kill the sweep
            try:
                factor = jax.jit(
                    lambda a: _dispatch_factor(a, True, cfg)
                ).lower(A).compile(compiler_options=COPTS)
                fac, _ipiv, perm, _info = jax.block_until_ready(factor(A))
                xf, xpiv = jax.block_until_ready(jsp.lu_factor(A))
            except Exception as e:  # noqa: BLE001
                print(f"n={n} precompute FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                f.write(json.dumps({"n": n, "error":
                                    f"precompute {type(e).__name__}: {e}"[:300]})
                        + "\n")
                continue

            # the precomputed factors ride as REAL jit arguments of the
            # timing graph (extra_args) — closed-over device arrays
            # embed as HLO constants, and at n=8192 the 256 MB constant
            # overflows the remote-compile tunnel (HTTP 413)
            def rf_solve(bb, fac, perm):
                return _lu_solve_impl(fac, perm, bb, True, 0)

            def xla_getrs(bb, xf, xpiv):
                return jsp.lu_solve((xf, xpiv), bb)

            def rf_fused(a, b=b, cfg=cfg):
                return _solve_fused_impl(a, b[:, None], True, cfg, 1)[0]

            def rf_compose(a, b=b, cfg=cfg):
                fc, _ip, pm, _in = _dispatch_factor(a, True, cfg)
                return _lu_solve_impl(fc, pm, b, True, 0)

            def xla_e2e(a, b=b):
                return jsp.lu_solve(jsp.lu_factor(a), b)

            solve_arms = {"rf_solve": (rf_solve, (fac, perm)),
                          "xla_getrs": (xla_getrs, (xf, xpiv))}
            e2e_arms = {"rf_fused": rf_fused, "rf_compose": rf_compose,
                        "xla_e2e": xla_e2e}
            if only is not None:
                solve_arms = {k: v for k, v in solve_arms.items()
                              if k in only}
                e2e_arms = {k: v for k, v in e2e_arms.items() if k in only}
            row = {"n": n, "dtype": "float32"}
            for name, (fn, extras) in solve_arms.items():
                try:
                    st = marginal_time_stats(fn, b, k1=2, k2=8, reps=4,
                                             compiler_options=COPTS,
                                             extra_args=extras)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n} {name}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
                    row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                    continue
                row[name] = {"time_s": st["time_s"],
                             "spread_s": [st["min_s"], st["max_s"]]}
                print(f"n={n} {name}: {st['time_s']*1e3:.3f} ms "
                      f"[{st['min_s']*1e3:.3f},{st['max_s']*1e3:.3f}]",
                      flush=True)
            for name, fn in e2e_arms.items():
                try:
                    st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                             compiler_options=COPTS)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n} {name}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
                    row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                    continue
                row[name] = {"time_s": st["time_s"],
                             "spread_s": [st["min_s"], st["max_s"]]}
                print(f"n={n} {name}: {st['time_s']*1e3:.3f} ms "
                      f"[{st['min_s']*1e3:.3f},{st['max_s']*1e3:.3f}]",
                      flush=True)
            f.write(json.dumps(row) + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

"""Delegation-band A/B (VERDICT r4 item 2): rf_whole (this package's
whole-matrix fori3 kernel, current defaults) vs xla_lu, interleaved in
ONE session, at n in the unmeasured 513..1023 band plus the bimodal
1024 endpoint.

Round-3 context: AUTO_XLA_THRESHOLD=1023 was calibrated from two
endpoints (0.85x at 512, ~1.1x at 1024) against an XLA baseline that
measured bimodal across sessions at 1024 (0.33 vs 0.62 ms).  This
script measures the whole band with enough interleaved per-rep
marginals to see any bimodality within one session, and prints the
crossover so AUTO_XLA_THRESHOLD can be set from data.

Usage: python perf/experiments/r4_band.py [sizes] [rounds]
Writes .bench_r4_band.out + perf/results_r04_band.json
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402

out = open(os.path.join(_REPO, ".bench_r4_band.out"), "a", buffering=1)


def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)


def looped(fn, K):
    @jax.jit
    def run(a0):
        def body(i, a):
            o = fn(a)
            return a * (1.0 + 1e-24 * o.ravel()[0])

        return lax.fori_loop(0, K, body, a0).ravel()[0]

    return run


def main():
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["512", "640", "768", "896", "1024", "1152"])]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ks = (8, 32)
    rng = np.random.RandomState(123)
    cfg_whole = rf.LUConfig(xla_threshold=None)
    variants = {
        "rf_whole": lambda a: _dispatch_factor(a, True, cfg_whole)[0],
        "xla_lu": lambda a: jax.scipy.linalg.lu_factor(a)[0],
    }
    log(f"=== r4_band {time.strftime('%H:%M:%S')} sizes={sizes} "
        f"rounds={rounds} ks={ks} backend={jax.default_backend()}")
    records = []
    for n in sizes:
        A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
        runs = {}
        for name, fn in variants.items():
            r1, r2 = looped(fn, ks[0]), looped(fn, ks[1])
            np.asarray(r1(A))  # compile + warm
            np.asarray(r2(A))
            runs[name] = (r1, r2)
        margs = {name: [] for name in variants}
        # interleave variants within each round so relay drift hits
        # both equally; each round yields one paired marginal/variant
        for _ in range(rounds):
            for name, (r1, r2) in runs.items():
                t0 = time.perf_counter()
                np.asarray(r1(A))
                t1 = time.perf_counter()
                np.asarray(r2(A))
                t2 = time.perf_counter()
                margs[name].append(((t2 - t1) - (t1 - t0)) / (ks[1] - ks[0]))
        row = {"n": n, "ks": ks, "rounds": rounds}
        for name, ms in margs.items():
            ms_s = sorted(ms)
            med = float(np.median(ms_s))
            row[name] = {
                "median_s": med,
                "min_s": ms_s[0],
                "max_s": ms_s[-1],
                "reps_s": [float(m) for m in ms],
            }
        ratio = row["xla_lu"]["median_s"] / row["rf_whole"]["median_s"]
        row["rf_speedup"] = ratio
        records.append(row)
        log(f"n={n}: rf_whole {row['rf_whole']['median_s']*1e3:.3f} ms "
            f"[{row['rf_whole']['min_s']*1e3:.3f},{row['rf_whole']['max_s']*1e3:.3f}] "
            f"| xla {row['xla_lu']['median_s']*1e3:.3f} ms "
            f"[{row['xla_lu']['min_s']*1e3:.3f},{row['xla_lu']['max_s']*1e3:.3f}] "
            f"| rf_speedup {ratio:.3f}")
    path = os.path.join(_REPO, "perf", "results_r04_band.json")
    with open(path, "w") as f:
        f.write(json.dumps({"meta": "r4_band", "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend(),
                            "jax": jax.__version__}) + "\n")
        for r in records:
            f.write(json.dumps(r) + "\n")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()

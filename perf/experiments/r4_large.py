"""The n >= 6144 regime on chip (VERDICT r4 item 1): correctness +
perf at n in {6144, 8192} f32 (rf_default = blocked w=512 fori3 u2
panels + recursive 2048 tail; rf_bf16x3; xla_lu), plus n=8192 f64
(rf only — XLA's lu has no f64 on TPU).

This is the framework's own scale claim: the 100 MiB fori budget keeps
w=512 panels to m~16k (utils/config.py) and the crash-class fallbacks
in ops/blocked.py gate exactly this region — neither had ever executed
above n=4096 before this script.

Usage: python perf/experiments/r4_large.py [sizes] [--no-f64]
                                           [--out NAME.json]
Writes .bench_r4_large.out + perf/results_r04_large.json (or --out;
use --out for captures beyond {6144, 8192} so the committed r4_large
artifact isn't overwritten — e.g. the n in {12288, 16384} extension
goes to perf/results_r04_xlarge.json).
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

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

out = open(os.path.join(_REPO, ".bench_r4_large.out"), "a", buffering=1)


def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)


def luflop(n):
    k = np.arange(n, dtype=np.float64)
    return float(np.sum((n - k - 1) + 2.0 * (n - k - 1) ** 2))


def check_resid(A, factor_fn, tag):
    """Factor once (jitted — an eager _dispatch_factor call at this
    size is hundreds of relay round-trips), verify the reference
    residual gate.  Above n=8192 the full host-side L@U is ~9 TFLOP on
    this ONE-core host (~10+ min), so the residual is evaluated on 256
    random columns instead: max_j |(L@U - PA)[:, j]| over the sample —
    same n·eps·|A| scaling, the LU residual is column-homogeneous."""
    F, ipiv, perm, info = jax.device_get(jax.jit(factor_fn)(A))
    n = A.shape[0]
    An = np.asarray(A, np.float64)
    L = np.tril(F, -1).astype(np.float64) + np.eye(n)
    U = np.triu(F).astype(np.float64)
    if n > 8192:
        cols = np.random.RandomState(7).choice(n, 256, replace=False)
        resid = np.max(np.abs(L @ U[:, cols] - An[perm][:, cols]))
        tag += " (256-col sample)"
    else:
        resid = np.max(np.abs(L @ U - An[perm]))
    scaled = resid / (n * np.finfo(np.asarray(A).dtype).eps * np.max(np.abs(An)))
    log(f"  {tag}: scaled_resid={scaled:.3f} info={int(info)}")
    return float(scaled), int(info)


def main():
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              and not sys.argv[1].startswith("-")
                              else ["6144", "8192"])]
    do_f64 = "--no-f64" not in sys.argv
    out_name = "results_r04_large.json"
    if "--out" in sys.argv:
        out_name = sys.argv[sys.argv.index("--out") + 1]
    rng = np.random.RandomState(123)
    records = [{"meta": "r4_large", "date": time.strftime("%Y-%m-%d"),
                "backend": jax.default_backend(), "jax": jax.__version__,
                "timing_compiler_options":
                    {"xla_tpu_scoped_vmem_limit_kib": "32768"}}]
    log(f"=== r4_large {time.strftime('%H:%M:%S')} sizes={sizes} "
        f"backend={jax.default_backend()}")

    # precisions pinned EXPLICITLY so this A/B stays meaningful if the
    # schur_precision default changes (it informs that decision)
    variants = {
        "rf_f32": lambda a: _dispatch_factor(
            a, True, rf.LUConfig(schur_precision="float32"))[0],
        "rf_bf16x3": lambda a: _dispatch_factor(
            a, True, rf.LUConfig(schur_precision="bf16x3"))[0],
        "xla_lu": lambda a: jax.scipy.linalg.lu_factor(a)[0],
    }
    for n in sizes:
        A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
        # correctness first (this region never ran on chip before)
        t0 = time.time()
        scaled, info = check_resid(
            A, lambda a: _dispatch_factor(a, True, rf.default_config()), f"f32 n={n}"
        )
        log(f"  (correctness pass took {time.time()-t0:.0f}s)")
        assert scaled < 100 and info == 0, (n, scaled, info)
        records.append({"kind": "resid", "n": n, "dtype": "float32",
                        "scaled_resid": scaled, "info": info})
        # the fori-looped timing graph (not the package path) trips the
        # 16 MiB scoped-vmem ceiling at n >= 6144; measured fix in
        # r4_oomprobe.py.  Same options for every variant = fair A/B.
        copts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
        for name, fn in variants.items():
            st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                     compiler_options=copts)
            gf = luflop(n) / st["time_s"] / 1e9
            log(f"n={n} {name}: {st['time_s']*1e3:.2f} ms "
                f"[{st['min_s']*1e3:.2f},{st['max_s']*1e3:.2f}] "
                f"{gf:.0f} GFLOP/s")
            records.append({"variant": name, "n": n, "dtype": "float32",
                            "time_s": st["time_s"],
                            "spread_s": [st["min_s"], st["max_s"]],
                            "gflops": gf, "reps": st["reps"]})

    if do_f64:
        n = 8192
        A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float64)
        scaled, info = check_resid(
            A, lambda a: _dispatch_factor(a, True, rf.default_config()),
            f"f64 n={n}",
        )
        assert scaled < 100 and info == 0, (scaled, info)
        records.append({"kind": "resid", "n": n, "dtype": "float64",
                        "scaled_resid": scaled, "info": info})
        fn = lambda a: _dispatch_factor(a, True, rf.default_config())[0]
        st = marginal_time_stats(
            fn, A, k1=1, k2=2, reps=3,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"},
        )
        gf = luflop(n) / st["time_s"] / 1e9
        log(f"n={n} rf_default f64: {st['time_s']*1e3:.1f} ms "
            f"[{st['min_s']*1e3:.1f},{st['max_s']*1e3:.1f}] {gf:.0f} GFLOP/s")
        records.append({"variant": "rf_default", "n": n, "dtype": "float64",
                        "time_s": st["time_s"],
                        "spread_s": [st["min_s"], st["max_s"]],
                        "gflops": gf, "reps": st["reps"]})

    path = os.path.join(_REPO, "perf", out_name)
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Round-5 n=8192 optimization A/Bs (follow-up to r4_phase8192.py).

The r5 phase run pinned the pass ladder: default (bf16x3 Schur)
37.3 ms, single-pass bf16 35.1 ms => ~1.1 ms/Schur-pass, i.e. the
O(n^3) Schur bulk is ~3.4 ms and ~34 ms is chain/glue.  These arms
attack the glue:

* ``default``  — re-measured in-session anchor
* ``bprec``    — panel_boundary_precision='bf16x3': the fori panels'
                 in-kernel TRSM/Schur boundary matmuls at 3-pass HIGH
                 instead of 6-pass HIGHEST (the micro inverse stays
                 HIGHEST)
* ``bprec_bf16``— bprec + single-pass Schur (stacking both ladders)
* ``micro64``  — panel_micro=64 for the blocked panels (half the
                 boundary count per panel; 'auto' resolves 32 there)
* ``outer512`` — panel_outer=512 on the w=512 panels: ONE outer block
                 per panel — every trailing update inside the panel is
                 confined until the single outer boundary
* ``tail1024`` — tail_threshold=1024: trade the last 4 panel rounds
                 for... fewer (the 2048 tail becomes panels + 1024
                 tail); bounds how much the tail helps/hurts

Usage: python perf/experiments/r5_phase.py [arms|all] [--n N]
Appends JSONL to perf/results_r05_phase.json.
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

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

COPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def luflop(n):
    k = np.arange(n, dtype=np.float64)
    return float(np.sum((n - k - 1) + 2.0 * (n - k - 1) ** 2))


VARIANTS = {
    "default": rf.LUConfig(),
    "bprec": rf.LUConfig(panel_boundary_precision="bf16x3"),
    "bprec_bf16": rf.LUConfig(panel_boundary_precision="bf16x3",
                              schur_precision="bf16"),
    "micro64": rf.LUConfig(panel_micro=64),
    "outer512": rf.LUConfig(panel_outer=512),
    "tail1024": rf.LUConfig(tail_threshold=1024),
}


def main():
    names = (sys.argv[1].split(",") if len(sys.argv) > 1
             and not sys.argv[1].startswith("-") else ["all"])
    if names == ["all"]:
        names = list(VARIANTS)
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 8192
    path = os.path.join(_REPO, "perf", "results_r05_phase.json")
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    print(f"=== r5_phase n={n} variants={names} "
          f"backend={jax.default_backend()}", flush=True)
    with open(path, "a") as f:
        f.write(json.dumps({"meta": "r5_phase", "n": n,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend(),
                            "variants": names}) + "\n")
        for name in names:
            cfg = VARIANTS[name]
            fn = lambda a: _dispatch_factor(a, True, cfg)[0]  # noqa: E731
            try:
                st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                         compiler_options=COPTS)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                f.write(json.dumps({"variant": name, "n": n,
                                    "error": f"{type(e).__name__}: {e}"[:300]})
                        + "\n")
                continue
            gf = luflop(n) / st["time_s"] / 1e9
            print(f"{name}: {st['time_s']*1e3:.2f} ms "
                  f"[{st['min_s']*1e3:.2f},{st['max_s']*1e3:.2f}] "
                  f"{gf:.0f} GFLOP/s", flush=True)
            f.write(json.dumps({"variant": name, "n": n, "dtype": "float32",
                                "time_s": st["time_s"],
                                "spread_s": [st["min_s"], st["max_s"]],
                                "gflops": gf, "reps": st["reps"]}) + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

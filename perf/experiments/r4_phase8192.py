"""Where do the other ~35 ms go?  Knob/phase breakdown at n=8192 f32.

The r4_large precision ladder (perf/results_r04_large.json) gives
t(6-pass f32 Schur) = 46.4 ms and t(3-pass bf16x3) = 40.9 ms at
n=8192 — a slope of ~1.8 ms per Schur pass, which extrapolates to a
NON-Schur "rest" of ~35 ms.  The O(n^3) Schur bulk is therefore NOT
where the default path spends its time at scale; this experiment pins
the rest by A/B-ing one knob at a time against the default
(bf16x3 Schur, w=512 fori3 u2 panels, trsm_block=128, 2048 tail):

* ``bf16``      — 1-pass Schur: completes the pass ladder (fit
                  rest + passes * per_pass from 1/3/6).
* ``w768``      — panel_width=768: 11 rounds instead of 16 — less
                  laswp + TRSM + Schur-launch traffic, longer panel
                  chains.  (w=1024 is NOT probed in-process: the
                  composed blocked graph at w>=1024 hit the Mosaic
                  compile-helper crash class at n=4096 in round 3.)
* ``trsm256``   — trsm_block=256: halves the blocked-TRSM sweep count
                  of each panel round's L11^-1 apply.
* ``physical``  — schedule='physical': NO row movement during the
                  factorization (one global gather at the end) —
                  bounds the laswp/row-gather share of the default
                  swap schedule.
* ``nopivot``   — pivot=False: no pivot chain, no laswp at all; the
                  no-pivot width cap (128) changes the schedule too,
                  so this is a bound on "all pivoting costs", not a
                  clean subtraction.

Usage: python perf/experiments/r4_phase8192.py [variant,variant|all]
                                               [--n N] [--out NAME]
Each cell appends to perf/results_r04_phase8192.json (JSONL) — run
risky cells in their own process; a crash loses only that cell.
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

COPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}  # timing graph only


def luflop(n):
    k = np.arange(n, dtype=np.float64)
    return float(np.sum((n - k - 1) + 2.0 * (n - k - 1) ** 2))


VARIANTS = {
    # the default, re-measured in the same session as the knobs
    "default": (True, rf.LUConfig()),
    "bf16": (True, rf.LUConfig(schur_precision="bf16")),
    "w768": (True, rf.LUConfig(panel_width=768, schur_precision="bf16x3")),
    "trsm256": (True, rf.LUConfig(trsm_block=256, schur_precision="bf16x3")),
    "physical": (True, rf.LUConfig(schedule="physical",
                                   schur_precision="bf16x3")),
    "nopivot": (False, rf.LUConfig(schur_precision="bf16x3")),
}


def main():
    names = (sys.argv[1].split(",") if len(sys.argv) > 1
             and not sys.argv[1].startswith("-") else ["all"])
    if names == ["all"]:
        names = list(VARIANTS)
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 8192
    out_name = (sys.argv[sys.argv.index("--out") + 1]
                if "--out" in sys.argv else "results_r04_phase8192.json")
    path = os.path.join(_REPO, "perf", out_name)
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    print(f"=== r4_phase8192 n={n} variants={names} "
          f"backend={jax.default_backend()}", flush=True)
    with open(path, "a") as f:
        f.write(json.dumps({"meta": "r4_phase8192", "n": n,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend(),
                            "timing_compiler_options": COPTS,
                            "variants": names}) + "\n")
        for name in names:
            pivot, cfg = VARIANTS[name]
            fn = lambda a: _dispatch_factor(a, pivot, cfg)[0]  # noqa: E731
            try:
                st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                         compiler_options=COPTS)
            except Exception as e:  # noqa: BLE001 — record, keep going
                print(f"{name}: FAILED {type(e).__name__}: {e}",
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
                                "pivot": pivot, "time_s": st["time_s"],
                                "spread_s": [st["min_s"], st["max_s"]],
                                "gflops": gf, "reps": st["reps"]}) + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

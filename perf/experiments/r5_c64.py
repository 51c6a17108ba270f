"""Native C64 crossover measurement (VERDICT r4 missing #1 / next #2).

Round 4 delegated pivoted complex64 to the platform kernel at EVERY
size (AUTO_XLA_THRESHOLD_C64 = 1<<30) because the package's complex
panels were the masked pure-JAX loop.  Round 5 adds the split-plane
fori Pallas kernel (ops/panel.py _panel_kernel_fori_c64); this A/B
measures it against XLA's native C64 getrf across the band so the
delegation threshold becomes a measured crossover like f32's.

Arms (interleaved marginals per size):
* ``rf``  — rf default config with xla_threshold=None (whole-matrix
            c64 kernel to small_threshold, blocked above)
* ``xla`` — jax.lax.linalg.lu on complex64

Usage: python perf/experiments/r5_c64.py [--sizes 512,1024,2048,4096]
Appends JSONL to perf/results_r05_c64.json.
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


def c64_luflop(n):
    # complex flop weight: each complex MAC ~ 4 real mul + 4 add
    k = np.arange(n, dtype=np.float64)
    real = float(np.sum((n - k - 1) + 2.0 * (n - k - 1) ** 2))
    return 4.0 * real


def main():
    sizes = [512, 1024, 2048, 4096]
    if "--sizes" in sys.argv:
        sizes = [int(s) for s in
                 sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    path = os.path.join(_REPO, "perf", "results_r05_c64.json")
    rng = np.random.RandomState(123)
    cfg = rf.LUConfig(xla_threshold=None)
    print(f"=== r5_c64 sizes={sizes} backend={jax.default_backend()}",
          flush=True)
    with open(path, "a", buffering=1) as f:
        f.write(json.dumps({"meta": "r5_c64", "sizes": sizes,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend()}) + "\n")
        for n in sizes:
            # complex built ON DEVICE from two real transfers — the
            # relay intermittently rejects complex host<->device
            # transfers (UNIMPLEMENTED) once large real programs have
            # run; see perf/sweep.py make_matrix
            re = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
            im = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
            A = jax.jit(jax.lax.complex)(re, im)
            arms = {
                "rf": lambda a: _dispatch_factor(a, True, cfg)[0],
                "xla": lambda a: jax.lax.linalg.lu(a)[0],
            }
            row = {"n": n, "dtype": "complex64"}
            for name, fn in arms.items():
                try:
                    st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                             compiler_options=COPTS)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n} {name}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
                    row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                    continue
                gf = c64_luflop(n) / st["time_s"] / 1e9
                row[name] = {"time_s": st["time_s"],
                             "spread_s": [st["min_s"], st["max_s"]],
                             "gflops": gf}
                print(f"n={n} {name}: {st['time_s']*1e3:.3f} ms "
                      f"[{st['min_s']*1e3:.3f},{st['max_s']*1e3:.3f}] "
                      f"{gf:.0f} GF/s", flush=True)
            if ("time_s" in row.get("rf", {})
                    and "time_s" in row.get("xla", {})):
                row["speedup"] = row["xla"]["time_s"] / row["rf"]["time_s"]
                print(f"n={n} speedup rf/xla: {row['speedup']:.3f}",
                      flush=True)
            f.write(json.dumps(row) + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

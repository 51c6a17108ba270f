"""Batched mid-n escape hatch measurement (VERDICT r4 missing #2).

The lane kernels refuse n > 128; round 4's fallback was the vmapped
masked pure-JAX loop.  Round 5 routes those cases to the platform's
batched lu (parallel/batched.py _use_batched_xla).  This measures all
arms at the mid-n shapes so the routing claim ("the fallback is never
slower than vmapped XLA") is backed by an artifact.

Arms per (B, n):
* ``xla_batched``  — jax.lax.linalg.lu on the (B, n, n) batch (the new
                     fallback)
* ``vmap_loop``    — jax.vmap(unblocked_lu) (the old fallback; only at
                     n <= 256 — it is orders of magnitude slower)
* ``lane``         — the Pallas lane kernel (only valid n <= 128, for
                     the boundary anchor)

Usage: python perf/experiments/r5_batched_mid.py
Appends JSONL to perf/results_r05_batched_mid.json.
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

from recursivefactorization_jl_tpu.ops.batched_kernel import (  # noqa: E402
    batched_lu_pallas_noswap,
)
from recursivefactorization_jl_tpu.ops.unblocked import unblocked_lu  # noqa: E402
from recursivefactorization_jl_tpu.parallel.batched import (  # noqa: E402
    _batched_xla_lu,
)
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

COPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}

SHAPES = [(2000, 128), (1000, 192), (1000, 256), (500, 512)]


def main():
    path = os.path.join(_REPO, "perf", "results_r05_batched_mid.json")
    rng = np.random.RandomState(123)
    print(f"=== r5_batched_mid backend={jax.default_backend()}", flush=True)
    with open(path, "a") as f:
        f.write(json.dumps({"meta": "r5_batched_mid",
                            "shapes": SHAPES,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend()}) + "\n")
        for B, n in SHAPES:
            A = jnp.asarray(rng.standard_normal((B, n, n)),
                            dtype=jnp.float32)
            arms = {"xla_batched": lambda a: _batched_xla_lu(a)[0]}
            if n <= 256:
                arms["vmap_loop"] = lambda a: jax.vmap(
                    lambda x: unblocked_lu(x, True)[0]
                )(a)
            if n <= 128:
                arms["lane"] = lambda a: batched_lu_pallas_noswap(
                    a, True, col_chunks=8
                )[0]
            row = {"B": B, "n": n, "dtype": "float32"}
            for name, fn in arms.items():
                try:
                    st = marginal_time_stats(fn, A, k1=1, k2=3, reps=4,
                                             compiler_options=COPTS)
                except Exception as e:  # noqa: BLE001
                    print(f"B={B} n={n} {name}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                    continue
                row[name] = {"time_s": st["time_s"],
                             "spread_s": [st["min_s"], st["max_s"]]}
                print(f"B={B} n={n} {name}: {st['time_s']*1e3:.2f} ms "
                      f"[{st['min_s']*1e3:.2f},{st['max_s']*1e3:.2f}]",
                      flush=True)
            f.write(json.dumps(row) + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

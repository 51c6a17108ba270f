"""Round-3: batched lane-kernel step unrolling A/B at the routed
configurations (swap+track_perm at n<=64, chunked noswap at n=128).

Usage: python perf/experiments/r3_batched_unroll.py [sizes]
Writes to .bench_r3_bunroll.out.
"""
import os, sys, time, itertools
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from recursivefactorization_jl_tpu.ops.batched_kernel import (
    batched_lu_pallas,
    batched_lu_pallas_noswap,
)

out = open(os.path.join(_REPO, ".bench_r3_bunroll.out"), "a", buffering=1)
def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)

log(f"=== run {time.strftime('%H:%M:%S')}")

def looped(fact, K):
    @jax.jit
    def run(A):
        def body(i, a):
            f = fact(a)
            return a * (1.0 + 1e-24 * f[0, 0, 0])
        return lax.fori_loop(0, K, body, A)[0, 0, 0]
    return run

KS = tuple(int(x) for x in os.environ.get("R3_KS", "2,5").split(","))
REPS = int(os.environ.get("R3_REPS", "3"))

def measure(variants):
    runs = {name: ({k: looped(f, k) for k in KS}, A) for name, (f, A) in variants.items()}
    for name, (rs, A) in runs.items():
        for k in KS:
            t0 = time.time()
            for attempt in range(3):
                try:
                    np.asarray(rs[k](A)); break
                except Exception as e:
                    log(f"  warm {name} K={k} attempt{attempt} failed: {str(e)[:160]}")
                    if attempt == 2: raise
                    time.sleep(45)
            log(f"  warm {name} K={k}: {time.time()-t0:.1f}s")
    times = {name: {k: [] for k in KS} for name in runs}
    for _ in range(REPS):
        for name, (rs, A) in runs.items():
            for k in KS:
                t0 = time.perf_counter()
                np.asarray(rs[k](A))
                times[name][k].append(time.perf_counter() - t0)
    res = {}
    for name in runs:
        margs = []
        for r in range(REPS):
            for ka, kb in itertools.combinations(KS, 2):
                margs.append((times[name][kb][r] - times[name][ka][r]) / (kb - ka))
        res[name] = float(np.median(margs))
    return res

rng = np.random.RandomState(123)
B = 10000
sizes = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["64", "128"])]

for n in sizes:
    A = jnp.asarray(rng.standard_normal((B, n, n)), dtype=jnp.float32)
    if n <= 64:
        variants = {
            "swap_tp": (lambda a: batched_lu_pallas(a, True)[0], A),
            "swap_tp_u2": (
                lambda a: batched_lu_pallas(a, True, unroll=2)[0], A),
            "swap_tp_u4": (
                lambda a: batched_lu_pallas(a, True, unroll=4)[0], A),
        }
    else:
        variants = {
            "noswap_cc8": (
                lambda a: batched_lu_pallas_noswap(a, True, col_chunks=8)[0],
                A),
            "noswap_cc8_u2": (
                lambda a: batched_lu_pallas_noswap(
                    a, True, col_chunks=8, unroll=2)[0], A),
        }
    res = measure(variants)
    base = res[list(res)[0]]
    for name, t in res.items():
        log(f"B={B} n={n} {name}: {t*1e3:.3f} ms  vs_first={base/t:.3f}")

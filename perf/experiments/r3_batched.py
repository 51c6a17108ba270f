"""Round-3: trimmed batched kernels at 10k x {16,32,64,128} vs XLA.

Writes to .bench_r3_batched.out.
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

import recursivefactorization_jl_tpu as rf
from recursivefactorization_jl_tpu.ops.batched_kernel import (
    batched_lu_pallas, batched_lu_pallas_noswap)

out = open(os.path.join(_REPO, ".bench_r3_batched.out"), "a", buffering=1)
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

def measure(variants, ks=KS, reps=REPS):
    runs = {name: ({k: looped(f, k) for k in ks}, A) for name, (f, A) in variants.items()}
    dead = set()
    for name, (rs, A) in runs.items():
        for k in ks:
            t0 = time.time()
            for attempt in range(3):
                try:
                    np.asarray(rs[k](A)); break
                except Exception as e:
                    log(f"  warm {name} K={k} attempt{attempt} failed: {str(e)[:160]}")
                    if attempt == 2:
                        dead.add(name)
                        break
                    time.sleep(60)
            if name in dead:
                log(f"  variant {name} DROPPED (compile/run failure)")
                break
            log(f"  warm {name} K={k}: {time.time()-t0:.1f}s")
    for name in dead:
        del runs[name]
    times = {name: {k: [] for k in ks} for name in runs}
    for _ in range(reps):
        for name, (rs, A) in runs.items():
            for k in ks:
                t0 = time.perf_counter()
                np.asarray(rs[k](A))
                times[name][k].append(time.perf_counter() - t0)
    res = {}
    for name in runs:
        margs = []
        for r in range(reps):
            for ka, kb in itertools.combinations(ks, 2):
                margs.append((times[name][kb][r] - times[name][ka][r]) / (kb - ka))
        res[name] = float(np.median(margs))
    return res

rng = np.random.RandomState(123)
B = 10000
sizes = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["64"])]

for n in sizes:
    A = jnp.asarray(rng.standard_normal((B, n, n)), dtype=jnp.float32)
    # correctness spot check on chip
    f, ipiv, perm, info = jax.device_get(batched_lu_pallas(A[:4], True))
    for b in range(4):
        An = np.asarray(A[b], np.float64)
        L = np.tril(f[b], -1) + np.eye(n); U = np.triu(f[b])
        r = np.max(np.abs(L @ U - An[perm[b]])) / (n * np.finfo(np.float32).eps * np.max(np.abs(An)))
        assert r < 100, (b, r)
    log(f"  correctness n={n} swap ok")
    f2, perm2, info2 = jax.device_get(batched_lu_pallas_noswap(A[:4], True))
    for b in range(4):
        An = np.asarray(A[b], np.float64)
        L = np.tril(f2[b], -1) + np.eye(n); U = np.triu(f2[b])
        r = np.max(np.abs(L @ U - An[perm2[b]])) / (n * np.finfo(np.float32).eps * np.max(np.abs(An)))
        assert r < 100, (b, r)
    log(f"  correctness n={n} noswap ok")

    variants = {
        "xla": (lambda a: jax.vmap(jax.scipy.linalg.lu_factor)(a)[0], A),
        "swap": (lambda a: batched_lu_pallas(a, True, with_perm=False)[0], A),
        "noswap": (lambda a: batched_lu_pallas_noswap(a, True)[0], A),
        # Wider lane groups: same total work, half the grid steps and
        # half the per-matrix op issues — issue latency is the dominant
        # cost of the step loop at these sizes.
        "swap_g256": (
            lambda a: batched_lu_pallas(a, True, group=256, with_perm=False)[0], A),
        "noswap_g256": (
            lambda a: batched_lu_pallas_noswap(a, True, group=256)[0], A),
        "swap_g512": (
            lambda a: batched_lu_pallas(a, True, group=512, with_perm=False)[0], A),
    }
    res = measure(variants)
    base = res["xla"]
    for name, t in res.items():
        log(f"B={B} n={n} {name}: {t*1e3:.3f} ms  vs_xla={base/t:.3f}")

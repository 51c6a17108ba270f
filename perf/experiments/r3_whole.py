"""Round-3 experiment: whole-LU fori kernel vs XLA lu at n=256..2048.

Writes progress to .bench_r3_whole.out (line-buffered).
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

from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

out = open(os.path.join(_REPO, ".bench_r3_whole.out"), "a", buffering=1)
def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)

log(f"=== run {time.strftime('%H:%M:%S')} devices={jax.devices()}")

def correctness(n, micro=32):
    A = np.asarray(rng2.standard_normal((n, n)), dtype=np.float32)
    o, piv, perm, info = jax.device_get(
        panel_factor_pallas(jnp.asarray(A), True, micro=micro, variant="fori")
    )
    L = np.tril(o, -1).astype(np.float64) + np.eye(n)
    U = np.triu(o).astype(np.float64)
    resid = np.max(np.abs(L @ U - A[perm].astype(np.float64)))
    scaled = resid / (n * np.finfo(np.float32).eps * np.max(np.abs(A)))
    log(f"  onchip correctness n={n} micro={micro}: scaled_resid={scaled:.3f} info={int(info)}")
    assert scaled < 100, scaled

rng2 = np.random.RandomState(7)

def looped(fact, K):
    @jax.jit
    def run(A):
        def body(i, a):
            f = fact(a)
            return a * (1.0 + 1e-24 * f[0, 0])
        return lax.fori_loop(0, K, body, A)[0, 0]
    return run

KS = tuple(int(x) for x in os.environ.get("R3_KS", "2,8").split(","))
REPS = int(os.environ.get("R3_REPS", "3"))

def measure(variants, ks=KS, reps=REPS):
    runs = {name: ({k: looped(f, k) for k in ks}, A) for name, (f, A) in variants.items()}
    for name, (rs, A) in runs.items():
        for k in ks:
            t0 = time.time()
            for attempt in range(3):
                try:
                    np.asarray(rs[k](A)); break
                except Exception as e:
                    log(f"  warm {name} K={k} attempt{attempt} failed: {str(e)[:200]}")
                    if attempt == 2: raise
                    time.sleep(60)
            log(f"  warm {name} K={k}: {time.time()-t0:.1f}s")
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
sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["512", "1024", "2048"])]
# variant spec: e.g. "fori_m32,fori2_m32,fori3_m32_o256"
specs = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["fori_m32"])

def make(spec):
    parts = spec.split("_")
    var = parts[0]
    mu = 32
    ou = 256
    ur = 1
    for p in parts[1:]:
        if p.startswith("m"):
            mu = int(p[1:])
        elif p.startswith("o"):
            ou = int(p[1:])
        elif p.startswith("u"):
            ur = int(p[1:])
    return lambda a: panel_factor_pallas(
        a, True, micro=mu, variant=var, outer=ou, unroll=ur
    )[0]

for n in sizes:
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    variants = {
        "xla": (lambda a: jax.scipy.linalg.lu_factor(a)[0], A),
    }
    for spec in specs:
        variants[spec] = (make(spec), A)
    res = measure(variants)
    base = res["xla"]
    for name, t in res.items():
        log(f"n={n} {name}: {t*1e3:.3f} ms  vs_xla={base/t:.3f}")

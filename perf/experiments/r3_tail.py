"""Round-3: recursive-tail schedule A/B at n=4096 (f32 pivoted).

Variants: XLA lu, default blocked (w=512 fori3 panels, no tail),
tail2048 (default + tail_threshold='auto'), w1024+tail2048 (two panel
rounds then one whole 2048 kernel), w2048+tail2048 (one panel round,
one rank-2048 Schur, one tail kernel — the fully recursive extreme,
the analog of the reference's threshold=4 sweep point, perf/lu.jl:48).

Usage: python perf/experiments/r3_tail.py [variant names to keep]
Writes to .bench_r3_tail.out.
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
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

out = open(os.path.join(_REPO, ".bench_r3_tail.out"), "a", buffering=1)
def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)

log(f"=== run {time.strftime('%H:%M:%S')}")

def looped(fact, K):
    @jax.jit
    def run(A):
        def body(i, a):
            f = fact(a)
            return a * (1.0 + 1e-24 * f[0, 0])
        return lax.fori_loop(0, K, body, A)[0, 0]
    return run

KS = tuple(int(x) for x in os.environ.get("R3_KS", "2,5,8").split(","))
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
                    time.sleep(45)
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
N = 4096
A = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.float32)

def mk(cfg):
    return (lambda c: lambda a: _dispatch_factor(a, True, c)[0])(cfg)

variants = {
    "xla": (lambda a: jax.scipy.linalg.lu_factor(a)[0], A),
    "default": (mk(rf.LUConfig()), A),
    "tail2048": (mk(rf.LUConfig(tail_threshold="auto")), A),
    "w1024_tail": (mk(rf.LUConfig(panel_width=1024, tail_threshold=2048)), A),
    "w2048_tail": (mk(rf.LUConfig(panel_width=2048, tail_threshold=2048)), A),
}
if len(sys.argv) > 1:
    keep = set(sys.argv[1].split(","))
    variants = {k: v for k, v in variants.items() if k in keep}

# Correctness probe first (single un-looped call per variant, scaled
# residual must be small) so a broken schedule never gets timed.
ref = np.asarray(A, dtype=np.float64)
for name in [v for v in list(variants) if v != "xla"]:
    cfgmap = {
        "default": rf.LUConfig(),
        "tail2048": rf.LUConfig(tail_threshold="auto"),
        "w1024_tail": rf.LUConfig(panel_width=1024, tail_threshold=2048),
        "w2048_tail": rf.LUConfig(panel_width=2048, tail_threshold=2048),
    }
    cfg = cfgmap[name]
    try:
        lu, piv, perm, info = _dispatch_factor(A, True, cfg)
        lu = np.asarray(lu, dtype=np.float64)
        L = np.tril(lu, -1) + np.eye(N)
        U = np.triu(lu)
        resid = np.max(np.abs(L @ U - ref[np.asarray(perm)]))
        scaled = resid / (np.finfo(np.float32).eps * N * np.max(np.abs(ref)))
        log(f"  probe {name}: scaled resid {scaled:.3f} info {int(info)}")
        if not (scaled < 10.0):
            log(f"  variant {name} DROPPED (bad residual)")
            del variants[name]
    except Exception as e:
        log(f"  probe {name} failed: {str(e)[:200]}")
        del variants[name]

res = measure(variants)
base = res.get("xla")
for name, t in res.items():
    vs = f"  vs_xla={base/t:.3f}" if base else ""
    log(f"n={N} {name}: {t*1e3:.3f} ms{vs}")

"""Round-3: n=4096 blocked LU with wide fori panels vs XLA.

Usage: python .bench_r3_4096.py [widths, default 256,512] [variants]
Writes to .bench_r3_4096.out.
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

out = open(os.path.join(_REPO, ".bench_r3_4096.out"), "a", buffering=1)
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
N = int(os.environ.get("R3_N", "4096"))
A = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.float32)


def make(spec):
    """Spec tokens joined by '_': wNNN (panel width), shadow (static
    kernel), bf16x3 (Schur precision), uN (fori step unroll), tail /
    notail (recursive-tail override)."""
    kw = dict(panel_variant="fori3", panel_micro=32)
    for tok in spec.split("_"):
        if tok.startswith("w"):
            kw["panel_width"] = int(tok[1:])
            kw["inner_panel_width"] = int(tok[1:])
        elif tok == "shadow":
            kw["panel_variant"] = "shadow"
        elif tok == "bf16x3":
            kw["schur_precision"] = "bf16x3"
        elif tok.startswith("u"):
            kw["panel_unroll"] = int(tok[1:])
        elif tok.startswith("m"):
            kw["panel_micro"] = int(tok[1:])
        elif tok == "notail":
            kw["tail_threshold"] = None
        elif tok == "tail":
            kw["tail_threshold"] = "auto"
        elif tok == "default":
            kw = {}
            break
        else:
            raise ValueError(tok)
    cfg = rf.LUConfig(**kw)
    return lambda a: _dispatch_factor(a, True, cfg)[0]


specs = (sys.argv[1].split(",") if len(sys.argv) > 1
         else ["w256", "w512"])
variants = {"xla": (lambda a: jax.scipy.linalg.lu_factor(a)[0], A)}
for spec in specs:
    variants[spec] = (make(spec), A)

res = measure(variants)
base = res["xla"]
for name, t in res.items():
    log(f"n={N} {name}: {t*1e3:.3f} ms  vs_xla={base/t:.3f}")

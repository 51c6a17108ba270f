import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import recursivefactorization_jl_tpu as rf
out = open(os.path.join(_REPO, ".bench_r3_probe.out"), "a", buffering=1)
def log(m): out.write(m + "\n"); print(m, flush=True)
log(f"=== probe {time.strftime('%H:%M:%S')} args={sys.argv[1:]}")
n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
rng = np.random.RandomState(3)
A = np.asarray(rng.standard_normal((n, n)), dtype=np.float32)
t0 = time.time()
F = rf.lu(jnp.asarray(A))   # default config end to end
f = np.asarray(F.factors)
log(f"default-config lu n={n}: compiled+ran in {time.time()-t0:.0f}s info={int(F.info)}")
L = np.tril(f, -1).astype(np.float64) + np.eye(n)
U = np.triu(f).astype(np.float64)
resid = np.max(np.abs(L @ U - A[np.asarray(F.p)].astype(np.float64)))
scaled = resid / (n * np.finfo(np.float32).eps * np.max(np.abs(A)))
log(f"scaled_resid={scaled:.3f}")
assert scaled < 100
log("probe ok")

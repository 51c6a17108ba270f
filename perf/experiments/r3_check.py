"""On-chip correctness gate for the fori kernel variants.

Usage: python .bench_r3_check.py [sizes] [variant_specs]
e.g.   python .bench_r3_check.py 512,2048 fori2_m32,fori3_m32_o256
"""
import os, sys, time
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

out = open(os.path.join(_REPO, ".bench_r3_check.out"), "a", buffering=1)
def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)

log(f"=== check {time.strftime('%H:%M:%S')}")
rng = np.random.RandomState(7)
sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["512", "2048"])]
specs = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["fori2_m32", "fori3_m32_o256"])

import scipy.linalg

for n in sizes:
    A = np.asarray(rng.standard_normal((n, n)), dtype=np.float32)
    _, piv_sp = scipy.linalg.lu_factor(A)
    for spec in specs:
        parts = spec.split("_"); var = parts[0]; mu, ou = 32, 256
        for p in parts[1:]:
            if p.startswith("m"): mu = int(p[1:])
            elif p.startswith("o"): ou = int(p[1:])
        t0 = time.time()
        o, piv, perm, info = jax.device_get(panel_factor_pallas(
            jnp.asarray(A), True, micro=mu, variant=var, outer=ou))
        L = np.tril(o, -1).astype(np.float64) + np.eye(n)
        U = np.triu(o).astype(np.float64)
        resid = np.max(np.abs(L @ U - A[perm].astype(np.float64)))
        scaled = resid / (n * np.finfo(np.float32).eps * np.max(np.abs(A)))
        ipiv_ok = bool(np.array_equal(piv, piv_sp))
        log(f"n={n} {spec}: scaled_resid={scaled:.3f} info={int(info)} "
            f"ipiv_match={ipiv_ok} ({time.time()-t0:.0f}s)")
        assert scaled < 100 and int(info) == 0 and ipiv_ok, spec
log("all checks passed")

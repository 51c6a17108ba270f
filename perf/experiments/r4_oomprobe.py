"""Probe harness-side fixes for the n>=6144 loop-in-jit compile OOM.

The package path is fine at this size (plain jit of _dispatch_factor at
n=6144 compiled and passed the residual gate on chip).  Only the
benchmark's fori_loop timing wrapper hits XLA's scoped-vmem ceiling:

    Ran out of memory in memory space vmem ... %reduce-window.114
    (u32[8,128], u32[8,128]) ... Scoped allocation with size 19.07M and
    limit 16.00M ... "It should not be possible to run out of scoped
    vmem - please file a bug against XLA."

Candidate fixes, compile-only (compiling is the failing step):
  A. lax.optimization_barrier around fn's outputs inside the loop body
     (breaks the loop-context fusion that inflates the scoped buffer);
  B. per-jit compiler_options xla_tpu_scoped_vmem_limit_kib=32768
     (raises the ceiling for the benchmark executable only).

Usage: python perf/experiments/r4_oomprobe.py [n]
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)  # same mode as r4_large

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    A = jnp.asarray(np.random.RandomState(0).standard_normal((n, n)),
                    dtype=jnp.float32)
    fn = lambda a: _dispatch_factor(a, True, rf.LUConfig(schur_precision="float32"))[0]

    def looped(K, barrier):
        def run(a0):
            def body(i, a):
                out = fn(a)
                if barrier:
                    (out,) = lax.optimization_barrier((out,))
                return a * (1.0 + 1e-24 * out.ravel()[0])

            return lax.fori_loop(0, K, body, a0).ravel()[0]

        return run

    probes = [
        ("A_barrier", jax.jit(looped(1, True)), None),
        ("B_vmemflag", jax.jit(looped(1, False)),
         {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ]
    for name, run, opts in probes:
        t0 = time.time()
        try:
            lowered = run.lower(A)
            if opts is None:
                lowered.compile()
            else:
                lowered.compile(compiler_options=opts)
            print(f"{name}: COMPILED OK in {time.time()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED in {time.time()-t0:.0f}s: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the n=4096 default-factor compile crash (round 5).

The r5_solve precompute step — ``jit(_dispatch_factor)(A4096)`` with
the scoped-vmem raise — fails the TPU compile helper (exit 1) twice,
deterministically, in ~12 s.  The same composed graph at n=8192 with
the same copts compiled and ran in the phase experiment (bprec arm,
36.12 ms), so the crash is shape-specific.  New-at-4096 suspect: the
round-5 ``panel_boundary_precision='auto'`` default resolves bf16x3
exactly from minmn >= AUTO_BF16X3_MIN = 4096.

Compile-only arms (no execute; one at a time):
* ``default_nocopts`` — the package's own jit path (what
  tests/test_tpu.py::test_blocked_lu_4096_default_on_chip and bench's
  fallback drive)
* ``default_copts``   — + scoped-vmem 32768 (the failing precompute)
* ``f32b_copts``      — panel_boundary_precision='float32', copts
* ``f32b_nocopts``    — panel_boundary_precision='float32', no copts

Usage: python perf/experiments/r5_bisect4096.py [arm ...]
"""
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

COPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def main():
    arms = sys.argv[1:] or ["default_nocopts", "default_copts",
                            "f32b_copts", "f32b_nocopts"]
    n = 4096
    A = jnp.asarray(np.random.RandomState(0).standard_normal((n, n)),
                    dtype=jnp.float32)
    dflt = rf.LUConfig()
    f32b = rf.LUConfig(panel_boundary_precision="float32")
    cfgs = {"default_nocopts": (dflt, None), "default_copts": (dflt, COPTS),
            "f32b_copts": (f32b, COPTS), "f32b_nocopts": (f32b, None)}
    for arm in arms:
        cfg, copts = cfgs[arm]
        t0 = time.time()
        try:
            lowered = jax.jit(
                lambda a, c=cfg: _dispatch_factor(a, True, c)
            ).lower(A)
            if copts:
                lowered.compile(compiler_options=copts)
            else:
                lowered.compile()
            print(f"{arm}: COMPILED OK in {time.time()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{arm}: FAILED in {time.time()-t0:.1f}s "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

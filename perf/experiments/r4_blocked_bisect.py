"""Bisect the on-chip blocked_lu w=128 corruption found by
r4_tp_parity_probe (scaled_resid 1261 at n=2048, w=128, info=0 —
silently wrong).  Sweep (n, w, variant) on the real chip and report the
residual of each combination; then isolate the failing panel call
standalone.

RESOLVED (r4): every (n, w, variant) was BAD with identical residuals
across three different panel kernels (note: the apparent "CPU
reproduction" was the sitecustomize ignoring JAX_PLATFORMS=cpu — those
runs were also on chip; real CPU is clean) — the corruption was the
TRSM-apply
``jnp.dot(L11_inv, A12)`` (ops/blocked.py) and 26 sibling products
running at Precision.DEFAULT (single-pass bf16) whenever ``blocked_lu``
was called directly, outside the public wrappers'
``full_matmul_precision`` trace context.  Public `rf.lu` results were
always correct (hence the green suite).  Fixed by giving every
full-precision product an explicit ``precision=FULL``;
tests/test_precision_audit.py walks the jaxpr of each entry point and
pins the invariant.

Usage: python perf/experiments/r4_blocked_bisect.py
"""
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.ops.blocked import blocked_lu  # noqa: E402


def resid(A, F, perm):
    n = A.shape[0]
    An = np.asarray(A, np.float64)
    L = np.tril(F, -1).astype(np.float64) + np.eye(*F.shape)[: F.shape[0], : F.shape[0]]
    U = np.triu(F).astype(np.float64)
    r = np.max(np.abs(L @ U - An[np.asarray(perm)]))
    return r / (n * np.finfo(np.float32).eps * np.max(np.abs(An)))


def main():
    rng = np.random.RandomState(123)
    print(f"backend={jax.default_backend()}", flush=True)
    for n in (512, 1024, 2048):
        A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
        for w in (128, 256):
            for variant in (None, "shadow", "basic"):
                kw = dict(panel_width=w, tail_threshold=None,
                          small_threshold=0)
                if variant:
                    kw["panel_variant"] = variant
                cfg = rf.LUConfig(**kw)
                F, ipiv, perm, info = jax.device_get(
                    jax.jit(lambda a, c=cfg: blocked_lu(a, True, c))(A)
                )
                s = resid(A, F, perm)
                tag = "OK " if s < 20 else "BAD"
                print(f"{tag} n={n} w={w} variant={variant or 'default'} "
                      f"resid={s:.3f} info={int(info)}", flush=True)


if __name__ == "__main__":
    main()

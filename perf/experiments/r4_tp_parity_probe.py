"""Diagnose the r4_tp_overhead on-chip finding: TP D=1 factors differ
from the plain blocked factors (max delta 1.79e2 at n=2048 w=128) where
the CPU virtual-mesh suite shows bitwise parity.

Question 1: is the TP chip result a VALID factorization of A under its
own pivots (residual gate)?  Question 2: where do the pivots first
diverge from blocked's, and is the divergence a tie/rounding artifact
of the Mosaic-compiled offset panel argmax or a real corruption?

RESOLVED (r4): both sides of this probe bypassed the public wrappers'
``full_matmul_precision`` context (direct ``blocked_lu`` /
``_tp_lu_kernel`` calls), so their TRSM/Schur products silently ran at
Precision.DEFAULT = single-pass bf16 — the probe was comparing two
differently-corrupted factorizations.  The public `rf.lu` / `tp_lu_*`
paths were always traced under HIGHEST and unaffected.  Fixed with
explicit ``precision=FULL`` on every full-precision product
(tests/test_precision_audit.py pins it); this probe is now meaningful.

Usage: python perf/experiments/r4_tp_parity_probe.py [n] [w]
"""
import functools
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.ops.blocked import blocked_lu  # noqa: E402
from recursivefactorization_jl_tpu.parallel.blockcyclic import (  # noqa: E402
    _cyclic_order,
    _tp_lu_kernel,
)
from recursivefactorization_jl_tpu.utils.config import is_tpu_backend  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    dev = jax.devices()[0]
    mesh = Mesh(np.asarray([dev]), ("tp",))
    order_np = _cyclic_order(n, w, 1)
    order = jnp.asarray(order_np, dtype=jnp.int32)
    inv_order = jnp.asarray(np.argsort(order_np), dtype=jnp.int32)
    cfg = rf.default_config()
    pallas_panels = is_tpu_backend()
    print(f"n={n} w={w} backend={jax.default_backend()} "
          f"pallas_panels={pallas_panels}", flush=True)

    def run_tp(pallas):
        kernel = functools.partial(
            _tp_lu_kernel, axis="tp", n=n, w=w, D=1, pivot=True,
            pallas_panels=pallas,
            panel_micro=cfg.resolved_panel_micro(n, w),
            panel_unroll=cfg.panel_unroll,
        )
        shard_fn = jax.shard_map(
            kernel, mesh=mesh, in_specs=P(None, "tp"),
            out_specs=(P(None, "tp"), P(), P(), P()),
        )
        col_sharding = NamedSharding(mesh, P(None, "tp"))

        @jax.jit
        def pipeline(a):
            a_store = lax.with_sharding_constraint(
                jnp.take(a, order, axis=1), col_sharding
            )
            F_store, ipiv, perm, info = shard_fn(a_store)
            return jnp.take(F_store, inv_order, axis=1), ipiv, perm, info

        return jax.device_get(pipeline(A))

    def resid(F, perm, tag):
        An = np.asarray(A, np.float64)
        L = np.tril(F, -1).astype(np.float64) + np.eye(n)
        U = np.triu(F).astype(np.float64)
        r = np.max(np.abs(L @ U - An[np.asarray(perm)]))
        scaled = r / (n * np.finfo(np.float32).eps * np.max(np.abs(An)))
        print(f"  {tag}: scaled_resid={scaled:.3f}", flush=True)
        return scaled

    Fb, ipb, pb, infob = jax.device_get(
        jax.jit(lambda a: blocked_lu(
            a, True, rf.LUConfig(panel_width=w, tail_threshold=None,
                                 small_threshold=0)))(A))
    resid(Fb, pb, f"blocked_w{w} (info={int(infob)})")

    for pallas in ([True, False] if pallas_panels else [False]):
        Ft, ipt, pt, infot = run_tp(pallas)
        tag = "tp_pallas" if pallas else "tp_jaxpanels"
        resid(Ft, pt, f"{tag} (info={int(infot)})")
        same = np.array_equal(Ft, Fb)
        print(f"  {tag} bitwise==blocked: {same}", flush=True)
        if not same:
            dp = np.nonzero(np.asarray(ipt) != np.asarray(ipb))[0]
            print(f"  first pivot divergence at step "
                  f"{dp[0] if dp.size else 'NONE (pivots identical)'}; "
                  f"{dp.size} differing pivots", flush=True)
            if dp.size:
                k = int(dp[0])
                colb = np.abs(np.asarray(A)[np.asarray(pb), k])
                print(f"    step {k}: ip_tp={int(np.asarray(ipt)[k])} "
                      f"ip_bl={int(np.asarray(ipb)[k])}", flush=True)
            else:
                d = np.abs(Ft - Fb)
                i, j = np.unravel_index(np.argmax(d), d.shape)
                print(f"    same pivots, max |dF|={d[i, j]:.3e} at "
                      f"({i},{j})", flush=True)


if __name__ == "__main__":
    main()

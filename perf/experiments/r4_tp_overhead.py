"""TP-layer overhead measured for real (VERDICT r4 item 8): the
degenerate D=1 mesh on the single real chip times the FULL tp_lu
pipeline (cyclic reorder gather + shard_map kernel with masked
full-height updates + inverse reorder) against the plain blocked
schedule at matched panel width, and against rf_default, at n=2048 f32.

Until now the TP extension's performance was asserted from flop/byte
accounting only; this gives the accounting a measured anchor: the D=1
delta IS the pure overhead of the TP formulation (no collectives on a
1-device mesh beyond self-psums).

Usage: python perf/experiments/r4_tp_overhead.py [n] [w]
Writes .bench_r4_tp.out + appends to perf/results_r04_tp.json
"""
import functools
import json
import os
import sys
import time

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
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402
from recursivefactorization_jl_tpu.ops.blocked import blocked_lu  # noqa: E402
from recursivefactorization_jl_tpu.parallel.blockcyclic import (  # noqa: E402
    _cyclic_order,
    _tp_lu_kernel,
)
from recursivefactorization_jl_tpu.utils.config import is_tpu_backend  # noqa: E402
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

out = open(os.path.join(_REPO, ".bench_r4_tp.out"), "a", buffering=1)


def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    dev = jax.devices()[0]
    mesh = Mesh(np.asarray([dev]), ("tp",))
    D = 1
    order_np = _cyclic_order(n, w, D)
    order = jnp.asarray(order_np, dtype=jnp.int32)
    inv_order = jnp.asarray(np.argsort(order_np), dtype=jnp.int32)
    pallas_panels = is_tpu_backend()
    cfg = rf.default_config()
    kernel = functools.partial(
        _tp_lu_kernel, axis="tp", n=n, w=w, D=D, pivot=True,
        pallas_panels=pallas_panels,
        panel_micro=cfg.resolved_panel_micro(n, w),
        panel_unroll=cfg.panel_unroll,
    )
    shard_fn = jax.shard_map(
        kernel, mesh=mesh, in_specs=P(None, "tp"),
        out_specs=(P(None, "tp"), P(), P(), P()),
    )
    col_sharding = NamedSharding(mesh, P(None, "tp"))

    def tp_pipeline(a):
        a_store = lax.with_sharding_constraint(
            jnp.take(a, order, axis=1), col_sharding
        )
        F_store, ipiv, perm, info = shard_fn(a_store)
        return jnp.take(F_store, inv_order, axis=1)

    cfg_matched = rf.LUConfig(panel_width=w, tail_threshold=None,
                              small_threshold=0)
    variants = {
        f"tp_d1_w{w}": tp_pipeline,
        f"blocked_w{w}": lambda a: blocked_lu(a, True, cfg_matched)[0],
        "rf_default": lambda a: _dispatch_factor(a, True, cfg)[0],
    }
    log(f"=== r4_tp_overhead {time.strftime('%H:%M:%S')} n={n} w={w} "
        f"pallas_panels={pallas_panels} backend={jax.default_backend()}")
    # correctness anchor: tp pipeline == plain blocked factors
    Ftp = np.asarray(tp_pipeline(A))
    Fbl = np.asarray(blocked_lu(A, True, cfg_matched)[0])
    same = bool(np.array_equal(Ftp, Fbl))
    log(f"factors bitwise equal to blocked: {same}"
        + ("" if same else f" (max delta {np.max(np.abs(Ftp - Fbl)):.2e})"))
    records = [{"meta": "r4_tp_overhead", "n": n, "w": w,
                "date": time.strftime("%Y-%m-%d"),
                "backend": jax.default_backend(),
                "pallas_panels": pallas_panels, "bitwise_vs_blocked": same}]
    for name, fn in variants.items():
        st = marginal_time_stats(fn, A, k1=2, k2=8, reps=4)
        log(f"{name}: {st['time_s']*1e3:.2f} ms "
            f"[{st['min_s']*1e3:.2f},{st['max_s']*1e3:.2f}]")
        records.append({"variant": name, "n": n, "time_s": st["time_s"],
                        "spread_s": [st["min_s"], st["max_s"]],
                        "reps": st["reps"]})
    path = os.path.join(_REPO, "perf", "results_r04_tp.json")
    with open(path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()

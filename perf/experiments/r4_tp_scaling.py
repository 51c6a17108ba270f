"""Virtual-mesh TP scaling curve (VERDICT r4 item 8): wall-clock of
tp_lu_factor at n=2048 over D in {1, 2, 4, 8} virtual CPU devices.

NOT a performance claim — on a 1-core host all D "devices" timeshare
the same core, so ideal scaling is flat-to-worse.  It is a regression
canary to pair with the HLO collective-count canary
(tests/test_parallel.py::test_tp_collective_count_canary): a change
that inflates per-panel communication or masked work shows up as a
blowup of the D-curve shape.  Recorded in docs/DESIGN.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python perf/experiments/r4_tp_scaling.py [n] [w]
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.sharding import Mesh

import recursivefactorization_jl_tpu as rf  # noqa: E402

out = open(os.path.join(_REPO, ".bench_r4_tp_scaling.out"), "a", buffering=1)


def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    devs = jax.devices()
    log(f"=== r4_tp_scaling {time.strftime('%H:%M:%S')} n={n} w={w} "
        f"ndev={len(devs)}")
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    base = None
    for D in (1, 2, 4, 8):
        if D > len(devs):
            break
        mesh = Mesh(np.asarray(devs[:D]), ("tp",))
        t0 = time.perf_counter()
        F, ipiv, info = rf.tp_lu_factor(A, mesh, "tp", panel_width=w)
        jax.block_until_ready(F)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            F, ipiv, info = rf.tp_lu_factor(A, mesh, "tp", panel_width=w)
            jax.block_until_ready(F)
            times.append(time.perf_counter() - t0)
        best = min(times)
        if base is None:
            base = best
        log(f"D={D}: best {best:.3f}s (x{best / base:.2f} vs D=1; "
            f"compile {compile_s:.0f}s) info={int(info)}")


if __name__ == "__main__":
    main()

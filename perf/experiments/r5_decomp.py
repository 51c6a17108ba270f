"""Panels-vs-glue decomposition of the n=8192 default factorization.

The r4/r5 pass-ladder bounded the XLA-level Schur bulk at ~3.4 ms of
the ~37 ms factorization, and the bprec A/B bounded the in-panel
boundary matmuls at ~1.2 ms — leaving ~32 ms attributed only as
"panel chains + glue".  The relay profiler may capture host events
only (see r5_profile.py), so this splits the program structurally:

* ``full``        — the default blocked factorization (anchor)
* ``glue_only``   — the identical schedule with every panel_factor
                    call replaced by an identity factorization
                    (factors = input, perm = arange, info = 0): times
                    laswp + TRSM-inverse + U12 + Schur + functional
                    update copies, WITHOUT the 13 Pallas panel calls.
                    The sparse-laswp gather/scatter still executes
                    (runtime-valued indices; padded writes are the
                    same traffic class).
* ``panels_only`` — only the panel_factor calls of the same schedule
                    (12 x (m_i, 512) fori3 panels + the (2048, 2048)
                    whole-matrix tail), chained through a checksum so
                    none is DCE'd; no trailing updates.

full ~ glue_only + panels_only up to scheduling overlap; whichever
side dominates is the round-5+ attack surface.

Usage: python perf/experiments/r5_decomp.py [arms] [--n N]
Appends JSONL to perf/results_r05_decomp.json.
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax

if "--cpu" in sys.argv:  # correctness/smoke runs off-chip
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402
from recursivefactorization_jl_tpu.ops import blocked as blocked_mod  # noqa: E402
from recursivefactorization_jl_tpu.ops.blocked import (  # noqa: E402
    resolve_blocked_schedule,
)
from recursivefactorization_jl_tpu.ops.panel import panel_factor  # noqa: E402
from recursivefactorization_jl_tpu.utils.profiling import (  # noqa: E402
    marginal_time_stats,
)

COPTS = (None if "--cpu" in sys.argv
         else {"xla_tpu_scoped_vmem_limit_kib": "32768"})


def luflop(n):
    k = np.arange(n, dtype=np.float64)
    return float(np.sum((n - k - 1) + 2.0 * (n - k - 1) ** 2))


def _identity_panel(panel, pivot, config):
    m, w = panel.shape
    minmn = min(m, w)
    return (
        panel,
        jnp.arange(minmn, dtype=jnp.int32),
        jnp.arange(m, dtype=jnp.int32),
        jnp.int32(0),
    )


class _patched_panels:
    """Swap ops.blocked's panel_factor for the identity stub (the
    module calls the name it imported, so patch blocked's binding)."""

    def __enter__(self):
        self._orig = blocked_mod.panel_factor
        blocked_mod.panel_factor = _identity_panel

    def __exit__(self, *exc):
        blocked_mod.panel_factor = self._orig


def make_full(cfg):
    def full(a):
        return _dispatch_factor(a, True, cfg)[0]

    return full


def make_glue(cfg):
    def glue(a):
        with _patched_panels():
            return blocked_mod.blocked_lu(a, True, cfg)[0]

    return glue


def make_panels(cfg, n):
    cfg2, w = resolve_blocked_schedule(n, n, jnp.float32, True, cfg)
    tail = cfg2.resolved_tail_threshold()

    def panels(a):
        acc = jnp.float32(0)
        s = 0
        while s < n:
            if s > 0 and tail is not None and n - s <= tail:
                pf, _, _, _ = panel_factor(a[s:, s:], True, cfg2)
                acc = acc + pf[0, 0]
                break
            ws = min(w, n - s)
            pf, _, _, _ = panel_factor(a[s:, s : s + ws], True, cfg2)
            acc = acc + pf[0, 0]
            s += ws
        # fold the checksum into a full-shaped output so the timing
        # harness's donation/transfer pattern matches the other arms
        return a + acc

    return panels


def main():
    names = (sys.argv[1].split(",") if len(sys.argv) > 1
             and not sys.argv[1].startswith("-") else ["all"])
    if names == ["all"]:
        names = ["full", "glue_only", "panels_only"]
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 8192
    path = os.path.join(_REPO, "perf", "results_r05_decomp.json")
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    cfg = rf.default_config()
    arms = {
        "full": make_full(cfg),
        "glue_only": make_glue(cfg),
        "panels_only": make_panels(cfg, n),
    }
    print(f"=== r5_decomp n={n} arms={names} backend={jax.default_backend()}",
          flush=True)
    with open(path, "a", buffering=1) as f:
        f.write(json.dumps({"meta": "r5_decomp", "n": n,
                            "date": time.strftime("%Y-%m-%d"),
                            "backend": jax.default_backend(),
                            "arms": names}) + "\n")
        for name in names:
            fn = arms[name]
            try:
                st = marginal_time_stats(fn, A, k1=1, k2=4, reps=4,
                                         compiler_options=COPTS)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                f.write(json.dumps({"arm": name, "n": n,
                                    "error": f"{type(e).__name__}: {e}"[:300]})
                        + "\n")
                continue
            gf = luflop(n) / st["time_s"] / 1e9
            print(f"{name}: {st['time_s']*1e3:.2f} ms "
                  f"[{st['min_s']*1e3:.2f},{st['max_s']*1e3:.2f}]", flush=True)
            f.write(json.dumps({"arm": name, "n": n, "dtype": "float32",
                                "time_s": st["time_s"],
                                "spread_s": [st["min_s"], st["max_s"]],
                                "gflops_equiv": gf, "reps": st["reps"]})
                    + "\n")
    print(f"appended to {path}", flush=True)


if __name__ == "__main__":
    main()

"""XLA-op-level attribution of the n=8192 default factorization.

The A/B knob sweeps bound individual phases; this gets the whole
breakdown at once: run the default factorization under
``jax.profiler.trace`` and aggregate device-side event durations by op
category (Schur matmuls, panel fused kernels, TRSM/inverse matmuls,
gathers/scatters for laswp, dynamic-update-slice copies, ...).

Caveat: through the axon relay the profiler may capture host-side
events only; the script prints whatever device planes exist so the
limitation is visible rather than silent.

Usage: python perf/experiments/r5_profile.py [--n N]
Writes the aggregate to perf/results_r05_profile.json and leaves the
raw trace under /tmp/rf_tpu_trace_r5.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import recursivefactorization_jl_tpu as rf  # noqa: E402
from recursivefactorization_jl_tpu.models.lu import _dispatch_factor  # noqa: E402

LOGDIR = "/tmp/rf_tpu_trace_r5"


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "panel" in n or "custom-call" in n:
        return "panel_kernel"
    if "fusion" in n and ("gather" in n or "scatter" in n):
        return "laswp_gather_scatter"
    if "gather" in n or "scatter" in n or "take" in n:
        return "laswp_gather_scatter"
    if "dot" in n or "convolution" in n or "dot_general" in n:
        return "matmul"
    if "dynamic-update-slice" in n or "dynamic_update_slice" in n:
        return "dus_copy"
    if "copy" in n or "bitcast" in n or "transpose" in n:
        return "copy_transpose"
    if "fusion" in n:
        return "fusion_other"
    if "reduce" in n or "sort" in n or "iota" in n or "select" in n:
        return "elementwise_reduce"
    return "other"


def main():
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 8192
    rng = np.random.RandomState(123)
    A = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    cfg = rf.LUConfig()
    fn = jax.jit(lambda a: _dispatch_factor(a, True, cfg)[0])
    # compile + warm OUTSIDE the trace
    jax.block_until_ready(fn(A))
    jax.block_until_ready(fn(A))
    jax.profiler.start_trace(LOGDIR)
    for _ in range(2):
        out = fn(A)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # parse the perfetto trace
    paths = sorted(glob.glob(os.path.join(
        LOGDIR, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("NO TRACE FILES — profiler produced nothing through the "
              "relay; attribution impossible this way", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device planes: pid names containing 'TPU'/'device'
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, nm in pid_names.items()
                   if "tpu" in nm.lower() or "device" in nm.lower()
                   or "/device" in nm.lower()}
    print(f"planes: {pid_names}", flush=True)
    agg = defaultdict(float)
    top = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e["dur"] / 1e6  # us -> s
        agg[categorize(name)] += dur
        top[name] += dur
        total += dur
    out = {
        "meta": "r5_profile", "n": n,
        "trace": paths[-1],
        "total_device_s": total,
        "by_category_s": dict(sorted(agg.items(),
                                     key=lambda kv: -kv[1])),
        "top_ops_s": dict(sorted(top.items(), key=lambda kv: -kv[1])[:30]),
    }
    with open(os.path.join(_REPO, "perf", "results_r05_profile.json"),
              "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out["by_category_s"], indent=1), flush=True)
    for k, v in list(out["top_ops_s"].items())[:20]:
        print(f"{v*1e3:9.3f} ms  {k[:110]}", flush=True)


if __name__ == "__main__":
    main()

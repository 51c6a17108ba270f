"""Round-3 probe: does Mosaic overlap a serial VPU chain with MXU
matmuls issued in the same fori body?

Three kernels, same fori trip count T:
  chain : T dependent VPU steps on a (8, 4096) block (pivot-chain-like:
          per step, a lane reduce + masked select-update).
  mxu   : T independent 512x512 MXU matmul-accumulates.
  mixed : each body does BOTH (no data dependence between them).

If time(mixed) ~= max(chain, mxu), the scheduler overlaps VPU and MXU
work inside a loop body and a fused panel-chain + trailing-Schur
kernel (lookahead) is worth building; if ~= chain + mxu, it is not.
Writes to .bench_r3_overlap.out.
"""
import os, sys, time, itertools, functools
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, _REPO)
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

out = open(os.path.join(_REPO, ".bench_r3_overlap.out"), "a", buffering=1)
def log(msg):
    out.write(msg + "\n")
    print(msg, flush=True)

log(f"=== run {time.strftime('%H:%M:%S')}")

T = int(os.environ.get("R3_T", "256"))
M = int(os.environ.get("R3_M", "512"))  # matmul side
hi = jax.lax.Precision.HIGHEST


def kern(a_ref, b_ref, out_ref, acc_ref, *, mode):
    # a_ref: (8, 4096) chain block; b_ref: (M, M) matmul operand
    # out_ref: (8, 4096); acc_ref: (M, M) scratch accumulator
    out_ref[:, :] = a_ref[:, :]
    acc_ref[:, :] = b_ref[:, :]
    lanes = lax.broadcasted_iota(jnp.int32, (1, 4096), 1)

    def body(i, c):
        if mode in ("chain", "mixed"):
            row = out_ref[pl.ds(0, 1), :]
            # dependent chain step: reduce -> select-update (like the
            # pivot search + scale of the panel chain)
            m = jnp.max(jnp.abs(row))
            kp = jnp.min(jnp.where(jnp.abs(row) == m, lanes, 4096))
            row = jnp.where(lanes == kp, row * 0.5, row + 1e-7)
            out_ref[pl.ds(0, 1), :] = row
        if mode in ("mxu", "mixed"):
            # independent MXU work: acc = acc @ B0 (depends only on
            # acc/b, never on the chain row)
            acc_ref[:, :] = jnp.dot(
                acc_ref[:, :], b_ref[:, :],
                preferred_element_type=jnp.float32, precision=hi,
            ) * 1e-3
        return c

    lax.fori_loop(0, T, body, 0)
    out_ref[pl.ds(1, 1), :1] = acc_ref[:1, :1] * 1.0


def build(mode):
    f = pl.pallas_call(
        functools.partial(kern, mode=mode),
        out_shape=jax.ShapeDtypeStruct((8, 4096), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )
    return f


KS = (2, 8)
REPS = 3

def looped(mode, K):
    f = build(mode)

    @jax.jit
    def run(a, b):
        def body(i, a_):
            o = f(a_, b)
            return a_ * (1.0 + 1e-24 * o[0, 0])
        return lax.fori_loop(0, K, body, a)[0, 0]
    return run

rng = np.random.RandomState(0)
a = jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32)
b = jnp.asarray(rng.standard_normal((M, M)) / M, dtype=jnp.float32)

res = {}
runs = {mode: {k: looped(mode, k) for k in KS} for mode in ("chain", "mxu", "mixed")}
for mode, rs in runs.items():
    for k in KS:
        t0 = time.time()
        np.asarray(rs[k](a, b))
        log(f"  warm {mode} K={k}: {time.time()-t0:.1f}s")
times = {mode: {k: [] for k in KS} for mode in runs}
for _ in range(REPS):
    for mode, rs in runs.items():
        for k in KS:
            t0 = time.perf_counter()
            np.asarray(rs[k](a, b))
            times[mode][k].append(time.perf_counter() - t0)
for mode in runs:
    margs = []
    for r in range(REPS):
        for ka, kb in itertools.combinations(KS, 2):
            margs.append((times[mode][kb][r] - times[mode][ka][r]) / (kb - ka))
    res[mode] = float(np.median(margs))
    log(f"T={T} {mode}: {res[mode]*1e3:.3f} ms")
ov = (res["chain"] + res["mxu"] - res["mixed"]) / min(res["chain"], res["mxu"])
log(f"overlap fraction (1.0 = full overlap of the smaller part): {ov:.2f}")

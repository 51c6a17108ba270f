"""Batched LU (vmap path) and data-parallel sharding of the batch.

The reference is a single-matrix library; its "many small problems"
story is Julia-level loops over `lu!` with `@batch` threading
(reference src/lu.jl:156-167).  The TPU-native redesign makes the batch
a first-class axis:

* :func:`batched_lu_factor` — (B, m, n) -> (factors, ipiv, info) with a
  dedicated Pallas grid kernel for small f32 matrices (one matrix per
  grid cell, VMEM-resident — see ops/batched_kernel.py) and a vmapped
  pure-JAX fallback everywhere else;
* :func:`batched_lu_solve` — vmapped triangular solves;
* :func:`sharded_batched_lu_factor` / :func:`sharded_batched_lu_solve`
  — the same, `shard_map`-ped over a mesh axis so each device factors
  its local shard of the batch (pure data parallelism: zero collectives
  in the factor path, which is the right layout for ICI — nothing to
  communicate).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.batched_kernel import (
    batched_lu_pallas,
    batched_lu_pallas_noswap,
    batched_solve_pallas,
    pick_group,
)
from ..ops.unblocked import unblocked_lu
from ..models.solve import _lu_solve_impl
from ..utils.config import LUConfig, default_config, is_tpu_backend
from ..utils.perm import ipiv_to_perm

# Above this min(m, n), the per-matrix pivot chain gets long and the
# vmapped blocked path wins.
_PALLAS_BATCH_MAX_N = 128

# batched_lu_factor_perm kernel routing (v5e, 10k-matrix batches,
# median interleaved marginals): at n <= 64 the per-step op-issue
# latency dominates and the swap kernel with in-kernel perm tracking
# wins (n=64: 8.9 ms vs noswap 12.6); above, the full-block VMEM
# traffic dominates and the noswap kernel with finished-column-chunk
# skipping wins (n=128: 35.5 ms vs swap 70.1).
_PERM_SWAP_MAX_N = 64
_PERM_NOSWAP_COL_CHUNKS = 8


def _use_batched_pallas(dtype, m: int, n: int, config: LUConfig) -> bool:
    if config.backend == "xla":
        return False
    if config.backend == "pallas":
        return True
    return (
        is_tpu_backend()
        and dtype == jnp.dtype(jnp.float32)
        and 0 < min(m, n) <= _PALLAS_BATCH_MAX_N
        # even a 1-matrix group must fit the VMEM working set (tall
        # batches like (B, 4096, 64) route to the vmapped path instead
        # of failing Mosaic compilation)
        and pick_group(m, n, jnp.dtype(dtype).itemsize) >= 1
    )


def _use_batched_xla(dtype, pivot: bool, config: LUConfig, tpu=None) -> bool:
    """Escape hatch for batches the lane kernels refuse (n > 128,
    VMEM overflow): on TPU, the platform's batched ``lax.linalg.lu``
    beats the vmapped masked pure-JAX loop by a wide margin at mid n
    (see perf/results_r05_batched_mid.json), the same
    delegate-to-the-platform principle as the single-matrix
    sub-crossover band (ref src/lu.jl:70-73).  Pivoted
    only (the platform kernel always pivots) and only dtypes its TPU
    kernel supports (f32/c64 — f64/c128 are emulated or absent there).
    ``tpu`` overrides backend detection for routing tests."""
    if config.backend == "pallas":
        return False
    if tpu is None:
        tpu = is_tpu_backend()
    return (
        tpu
        and pivot
        and jnp.dtype(dtype)
        in (jnp.dtype(jnp.float32), jnp.dtype(jnp.complex64))
    )


def _batched_xla_lu(A: jax.Array):
    """Batched platform LU with the delegated-path info derivation
    (first EXACTLY-zero U diagonal; same limitation as the
    single-matrix delegated route — see models/lu.py dispatch docs).
    Returns ``(factors, ipiv, perm, info)``."""
    f, ipiv, perm = jax.lax.linalg.lu(A)
    minmn = min(A.shape[-2], A.shape[-1])
    diag = jnp.diagonal(f, axis1=-2, axis2=-1)[..., :minmn]
    zero = diag == 0
    first = jnp.argmax(zero, axis=-1)
    info = jnp.where(jnp.any(zero, axis=-1), first + 1, 0).astype(jnp.int32)
    return f, ipiv.astype(jnp.int32), perm.astype(jnp.int32), info


@functools.partial(jax.jit, static_argnames=("pivot", "config"))
def batched_lu_factor(
    A: jax.Array,
    pivot: bool = True,
    config: Optional[LUConfig] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Factor a batch of matrices ``A`` with shape (B, m, n).

    Returns ``(factors, ipiv, info)`` batched along axis 0. Semantics per
    matrix are identical to :func:`~..models.lu.lu_factor` (reference
    info/pivot conventions, src/lu.jl:93-122).
    """
    if A.ndim != 3:
        raise ValueError(f"batched_lu_factor expects (B, m, n), got {A.shape}")
    config = config or default_config()
    B, m, n = A.shape
    if _use_batched_pallas(A.dtype, m, n, config):
        f, ipiv, _perm, info = batched_lu_pallas(A, pivot, with_perm=False)
        return f, ipiv, info
    if _use_batched_xla(A.dtype, pivot, config):
        f, ipiv, _perm, info = _batched_xla_lu(A)
        return f, ipiv, info
    f, ipiv, _perm, info = jax.vmap(lambda a: unblocked_lu(a, pivot))(A)
    return f, ipiv, info


@functools.partial(jax.jit, static_argnames=("pivot", "config"))
def batched_lu_factor_perm(
    A: jax.Array,
    pivot: bool = True,
    config: Optional[LUConfig] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fast batched factorization for SQUARE matrices: returns
    ``(factors, perm, info)`` with ``L @ U == A[perm, :]``.

    Routes between two Pallas kernels by the measured regime (see
    ops/batched_kernel.py): at small n the swap kernel with in-kernel
    perm tracking (LAPACK-identical factors, perm ==
    ``ipiv_to_perm(ipiv)``); at larger n the no-swap kernel with
    finished-column chunk skipping (pivot ties break by physical row
    index there).  Both satisfy ``L @ U == A[perm, :]``.  Prefer this +
    :func:`batched_lu_solve_perm` for bulk solve pipelines; use
    :func:`batched_lu_factor` when exact LAPACK ipiv semantics are
    required.
    """
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(
            f"batched_lu_factor_perm expects (B, n, n), got {A.shape}"
        )
    config = config or default_config()
    if _use_batched_pallas(A.dtype, A.shape[1], A.shape[2], config):
        if A.shape[1] <= _PERM_SWAP_MAX_N:
            f, _ipiv, perm, info = batched_lu_pallas(A, pivot, with_perm=True)
            return f, perm, info
        return batched_lu_pallas_noswap(
            A, pivot, col_chunks=_PERM_NOSWAP_COL_CHUNKS
        )
    if _use_batched_xla(A.dtype, pivot, config):
        f, _ipiv, perm, info = _batched_xla_lu(A)
        return f, perm, info
    f, _ipiv, perm, info = jax.vmap(lambda a: unblocked_lu(a, pivot))(A)
    return f, perm, info


def _use_solve_pallas(factors, b, trans) -> bool:
    """Lane-batched solve kernel routing: TPU f32 square n <= 128
    untransposed solves with few right-hand sides (the 10k x 64 bulk
    workload, BASELINE batched configs); everything else vmaps the
    blocked TRSM path."""
    n = factors.shape[1]
    nrhs = 1 if b.ndim == 2 else b.shape[2]
    return (
        is_tpu_backend()
        and not trans
        and factors.dtype == jnp.dtype(jnp.float32)
        and factors.shape[1] == factors.shape[2]
        and 0 < n <= _PALLAS_BATCH_MAX_N
        and nrhs * n <= 1024
    )


@functools.partial(jax.jit, static_argnames=("pivoted", "trans"))
def batched_lu_solve_perm(
    factors: jax.Array,
    perm: jax.Array,
    b: jax.Array,
    pivoted: bool = True,
    trans: bool = False,
) -> jax.Array:
    """Batched solve taking the composed permutation (from
    :func:`batched_lu_factor_perm`) directly.

    On the TPU f32 bulk workload (square n <= 128, untransposed) this
    runs the lane-batched substitution kernel
    (:func:`~..ops.batched_kernel.batched_solve_pallas`): permutation
    as one batched gather, then both triangular sweeps in ONE Pallas
    call that reads the factor block exactly twice.  Other
    shapes/dtypes/trans solves vmap the blocked TRSM path."""
    if _use_solve_pallas(factors, b, trans):
        rhs = jnp.take_along_axis(
            b if b.ndim == 3 else b[:, :, None], perm[:, :, None], axis=1
        ) if pivoted else (b if b.ndim == 3 else b[:, :, None])
        x = batched_solve_pallas(factors, rhs)
        return x[:, :, 0] if b.ndim == 2 else x
    return jax.vmap(
        lambda f, p, rhs: _lu_solve_impl(f, p, rhs, pivoted, trans)
    )(factors, perm, b)


@functools.partial(jax.jit, static_argnames=("pivoted", "trans"))
def batched_lu_solve(
    factors: jax.Array,
    ipiv: jax.Array,
    b: jax.Array,
    pivoted: bool = True,
    trans: bool = False,
) -> jax.Array:
    """Batched solve: ``factors`` (B, n, n), ``ipiv`` (B, n), ``b``
    (B, n) or (B, n, k).  Routes to the lane-batched substitution
    kernel on the TPU f32 bulk workload (see
    :func:`batched_lu_solve_perm`)."""
    n = factors.shape[1]
    if pivoted:
        perm = jax.vmap(lambda p: ipiv_to_perm(p, n))(ipiv)
    else:
        perm = ipiv
    return batched_lu_solve_perm(factors, perm, b, pivoted, trans)


# ---------------------------------------------------------------------------
# Data-parallel sharding over a mesh axis
# ---------------------------------------------------------------------------


def sharded_batched_lu_factor(
    A: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    pivot: bool = True,
    config: Optional[LUConfig] = None,
):
    """Factor a (B, m, n) batch sharded over ``mesh`` axis ``axis``.

    Each device runs :func:`batched_lu_factor` on its local batch shard —
    embarrassingly parallel, no collectives. B must divide evenly by the
    axis size.
    """
    config = config or default_config()
    fn = functools.partial(batched_lu_factor, pivot=pivot, config=config)
    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    spec = NamedSharding(mesh, P(axis))
    return jax.jit(shard_fn)(jax.device_put(A, spec))


def sharded_batched_lu_solve(
    factors: jax.Array,
    ipiv: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    pivoted: bool = True,
):
    """Batched solve with batch sharded over ``mesh`` axis ``axis``."""
    fn = functools.partial(batched_lu_solve, pivoted=pivoted)
    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    spec = NamedSharding(mesh, P(axis))
    return jax.jit(shard_fn)(
        jax.device_put(factors, spec),
        jax.device_put(ipiv, spec),
        jax.device_put(b, spec),
    )

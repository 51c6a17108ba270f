"""Batched small-matrix LU — one matrix per Pallas grid cell.

The reference escapes to the stdlib unblocked kernel for small matrices
(`min(m,n) < 10`, reference src/lu.jl:70) and relies on `@turbo` SIMD to
make small-n fast on CPU.  On TPU, small single matrices cannot feed the
MXU/VPU; the native win is **batching**: factor thousands of small
matrices concurrently, one whole matrix VMEM-resident per grid cell,
with the pivot chain statically unrolled (the same fused
search/swap/scale/update design as ops/panel.py, ref src/lu.jl:282-330).

Grid parallelism over the batch is the TPU analog of the reference's
`@batch` shared-memory threading (ref src/lu.jl:156-167).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import is_tpu_backend


def _batched_lu_kernel(a_ref, out_ref, piv_ref, info_ref, *, pivot: bool):
    """Factor one (1, m, n) block. Same algorithm as ops/panel.py's
    `_panel_kernel` (fused pivot search + swap + scale + rank-1 update,
    ref src/lu.jl:282-330) with a leading batch axis of 1."""
    _, m, n = a_ref.shape
    minmn = min(m, n)
    out_ref[0, :, :] = a_ref[0, :, :]
    info_ref[0, 0] = 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    for k in range(minmn):  # static unroll: lane indices stay static
        colk = out_ref[0, :, k].reshape(m, 1)
        if pivot:
            abscol = jnp.where(rows >= k, jnp.abs(colk), -jnp.inf)
            maxv = jnp.max(abscol)
            kp = jnp.min(jnp.where(abscol == maxv, rows, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            kp = jnp.int32(k)
        piv_ref[0, k] = kp

        rowkp = out_ref[0, pl.ds(kp, 1), :]  # (1, n) dynamic sublane read
        pivval = rowkp[0, k]
        nonzero = pivval != 0.0

        if pivot:

            @pl.when(nonzero & (kp != k))
            def _swap(k=k, rowkp=rowkp):
                rowk = out_ref[0, k, :].reshape(1, n)
                out_ref[0, k, :] = rowkp[0, :]
                out_ref[0, pl.ds(kp, 1), :] = rowk

        @pl.when(nonzero)
        def _scale(k=k, pivval=pivval):
            c = out_ref[0, :, k].reshape(m, 1)
            out_ref[0, :, k] = jnp.where(rows > k, c * (1.0 / pivval), c)[
                :, 0
            ]

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0, 0] == 0))
        def _info(k=k):
            info_ref[0, 0] = (k + 1) if pivot else -(k + 1)

        if k + 1 < n and k + 1 < m:
            lcol = out_ref[0, k + 1 :, k].reshape(m - k - 1, 1)
            urow = out_ref[0, k, k + 1 :].reshape(1, n - k - 1)
            out_ref[0, k + 1 :, k + 1 :] -= lcol * urow


@functools.partial(jax.jit, static_argnames=("pivot", "interpret"))
def batched_lu_pallas(
    A: jax.Array, pivot: bool = True, interpret=None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Factor a batch ``A`` of shape (B, m, n), one matrix per grid cell.

    Returns ``(factors (B,m,n), ipiv (B,minmn), info (B,))``.
    """
    B, m, n = A.shape
    minmn = min(m, n)
    if interpret is None:
        interpret = not is_tpu_backend()
    kernel = functools.partial(_batched_lu_kernel, pivot=pivot)
    out, piv, info = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, n), A.dtype),
            jax.ShapeDtypeStruct((B, minmn), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, minmn), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(A)
    return out, piv, info[:, 0]

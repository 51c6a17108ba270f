"""Batched small-matrix LU — a group of matrices per Pallas grid cell.

The reference escapes to the stdlib unblocked kernel for small matrices
(`min(m,n) < 10`, reference src/lu.jl:70) and relies on `@turbo` SIMD to
make small-n fast on CPU.  On TPU, small single matrices cannot feed the
MXU/VPU; the native win is **batching**.  Design points (measured on
v5e):

* a vmapped pure-JAX loop round-trips the whole (B, m, n) batch through
  HBM on every one of the min(m, n) elimination steps — 224 ms for
  10000 x 64 x 64 f32;
* one matrix per grid cell keeps data in VMEM but pays the per-op issue
  overhead of the serial pivot chain per matrix;
* so each grid cell holds a GROUP of ``G`` matrices, VMEM-resident, and
  every step of the pivot chain is one **branchless vectorized op over
  the whole group**: the pivot row index differs per matrix, so swaps /
  pivot reads use iota-mask selects and reductions instead of dynamic
  indexing.  The group amortizes op-issue overhead ~G-fold.

Zero-pivot semantics match the reference (no swap, no scale, rank-1
still runs, info records the first 1-based failure column,
ref src/lu.jl:299-319) — enforced per matrix with vector masks.

Block shapes honour Mosaic tiling: every output is reshaped so its last
two block dims are (multiple of 8, == array dim) — int32 vectors ride
along as (1, G, k) VMEM blocks, not SMEM scalars.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import is_tpu_backend

GROUP = 32  # matrices per grid cell (measured best of 8/16/32 on v5e at 64x64)


def _batched_group_kernel(a_ref, out_ref, piv_ref, perm_ref, info_ref, *, pivot: bool):
    """Factor a (G, m, n) group. All per-step ops are vectorized over G
    and branchless (per-matrix pivot rows differ)."""
    G, m, n = a_ref.shape
    minmn = min(m, n)
    out_ref[:, :, :] = a_ref[:, :, :]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (G, m), 1)          # row ids
    rowi3 = jax.lax.broadcasted_iota(jnp.int32, (G, m, 1), 1)
    # perm and info live in their output refs, not SSA carries: a value
    # carried across the full static unroll trips a Mosaic compiler
    # assert ("limits[i] <= dim(i)") for G > 8 — ref round-trips keep
    # live ranges per-step.
    perm_ref[0, :, :] = rowi
    info_ref[0, 0, :] = jnp.zeros((G,), jnp.int32)

    # NB: Mosaic only supports inserting minor dims on 32-bit types, so
    # every rank-expanded mask below is built by reshaping an int32/f32
    # array and comparing at the target rank — never by reshaping a bool.
    for k in range(minmn):  # static unroll
        colk = out_ref[:, :, k]                                    # (G, m)
        if pivot:
            abscol = jnp.where(rowi >= k, jnp.abs(colk), -jnp.inf)
            maxv = jnp.max(abscol, axis=1, keepdims=True)          # (G, 1)
            kp2 = jnp.min(
                jnp.where(abscol == maxv, rowi, m), axis=1, keepdims=True
            ).astype(jnp.int32)                                    # (G, 1)
            kp2 = jnp.minimum(kp2, m - 1)
        else:
            kp2 = jnp.full((G, 1), k, jnp.int32)
        piv_ref[0, :, k] = kp2[:, 0]

        kp3 = kp2[:, :, None]                                      # int32 ok
        is_kp2 = rowi == kp2                                       # (G, m)
        is_kp3 = rowi3 == kp3                                      # (G, m, 1)
        pivval2 = jnp.sum(
            jnp.where(is_kp2, colk, 0.0), axis=1, keepdims=True
        )                                                          # (G, 1)
        pivval3 = pivval2[:, :, None]                              # f32 ok
        nonzero2 = pivval2 != 0.0
        nonzero3 = pivval3 != 0.0

        if pivot:
            do_swap3 = nonzero3 & (kp3 != k)
            # branchless row swap k <-> kp per matrix
            blk = out_ref[:, :, :]
            rowk = blk[:, k:k + 1, :]                              # (G, 1, n)
            rowkp = jnp.sum(
                jnp.where(is_kp3, blk, 0.0), axis=1, keepdims=True
            )                                                      # (G, 1, n)
            sel_k = (rowi3 == k) & do_swap3
            sel_kp = is_kp3 & do_swap3
            blk = jnp.where(sel_k, rowkp, blk)
            blk = jnp.where(sel_kp, rowk, blk)
            out_ref[:, :, :] = blk
            # permutation bookkeeping, same selects on (G, m)
            do_swap2 = nonzero2 & (kp2 != k)
            perm = perm_ref[0, :, :]
            pk2 = perm[:, k:k + 1]                                 # (G, 1)
            pkp2 = jnp.sum(
                jnp.where(is_kp2, perm, 0), axis=1, keepdims=True
            )
            perm = jnp.where((rowi == k) & do_swap2, pkp2, perm)
            perm = jnp.where(is_kp2 & do_swap2, pk2, perm)
            perm_ref[0, :, :] = perm
            colk = out_ref[:, :, k]

        # scale the pivot column below the diagonal (skip if zero pivot)
        inv2 = jnp.where(nonzero2, 1.0, 0.0) / jnp.where(
            nonzero2, pivval2, 1.0
        )
        scaled = jnp.where((rowi > k) & nonzero2, colk * inv2, colk)
        out_ref[:, :, k] = scaled

        nonzero1 = pivval2[:, 0] != 0.0                            # (G,)
        info = info_ref[0, 0, :]
        info_ref[0, 0, :] = jnp.where(
            (~nonzero1) & (info == 0),
            jnp.int32(k + 1) if pivot else jnp.int32(-(k + 1)),
            info,
        )

        if k + 1 < n and k + 1 < m:
            lcol = out_ref[:, k + 1 :, k]                          # (G, m')
            urow = out_ref[:, k, k + 1 :]                          # (G, n')
            out_ref[:, k + 1 :, k + 1 :] -= (
                lcol[:, :, None] * urow[:, None, :]
            )



def _batched_noswap_kernel(a_ref, out_ref, prow_ref, info_ref, used_ref, *, pivot: bool):
    """No-swap variant: rows are eliminated in PHYSICAL order — a `used`
    mask tracks consumed pivot rows instead of swapping, which removes
    the two full (G, m, n) select passes per step (the dominant cost of
    the swap kernel).  The caller applies the composed permutation as
    ONE gather at the end.

    Square matrices only (the tall-matrix residual-row order under
    LAPACK swap semantics has no cheap physical-order equivalent).
    Pivot tie-breaking is by physical row index, so on exact ties the
    chosen row can differ from LAPACK's (factors still satisfy
    L @ U == A[perm, :]); `info` semantics are unchanged.
    """
    G, m, n = a_ref.shape
    out_ref[:, :, :] = a_ref[:, :, :]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (G, m), 1)
    used_ref[:, :] = jnp.zeros((G, m), jnp.float32)
    info_ref[0, 0, :] = jnp.zeros((G,), jnp.int32)

    for k in range(n):  # static unroll
        colk = out_ref[:, :, k]                                    # (G, m)
        avail = used_ref[:, :] < 0.5                               # (G, m)
        if pivot:
            abscol = jnp.where(avail, jnp.abs(colk), -jnp.inf)
            maxv = jnp.max(abscol, axis=1, keepdims=True)          # (G, 1)
            kp2 = jnp.min(
                jnp.where(abscol == maxv, rowi, m), axis=1, keepdims=True
            ).astype(jnp.int32)
        else:
            # first available row == physical row k (rows consumed in
            # order when not pivoting)
            kp2 = jnp.full((G, 1), k, jnp.int32)
        kp2 = jnp.minimum(kp2, m - 1)
        prow_ref[0, :, k] = kp2[:, 0]

        is_kp2 = rowi == kp2                                       # (G, m)
        pivval2 = jnp.sum(
            jnp.where(is_kp2, colk, 0.0), axis=1, keepdims=True
        )
        nonzero2 = pivval2 != 0.0
        used_ref[:, :] = used_ref[:, :] + is_kp2.astype(jnp.float32)
        remaining = avail & jnp.logical_not(is_kp2)                # (G, m)

        # scale remaining rows of column k (unscaled when zero pivot,
        # matching ref src/lu.jl:299-319)
        inv2 = jnp.where(nonzero2, 1.0, 0.0) / jnp.where(
            nonzero2, pivval2, 1.0
        )
        lcol = jnp.where(
            remaining & nonzero2, colk * inv2,
            jnp.where(remaining, colk, 0.0),
        )                                                          # (G, m)
        out_ref[:, :, k] = jnp.where(remaining & nonzero2, colk * inv2, colk)

        nonzero1 = pivval2[:, 0] != 0.0
        info = info_ref[0, 0, :]
        info_ref[0, 0, :] = jnp.where(
            (~nonzero1) & (info == 0),
            jnp.int32(k + 1) if pivot else jnp.int32(-(k + 1)),
            info,
        )

        if k + 1 < n:
            # urow: the pivot row's trailing columns (masked reduce)
            is_kp3 = jax.lax.broadcasted_iota(
                jnp.int32, (G, m, 1), 1
            ) == kp2[:, :, None]
            urow = jnp.sum(
                jnp.where(is_kp3, out_ref[:, :, k + 1 :], 0.0),
                axis=1,
                keepdims=True,
            )                                                      # (G, 1, n')
            out_ref[:, :, k + 1 :] -= lcol[:, :, None] * urow


@functools.partial(jax.jit, static_argnames=("pivot", "interpret", "group"))
def batched_lu_pallas_noswap(
    A: jax.Array, pivot: bool = True, interpret=None, group: int = GROUP
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """No-swap batched LU for square matrices: returns
    ``(factors (B,n,n), perm (B,n), info (B,))`` with
    ``L @ U == A[perm, :]``.  Faster than :func:`batched_lu_pallas`
    (no per-step swap passes) but does not produce a LAPACK ipiv
    sequence and breaks pivot ties by physical row index.
    """
    B, m, n = A.shape
    if m != n:
        raise ValueError("batched_lu_pallas_noswap requires square matrices")
    if interpret is None:
        interpret = not is_tpu_backend()
    G = group
    pad = (-B) % G
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, n, dtype=A.dtype), (pad, m, n))
        A = jnp.concatenate([A, eye], axis=0)
    Bp = B + pad
    nb = Bp // G

    kernel = functools.partial(_batched_noswap_kernel, pivot=pivot)
    out, prow, info = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, m, n), A.dtype),
            jax.ShapeDtypeStruct((nb, G, n), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, G), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (G, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (G, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, G, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((G, m), jnp.float32)],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A)
    perm = prow.reshape(Bp, n)[:B]
    info = info.reshape(Bp)[:B]
    # ONE gather puts rows into logical (pivot) order
    factors = jnp.take_along_axis(out[:B], perm[:, :, None], axis=1)
    return factors, perm, info


@functools.partial(jax.jit, static_argnames=("pivot", "interpret", "group"))
def batched_lu_pallas(
    A: jax.Array, pivot: bool = True, interpret=None, group: int = GROUP
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Factor a batch ``A`` of shape (B, m, n), ``group`` matrices per
    grid cell.  Returns ``(factors (B,m,n), ipiv (B,minmn),
    perm (B,m), info (B,))``.  B is padded internally to a multiple of
    ``group`` with identity matrices.
    """
    B, m, n = A.shape
    minmn = min(m, n)
    if interpret is None:
        interpret = not is_tpu_backend()
    G = group
    pad = (-B) % G
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, n, dtype=A.dtype), (pad, m, n))
        A = jnp.concatenate([A, eye], axis=0)
    Bp = B + pad
    nb = Bp // G

    kernel = functools.partial(_batched_group_kernel, pivot=pivot)
    out, piv, perm, info = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, m, n), A.dtype),
            jax.ShapeDtypeStruct((nb, G, minmn), jnp.int32),
            jax.ShapeDtypeStruct((nb, G, m), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, G), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (G, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (G, m, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, G, minmn), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, G, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A)
    piv = piv.reshape(Bp, minmn)[:B]
    perm = perm.reshape(Bp, m)[:B]
    info = info.reshape(Bp)[:B]
    return out[:B], piv, perm, info

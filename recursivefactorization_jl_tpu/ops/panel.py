"""Tall-panel LU factorization — the fused Pallas kernel.

This is the TPU re-design of ``_generic_lufact!`` (reference
src/lu.jl:282-330): the panel (m x w, w <= 256) stays **VMEM-resident
across all w pivot steps**, so the latency-bound pivot-search /
row-interchange / scale / rank-1-update chain never round-trips HBM.
The reference got the same effect from `@turbo` keeping the panel hot in
L1/L2; here it is explicit.

Kernel design notes (TPU constraints):
* the elimination step index ``k`` is **statically unrolled** — lane
  (column) indices must be static on TPU; only the pivot row index ``kp``
  is dynamic, and dynamic indexing happens exclusively on the sublane
  (row) dimension, which Mosaic supports via ``pl.ds``;
* the pivot search is a first-occurrence argmax done as max + min-index
  reduction (strict ``>`` semantics of ref src/lu.jl:289-297);
* zero pivot => no swap, no scale, but the rank-1 update still runs and
  ``info`` records the first 1-based failure column
  (ref src/lu.jl:299-319).

Backend dispatch (the analog of the reference's f32/f64 PtrArray fast
path vs generic fallback, src/lu.jl:107-118):
* TPU + f32 -> Pallas kernel;  everything else -> masked pure-JAX loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import LUConfig, is_tpu_backend
from .unblocked import unblocked_lu


def _use_pallas(dtype, config: LUConfig) -> bool:
    if config.backend == "xla":
        return False
    if config.backend == "pallas":
        return True
    return is_tpu_backend() and dtype == jnp.dtype(jnp.float32)


def panel_factor(
    panel: jax.Array, pivot: bool, config: LUConfig
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Factor a tall panel (m x w). Returns ``(factors, piv_local,
    info_local)`` with 0-based panel-local pivot rows and 1-based
    (sign-carrying) panel-local info."""
    if _use_pallas(panel.dtype, config):
        return panel_factor_pallas(panel, pivot)
    return unblocked_lu(panel, pivot)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _panel_kernel(a_ref, out_ref, piv_ref, info_ref, *, pivot: bool):
    m, w = a_ref.shape
    minmn = min(m, w)
    out_ref[:, :] = a_ref[:, :]
    info_ref[0] = 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    for k in range(minmn):  # static unroll: lane indices stay static
        colk = out_ref[:, k].reshape(m, 1)
        if pivot:
            abscol = jnp.where(rows >= k, jnp.abs(colk), -jnp.inf)
            maxv = jnp.max(abscol)
            kp = jnp.min(jnp.where(abscol == maxv, rows, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)  # all-NaN guard
        else:
            kp = jnp.int32(k)
        piv_ref[k] = kp

        rowkp = out_ref[pl.ds(kp, 1), :]  # (1, w) dynamic sublane read
        pivval = rowkp[0, k]
        nonzero = pivval != 0.0

        if pivot:

            @pl.when(nonzero & (kp != k))
            def _swap(k=k, rowkp=rowkp):
                rowk = out_ref[k, :].reshape(1, w)
                out_ref[k, :] = rowkp[0, :]
                out_ref[pl.ds(kp, 1), :] = rowk

        @pl.when(nonzero)
        def _scale(k=k, pivval=pivval):
            c = out_ref[:, k].reshape(m, 1)
            out_ref[:, k] = jnp.where(rows > k, c * (1.0 / pivval), c)[:, 0]

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info(k=k):
            info_ref[0] = (k + 1) if pivot else -(k + 1)

        if k + 1 < w and k + 1 < m:
            # Rank-1 trailing update on the static subblock (no masking
            # needed because k is static).
            lcol = out_ref[k + 1 :, k].reshape(m - k - 1, 1)
            urow = out_ref[k, k + 1 :].reshape(1, w - k - 1)
            out_ref[k + 1 :, k + 1 :] -= lcol * urow


@functools.partial(jax.jit, static_argnames=("pivot", "interpret"))
def panel_factor_pallas(panel: jax.Array, pivot: bool, interpret=None):
    m, w = panel.shape
    minmn = min(m, w)
    if interpret is None:
        interpret = not is_tpu_backend()
    kernel = functools.partial(_panel_kernel, pivot=pivot)
    out, piv, info = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), panel.dtype),
            jax.ShapeDtypeStruct((minmn,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(panel)
    return out, piv, info[0]

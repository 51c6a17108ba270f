"""Tensor-parallel LU over a device mesh: block-cyclic columns + panel
broadcast (`shard_map` + XLA collectives).

The reference is single-process shared-memory only (SURVEY.md §2:
"no NCCL/MPI anywhere"); this module is the scale-out extension, built
the way ScaLAPACK pgetrf structures its communication, but expressed
TPU-natively:

* columns are distributed **block-cyclically** over the mesh axis so
  every device keeps work throughout the factorization (a contiguous
  split would idle the left devices as elimination proceeds);
* per panel, the owner's tall panel is **broadcast with one `psum`**
  (mask + sum is the XLA idiom for a broadcast-from-dynamic-root, and
  rides ICI);
* the panel factorization itself is **replicated on every device**
  instead of factored-then-broadcast: the panel factor is tiny
  (O(m·w²) on a VMEM-resident block via ops/panel.py), while a second
  broadcast of factors + pivot indices would cost another latency-bound
  collective per panel — compute is cheaper than ICI latency here;
* pivot row swaps apply only to **local columns** (a pure-local gather,
  no communication), because the row axis is unsharded;
* TRSM + Schur updates run on all local column blocks with a
  global-block-index mask (`iota*D + axis_index > j`), so the SPMD
  program is identical on every device — no data-dependent control
  flow for XLA to choke on.

Algorithmic semantics (pivoting, info conventions, factor layout) match
the single-device blocked schedule (ops/blocked.py; reference
src/lu.jl:181-255 recursion semantics, info offsetting src/lu.jl:240-247).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.blocked import _offset_info
from ..ops.panel import panel_factor
from ..ops.trsm import unit_lower_inverse
from ..utils.config import LUConfig, default_config, full_matmul_precision


def _cyclic_order(n: int, w: int, D: int) -> np.ndarray:
    """Column storage order: device d's contiguous shard holds the cyclic
    blocks g ∈ {d, d+D, ...} in increasing g."""
    nb = n // w
    order = [
        c
        for d in range(D)
        for g in range(d, nb, D)
        for c in range(g * w, (g + 1) * w)
    ]
    return np.asarray(order, dtype=np.int64)


@full_matmul_precision
def _tp_lu_kernel(
    A_loc: jax.Array,
    *,
    axis: str,
    n: int,
    w: int,
    D: int,
    pivot: bool,
    config: LUConfig,
):
    """shard_map body. ``A_loc``: (n, n/D) local cyclic column blocks."""
    me = lax.axis_index(axis)
    nb = n // w          # global panel count
    nbl = nb // D        # local blocks per device
    ipiv = jnp.zeros((n,), jnp.int32)
    info = jnp.int32(0)

    for j in range(nb):
        o, q, s = j % D, j // D, j * w
        # --- panel broadcast: one psum of the (n-s) x w owner block -----
        panel_local = A_loc[s:, q * w : (q + 1) * w]
        panel = lax.psum(
            jnp.where(me == o, panel_local, jnp.zeros_like(panel_local)),
            axis,
        )
        # --- replicated panel factorization ------------------------------
        pf, piv_l, perm_l, linfo = panel_factor(panel, pivot, config)
        ipiv = ipiv.at[s : s + w].set(piv_l + s)
        info = _offset_info(info, linfo, s)
        # --- local laswp: permute rows s: of ALL local columns -----------
        if pivot:
            # sparse form: w swaps move at most 2w rows (see
            # ops/blocked.py) — gather+scatter only those.
            (aff,) = jnp.nonzero(
                perm_l != jnp.arange(n - s, dtype=perm_l.dtype),
                size=min(2 * w, n - s),
                fill_value=0,
            )
            src = perm_l[aff]
            A_loc = A_loc.at[s + aff, :].set(A_loc[s + src, :])
        # --- owner stores the factored panel -----------------------------
        stored = A_loc.at[s:, q * w : (q + 1) * w].set(pf)
        A_loc = jnp.where(me == o, stored, A_loc)
        # --- masked TRSM + Schur on trailing local blocks -----------------
        if j + 1 < nb:
            L11_inv = unit_lower_inverse(pf[:w, :w])
            L21 = pf[w:, :]  # (n-s-w, w)
            Ablk = A_loc.reshape(n, nbl, w)
            glob = jnp.arange(nbl, dtype=jnp.int32) * D + me
            mask = (glob > j)[None, :, None]
            A12 = Ablk[s : s + w]  # (w, nbl, w)
            U12 = jnp.where(
                mask,
                jnp.einsum(
                    "ik,kbj->ibj", L11_inv, A12,
                    preferred_element_type=A_loc.dtype,
                ),
                jnp.zeros_like(A12),
            )
            Ablk = Ablk.at[s : s + w].set(jnp.where(mask, U12, A12))
            upd = jnp.einsum(
                "ik,kbj->ibj", L21, U12, preferred_element_type=A_loc.dtype
            )  # U12 is zero outside the mask -> update is a no-op there
            Ablk = Ablk.at[s + w :].add(-upd)
            A_loc = Ablk.reshape(n, nbl * w)

    return A_loc, ipiv, info


def tp_lu_factor(
    A: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel_width: int = 128,
    pivot: bool = True,
    config: Optional[LUConfig] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tensor-parallel LU of a square matrix over ``mesh`` axis ``axis``.

    Returns ``(factors, ipiv, info)`` with the same conventions as
    :func:`~..models.lu.lu_factor`; ``factors`` comes back sharded
    column-wise over the mesh. ``A`` is identity-padded up to a multiple
    of ``D * panel_width`` internally (padding rows/columns cannot win a
    pivot in the leading n columns, so the leading n x n factors and
    ipiv[:n] are unchanged).
    """
    config = config or default_config()
    n = A.shape[0]
    if A.ndim != 2 or A.shape[1] != n:
        raise ValueError(f"tp_lu_factor expects a square matrix, got {A.shape}")
    D = mesh.shape[axis]
    w = panel_width
    npad = -n % (D * w)
    if npad:
        Ap = jnp.zeros((n + npad, n + npad), dtype=A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[
            jnp.arange(n, n + npad), jnp.arange(n, n + npad)
        ].set(1)
        A = Ap
    N = n + npad

    order = _cyclic_order(N, w, D)
    inv_order = np.argsort(order)

    kernel = functools.partial(
        _tp_lu_kernel, axis=axis, n=N, w=w, D=D, pivot=pivot, config=config
    )
    shard_fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(None, axis), P(), P()),
    )

    @jax.jit
    def run(A):
        A_store = A[:, order]
        F_store, ipiv, info = shard_fn(A_store)
        F = F_store[:, inv_order]
        return F[:n, :n], ipiv[:n], info

    F, ipiv, info = run(
        jax.device_put(A, NamedSharding(mesh, P(None, None)))
    )
    return F, ipiv, info


def tp_lu(
    A: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel_width: int = 128,
    pivot: bool = True,
    config: Optional[LUConfig] = None,
):
    """Tensor-parallel :func:`~..models.lu.lu` — returns an LU object."""
    from ..models.lu import LU

    F, ipiv, info = tp_lu_factor(
        A, mesh, axis, panel_width, pivot, config
    )
    return LU(F, ipiv, info, pivoted=pivot)

"""Tensor-parallel LU over a device mesh: block-cyclic columns + panel
broadcast (`shard_map` + XLA collectives).

The reference is single-process shared-memory only (SURVEY.md §2:
"no NCCL/MPI anywhere"); this module is the scale-out extension, built
the way ScaLAPACK pgetrf structures its communication, but expressed
TPU-natively:

* columns are distributed **block-cyclically** over the mesh axis so
  every device keeps work throughout the factorization (a contiguous
  split would idle the left devices as elimination proceeds);
* the panel loop is a ``lax.fori_loop`` with every per-panel quantity
  at FULL height and masked by the traced panel start — so compile
  time is one body trace regardless of the panel count (a Python
  unroll at n=16k/w=128 would inline 128 shard_map bodies), and the
  input is column-sharded end to end (the matrix is never replicated);
* per panel, the owner's tall panel is **broadcast with one `psum`**
  (mask + sum is the XLA idiom for a broadcast-from-dynamic-root, and
  rides ICI);
* the panel factorization itself is **replicated on every device**
  instead of factored-then-broadcast: the panel factor is tiny next to
  the Schur update, while a second broadcast of factors + pivot
  indices would cost another latency-bound collective per panel —
  compute is cheaper than ICI latency here;
* pivot row swaps apply only to **local columns** (a pure-local sparse
  gather/scatter, no communication), because the row axis is unsharded;
* TRSM + Schur updates run on all local column blocks with a
  global-block-index mask (`iota*D + axis_index > j`), so the SPMD
  program is identical on every device — no data-dependent control
  flow for XLA to choke on.

Full-height masking trades ~2-3x extra (masked-to-zero) matmul flops
for static shapes; the Schur matmuls stay MXU work either way.

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
from ..ops.schur import FULL
from ..ops.trsm import unit_lower_inverse, upper_inverse
from ..utils.config import LUConfig, default_config, full_matmul_precision
from ..utils.perm import vma_zero


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


def _offset_panel_lu(panel: jax.Array, ofs, pivot: bool):
    """Unblocked LU of the full-height panel (n, w) whose elimination
    starts at (traced) global row ``ofs``: local column k eliminates
    global row ofs+k; rows < ofs are never touched.  Returns
    ``(pf, piv (w,), perm (n,), info)`` with GLOBAL pivot-row indices
    and the composed global row permutation of rows >= ofs.

    Same per-step semantics as ops/unblocked.py (first-occurrence
    argmax, zero pivot => no swap/scale but rank-1 runs, signed info —
    ref src/lu.jl:289-319), re-derived with an offset so the
    tensor-parallel panel loop can keep static shapes."""
    n, w = panel.shape
    rowi = jnp.arange(n)
    coli = jnp.arange(w)
    vz = vma_zero(panel)
    piv0 = jnp.zeros((w,), jnp.int32) + vz
    perm0 = jnp.arange(n, dtype=jnp.int32) + vz
    ofs = jnp.asarray(ofs, jnp.int32)
    z = jnp.int32(0)

    def body(k, carry):
        A, piv, perm, info = carry
        k = jnp.asarray(k, jnp.int32)
        gk = ofs + k
        col = lax.dynamic_slice(A, (z, k), (n, 1))[:, 0]
        if pivot:
            abscol = jnp.where(rowi >= gk, jnp.abs(col), -jnp.inf)
            kp = jnp.argmax(abscol).astype(jnp.int32)
        else:
            kp = gk.astype(jnp.int32)
        piv = piv.at[k].set(kp)

        pivval = col[kp]
        nonzero = pivval != 0

        # interchange global rows gk <-> kp (skipped on zero pivot)
        do_swap = nonzero & (kp != gk)
        rowgk = lax.dynamic_slice(A, (gk, z), (1, w))[0]
        rowkp = A[kp]
        sel_gk = (rowi[:, None] == gk) & do_swap
        sel_kp = (rowi[:, None] == kp) & do_swap
        A = jnp.where(sel_gk, rowkp[None, :], A)
        A = jnp.where(sel_kp, rowgk[None, :], A)
        pgk, pkp = perm[gk], perm[kp]
        perm = jnp.where(
            do_swap, perm.at[gk].set(pkp).at[kp].set(pgk), perm
        )

        # scale rows below the (global) diagonal
        akk_inv = jnp.where(nonzero, 1, 0) / jnp.where(nonzero, pivval, 1)
        col = lax.dynamic_slice(A, (z, k), (n, 1))[:, 0]
        newcol = jnp.where(
            (rowi > gk) & nonzero, col * akk_inv.astype(A.dtype), col
        )
        A = lax.dynamic_update_slice(A, newcol[:, None], (z, k))

        local_info = (k + 1) if pivot else -(k + 1)
        info = jnp.where(
            (~nonzero) & (info == 0), local_info.astype(jnp.int32), info
        )

        # rank-1 trailing update within the panel
        lcol = jnp.where(rowi > gk, newcol, 0)
        urow_full = lax.dynamic_slice(A, (gk, z), (1, w))[0]
        urow = jnp.where(coli > k, urow_full, 0)
        A = A - lcol[:, None] * urow[None, :]
        return A, piv, perm, info

    return lax.fori_loop(
        0, w, body, (panel, piv0, perm0, jnp.int32(0) + vz)
    )


@full_matmul_precision
def _tp_lu_kernel(
    A_loc: jax.Array,
    *,
    axis: str,
    n: int,
    w: int,
    D: int,
    pivot: bool,
    stages: int = 4,
    pallas_panels: bool = False,
    panel_micro: int = 32,
    panel_unroll: int = 1,
):
    """shard_map body. ``A_loc``: (n, n/D) local cyclic column blocks.

    The panel loop runs as ``stages`` static SHRINKING-HEIGHT stages,
    each a ``fori_loop`` over its share of the panels: when stage t
    starts at panel j0, rows < j0*w are final, so every per-panel op of
    the stage (panel broadcast psum, replicated offset panel chain,
    TRSM/Schur einsums) runs on the static row slice [j0*w:, :] — and
    local column blocks that are statically finished by j0 are skipped
    too.  Against the single-stage full-height loop this roughly halves
    the masked-to-useful Schur flops, the VPU panel-chain height, and
    the per-panel ICI psum payload, at the cost of `stages` traced
    bodies instead of one.  The live-region arithmetic is unchanged
    (masked rows/cols only ever contributed zeros), so results are
    bitwise identical to the single-stage loop.
    """
    me = lax.axis_index(axis)
    nb = n // w          # global panel count
    nbl = nb // D        # local blocks per device
    # ipiv/perm/info carries stay REPLICATED across the axis: every
    # device computes them from the psum'd (replicated) panel, matching
    # the plain inits — so the P() out_specs hold.  Only A_loc varies.
    ipiv0 = jnp.zeros((n,), jnp.int32)
    perm0 = jnp.arange(n, dtype=jnp.int32)

    def body(j, carry, h0, qd):
        # h0: static finished-row count; qd: static finished local blocks
        A_loc, ipiv, perm, info = carry
        H = n - h0
        nbl_t = nbl - qd
        rowi = jnp.arange(H)[:, None]
        o = j % D
        q = j // D
        s = j * w
        sl = s - h0          # panel start within the live row slice
        # --- panel broadcast: one psum of the live-height owner block --
        panel_local = lax.dynamic_slice(A_loc, (h0, q * w), (H, w))
        panel = lax.psum(
            jnp.where(me == o, panel_local, jnp.zeros_like(panel_local)),
            axis,
        )
        # --- replicated offset panel factorization ---------------------
        if pallas_panels:
            from ..ops.panel import offset_panel_factor_pallas

            pf, piv_l, perm_l, linfo = offset_panel_factor_pallas(
                panel, sl, pivot,
                micro=panel_micro, unroll=panel_unroll,
            )
        else:
            pf, piv_l, perm_l, linfo = _offset_panel_lu(panel, sl, pivot)
        ipiv = lax.dynamic_update_slice(ipiv, piv_l + h0, (s,))
        info = _offset_info(info, linfo, s)
        # --- local laswp: sparse row scatter on ALL local columns ------
        if pivot:
            # a composition of w swaps moves at most 2w rows — gather +
            # scatter only those (see ops/blocked.py)
            (aff,) = jnp.nonzero(
                perm_l != jnp.arange(H, dtype=perm_l.dtype),
                size=min(2 * w, H),
                fill_value=0,
            )
            src = perm_l[aff]
            A_loc = A_loc.at[h0 + aff, :].set(A_loc[h0 + src, :])
            perm = perm.at[h0 + aff].set(perm[h0 + src])
        # --- owner stores the factored panel ---------------------------
        stored = lax.dynamic_update_slice(A_loc, pf, (h0, q * w))
        A_loc = jnp.where(me == o, stored, A_loc)
        # --- masked TRSM + Schur on live trailing local blocks ----------
        L11 = lax.dynamic_slice(pf, (sl, 0), (w, w))
        L11_inv = unit_lower_inverse(L11)
        L21 = jnp.where(rowi >= sl + w, pf, 0)      # (H, w), zero elsewhere
        Ablk = A_loc[h0:, qd * w :].reshape(H, nbl_t, w)
        glob = (qd + jnp.arange(nbl_t, dtype=jnp.int32)) * D + me
        mask = (glob > j)[None, :, None]
        A12 = lax.dynamic_slice(Ablk, (sl, 0, 0), (w, nbl_t, w))
        U12 = jnp.where(
            mask,
            jnp.einsum(
                "ik,kbj->ibj", L11_inv, A12,
                preferred_element_type=A_loc.dtype, precision=FULL,
            ),
            jnp.zeros_like(A12),
        )
        Ablk = lax.dynamic_update_slice(
            Ablk, jnp.where(mask, U12, A12), (sl, 0, 0)
        )
        # U12 is zero outside the mask and L21 zero at rows < sl+w, so
        # the full-shape product is a no-op everywhere it must be
        upd = jnp.einsum(
            "ik,kbj->ibj", L21, U12, preferred_element_type=A_loc.dtype, precision=FULL
        )
        A_loc = A_loc.at[h0:, qd * w :].set(
            (Ablk - upd).reshape(H, nbl_t * w)
        )
        return A_loc, ipiv, perm, info

    carry = (A_loc, ipiv0, perm0, jnp.int32(0))
    S = max(1, min(stages, nb))
    bounds = [nb * t // S for t in range(S)] + [nb]
    for t in range(S):
        j0, j1 = bounds[t], bounds[t + 1]
        if j0 == j1:
            continue
        h0 = j0 * w
        # device me's local block q is finished once q*D + me < j0 for
        # every me <= D-1; the safe static count is floor((j0-D+1)/D)+1
        # clamped at 0 (underestimates for small me — masks catch those)
        qd = max(0, (j0 - D) // D + 1) if j0 >= D else 0
        carry = lax.fori_loop(
            j0, j1, functools.partial(body, h0=h0, qd=qd), carry
        )
    return carry


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
    ipiv[:n] are unchanged).  The input is placed column-sharded (never
    replicated); the cyclic reorder runs as one sharded gather under jit.
    """
    F, ipiv, _perm, info = tp_lu_factor_p(
        A, mesh, axis, panel_width, pivot, config
    )
    return F, ipiv, info


def tp_lu_factor_p(
    A: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel_width: int = 128,
    pivot: bool = True,
    config: Optional[LUConfig] = None,
):
    """Like :func:`tp_lu_factor` but also returns the composed row
    permutation: ``(factors, ipiv, perm, info)``."""
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

    order_np = _cyclic_order(N, w, D)
    order = jnp.asarray(order_np, dtype=jnp.int32)
    inv_order = jnp.asarray(np.argsort(order_np), dtype=jnp.int32)

    if config.tp_panel_backend == "auto":
        from ..utils.config import is_tpu_backend

        pallas_panels = is_tpu_backend() and A.dtype == jnp.dtype(
            jnp.float32
        )
    else:
        pallas_panels = config.tp_panel_backend == "pallas"
    kernel = functools.partial(
        _tp_lu_kernel, axis=axis, n=N, w=w, D=D, pivot=pivot,
        pallas_panels=pallas_panels,
        panel_micro=config.resolved_panel_micro(N, w),
        panel_unroll=config.panel_unroll,
    )
    shard_fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(None, axis), P(), P(), P()),
    )
    col_sharding = NamedSharding(mesh, P(None, axis))

    @jax.jit
    def run(A):
        # cyclic reorder as a sharded gather (XLA inserts the all-to-all)
        A_store = lax.with_sharding_constraint(
            jnp.take(A, order, axis=1), col_sharding
        )
        F_store, ipiv, perm, info = shard_fn(A_store)
        F = jnp.take(F_store, inv_order, axis=1)
        return F[:n, :n], ipiv[:n], perm, info

    F, ipiv, perm, info = run(jax.device_put(A, col_sharding))
    return F, ipiv, perm, info


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

    n = A.shape[0]
    F, ipiv, perm, info = tp_lu_factor_p(
        A, mesh, axis, panel_width, pivot, config
    )
    perm = jnp.where(perm[:n] < n, perm[:n], 0)  # padded rows can't appear
    return LU(F, ipiv, info, pivoted=pivot, perm=perm)


@full_matmul_precision
def _tp_solve_kernel(
    F_loc: jax.Array,
    r: jax.Array,
    *,
    axis: str,
    n: int,
    w: int,
    D: int,
    k: int,
    trans: bool = False,
):
    """shard_map body for the distributed substitution.

    ``F_loc``: (n, n/D) local block-cyclic column blocks of the factors.
    ``r``: (n, k) REPLICATED right-hand sides (already row-permuted).

    Fan-out substitution: per panel j, the OWNER solves the w x w
    diagonal block against r[s:s+w] and forms the full-height update
    delta (its local panel columns are the only ones that touch r this
    step); ONE ``psum`` per panel broadcasts the (n, k) delta.  Total
    ICI traffic is nb * n * k elements — a factor ``w`` below
    re-broadcasting factor panels the way the factorization must.
    Non-owner devices compute a garbage delta from their own local
    block (it can even contain inf/nan from a non-triangular diag
    slice); the masked ``where`` before the psum zeroes it exactly,
    and ``where`` does not propagate NaNs from the unselected branch.

    ``trans=True``: ``F_loc`` holds the (conjugate-)TRANSPOSED factors
    F^T in the same block-cyclic column layout.  tril(F^T) = U^T is
    then NON-unit lower (diag-block inverse = upper_inverse(d^T)^T)
    and triu(F^T) = L^T is UNIT upper (inverse =
    unit_lower_inverse(d^T)^T) — the same two substitution sweeps run
    with the triangle roles swapped (single-device analog:
    models/solve.py trans path; ref Adjoint wrappers src/lu.jl:81-83).
    """
    me = lax.axis_index(axis)
    nb = n // w
    rowi = jnp.arange(n)[:, None]
    z = jnp.int32(0)

    def step(j, r, lower: bool):
        j = jnp.asarray(j, jnp.int32)
        o = j % D
        q = j // D
        s = j * w
        blk = lax.dynamic_slice(F_loc, (z, q * w), (n, w))
        diag = lax.dynamic_slice(blk, (s, z), (w, w))
        rj = lax.dynamic_slice(r, (s, z), (w, k))
        if lower:
            if trans:
                # non-unit lower U^T block: inv = upper_inverse(d^T)^T
                yj = upper_inverse(diag.T).T @ rj
            else:
                yj = unit_lower_inverse(diag) @ rj
            off_mask = rowi >= s + w     # forward: update rows below
        else:
            if trans:
                # unit-upper L^T block: inv = unit_lower_inverse(d^T)^T
                yj = unit_lower_inverse(diag.T).T @ rj
            else:
                yj = upper_inverse(diag) @ rj
            off_mask = rowi < s          # backward: update rows above
        upd = jnp.where(off_mask, blk, 0) @ yj  # (n, k); 0 off the mask
        panel_mask = (rowi >= s) & (rowi < s + w)
        yj_full = lax.dynamic_update_slice(
            jnp.zeros_like(r), yj - rj, (s, z)
        )
        delta = jnp.where(panel_mask, yj_full, -upd)
        delta = lax.psum(
            jnp.where(me == o, delta, jnp.zeros_like(delta)), axis
        )
        return r + delta

    # forward: y = L^-1 (P b); backward: x = U^-1 y
    r = lax.fori_loop(0, nb, lambda j, a: step(j, a, True), r)
    r = lax.fori_loop(0, nb, lambda t, a: step(nb - 1 - t, a, False), r)
    return r


def tp_lu_solve(
    lu_res,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel_width: int = 128,
    trans=0,
) -> jax.Array:
    """Distributed solve ``A x = b`` from a :func:`tp_lu` (or single-
    device ``lu``) result, over mesh axis ``axis``.

    The factors are laid out block-cyclically over the axis (the same
    storage layout :func:`tp_lu_factor` uses internally) and never
    replicated; the right-hand side stays replicated and each panel
    step contributes one psum'd update vector (see
    :func:`_tp_solve_kernel`).  ``b`` may be a vector ``(n,)`` or a
    matrix of stacked right-hand sides ``(n, k)``.  Semantics match the
    single-device :func:`~..models.solve.lu_solve` (pivoted solve =
    permute rhs + unit-lower + upper substitution; the no-pivot path
    skips the permutation — ref src/lu.jl:42-61).

    ``trans``: same selector as :func:`~..models.solve.lu_solve`
    (``0``/``"N"``, ``1``/``"T"``, ``2``/``"H"``).  Transpose solves
    distribute the TRANSPOSED factors block-cyclically and swap the
    triangle roles in the same two sweeps (``U^T y = b`` forward,
    ``L^T z = y`` backward, ``x = P^T z``) — the distributed analog of
    the reference's Adjoint/Transpose wrappers (ref src/lu.jl:81-83).
    """
    from ..models.solve import normalize_trans
    from ..utils.perm import invert_perm

    t = normalize_trans(trans)
    F = lu_res.factors
    n = F.shape[0]
    if F.shape[1] != n:
        raise ValueError("tp_lu_solve requires a square factorization")
    b = jnp.asarray(b)
    vec = b.ndim == 1
    B = (b[:, None] if vec else b).astype(F.dtype)
    if B.shape[0] != n:
        raise ValueError(
            f"rhs rows {B.shape[0]} do not match factorization size {n}"
        )
    if t == 0:
        if lu_res.pivoted:
            B = jnp.take(B, lu_res.p, axis=0)
    else:
        # A = P^T L U => A^T x = b: substitute through F^T, then
        # un-permute the result (x = P^T z); A^H conjugates the factors.
        F = F.T
        if t == 2 and jnp.issubdtype(F.dtype, jnp.complexfloating):
            F = jnp.conj(F)

    D = mesh.shape[axis]
    w = panel_width
    npad = -n % (D * w)
    N = n + npad
    if npad:
        Fp = jnp.zeros((N, N), F.dtype).at[:n, :n].set(F)
        # identity padding: unit-lower block is I, upper diag is 1, so
        # the padded trailing solve is a no-op on zero-padded rhs rows
        Fp = Fp.at[jnp.arange(n, N), jnp.arange(n, N)].set(1)
        F = Fp
        B = jnp.concatenate(
            [B, jnp.zeros((npad, B.shape[1]), B.dtype)], axis=0
        )

    order_np = _cyclic_order(N, w, D)
    order = jnp.asarray(order_np, dtype=jnp.int32)
    kernel = functools.partial(
        _tp_solve_kernel, axis=axis, n=N, w=w, D=D, k=B.shape[1],
        trans=t != 0,
    )
    shard_fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=P(),
    )
    col_sharding = NamedSharding(mesh, P(None, axis))

    @jax.jit
    def run(F, B):
        F_store = lax.with_sharding_constraint(
            jnp.take(F, order, axis=1), col_sharding
        )
        return shard_fn(F_store, B)[:n]

    x = run(jax.device_put(F, col_sharding), B)
    if t != 0 and lu_res.pivoted:
        x = jnp.take(x, invert_perm(lu_res.p), axis=0)
    return x[:, 0] if vec else x

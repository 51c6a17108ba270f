"""Static blocked right-looking LU schedule (the TPU Toledo analog).

The reference's cache-oblivious recursion (``reckernel!``, reference
src/lu.jl:181-255) exists to tile for an implicit CPU cache hierarchy.
On TPU the hierarchy is explicit, so the recursion is flattened at trace
time into a right-looking panel schedule with static shapes that XLA can
pipeline:

    for each panel s (width w):
        1. factor the tall panel A[s:, s:s+w]      (fused Pallas kernel)
        2. laswp: apply the panel's composed permutation to all other
           columns as ONE row gather               (ref src/lu.jl:156-180)
        3. TRSM:  U12 = L11^-1 @ A12 via triangular inverse + MXU matmul
                                                  (ref src/lu.jl:227)
        4. Schur: A22 -= L21 @ U12 on the MXU     (ref src/lu.jl:257-276)

The permutation vector comes out of the panel kernel itself (maintained
alongside the swaps); recomposing it from ipiv would cost a sequential
m-step scalar chain per panel — measured ~0.75 ms per 256 steps on TPU,
which dominated the whole factorization before this design.

Fat matrices (m < n) factor the left m x m block then TRSM the remainder,
mirroring ``_recurse!`` (ref src/lu.jl:137-148).  ``info`` offsetting
across panels mirrors ref src/lu.jl:240-247.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.config import FORI_VMEM_BUDGET_BYTES, LUConfig
from .panel import (
    _use_pallas,
    _use_pallas_c64,
    panel_factor,
    panel_factor_noswap_pallas,
)
from .schur import FULL, schur_update
from .trsm import solve_unit_lower, unit_lower_inverse


def _offset_info(info, local_info, s):
    """First zero pivot wins; offset panel-local info by the panel start
    (sign-aware for the no-pivot negative convention,
    ref src/lu.jl:240-247)."""
    glob = jnp.where(local_info < 0, local_info - s, local_info + s)
    return jnp.where((info == 0) & (local_info != 0), glob, info)


def blocked_lu_physical(
    A: jax.Array, pivot: bool, config: LUConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Physical-order (no row movement) blocked LU for m >= n.

    Rows NEVER move during the factorization: the panel kernel
    (ops/panel.py ``_panel_kernel_noswap``) eliminates whichever row
    wins the pivot search in place, and the trailing update runs at
    full height with the per-step-masked L block, which makes it a
    no-op on already-consumed rows AND deposits the U12 rows into the
    pivot rows automatically (their partial L-sums reproduce the
    forward substitution).  This removes the two largest non-MXU costs
    of the swap schedule: the per-step row interchanges inside the
    panel kernel (taken with probability ~1 per step) and the per-panel
    laswp of the trailing matrix.  The price: trailing Schur updates at
    full height m instead of m-s (~1.5x masked-to-useful flops — MXU
    work) and ONE global row gather at the end.

    Returns ``(factors, prow, perm, info)`` where ``perm`` is the
    composed row permutation (``L @ U == A[perm, :]``) and ``prow`` is
    its leading min(m, n) entries — the physical row chosen at each
    elimination step.  NOTE: ``prow`` is NOT a LAPACK-style swap
    sequence (use ``perm`` for solves; this path is opt-in via
    ``LUConfig(schedule='physical')``).
    """
    m, n = A.shape
    if m < n:
        raise ValueError("blocked_lu_physical requires m >= n")
    w = config.resolved_panel_width(m, n, jnp.dtype(A.dtype).itemsize)
    schur_prec = config.resolved_schur_precision(min(m, n), A.dtype)
    used = jnp.zeros((1, m), jnp.float32)
    info = jnp.int32(0)
    prows = []
    rowi = jnp.arange(m)[:, None]

    s = 0
    while s < n:
        ws = min(w, n - s)
        used_prev = used
        pf, prow_l, used, linfo = panel_factor_noswap_pallas(
            A[:, s : s + ws], used, pivot,
            micro=min(config.resolved_panel_micro(m, ws), ws),
        )
        A = A.at[:, s : s + ws].set(pf)
        info = _offset_info(info, linfo, s)
        prows.append(prow_l)

        if s + ws < n:
            # masked L block: entry (i, r) kept iff row i was still
            # available after step r (not consumed at a step <= r, nor
            # by an earlier panel) — zeros truncate consumed rows' sums
            # so one full-height matmul updates available rows AND
            # writes U12 into the pivot rows.
            oh = (rowi == prow_l[None, :]).astype(A.dtype)    # (m, ws)
            consumed = jnp.cumsum(oh, axis=1) > 0             # (m, ws)
            keep = (~consumed) & (used_prev[0][:, None] < 0.5)
            Lscr = jnp.where(keep, pf, 0)
            R = A[prow_l, s + ws :]                           # (ws, n_trail)
            L11 = Lscr[prow_l, :]                             # strict lower
            U12 = jnp.dot(
                unit_lower_inverse(L11), R,
                preferred_element_type=A.dtype, precision=FULL,
            )
            A = A.at[:, s + ws :].set(
                schur_update(A[:, s + ws :], Lscr, U12, schur_prec)
            )
        s += ws

    prow = jnp.concatenate(prows) if len(prows) > 1 else prows[0]
    if m > n:
        (tail,) = jnp.nonzero(used[0] < 0.5, size=m - n, fill_value=0)
        perm = jnp.concatenate([prow, tail.astype(prow.dtype)])
    else:
        perm = prow
    factors = jnp.take(A, perm, axis=0)  # ONE gather to pivoted layout
    return factors, prow, perm, info


def resolve_blocked_schedule(
    m: int, n: int, dtype, pivot: bool, config: LUConfig, tpu=None
) -> Tuple[LUConfig, int]:
    """Pure trace-time resolution of the blocked schedule's effective
    ``(config, panel_width)`` for an (m, n) matrix — extracted from
    :func:`blocked_lu` so the empirical Mosaic crash-class fallbacks are
    unit-testable without running a factorization
    (tests/test_routing.py pins every documented routing decision).

    ``tpu`` overrides backend detection for tests; None -> detect.
    Applied in order:
    1. ``blocked_panel_variant`` override (LUConfig);
    2. fori -> shadow fallback when the auto width drops below 512 at
       minmn >= 4096 on the Pallas path (v5e compile-helper crash
       class, 2026-08);
    3. no-pivot auto-width cap at 128 for minmn >= 4096 (same crash
       class, no-pivot flavor).
    """
    import dataclasses

    minmn = min(m, n)
    if config.resolved_blocked_variant() != config.panel_variant:
        config = dataclasses.replace(
            config, panel_variant=config.resolved_blocked_variant()
        )
    itemsize = jnp.dtype(dtype).itemsize
    w = config.resolved_panel_width(m, n, itemsize)
    if (
        config.panel_width is None
        and config.panel_variant.startswith("fori")
        and w < 512
        and minmn >= 4096
        and _use_pallas(jnp.dtype(dtype), config, tpu)
    ):
        # Empirical Mosaic/XLA workaround (v5e, 2026-08): composed
        # blocked graphs with 256-wide fori panels at n>=4096 crash the
        # TPU compile helper (LUConfig.blocked_panel_variant).  If the
        # VMEM budget can't afford w=512 fori panels (m beyond ~16k
        # f32), fall back to the static shadow kernel class, whose
        # narrow-panel widths are proven on chip.
        config = dataclasses.replace(config, panel_variant="shadow")
        w = config.resolved_panel_width(m, n, itemsize)
    if not pivot and minmn >= 4096 and config.panel_width is None:
        # Empirical Mosaic/XLA workaround (v5e, 2026-08): the composed
        # no-pivot blocked graph with 256-wide panels at n>=4096 crashes
        # the TPU compile helper (the same panels compile standalone and
        # the pivoted graph compiles at any width); 128-wide panels
        # compile fine.  Only the auto-derived width is capped — an
        # explicit panel_width is honored as given.
        w = min(w, 128)
    return config, w


def blocked_lu(
    A: jax.Array, pivot: bool, config: LUConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Factor ``A`` (m x n) with the static blocked schedule.

    Returns ``(factors, ipiv, perm, info)``; ``ipiv`` is the 0-based
    global swap sequence of length min(m, n) and ``perm`` the composed
    global row permutation (``L @ U == A[perm, :]``).
    """
    m, n = A.shape
    minmn = min(m, n)
    # Direct callers (perf arms, TP) may land here with the 'auto'
    # boundary-precision knob unresolved; resolve it against the whole
    # factorization's min dim, same gate as _dispatch_factor.
    if config.panel_boundary_precision == "auto":
        import dataclasses

        config = dataclasses.replace(
            config,
            panel_boundary_precision=(
                config.resolved_panel_boundary_precision(minmn, A.dtype)
            ),
        )
    if m < n:
        # Fat: factor the left square block, then permute + TRSM the
        # remaining columns (ref _recurse! src/lu.jl:140-146).
        FL, ipiv, perm, info = blocked_lu(A[:, :m], pivot, config)
        AR = A[:, m:]
        if pivot:
            AR = jnp.take(AR, perm, axis=0)
        U1R = solve_unit_lower(FL, AR, config.trsm_block)
        return jnp.concatenate([FL, U1R], axis=1), ipiv, perm, info

    config, w = resolve_blocked_schedule(m, n, A.dtype, pivot, config)
    schur_prec = config.resolved_schur_precision(minmn, A.dtype)
    ipiv = jnp.zeros((minmn,), jnp.int32)
    perm = jnp.arange(m, dtype=jnp.int32)
    info = jnp.int32(0)

    tail = config.resolved_tail_threshold()
    itemsize = jnp.dtype(A.dtype).itemsize

    s = 0
    while s < n:
        if (
            pivot
            and s > 0
            and tail is not None
            and n - s <= tail
            and (
                _use_pallas(A.dtype, config)
                or _use_pallas_c64(A.dtype, config)
            )
            # whole-block VMEM residency gate (same bound as the fori
            # kernel's direct path in ops/panel.py panel_factor)
            and 3 * (m - s) * (n - s) * itemsize <= FORI_VMEM_BUDGET_BYTES
        ):
            # Recursive tail: the trailing block fits the whole-matrix
            # fused kernel — factor it in ONE call instead of more panel
            # rounds (the reference's recursion base case,
            # src/lu.jl:98-106), then pull the tail's row permutation
            # through the already-computed L columns (one dense gather;
            # the tail moves up to 2*(n-s) rows so the sparse scatter
            # has no advantage here).
            pf, piv_local, perm_local, linfo = panel_factor(
                A[s:, s:], pivot, config
            )
            ipiv = ipiv.at[s:].set(piv_local + s)
            info = _offset_info(info, linfo, s)
            A = A.at[s:, :s].set(jnp.take(A[s:, :s], perm_local, axis=0))
            perm = perm.at[s:].set(jnp.take(perm[s:], perm_local))
            A = A.at[s:, s:].set(pf)
            return A, ipiv, perm, info
        ws = min(w, n - s)
        pf, piv_local, perm_local, local_info = panel_factor(
            A[s:, s : s + ws], pivot, config
        )
        ipiv = ipiv.at[s : s + ws].set(piv_local + s)
        info = _offset_info(info, local_info, s)

        if pivot:
            mh = m - s
            if mh * n * itemsize > 32 * 1024 * 1024:
                # Sparse laswp: a composition of ws row swaps moves at
                # most 2*ws rows — gather+scatter only those instead of
                # the full (m-s) x n trailing block (full gathers are
                # O(n^3/w) traffic across panels; measured 3 ms of the
                # n=4096 factorization).  fill_value=0 padding is
                # harmless: every padded entry writes row perm[0]'s
                # correct value to row 0.
                (aff,) = jnp.nonzero(
                    perm_local != jnp.arange(mh, dtype=perm_local.dtype),
                    size=min(2 * ws, mh),
                    fill_value=0,
                )
                src = perm_local[aff]
                A = A.at[s + aff, :].set(A[s + src, :])
                perm = perm.at[s + aff].set(perm[s + src])
            else:
                # Small trailing block: one dense row gather beats the
                # scatter's fixed overhead.
                A = A.at[s:, :].set(jnp.take(A[s:, :], perm_local, axis=0))
                perm = perm.at[s:].set(jnp.take(perm[s:], perm_local))
        A = A.at[s:, s : s + ws].set(pf)

        if s + ws < n:
            L11_inv = unit_lower_inverse(pf[:ws, :ws])
            U12 = jnp.dot(
                L11_inv, A[s : s + ws, s + ws :],
                preferred_element_type=A.dtype, precision=FULL,
            )
            A = A.at[s : s + ws, s + ws :].set(U12)
            A = A.at[s + ws :, s + ws :].set(
                schur_update(
                    A[s + ws :, s + ws :],
                    A[s + ws :, s : s + ws],
                    U12,
                    schur_prec,
                )
            )
        s += ws

    return A, ipiv, perm, info

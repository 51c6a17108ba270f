"""Batched small-matrix LU — lane-batched Pallas kernels.

The reference escapes to the stdlib unblocked kernel for small matrices
(`min(m,n) < 10`, reference src/lu.jl:70) and relies on `@turbo` SIMD to
make small-n fast on CPU.  On TPU, small single matrices cannot feed the
MXU/VPU; the native win is **batching**.

Design (2nd generation; the 1st statically unrolled the pivot chain over
a (G, m, n) group, which exploded Mosaic compile time above G=32 and
wasted lanes on every (G, 1)-shaped per-matrix scalar):

* the batch lives on the LANE axis: each grid cell holds a
  ``(n, m, G)`` block — ``block[j, i, g] = A[g, i, j]`` — so the tile
  layout is (m sublanes, G lanes) with the column index untiled.  Every
  per-step quantity is ``(1, m, G)`` or ``(n, 1, G)``: all 128 lanes do
  useful work for G >= 128 matrices at once, and the pivot reductions
  run across sublanes.
* the elimination step is a ``lax.fori_loop`` (dynamic k), not a static
  unroll: compile time is one body trace regardless of n, enabling
  n up to 128 (BASELINE config 5) and large G.  Trailing-update
  confinement is replaced by column masks (``ci > k``) — more raw VPU
  flops than shrinking slices, but every op is a full-width vector op,
  which is the winning trade on TPU.
* two variants share the structure:
  - ``swap``  : LAPACK row interchanges via sublane masked selects;
    produces the exact ipiv swap sequence (ref src/lu.jl:289-307).
  - ``noswap``: rows eliminated in PHYSICAL order with a `used` mask;
    no swap passes (the dominant per-step cost), composed permutation
    applied as ONE gather by the caller.  Pivot ties break by physical
    row index, so on exact ties the chosen row can differ from
    LAPACK's; factors still satisfy ``L @ U == A[perm, :]``.

Zero-pivot semantics match the reference (no swap, no scale, rank-1
still runs, info records the first 1-based failure column,
ref src/lu.jl:299-319) — enforced per matrix with lane masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import is_tpu_backend, trace32

# matrices per grid cell (lanes-major: keep a multiple of 128).
# Measured on v5e at 10000x64x64 f32: G=128 12.4 ms, G=256 12.9 ms,
# G=512 12.9 ms (vs 172 ms for vmapped XLA lu) — the VPU is saturated
# from G=128 and smaller groups leave more scoped-VMEM headroom.
GROUP = 128


# Scoped-vmem budget for the batched kernel.  Mosaic's default limit is
# 16 MB but the physical VMEM on v5e is far larger; the pallas_call
# below raises the limit explicitly, so the group picker budgets
# against this (measured: G=256 at 64x64 needs 16.2 MB scoped).
BATCHED_VMEM_BUDGET = 48 * 1024 * 1024


def pick_group(m: int, n: int, itemsize: int, group: int = GROUP) -> int:
    """Largest group size <= ``group`` whose kernel working set fits the
    VMEM budget.  The working set is ~4x the (n, m, G) block: the
    aliased in/out block plus the masked-select/FMA temporaries of the
    step ops.  Returns 0 when even a 128-lane group does not fit
    (callers must fall back to the vmapped path)."""
    per = 4 * m * n * itemsize
    g = group
    while g >= 128 and g * per > BATCHED_VMEM_BUDGET:
        g //= 2
    return g if g >= 128 else 0


def _lane_kernel(a_ref, out_ref, piv_ref, perm_ref, info_ref, used_ref, *,
                 pivot: bool, swap: bool, col_chunks: int = 1,
                 track_perm: bool = False, unroll: int = 1):
    """Shared body of both variants. Refs:
    a/out  : (n, m, G)   column-major lane-batched block (aliased)
    piv    : (minmn, G)  pivot row per step (ipiv for swap, physical
                         pivot row = composed perm for noswap)
    perm   : (minmn, G)  composed permutation (swap + track_perm only;
                         otherwise left untouched)
    info   : (1, G)      reference info convention
    used   : (1, m, G)   f32 scratch: consumed-row mask (noswap) or the
                         running permutation (swap + track_perm)

    ``track_perm`` (swap only, square): maintain the composed
    permutation alongside the ipiv sequence with thin (1, m, G) ops per
    step — bitwise-identical to ``ipiv_to_perm(ipiv)`` (entries swap
    unconditionally on the *stored* pivot row, mirroring LAPACK's
    convention of recording IPIV even when the zero-pivot interchange
    is skipped) but without the sequential minmn-step post-hoc chain.

    ``col_chunks`` (noswap only): split the column axis of the U-row
    reduce + fused write into this many static chunks, each guarded by
    ``pl.when(k < chunk_end)``.  Without row swaps, columns j < k are
    final and untouched by step k, so trailing-only chunks skip — the
    dominant full-block passes shrink from n to ~(n - k) columns on
    average (~2x less VMEM traffic over the whole factorization), at
    the price of ``col_chunks``x more op issues per step.  1 = the
    original single full-block pass.  The swap variant cannot chunk:
    its row interchange touches every column including the finished
    L columns (LAPACK layout).
    """
    n, m, G = a_ref.shape
    minmn = min(m, n)
    out_ref[:, :, :] = a_ref[:, :, :]
    info_ref[0, :] = jnp.zeros((G,), jnp.int32)
    if not (swap and track_perm):
        # tiny deterministic fill so the unused perm output is never
        # read uninitialized
        perm_ref[:, :] = jnp.zeros((minmn, G), jnp.int32)
    if not swap:
        used_ref[:, :, :] = jnp.zeros((1, m, G), jnp.float32)
    elif track_perm:
        # int iota then cast — Mosaic's tpu.iota is integer-only
        used_ref[:, :, :] = lax.broadcasted_iota(
            jnp.int32, (1, m, G), 1
        ).astype(jnp.float32)

    ii = lax.broadcasted_iota(jnp.int32, (1, m, G), 1)   # row ids
    ci = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)   # column ids

    def body(k, _):
        # Per-step full-block traffic is the whole cost of this kernel
        # (every pass reads/writes the (n, m, G) block from VMEM), so
        # the step is organized to touch the block as few times as
        # possible: ONE row-kp extraction reduce (reused as the U row —
        # post-swap row k IS pre-swap row kp), one row-k reduce (swap
        # variant only), and ONE fused select-swap + scale-write +
        # rank-1-FMA pass.  The round-2 kernel spent 7 block passes per
        # step (2 swap reduces + 2 swap selects + swap write + a third
        # U-row reduce + FMA write); this spends 4 (swap) / 3 (noswap).
        chunked = (not swap) and col_chunks > 1
        col = out_ref[pl.ds(k, 1), :, :]                 # (1, m, G)
        if swap:
            avail = ii >= k
        else:
            avail = used_ref[:, :, :] < 0.5
        if pivot:
            abscol = jnp.where(avail, jnp.abs(col), -jnp.inf)
            maxv = jnp.max(abscol, axis=1, keepdims=True)     # (1, 1, G)
            kp = jnp.min(
                jnp.where(abscol == maxv, ii, m), axis=1, keepdims=True
            ).astype(jnp.int32)
            kp = jnp.minimum(kp, m - 1)                       # all-NaN guard
        else:
            # no pivoting: swap -> row k; noswap -> rows consumed in
            # physical order, so also row k
            kp = jnp.full((1, 1, G), k, jnp.int32)
        piv_ref[pl.ds(k, 1), :] = kp[0]

        is_kp = ii == kp                                      # (1, m, G)
        pivval = jnp.sum(jnp.where(is_kp, col, 0.0), axis=1,
                         keepdims=True)                       # (1, 1, G)
        nonzero = pivval != 0.0
        inv = jnp.where(nonzero, 1.0, 0.0) / jnp.where(nonzero, pivval, 1.0)

        if chunked:
            # chunked noswap: no full-block read here — the U-row
            # extraction happens per column chunk below
            used_ref[:, :, :] = (
                used_ref[:, :, :] + is_kp.astype(jnp.float32)
            )
            elim_rows = avail & jnp.logical_not(is_kp)
            blk = None
            swap_sel = lambda b: b
        elif not swap:
            blk = out_ref[:, :, :]
            rowkp = jnp.sum(jnp.where(is_kp, blk, 0.0), axis=1,
                            keepdims=True)                    # (n, 1, G)
            used_ref[:, :, :] = (
                used_ref[:, :, :] + is_kp.astype(jnp.float32)
            )
            elim_rows = avail & jnp.logical_not(is_kp)
            urow = rowkp
            swap_sel = lambda b: b
        else:
            blk = out_ref[:, :, :]
            # row kp — doubles as the U row when the swap is taken
            rowkp = jnp.sum(jnp.where(is_kp, blk, 0.0), axis=1,
                            keepdims=True)                    # (n, 1, G)
            # interchange rows k <-> kp across ALL columns (skipped on a
            # zero pivot, ref src/lu.jl:299-307), fused into the main
            # pass below
            do_swap = nonzero & (kp != k)                     # (1, 1, G)
            is_k = ii == k                                    # (1, m, G)
            # row k sits at a known (lane-uniform) sublane index, so a
            # thin dynamic slice replaces a full-block masked reduce —
            # one fewer (n, m, G) VMEM pass per step
            rowk = out_ref[:, pl.ds(k, 1), :]                 # (n, 1, G)
            if track_perm:
                # swap perm entries k <-> kp UNCONDITIONALLY (matches
                # ipiv_to_perm over the stored ipiv, incl. zero pivots)
                pcur = used_ref[:, :, :]                      # (1, m, G)
                pk = used_ref[:, pl.ds(k, 1), :]              # (1, 1, G)
                pkp = jnp.sum(jnp.where(is_kp, pcur, 0.0), axis=1,
                              keepdims=True)                  # (1, 1, G)
                used_ref[:, :, :] = jnp.where(
                    is_k, pkp, jnp.where(is_kp, pk, pcur)
                )
            # post-swap pivot column (cheap: (1, m, G) ops only)
            col_at_k = jnp.sum(jnp.where(is_k, col, 0.0), axis=1,
                               keepdims=True)                 # (1, 1, G)
            col = jnp.where(
                do_swap & is_k, pivval,
                jnp.where(do_swap & is_kp, col_at_k, col),
            )
            elim_rows = ii > k                                # L rows
            urow = jnp.where(do_swap, rowkp, rowk)            # (n, 1, G)
            swap_sel = lambda b: jnp.where(
                is_k & do_swap, rowkp, jnp.where(is_kp & do_swap, rowk, b)
            )

        # scaled pivot column (no scale on zero pivot, but the rank-1
        # still uses the raw values, ref src/lu.jl:309-326)
        newcol = jnp.where(elim_rows & nonzero, col * inv, col)
        lcol = jnp.where(elim_rows & nonzero, col * inv,
                         jnp.where(elim_rows, col, 0.0))      # (1, m, G)

        info = info_ref[0, :]
        nz1 = nonzero[0, 0, :]
        info_ref[0, :] = jnp.where(
            (~nz1) & (info == 0),
            (k + 1) if pivot else -(k + 1),
            info,
        )

        if chunked:
            # per-chunk U-row extraction + fused write; trailing-only
            # chunks (q1 <= k: every column already final) skip
            nc = -(-n // col_chunks)
            for q0 in range(0, n, nc):
                q1 = min(q0 + nc, n)
                ci_q = (
                    lax.broadcasted_iota(jnp.int32, (q1 - q0, 1, 1), 0)
                    + q0
                )

                @pl.when(k < q1)
                def _chunk(q0=q0, q1=q1, ci_q=ci_q):
                    blk_q = out_ref[q0:q1, :, :]
                    rowkp_q = jnp.sum(
                        jnp.where(is_kp, blk_q, 0.0), axis=1, keepdims=True
                    )
                    urow_q = jnp.where(ci_q > k, rowkp_q, 0.0)
                    out_ref[q0:q1, :, :] = jnp.where(
                        ci_q == k, newcol, blk_q - urow_q * lcol
                    )
        else:
            urow = jnp.where(ci > k, urow, 0.0)
            # ONE fused pass: swap-select, rank-1 FMA, pivot-column write
            out_ref[:, :, :] = jnp.where(
                ci == k, newcol, swap_sel(blk) - urow * lcol
            )
        return 0

    # `unroll` packs u consecutive steps per fori iteration (identical
    # program order — bitwise-equal results): at n <= 64 the kernel is
    # per-step issue-latency bound (docs/ROUND3.md §5), so amortizing
    # the loop bookkeeping is the same lever as the panel kernels'
    # `panel_unroll`; the leftover minmn % u steps run statically.
    ub = unroll if unroll > 1 else 1
    if ub > 1:
        main = (minmn // ub) * ub

        def body_u(j, _):
            for t in range(ub):
                body(j * ub + t, 0)
            return 0

        lax.fori_loop(0, minmn // ub, body_u, 0)
        for k in range(main, minmn):
            body(jnp.int32(k), 0)
    else:
        lax.fori_loop(0, minmn, body, 0)
    if swap and track_perm:
        # (1, m, G) -> (m, G): drop the singleton major dim (layout-
        # preserving) and cast the exactly-representable row indices
        perm_ref[:, :] = used_ref[:, :, :].reshape(m, G).astype(jnp.int32)


@trace32
def _call_lane_kernel(A: jax.Array, pivot: bool, swap: bool,
                      interpret, group: int, col_chunks: int = 1,
                      track_perm: bool = False, unroll: int = 1):
    """Pad/transpose to the lane-batched layout and run the kernel.
    ``A``: (B, m, n).  Returns (out (n, m, Bp), piv (minmn, Bp),
    perm (minmn, Bp) (garbage unless ``track_perm``), info (1, Bp),
    Bp)."""
    B, m, n = A.shape
    minmn = min(m, n)
    if interpret is None:
        interpret = not is_tpu_backend()
    picked = pick_group(m, n, jnp.dtype(A.dtype).itemsize, group)
    if picked == 0 and not interpret:
        # A silent clamp here would compile anyway and die inside Mosaic
        # with an opaque scoped-vmem error; fail with an actionable one.
        raise ValueError(
            f"batched Pallas kernel working set for ({m}, {n}) matrices "
            f"exceeds the VMEM budget ({BATCHED_VMEM_BUDGET >> 20} MiB) "
            "even at the minimum 128-lane group; use the vmapped path "
            "(batched_lu_factor routes there automatically)"
        )
    G = min(group, max(picked, 128))
    pad = (-B) % G
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, n, dtype=A.dtype), (pad, m, n))
        A = jnp.concatenate([A, eye], axis=0)
    Bp = B + pad
    nb = Bp // G

    At = jnp.transpose(A, (2, 1, 0))  # (n, m, Bp)
    if col_chunks > 1 and swap:
        raise ValueError("col_chunks applies to the noswap kernel only")
    if track_perm and (not swap or m != n):
        raise ValueError("track_perm requires the swap kernel and square "
                         "matrices")
    kernel = functools.partial(_lane_kernel, pivot=pivot, swap=swap,
                               col_chunks=col_chunks, track_perm=track_perm,
                               unroll=unroll)
    # The Mosaic DEFAULT scoped-vmem limit is 16 MB; the physical VMEM
    # on v5e is far larger, and bigger groups amortize per-op issue
    # overhead, so raise the limit to fit the (n, m, G) block plus the
    # step ops' select/FMA temporaries (~4x block; the swap variant's
    # full-width row selects need more headroom).
    mult = 7 if swap else 5
    # +4 MB fixed headroom: the multiplier models the block-proportional
    # temporaries only, and Mosaic's stack allocation runs a few hundred
    # KB past it (measured: noswap at 128x128/G=128 needs 40.27 MB
    # against the 40 MB the bare multiplier predicts).
    vmem_limit = min(100 * 1024 * 1024,
                     max(mult * G * m * n * 4 + (4 << 20), 1 << 24))
    out, piv, perm, info = pl.pallas_call(
        kernel,
        grid=(nb,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, m, Bp), A.dtype),
            jax.ShapeDtypeStruct((minmn, Bp), jnp.int32),
            jax.ShapeDtypeStruct((minmn, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((n, m, G), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((n, m, G), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((minmn, G), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((minmn, G), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, m, G), jnp.float32)],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(At)
    return out, piv, perm, info, B


@functools.partial(
    jax.jit,
    static_argnames=("pivot", "interpret", "group", "with_perm", "unroll"),
)
def batched_lu_pallas(
    A: jax.Array,
    pivot: bool = True,
    interpret=None,
    group: int = GROUP,
    with_perm: bool = True,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Factor a batch ``A`` of shape (B, m, n) with exact LAPACK swap
    semantics.  Returns ``(factors (B,m,n), ipiv (B,minmn),
    perm (B,m), info (B,))``.  B is padded internally to a multiple of
    the group size with identity matrices.

    ``with_perm=False`` returns ``perm=None`` and skips the permutation
    bookkeeping entirely; callers that only need ipiv
    (e.g. ``batched_lu_factor``) should not pay for it.  With
    ``with_perm=True`` and square matrices, the permutation is tracked
    in-kernel with thin per-step ops (bitwise-equal to
    ``ipiv_to_perm(ipiv)`` but without its sequential post-hoc chain);
    rectangular batches fall back to composing from ipiv.
    """
    B, m, n = A.shape
    track = with_perm and m == n
    out, piv, perm, info, B = _call_lane_kernel(
        A, pivot, True, interpret, group, track_perm=track, unroll=unroll
    )
    factors = jnp.transpose(out, (2, 1, 0))[:B]
    ipiv = jnp.transpose(piv, (1, 0))[:B]
    info = info[0, :B]
    if not with_perm:
        return factors, ipiv, None, info
    if track:
        perm = jnp.transpose(perm, (1, 0))[:B]
        return factors, ipiv, perm, info
    from ..utils.perm import ipiv_to_perm

    perm = jax.vmap(lambda p: ipiv_to_perm(p, m))(ipiv)
    return factors, ipiv, perm, info


def _lane_solve_kernel(f_ref, b_ref, x_ref, *, unroll: int = 1):
    """Lane-batched forward+backward substitution (VERDICT r4 item 5).

    Refs: ``f`` (n, n, G) — the factor block in the same column-major
    lane-batched layout as :func:`_lane_kernel`'s output
    (``f[j, i, g] = F[g, i, j]``); ``b``/``x`` (nrhs, n, G) — the
    already-permuted right-hand sides (aliased in/out).

    Solves ``L y = b`` (unit lower, forward) then ``U x = y`` (upper,
    backward) IN ONE kernel call.  Per step the work is two thin
    (nrhs, n, G)/(1, n, G) passes — a column extraction (a sublane
    dynamic slice, free of full-block traffic) and one fused
    select/FMA — so the whole solve reads the factor block exactly
    twice (once per sweep), which is the speed-of-light for
    substitution.  A zero U diagonal produces inf/nan in the affected
    lane only (LAPACK getrs behavior; callers gate on info from the
    factorization, ref src/lu.jl:120)."""
    n = f_ref.shape[0]
    G = f_ref.shape[2]
    ii = lax.broadcasted_iota(jnp.int32, (1, n, G), 1)  # row ids
    x_ref[...] = b_ref[...]

    def fwd(k, _):
        col = f_ref[pl.ds(k, 1), :, :]                 # (1, n, G)
        is_k = ii == k
        yk = jnp.sum(jnp.where(is_k, x_ref[...], 0.0), axis=1,
                     keepdims=True)                    # (nrhs, 1, G)
        lcol = jnp.where(ii > k, col, 0.0)
        x_ref[...] = x_ref[...] - lcol * yk
        return 0

    def bwd(t, _):
        k = n - 1 - t
        col = f_ref[pl.ds(k, 1), :, :]
        is_k = ii == k
        ukk = jnp.sum(jnp.where(is_k, col, 0.0), axis=1,
                      keepdims=True)                   # (1, 1, G)
        rk = jnp.sum(jnp.where(is_k, x_ref[...], 0.0), axis=1,
                     keepdims=True)
        xk = rk / ukk
        ucol = jnp.where(ii < k, col, 0.0)
        x_ref[...] = jnp.where(is_k, xk, x_ref[...] - ucol * xk)
        return 0

    for loop in (fwd, bwd):
        ub = unroll if unroll > 1 else 1
        if ub > 1:
            main = (n // ub) * ub

            def body_u(j, _, loop=loop):
                for t in range(ub):
                    loop(j * ub + t, 0)
                return 0

            lax.fori_loop(0, n // ub, body_u, 0)
            for k in range(main, n):
                loop(jnp.int32(k), 0)
        else:
            lax.fori_loop(0, n, loop, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "group", "unroll")
)
@trace32
def batched_solve_pallas(
    factors: jax.Array,
    b: jax.Array,
    interpret=None,
    group: int = GROUP,
    unroll: int = 2,
) -> jax.Array:
    """Lane-batched triangular solve: ``factors`` (B, n, n) packed LU
    (from any batched factor path), ``b`` (B, n) or (B, n, k) right-hand
    sides ALREADY in pivoted order (callers apply the permutation
    gather; see ``parallel/batched.py`` routing).  Returns x with b's
    shape.  f32/TPU-targeted; interpret-mode runs anywhere."""
    B, n, n2 = factors.shape
    if n != n2:
        raise ValueError("batched_solve_pallas requires square factors")
    if interpret is None:
        interpret = not is_tpu_backend()
    vec = b.ndim == 2
    Bb = b[:, :, None] if vec else b
    nrhs = Bb.shape[2]
    # working set: factor block + rhs block + thin temporaries
    per = (n * n + 3 * nrhs * n) * jnp.dtype(factors.dtype).itemsize
    g = group
    while g >= 128 and g * per * 2 > BATCHED_VMEM_BUDGET:
        g //= 2
    if g < 128 and not interpret:
        raise ValueError(
            f"batched solve kernel working set for n={n}, nrhs={nrhs} "
            "exceeds the VMEM budget; use the vmapped path"
        )
    G = min(group, max(g, 128))
    pad = (-B) % G
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=factors.dtype), (pad, n, n)
        )
        factors = jnp.concatenate([factors, eye], axis=0)
        Bb = jnp.concatenate(
            [Bb, jnp.zeros((pad, n, nrhs), Bb.dtype)], axis=0
        )
    Bp = B + pad
    nb = Bp // G
    Ft = jnp.transpose(factors, (2, 1, 0))            # (n, n, Bp)
    bt = jnp.transpose(Bb, (2, 1, 0)).astype(factors.dtype)  # (nrhs, n, Bp)
    kernel = functools.partial(_lane_solve_kernel, unroll=unroll)
    vmem_limit = min(100 * 1024 * 1024,
                     max(3 * G * per, 1 << 24))
    x = pl.pallas_call(
        kernel,
        grid=(nb,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)
        ),
        out_shape=jax.ShapeDtypeStruct((nrhs, n, Bp), factors.dtype),
        in_specs=[
            pl.BlockSpec((n, n, G), lambda b_: (0, 0, b_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, n, G), lambda b_: (0, 0, b_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrhs, n, G), lambda b_: (0, 0, b_),
                               memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(Ft, bt)
    x = jnp.transpose(x, (2, 1, 0))[:B]               # (B, n, nrhs)
    return x[:, :, 0] if vec else x


@functools.partial(
    jax.jit,
    static_argnames=("pivot", "interpret", "group", "col_chunks", "unroll"),
)
def batched_lu_pallas_noswap(
    A: jax.Array, pivot: bool = True, interpret=None, group: int = GROUP,
    col_chunks: int = 1, unroll: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """No-swap batched LU for square matrices: returns
    ``(factors (B,n,n), perm (B,n), info (B,))`` with
    ``L @ U == A[perm, :]``.  Faster than :func:`batched_lu_pallas`
    (no per-step swap passes) but does not produce a LAPACK ipiv
    sequence and breaks pivot ties by physical row index.
    ``col_chunks`` > 1 skips finished-column chunks per step (see
    :func:`_lane_kernel`).
    """
    B, m, n = A.shape
    if m != n:
        raise ValueError("batched_lu_pallas_noswap requires square matrices")
    out, prow, _perm, info, B = _call_lane_kernel(
        A, pivot, False, interpret, group, col_chunks, unroll=unroll
    )
    phys = jnp.transpose(out, (2, 1, 0))[:B]       # (B, m, n) physical order
    perm = jnp.transpose(prow, (1, 0))[:B]         # (B, n)
    info = info[0, :B]
    # ONE gather puts rows into logical (pivot) order
    factors = jnp.take_along_axis(phys, perm[:, :, None], axis=1)
    return factors, perm, info

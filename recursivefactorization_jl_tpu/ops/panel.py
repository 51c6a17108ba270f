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

from ..utils.config import (
    FORI_VMEM_BUDGET_BYTES,
    LUConfig,
    is_tpu_backend,
    trace32,
)
from .unblocked import unblocked_lu


def _use_pallas(dtype, config: LUConfig, tpu=None) -> bool:
    """``tpu`` overrides backend detection (routing tests pin the TPU
    decision from a CPU session; None -> detect)."""
    if config.backend == "xla":
        return False
    if config.backend == "pallas":
        return True
    if tpu is None:
        tpu = is_tpu_backend()
    return tpu and dtype == jnp.dtype(jnp.float32)


def _use_pallas_c64(dtype, config: LUConfig, tpu=None) -> bool:
    """Split-plane complex64 kernel gate: TPU + c64 + a fori variant
    (the only c64 kernel class — round 5)."""
    if config.backend == "xla":
        return False
    if dtype != jnp.dtype(jnp.complex64):
        return False
    if not config.panel_variant.startswith("fori"):
        return False
    if config.backend == "pallas":
        return True
    if tpu is None:
        tpu = is_tpu_backend()
    return tpu


def panel_route(m: int, w: int, dtype, config: LUConfig, tpu=None) -> str:
    """Pure trace-time routing of a panel-kernel call on an (m, w)
    block (unit-testable; :func:`panel_factor` executes exactly this).

    * ``"split"``    — panel wider than ``inner_panel_width`` and not
      fori-direct: factored as a blocked schedule of sub-panels (the
      static-unroll kernels cap at ``inner`` width — Mosaic program
      size grows linearly with the unrolled pivot chain);
    * ``"pallas"``   — one Pallas kernel call (``config.panel_variant``);
      fori variants take ANY width directly while the whole panel fits
      the fori VMEM footprint (~3x panel bytes: aliased in/out +
      (micro+1, m) shadow);
    * ``"pallas-c64"`` — split-plane complex64 fori kernel (round 5);
    * ``"unblocked"`` — masked pure-JAX loop (non-Pallas backends).
    """
    dtype = jnp.dtype(dtype)
    inner = config.inner_panel_width
    c64 = _use_pallas_c64(dtype, config, tpu)
    fori_direct = (
        config.panel_variant.startswith("fori")
        and (_use_pallas(dtype, config, tpu) or c64)
        and 3 * m * w * dtype.itemsize <= FORI_VMEM_BUDGET_BYTES
    )
    if min(m, w) > inner and not fori_direct:
        return "split"
    if c64:
        return "pallas-c64"
    if _use_pallas(dtype, config, tpu):
        return "pallas"
    return "unblocked"


def panel_factor(
    panel: jax.Array, pivot: bool, config: LUConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Factor a tall panel (m x w). Returns ``(factors, piv_local,
    perm_local, info_local)`` with 0-based panel-local pivot rows, the
    composed panel-local row permutation, and 1-based (sign-carrying)
    panel-local info.

    Two-level blocking: a panel wider than ``config.inner_panel_width``
    is itself factored as a blocked schedule over sub-panels, so the
    sequential VPU-bound pivot chain only runs at the inner width and
    the rest of the panel's O(m*w^2) work rides the MXU as TRSM/Schur
    matmuls (the reference's recursion-to-blocksize analog,
    src/lu.jl:97,184-186)."""
    m, w = panel.shape
    route = panel_route(m, w, panel.dtype, config)
    if route == "split":
        from .blocked import blocked_lu  # deferred: avoids import cycle

        import dataclasses

        sub = dataclasses.replace(
            config, panel_width=config.inner_panel_width
        )
        return blocked_lu(panel, pivot, sub)
    if route == "pallas":
        # 'auto' still unresolved here only for direct callers (the
        # dispatch and blocked layers resolve against the full
        # factorization's min dim); min(m, w) IS that dim for a
        # whole-matrix call, the only direct-call shape that matters.
        return panel_factor_pallas(
            panel,
            pivot,
            micro=config.resolved_panel_micro(m, w),
            variant=config.panel_variant,
            outer=config.panel_outer,
            unroll=config.panel_unroll,
            bprec=config.resolved_panel_boundary_precision(
                min(m, w), panel.dtype
            ),
        )
    if route == "pallas-c64":
        return panel_factor_pallas_c64(
            panel,
            pivot,
            micro=config.resolved_panel_micro(m, w),
            unroll=config.panel_unroll,
        )
    return unblocked_lu(panel, pivot)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _panel_kernel(
    a_ref, out_ref, piv_ref, perm_ref, info_ref, *, pivot: bool, micro: int
):
    # The panel is factored IN PLACE: the pallas_call aliases the input
    # with the factors output (input_output_aliases), halving the
    # kernel's VMEM footprint — the binding constraint on panel width
    # for tall panels (a 4096x256 f32 panel is 4 MiB; VMEM is ~16 MiB).
    # a_ref and out_ref are the same buffer on TPU; the copy below is a
    # self-copy there and the real initialization in interpret mode.
    #
    # micro: width of the in-kernel blocking — rank-1 updates are
    # confined to the current micro-panel, and a delayed rank-`micro`
    # update (one MXU matmul) hits the trailing columns at each
    # micro-panel boundary, cutting the VPU work on the serial pivot
    # chain from O(m*w) to O(m*micro) per step.  micro >= w disables it.
    _MICRO = micro
    m, w = out_ref.shape
    minmn = min(m, w)
    out_ref[:, :] = a_ref[:, :]
    info_ref[0] = 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    # Composed row permutation, maintained alongside the swaps so callers
    # never recompose it from ipiv (a sequential m-step scalar chain).
    perm_ref[:, :] = rows

    for k in range(minmn):  # static unroll: lane indices stay static
        p0 = (k // _MICRO) * _MICRO          # current micro-panel start
        p1 = min(p0 + _MICRO, minmn)         # current micro-panel end

        if k == p0 and k > 0:
            # Micro-panel boundary: bring columns [p0:w) up to date with
            # the just-finished block [q0:p0).
            q0 = p0 - _MICRO
            # (a) unit-lower TRSM of the U-block rows [q0:p0) x [p0:w)
            #     as _MICRO sequential row eliminations (tiny VPU work);
            for i in range(q0, p0 - 1):
                lcol = out_ref[i + 1 : p0, i].reshape(p0 - i - 1, 1)
                urow = out_ref[i, p0:].reshape(1, w - p0)
                out_ref[i + 1 : p0, p0:] -= lcol * urow
            # (b) rank-_MICRO Schur update of rows [p0:) on the MXU.
            Lb = out_ref[p0:, q0:p0]           # (m-p0, _MICRO)
            Ub = out_ref[q0:p0, p0:]           # (_MICRO, w-p0)
            out_ref[p0:, p0:] -= jnp.dot(
                Lb, Ub, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )

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
                permkp = perm_ref[pl.ds(kp, 1), :]
                permk = perm_ref[k, :].reshape(1, 1)
                perm_ref[k, :] = permkp[0, :]
                perm_ref[pl.ds(kp, 1), :] = permk

        @pl.when(nonzero)
        def _scale(k=k, pivval=pivval):
            c = out_ref[:, k].reshape(m, 1)
            out_ref[:, k] = jnp.where(rows > k, c * (1.0 / pivval), c)[:, 0]

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info(k=k):
            info_ref[0] = (k + 1) if pivot else -(k + 1)

        if k + 1 < p1 and k + 1 < m:
            # Rank-1 update confined to the micro-panel columns.
            lcol = out_ref[k + 1 :, k].reshape(m - k - 1, 1)
            urow = out_ref[k, k + 1 : p1].reshape(1, p1 - k - 1)
            out_ref[k + 1 :, k + 1 : p1] -= lcol * urow

    # Final catch-up: if w > minmn (fat panel), the last micro block must
    # still be applied to the trailing columns [minmn:w).
    if w > minmn:
        q0 = ((minmn - 1) // _MICRO) * _MICRO
        for i in range(q0, minmn - 1):
            lcol = out_ref[i + 1 : minmn, i].reshape(minmn - i - 1, 1)
            urow = out_ref[i, minmn:].reshape(1, w - minmn)
            out_ref[i + 1 : minmn, minmn:] -= lcol * urow
        if minmn < m and q0 < minmn:
            Lb = out_ref[minmn:, q0:minmn]
            Ub = out_ref[q0:minmn, minmn:]
            out_ref[minmn:, minmn:] -= jnp.dot(
                Lb, Ub, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )


def _panel_kernel_shadow(
    a_ref,
    out_ref,
    piv_ref,
    perm_ref,
    info_ref,
    sh_ref,
    *,
    pivot: bool,
    micro: int,
):
    """Shadow-transposed panel kernel.

    Same algorithm as :func:`_panel_kernel`, but the CURRENT micro-panel
    lives transposed in a (micro, m) VMEM scratch (``sh_ref``): logical
    column p0+r of the panel is shadow ROW r.  On TPU a column is laid
    out (m, 1) — ONE lane of 128 — so every per-step op of the serial
    pivot chain (abs/mask, max-reduce, index-reduce, scale) wastes 99%
    of the VPU; as shadow rows they are (1, m) — fully lane-parallel.
    Row swaps still hit ``out_ref`` (dynamic sublane indexing, which
    Mosaic supports) while the shadow swaps lanes with masked selects
    (dynamic *lane* indexing is not supported, but masks are cheap at
    (micro, m)).  The micro block transposes back into ``out_ref`` at
    each boundary, where the delayed TRSM + rank-micro MXU Schur update
    brings the trailing columns up to date.
    """
    m, w = out_ref.shape
    minmn = min(m, w)
    out_ref[:, :] = a_ref[:, :]
    info_ref[0] = 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    perm_ref[:, :] = rows

    def writeback(q0, q1):
        out_ref[:, q0:q1] = jnp.transpose(sh_ref[: q1 - q0, :])

    def load_shadow(q0, q1):
        sh_ref[: q1 - q0, :] = jnp.transpose(out_ref[:, q0:q1])

    def boundary_update(q0, p0):
        # (a) unit-lower TRSM of U-block rows [q0:p0) x cols [p0:w)
        for i in range(q0, p0 - 1):
            lcol = out_ref[i + 1 : p0, i].reshape(p0 - i - 1, 1)
            urow = out_ref[i, p0:].reshape(1, w - p0)
            out_ref[i + 1 : p0, p0:] -= lcol * urow
        # (b) rank-(p0-q0) Schur update of rows [p0:) on the MXU
        Lb = out_ref[p0:, q0:p0]
        Ub = out_ref[q0:p0, p0:]
        out_ref[p0:, p0:] -= jnp.dot(Lb, Ub, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    for k in range(minmn):
        p0 = (k // micro) * micro
        p1 = min(p0 + micro, minmn)
        r = k - p0

        if k == p0:
            if k > 0:
                writeback(p0 - micro, p0)
                boundary_update(p0 - micro, p0)
            load_shadow(p0, p1)

        rowr = sh_ref[r, :].reshape(1, m)  # logical column k, lane-major
        if pivot:
            absrow = jnp.where(lanes >= k, jnp.abs(rowr), -jnp.inf)
            maxv = jnp.max(absrow)
            kp = jnp.min(jnp.where(absrow == maxv, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            kp = jnp.int32(k)
        piv_ref[k] = kp

        # value at lane kp of shadow row r (dynamic-lane read via reduce)
        pivval = jnp.sum(jnp.where(lanes == kp, rowr, 0.0))
        nonzero = pivval != 0.0

        if pivot:

            @pl.when(nonzero & (kp != k))
            def _swap(k=k, kp=kp, p0=p0, p1=p1):
                # out_ref: full-width row swap (micro cols are stale but
                # swap-consistent; the shadow writeback overwrites them)
                rowkp = out_ref[pl.ds(kp, 1), :]
                rowk = out_ref[k, :].reshape(1, w)
                out_ref[k, :] = rowkp[0, :]
                out_ref[pl.ds(kp, 1), :] = rowk
                permkp = perm_ref[pl.ds(kp, 1), :]
                permk = perm_ref[k, :].reshape(1, 1)
                perm_ref[k, :] = permkp[0, :]
                perm_ref[pl.ds(kp, 1), :] = permk
                # shadow: swap lanes k <-> kp with masked selects
                nb = p1 - p0
                sh = sh_ref[:nb, :]
                colk = sh[:, k].reshape(nb, 1)
                colkp = jnp.sum(
                    jnp.where(lanes[:, :] == kp, sh, 0.0),
                    axis=1,
                    keepdims=True,
                )
                sh = jnp.where(lanes == kp, colk, sh)
                sh_ref[:nb, :] = sh
                sh_ref[:nb, k] = colkp[:, 0]

        @pl.when(nonzero)
        def _scale(k=k, r=r, pivval=pivval):
            rr = sh_ref[r, :].reshape(1, m)
            sh_ref[r, :] = jnp.where(lanes > k, rr * (1.0 / pivval), rr)[
                0, :
            ]

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info(k=k):
            info_ref[0] = (k + 1) if pivot else -(k + 1)

        if r + 1 < p1 - p0:
            # rank-1 update of the remaining micro-panel columns
            # (shadow rows r+1..): sh[j, :] -= u_j * masked L-row
            nrem = (p1 - p0) - (r + 1)
            lrow = jnp.where(
                lanes > k, sh_ref[r, :].reshape(1, m), 0.0
            )
            u = sh_ref[r + 1 : p1 - p0, k].reshape(nrem, 1)
            sh_ref[r + 1 : p1 - p0, :] -= u * lrow

    # write back the final micro block
    lastq0 = ((minmn - 1) // micro) * micro
    writeback(lastq0, minmn)

    # fat panel: bring trailing columns [minmn:w) up to date with the
    # last block
    if w > minmn:
        for i in range(lastq0, minmn - 1):
            lcol = out_ref[i + 1 : minmn, i].reshape(minmn - i - 1, 1)
            urow = out_ref[i, minmn:].reshape(1, w - minmn)
            out_ref[i + 1 : minmn, minmn:] -= lcol * urow
        if minmn < m and lastq0 < minmn:
            Lb = out_ref[minmn:, lastq0:minmn]
            Ub = out_ref[lastq0:minmn, minmn:]
            out_ref[minmn:, minmn:] -= jnp.dot(
                Lb, Ub, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )


def _panel_kernel_fori(
    a_ref,
    out_ref,
    piv_ref,
    perm_ref,
    info_ref,
    sh_ref,
    inv_ref,
    *,
    pivot: bool,
    micro: int,
    slim: bool = False,
    outer=None,
    unroll: int = 1,
    bprec: str = "float32",
):
    """fori-loop shadow panel kernel — scales to WHOLE-MATRIX LU.

    Same algorithm as :func:`_panel_kernel_shadow` (current micro-panel
    transposed in VMEM so the serial pivot chain is lane-parallel), but
    the per-block elimination steps run in a ``lax.fori_loop`` with a
    dynamic step index instead of a static unroll.  Dynamic indices only
    ever touch the SUBLANE dimension (``pl.ds`` row reads/writes) or
    appear inside lane masks — both Mosaic-supported — while every LANE
    slice (shadow load/writeback, TRSM, Schur boundaries) sits in the
    static Python loop over micro-blocks.  Program size is therefore
    O(minmn / micro) traced blocks instead of O(minmn) unrolled steps,
    which makes panels of width 1024-2048 (and whole n<=2048 matrices,
    16 MiB f32 — VMEM-resident) compile: the round-2 static kernels
    were capped near w=256 by Mosaic program size.  Eliminating the
    per-panel dispatch + HBM round-trips of the blocked schedule is the
    reference's own small-matrix story (recursion bottoming out into a
    cache-resident kernel, ref src/lu.jl:85-155) re-played at VMEM
    scale.

    Two further deviations from the static shadow kernel:

    * the composed row permutation is carried as ONE EXTRA SHADOW ROW
      (f32 row ids — exact below 2^24): the per-step lane-swap select
      pass updates it together with the data rows at zero extra ops;
    * each micro boundary solves the (nb, nb) unit-lower TRSM by the
      nilpotent repeated-squaring inverse (exact polynomial in N =
      strict-lower block, log2(nb) tiny matmuls — the same scheme the
      noswap kernel uses) instead of nb-1 sequential row eliminations,
      then brings the trailing columns up to date with two MXU matmuls.
    """
    m, w = out_ref.shape
    minmn = min(m, w)
    f32 = jnp.float32
    out_ref[:, :] = a_ref[:, :]
    info_ref[0] = 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    nsh = sh_ref.shape[0]  # micro + 1 (last row carries the perm)
    subs = jax.lax.broadcasted_iota(jnp.int32, (nsh, 1), 0)
    sh_ref[nsh - 1, :] = lanes[0, :].astype(f32)

    hi = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=hi)

    # boundary-update precision (LUConfig.panel_boundary_precision):
    # the TRSM applies + rank-micro/outer Schur may run 3-pass bf16x3;
    # the micro-block inverse below always stays HIGHEST.  Mosaic does
    # not lower Precision.HIGH inside kernels ("Unsupported dot
    # precision: HIGH" on chip, measured r5), so the 3-pass split is
    # built by hand: a = ah + al with ah = bf16(a), al = bf16(a - ah);
    # a@b ~= ah@bh + ah@bl + al@bh (the al@bl term is below 2^-21 and
    # dropped, exactly XLA's HIGH).  Each bf16xbf16->f32 dot is one MXU
    # pass vs HIGHEST's six.
    if bprec == "bf16x3":

        def mmb(a, b):
            bf = jnp.bfloat16
            ah = a.astype(bf)
            al = (a - ah.astype(f32)).astype(bf)
            bh = b.astype(bf)
            bl = (b - bh.astype(f32)).astype(bf)

            def d(x, y):
                # precision pinned to DEFAULT: the package's
                # full_matmul_precision context would otherwise promote
                # these bf16 dots to HIGHEST -> fp32 contract precision
                # on bf16 operands, which Mosaic rejects ("Bad lhs
                # type", measured r5).  DEFAULT on bf16 inputs is the
                # single MXU pass the split wants.
                return jnp.dot(x, y, preferred_element_type=f32,
                               precision=jax.lax.Precision.DEFAULT)

            return d(ah, bh) + (d(ah, bl) + d(al, bh))
    else:
        mmb = mm

    def step_basic(i, carry, p0, nb):
        k = p0 + i
        rowr = sh_ref[pl.ds(i, 1), :]  # logical column k, lane-major
        if pivot:
            absrow = jnp.where(lanes >= k, jnp.abs(rowr), -jnp.inf)
            maxv = jnp.max(absrow)
            kp = jnp.min(jnp.where(absrow == maxv, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            kp = jnp.asarray(k, jnp.int32)
        piv_ref[k] = kp
        is_kp = lanes == kp
        pivval = jnp.sum(jnp.where(is_kp, rowr, 0.0))
        nonzero = pivval != 0.0

        if pivot:

            @pl.when(nonzero & (kp != k))
            def _swap():
                # main buffer: full-width row interchange (the panel
                # columns are stale there; writeback overwrites them)
                rk = out_ref[pl.ds(k, 1), :]
                rkp = out_ref[pl.ds(kp, 1), :]
                out_ref[pl.ds(k, 1), :] = rkp
                out_ref[pl.ds(kp, 1), :] = rk
                # shadow (+ perm row, rows beyond nb are stale but
                # harmless): swap lanes k <-> kp via masked selects
                sh = sh_ref[:, :]
                is_k = lanes == k
                ck = jnp.sum(jnp.where(is_k, sh, 0.0), axis=1,
                             keepdims=True)
                ckp = jnp.sum(jnp.where(is_kp, sh, 0.0), axis=1,
                              keepdims=True)
                sh = jnp.where(is_k, ckp, sh)
                sh_ref[:, :] = jnp.where(is_kp, ck, sh)

        # scale row i (post-swap value), zero-pivot -> no scale but
        # the rank-1 below still uses the raw values
        # (ref src/lu.jl:299-326)
        rr = sh_ref[pl.ds(i, 1), :]
        psafe = jnp.where(nonzero, pivval, 1.0)
        rr = jnp.where((lanes > k) & nonzero, rr * (1.0 / psafe), rr)
        sh_ref[pl.ds(i, 1), :] = rr

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info():
            val = (k + 1) if pivot else -(k + 1)
            info_ref[0] = jnp.asarray(val, jnp.int32)

        # rank-1 update of the remaining shadow rows (masked to
        # (i, nb): stale rows and the perm row are excluded)
        sh = sh_ref[:, :]
        u = jnp.sum(jnp.where(lanes == k, sh, 0.0), axis=1,
                    keepdims=True)
        lrow = jnp.where(lanes > k, rr, 0.0)
        rmask = (subs > i) & (subs < nb)
        sh_ref[:, :] = sh - jnp.where(rmask, u, 0.0) * lrow
        return carry

    def step_slim(i, carry, p0, nb):
        # Slimmed step: the whole-block work collapses to TWO column
        # reduces + ONE fused read-modify-write pass.  Key identities:
        # the post-swap lane-k column equals the pre-swap lane-kp
        # column (so the rank-1 multipliers u never need a third
        # reduce), and the swap-select, row-i scale-write and rank-1
        # FMA commute into a single element-wise select chain.
        k = p0 + i
        rowr = sh_ref[pl.ds(i, 1), :]
        if pivot:
            absrow = jnp.where(lanes >= k, jnp.abs(rowr), -jnp.inf)
            maxv = jnp.max(absrow)
            kp = jnp.min(jnp.where(absrow == maxv, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            kp = jnp.asarray(k, jnp.int32)
        piv_ref[k] = kp
        is_kp_l = lanes == kp
        is_k_l = lanes == k
        pivval = jnp.sum(jnp.where(is_kp_l, rowr, 0.0))
        rk_val = jnp.sum(jnp.where(is_k_l, rowr, 0.0))
        nonzero = pivval != 0.0
        do_swap = nonzero & (kp != k) if pivot else jnp.asarray(False)

        if pivot:

            @pl.when(do_swap)
            def _swap_main():
                rk = out_ref[pl.ds(k, 1), :]
                rkp = out_ref[pl.ds(kp, 1), :]
                out_ref[pl.ds(k, 1), :] = rkp
                out_ref[pl.ds(kp, 1), :] = rk

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info():
            val = (k + 1) if pivot else -(k + 1)
            info_ref[0] = jnp.asarray(val, jnp.int32)

        # post-swap scaled row i, in registers ((1, m) ops only)
        rr = rowr
        if pivot:
            rr = jnp.where(
                do_swap & is_k_l, pivval,
                jnp.where(do_swap & is_kp_l, rk_val, rowr),
            )
        psafe = jnp.where(nonzero, pivval, 1.0)
        rr = jnp.where((lanes > k) & nonzero, rr * (1.0 / psafe), rr)
        lrow = jnp.where(lanes > k, rr, 0.0)

        sh = sh_ref[:, :]
        colk = jnp.sum(jnp.where(is_k_l, sh, 0.0), axis=1, keepdims=True)
        if pivot:
            colkp = jnp.sum(jnp.where(is_kp_l, sh, 0.0), axis=1,
                            keepdims=True)
            # post-swap multipliers: lane k holds the old lane-kp column
            u = jnp.where(do_swap, colkp, colk)
            sh = jnp.where(
                do_swap & is_k_l, colkp,
                jnp.where(do_swap & is_kp_l, colk, sh),
            )
        else:
            u = colk
        rmask = (subs > i) & (subs < nb)
        sh_ref[:, :] = jnp.where(
            subs == i, rr, sh - jnp.where(rmask, u, 0.0) * lrow
        )
        return carry

    step = step_slim if slim else step_basic

    def micro_inverse(p0, p1):
        """inv(L[p0:p1, p0:p1]) (unit-lower) for pivoted blocks: the
        nilpotent repeated-squaring polynomial — exact for nilpotent N
        and safe here because partial pivoting bounds |N| <= 1 (the
        same scheme the noswap kernel uses).  NOT used unpivoted,
        where multipliers are unbounded and the alternating N^k terms
        cancel catastrophically (measured resid 2e1 vs the oracle's
        4e-4 at n=130 unpivoted)."""
        nb = p1 - p0
        blk = out_ref[p0:p1, p0:p1]
        ri = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        P = jnp.where(ri > ci, -blk, 0.0)
        X = jnp.where(ri == ci, 1.0, 0.0) + P
        kk = 1
        while kk < nb:
            P = mm(P, P)
            X = X + mm(P, X)
            kk *= 2
        return X

    def substitution_trsm(p0, p1, c0, c1):
        """U[p0:p1, c0:c1) = L[p0:p1,p0:p1]^-1 @ A[...] by forward
        substitution (nb-1 tiny rank-1s) — stable for any multipliers."""
        for i in range(p0, p1 - 1):
            lcol = out_ref[i + 1 : p1, i].reshape(p1 - i - 1, 1)
            urow = out_ref[i, c0:c1].reshape(1, c1 - c0)
            out_ref[i + 1 : p1, c0:c1] -= lcol * urow

    # Two-level trailing updates (pivoted only): inner micro boundaries
    # update columns within the current OUTER block; outer boundaries
    # apply one rank-`outer` TRSM + Schur to everything beyond — the
    # bulk O(m*w^2) rides the MXU at contraction depth `outer` (128+)
    # instead of `micro` (32), a 4x MXU pipeline-efficiency difference.
    two_level = (
        pivot and outer is not None and outer > micro and minmn > outer
    )

    for p0 in range(0, minmn, micro):
        p1 = min(p0 + micro, minmn)
        nb = p1 - p0
        sh_ref[:nb, :] = jnp.transpose(out_ref[:, p0:p1])

        # `unroll` consecutive elimination steps per fori iteration:
        # the steps stay in exact program order (bitwise-identical
        # results), but the loop bookkeeping amortizes and Mosaic can
        # overlap independent ops across adjacent steps (e.g. step
        # 2j's main-buffer swap with step 2j+1's pivot reduces) — the
        # serial chain's ~0.6 us/step issue latency is the single-
        # matrix floor (docs/DESIGN.md lesson 2).
        ub = unroll if unroll > 1 and nb % unroll == 0 else 1
        if ub > 1:

            def body_u(j, carry):
                c = carry
                for t in range(ub):
                    c = step(j * ub + t, c, p0, nb)
                return c

            jax.lax.fori_loop(0, nb // ub, body_u, 0)
        else:
            jax.lax.fori_loop(
                0, nb, functools.partial(step, p0=p0, nb=nb), 0
            )
        out_ref[:, p0:p1] = jnp.transpose(sh_ref[:nb, :])

        if not two_level:
            if p1 < w:
                substitution_trsm(p0, p1, p1, w)
                if p1 < m:
                    # rank-nb Schur update of the trailing block (MXU)
                    out_ref[p1:, p1:] -= mmb(
                        out_ref[p1:, p0:p1], out_ref[p0:p1, p1:]
                    )
            continue

        P0 = (p0 // outer) * outer
        P1 = min(P0 + outer, minmn)
        Xq = micro_inverse(p0, p1)
        inv_ref[p0 - P0 : p0 - P0 + nb, :nb] = Xq
        if p1 < P1:
            # inner boundary: TRSM + Schur confined to the outer block
            out_ref[p0:p1, p1:P1] = mmb(Xq, out_ref[p0:p1, p1:P1])
            out_ref[p1:, p1:P1] -= mmb(
                out_ref[p1:, p0:p1], out_ref[p0:p1, p1:P1]
            )
        if p1 == P1 and p1 < w:
            # outer boundary: block forward substitution over the outer
            # width using the stored micro inverses, then ONE
            # rank-(P1-P0) MXU Schur of the whole trailing block
            for q0 in range(P0, P1, micro):
                q1 = min(q0 + micro, P1)
                nq = q1 - q0
                R = out_ref[q0:q1, p1:]
                if q0 > P0:
                    R = R - mmb(out_ref[q0:q1, P0:q0], out_ref[P0:q0, p1:])
                out_ref[q0:q1, p1:] = mmb(
                    inv_ref[q0 - P0 : q0 - P0 + nq, :nq], R
                )
            if p1 < m:
                out_ref[p1:, p1:] -= mmb(
                    out_ref[p1:, P0:p1], out_ref[P0:p1, p1:]
                )

    perm_ref[:, :] = jnp.transpose(
        sh_ref[nsh - 1 : nsh, :]
    ).astype(jnp.int32)


def _panel_kernel_noswap(
    a_ref,
    used0_ref,
    out_ref,
    prow_ref,
    used_ref,
    info_ref,
    sh_ref,
    lscr_ref,
    oh_ref,
    *,
    pivot: bool,
    micro: int,
):
    """No-swap (physical-order) shadow panel kernel.

    Rows NEVER move: elimination step r picks a pivot among the rows
    still available (``used`` mask, seeded from ``used0`` so rows
    consumed by earlier panels of the physical blocked schedule are
    excluded), scales the remaining rows, and the chosen row keeps its
    physical position.  This removes the per-step row-interchange ops —
    the largest slice of the serial pivot chain in the swap kernel
    (every step swaps with probability ~1 on random matrices) — at the
    cost of masked (full-height) trailing updates in the caller.

    The current micro-panel lives transposed in ``sh_ref`` ((micro, m),
    lane = physical row) exactly like :func:`_panel_kernel_shadow`;
    ``lscr_ref`` additionally keeps the per-step MASKED L column
    (zeros at consumed rows), which the micro-boundary update and the
    caller's delayed Schur algebra both need.  The boundary update of
    trailing panel columns uses the one-hot extraction algebra (U rows
    live scattered at pivot rows):

        R   = onehot @ out[:, p1:]          (pivot rows, stale)
        L11 = onehot @ Lscr_block^T         (strictly-lower, unit diag)
        U12 = L11^{-1} @ R                  (repeated-squaring inverse)
        out[:, p1:] -= Lscr_block^T @ U12   (consumed rows get U12
                                             automatically: Lscr zeros
                                             truncate their sums)

    Zero pivot: no scale, rank-1 still runs, info records the first
    1-based failure column (ref src/lu.jl:299-319); the zero column
    still consumes its (min-index available) row.
    """
    m, w = out_ref.shape
    minmn = min(m, w)
    out_ref[:, :] = a_ref[:, :]
    used_ref[:, :] = used0_ref[:, :]
    info_ref[0] = 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    for k in range(minmn):
        p0 = (k // micro) * micro
        p1 = min(p0 + micro, minmn)
        r = k - p0

        if k == p0:
            if k > 0:
                # write back the finished block and update trailing cols
                q0, q1 = p0 - micro, p0
                nbk = q1 - q0
                out_ref[:, q0:q1] = jnp.transpose(sh_ref[:nbk, :])
                if p0 < w:
                    oh = oh_ref[:nbk, :]                # (nbk, m) one-hot
                    R = jnp.dot(
                        oh, out_ref[:, p0:],
                        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
                    )                                   # (nbk, w-p0)
                    lblk = lscr_ref[:nbk, :]            # (nbk, m) masked L
                    L11 = jnp.dot(
                        oh, jnp.transpose(lblk),
                        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
                    )                                   # (nbk, nbk) strict-lower
                    # X = (I + N)^(-1) = sum (-N)^j  (nilpotent) via
                    # repeated squaring: X <- X + P@X, P <- P@P
                    P = -L11
                    X = jnp.eye(nbk, dtype=jnp.float32) + P
                    kk = 1
                    while kk < nbk:
                        P = jnp.dot(P, P, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
                        X = X + jnp.dot(
                            P, X, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                        )
                        kk *= 2
                    U12 = jnp.dot(X, R, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
                    out_ref[:, p0:] -= jnp.dot(
                        jnp.transpose(lblk), U12,
                        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
                    )
            sh_ref[: p1 - p0, :] = jnp.transpose(out_ref[:, p0:p1])

        rowr = sh_ref[r, :].reshape(1, m)
        avail = used_ref[:, :] < 0.5
        if pivot:
            absrow = jnp.where(avail, jnp.abs(rowr), -jnp.inf)
            maxv = jnp.max(absrow)
            kp = jnp.min(jnp.where(absrow == maxv, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            # consume rows in physical order: first available lane
            kp = jnp.min(jnp.where(avail, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        prow_ref[k] = kp

        is_kp = lanes == kp
        pivval = jnp.sum(jnp.where(is_kp, rowr, 0.0))
        nonzero = pivval != 0.0
        used_ref[:, :] = used_ref[:, :] + is_kp.astype(jnp.float32)
        oh_ref[r, :] = is_kp.astype(jnp.float32)[0, :]
        remaining = avail & jnp.logical_not(is_kp)

        inv = jnp.where(nonzero, 1.0, 0.0) / jnp.where(nonzero, pivval, 1.0)
        newrow = jnp.where(remaining & nonzero, rowr * inv, rowr)
        sh_ref[r, :] = newrow[0, :]
        lcol = jnp.where(remaining & nonzero, rowr * inv,
                         jnp.where(remaining, rowr, 0.0))
        lscr_ref[r, :] = lcol[0, :]

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info(k=k):
            info_ref[0] = (k + 1) if pivot else -(k + 1)

        if r + 1 < p1 - p0:
            nrem = (p1 - p0) - (r + 1)
            sub = sh_ref[r + 1 : p1 - p0, :]
            u = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (nrem, m), 1) == kp,
                    sub,
                    0.0,
                ),
                axis=1,
                keepdims=True,
            )
            sh_ref[r + 1 : p1 - p0, :] = sub - u * lcol

    # write back the final micro block (no trailing cols remain when
    # w == minmn; fat panels are not used by the physical schedule)
    lastq0 = ((minmn - 1) // micro) * micro
    out_ref[:, lastq0:minmn] = jnp.transpose(sh_ref[: minmn - lastq0, :])


@functools.partial(
    jax.jit, static_argnames=("pivot", "interpret", "micro")
)
@trace32
def panel_factor_noswap_pallas(
    panel: jax.Array,
    used0: jax.Array,
    pivot: bool,
    interpret=None,
    micro: int = 32,
):
    """Physical-order panel factorization.  ``panel``: (m, w) with
    w <= m and w a multiple of... any width; ``used0``: (1, m) f32 mask
    of rows consumed by earlier panels.  Returns
    ``(out_phys (m, w), prow (w,), used (1, m), info)`` where ``out``
    stays in PHYSICAL row order and ``prow[k]`` is the physical row
    chosen at elimination step k."""
    m, w = panel.shape
    if interpret is None:
        interpret = not is_tpu_backend()
    kernel = functools.partial(_panel_kernel_noswap, pivot=pivot, micro=micro)
    out, prow, used, info = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), panel.dtype),
            jax.ShapeDtypeStruct((w,), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((min(micro, w), m), panel.dtype),
            pltpu.VMEM((min(micro, w), m), panel.dtype),
            pltpu.VMEM((min(micro, w), m), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(100 * 1024 * 1024,
                    max(6 * m * w * 4 + 3 * micro * m * 4, 1 << 24))
            ),
        ),
        interpret=interpret,
    )(panel, used0)
    return out, prow, used, info[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pivot", "interpret", "micro", "variant", "outer", "unroll",
        "bprec",
    ),
)
@trace32
def panel_factor_pallas(
    panel: jax.Array,
    pivot: bool,
    interpret=None,
    micro: int = 16,
    variant: str = "shadow",
    outer: int = 256,
    unroll: int = 1,
    bprec: str = "float32",
):
    m, w = panel.shape
    minmn = min(m, w)
    if interpret is None:
        interpret = not is_tpu_backend()
    if variant in ("fori", "fori2", "fori3"):
        kernel = functools.partial(
            _panel_kernel_fori,
            pivot=pivot,
            micro=micro,
            slim=(variant in ("fori2", "fori3")),
            outer=(outer if variant == "fori3" else None),
            unroll=unroll,
            bprec=bprec,
        )
        extra = {
            "scratch_shapes": [
                pltpu.VMEM((micro + 1, m), panel.dtype),
                pltpu.VMEM((max(micro, outer), micro), jnp.float32),
            ],
            # Whole-matrix panels (n <= 2048 f32 = 16 MiB) need the
            # scoped-vmem ceiling above Mosaic's 16 MiB default; the
            # physical VMEM on v5e is far larger (round-2 measurements).
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    min(
                        120 * 1024 * 1024,
                        max(3 * m * w * 4 + 2 * micro * m * 4, 1 << 24),
                    )
                )
            ),
        }
    elif variant == "shadow":
        kernel = functools.partial(
            _panel_kernel_shadow, pivot=pivot, micro=micro
        )
        extra = {"scratch_shapes": [pltpu.VMEM((micro, m), panel.dtype)]}
    else:
        kernel = functools.partial(_panel_kernel, pivot=pivot, micro=micro)
        extra = {}
    out, piv, perm, info = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), panel.dtype),
            jax.ShapeDtypeStruct((minmn,), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={0: 0},  # factor the panel in place
        interpret=interpret,
        **extra,
    )(panel)
    return out, piv, perm[:, 0], info[0]


# ---------------------------------------------------------------------------
# Complex64 split-plane fori kernel
# ---------------------------------------------------------------------------


def _panel_kernel_fori_c64(
    are_ref,
    aim_ref,
    ore_ref,
    oim_ref,
    piv_ref,
    perm_ref,
    info_ref,
    shre_ref,
    shim_ref,
    *,
    pivot: bool,
    micro: int,
    unroll: int = 1,
):
    """Split-plane complex64 fori shadow panel kernel (round 5).

    Mosaic has no complex types, so the panel lives as TWO f32 planes
    (re, im) — every buffer of :func:`_panel_kernel_fori` is doubled
    and each complex op expands to its 2-plane form; the kernel body
    itself is pure f32.  Same architecture as the f32 fori kernel: the
    current micro-panel transposed in VMEM shadows (lane = matrix row)
    so the serial pivot chain is lane-parallel; the composed row
    permutation rides as one extra shadow row of ``shre``.

    Complex-specific pieces:
    * pivot metric |re| + |im| (LAPACK cgetrf's CABS1 — cheaper than
      the modulus on the VPU and the standard cgetrf semantics; the
      reference's generic path uses Julia's ``abs`` = modulus, so
      pivot ROWS may differ from the reference on contrived ties —
      both satisfy the residual contract);
    * scale step multiplies by conj(p)/|p|^2 (complex reciprocal);
    * the rank-1 update and the micro-boundary TRSM/Schur expand to
      4 real multiplies / 4 real MXU matmuls per complex product
      (Karatsuba-3 measured no win at panel widths — the boundary
      matmuls are skinny).

    Zero-pivot (re == 0 AND im == 0): no swap, no scale, rank-1 still
    runs, signed 1-based info — ref src/lu.jl:299-319 semantics.
    """
    m, w = ore_ref.shape
    minmn = min(m, w)
    f32 = jnp.float32
    ore_ref[:, :] = are_ref[:, :]
    oim_ref[:, :] = aim_ref[:, :]
    info_ref[0] = 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    nsh = shre_ref.shape[0]  # micro + 1 (last shre row carries the perm)
    subs = jax.lax.broadcasted_iota(jnp.int32, (nsh, 1), 0)
    shre_ref[nsh - 1, :] = lanes[0, :].astype(f32)

    hi = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=hi)

    def step(i, carry, p0, nb):
        k = p0 + i
        rre = shre_ref[pl.ds(i, 1), :]  # logical column k, lane-major
        rim = shim_ref[pl.ds(i, 1), :]
        if pivot:
            cabs = jnp.where(
                lanes >= k, jnp.abs(rre) + jnp.abs(rim), -jnp.inf
            )
            maxv = jnp.max(cabs)
            kp = jnp.min(jnp.where(cabs == maxv, lanes, m))
            kp = jnp.minimum(kp, m - 1).astype(jnp.int32)
        else:
            kp = jnp.asarray(k, jnp.int32)
        piv_ref[k] = kp
        is_kp = lanes == kp
        pr = jnp.sum(jnp.where(is_kp, rre, 0.0))
        pi = jnp.sum(jnp.where(is_kp, rim, 0.0))
        nonzero = (pr != 0.0) | (pi != 0.0)

        if pivot:

            @pl.when(nonzero & (kp != k))
            def _swap():
                is_k = lanes == k
                for oref in (ore_ref, oim_ref):
                    rk = oref[pl.ds(k, 1), :]
                    rkp = oref[pl.ds(kp, 1), :]
                    oref[pl.ds(k, 1), :] = rkp
                    oref[pl.ds(kp, 1), :] = rk
                for sref in (shre_ref, shim_ref):
                    sh = sref[:, :]
                    ck = jnp.sum(jnp.where(is_k, sh, 0.0), axis=1,
                                 keepdims=True)
                    ckp = jnp.sum(jnp.where(is_kp, sh, 0.0), axis=1,
                                  keepdims=True)
                    sh = jnp.where(is_k, ckp, sh)
                    sref[:, :] = jnp.where(is_kp, ck, sh)

        # scale row i (post-swap values): multiply lanes > k by
        # conj(p) / |p|^2; zero pivot -> no scale (raw values feed the
        # rank-1 below, ref src/lu.jl:299-326)
        rre = shre_ref[pl.ds(i, 1), :]
        rim = shim_ref[pl.ds(i, 1), :]
        d = pr * pr + pi * pi
        dsafe = jnp.where(nonzero, d, 1.0)
        ir = pr / dsafe
        ii = -pi / dsafe
        smask = (lanes > k) & nonzero
        sre = jnp.where(smask, rre * ir - rim * ii, rre)
        sim = jnp.where(smask, rre * ii + rim * ir, rim)
        shre_ref[pl.ds(i, 1), :] = sre
        shim_ref[pl.ds(i, 1), :] = sim

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info():
            val = (k + 1) if pivot else -(k + 1)
            info_ref[0] = jnp.asarray(val, jnp.int32)

        # rank-1 update of the remaining shadow rows: sh[j,:] -= u_j *
        # lrow (complex), u_j = sh[j, lane k], lrow = scaled row i
        lre = jnp.where(lanes > k, sre, 0.0)
        lim = jnp.where(lanes > k, sim, 0.0)
        is_k_l = lanes == k
        shr = shre_ref[:, :]
        shi = shim_ref[:, :]
        ure = jnp.sum(jnp.where(is_k_l, shr, 0.0), axis=1, keepdims=True)
        uim = jnp.sum(jnp.where(is_k_l, shi, 0.0), axis=1, keepdims=True)
        rmask = (subs > i) & (subs < nb)
        urm = jnp.where(rmask, ure, 0.0)
        uimm = jnp.where(rmask, uim, 0.0)
        shre_ref[:, :] = shr - (urm * lre - uimm * lim)
        shim_ref[:, :] = shi - (urm * lim + uimm * lre)
        return carry

    def substitution_trsm(p0, p1, c0, c1):
        """U[p0:p1, c0:c1) = L^-1 @ A by complex forward substitution."""
        for i in range(p0, p1 - 1):
            lre = ore_ref[i + 1 : p1, i].reshape(p1 - i - 1, 1)
            lim = oim_ref[i + 1 : p1, i].reshape(p1 - i - 1, 1)
            ure = ore_ref[i, c0:c1].reshape(1, c1 - c0)
            uim = oim_ref[i, c0:c1].reshape(1, c1 - c0)
            ore_ref[i + 1 : p1, c0:c1] -= lre * ure - lim * uim
            oim_ref[i + 1 : p1, c0:c1] -= lre * uim + lim * ure

    for p0 in range(0, minmn, micro):
        p1 = min(p0 + micro, minmn)
        nb = p1 - p0
        shre_ref[:nb, :] = jnp.transpose(ore_ref[:, p0:p1])
        shim_ref[:nb, :] = jnp.transpose(oim_ref[:, p0:p1])

        ub = unroll if unroll > 1 and nb % unroll == 0 else 1
        if ub > 1:

            def body_u(j, carry, p0=p0, nb=nb):
                c = carry
                for t in range(ub):
                    c = step(j * ub + t, c, p0, nb)
                return c

            jax.lax.fori_loop(0, nb // ub, body_u, 0)
        else:
            jax.lax.fori_loop(
                0, nb, functools.partial(step, p0=p0, nb=nb), 0
            )
        ore_ref[:, p0:p1] = jnp.transpose(shre_ref[:nb, :])
        oim_ref[:, p0:p1] = jnp.transpose(shim_ref[:nb, :])

        if p1 < w:
            substitution_trsm(p0, p1, p1, w)
            if p1 < m:
                # rank-nb complex Schur on the MXU: 4 real matmuls
                Lre = ore_ref[p1:, p0:p1]
                Lim = oim_ref[p1:, p0:p1]
                Ure = ore_ref[p0:p1, p1:]
                Uim = oim_ref[p0:p1, p1:]
                ore_ref[p1:, p1:] -= mm(Lre, Ure) - mm(Lim, Uim)
                oim_ref[p1:, p1:] -= mm(Lre, Uim) + mm(Lim, Ure)

    perm_ref[:, :] = jnp.transpose(
        shre_ref[nsh - 1 : nsh, :]
    ).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("pivot", "interpret", "micro", "unroll")
)
@trace32
def panel_factor_pallas_c64(
    panel: jax.Array,
    pivot: bool,
    interpret=None,
    micro: int = 32,
    unroll: int = 2,
):
    """Complex64 panel/whole-matrix LU via the split-plane fori kernel.

    ``panel``: (m, w) complex64.  Returns ``(factors c64, piv (minmn,),
    perm (m,), info)`` with the same conventions as
    :func:`panel_factor_pallas`."""
    m, w = panel.shape
    minmn = min(m, w)
    if interpret is None:
        interpret = not is_tpu_backend()
    are = jnp.real(panel).astype(jnp.float32)
    aim = jnp.imag(panel).astype(jnp.float32)
    kernel = functools.partial(
        _panel_kernel_fori_c64, pivot=pivot, micro=micro, unroll=unroll
    )
    ore, oim, piv, perm, info = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), jnp.float32),
            jax.ShapeDtypeStruct((m, w), jnp.float32),
            jax.ShapeDtypeStruct((minmn,), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((micro + 1, m), jnp.float32),
            pltpu.VMEM((micro + 1, m), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(
                    120 * 1024 * 1024,
                    max(3 * m * w * 8 + 4 * micro * m * 4, 1 << 24),
                )
            )
        ),
        interpret=interpret,
    )(are, aim)
    out = jax.lax.complex(ore, oim)
    return out, piv, perm[:, 0], info[0]


# ---------------------------------------------------------------------------
# Offset panel kernel (tensor-parallel panels)
# ---------------------------------------------------------------------------


def _offset_panel_kernel(
    ofs_ref,
    a_ref,
    out_ref,
    piv_ref,
    perm_ref,
    info_ref,
    sh_ref,
    *,
    pivot: bool,
    micro: int,
    unroll: int = 1,
):
    """fori shadow panel kernel with a TRACED global row offset.

    The tensor-parallel panel loop (parallel/blockcyclic.py) factors a
    full-height (H, w) panel whose elimination starts at traced row
    ``ofs`` (column k eliminates row ofs+k; rows < ofs are final and
    never touched).  This is the Pallas replacement for the pure-JAX
    ``_offset_panel_lu`` select chain: per elimination step, XLA emits
    ~6 full (H, w) where/dynamic-slice passes through HBM, while here
    the step runs on the VMEM-resident lane-major shadow exactly like
    :func:`_panel_kernel_fori`'s slim step — the offset only shifts
    the ROW masks/indices (``lanes >= ofs+k`` instead of ``>= k``) and
    arrives as a scalar in SMEM, so one compiled kernel serves every
    panel of the shard_map fori loop.

    Boundaries are single-level (tp panel widths are <= 256, below the
    two-level kernel's outer block) and full-height row-masked: the
    trailing-column Schur runs as ONE MXU matmul with L zeroed at rows
    < ofs+p1 — the same masked-flops-for-static-shapes trade the tp
    schedule itself makes (blockcyclic.py module docstring).

    Semantics (first-occurrence argmax over rows >= ofs+k, zero pivot
    => no swap/scale but the rank-1 still runs, signed 1-based local
    info — ref src/lu.jl:289-319) match ``_offset_panel_lu``; the
    trailing-column association differs (delayed micro-boundary
    updates vs eager full-width rank-1), so cross-backend results
    agree to rounding, not bitwise.  Returns GLOBAL pivot rows in
    ``piv`` and the composed permutation of all H rows in ``perm``.
    """
    H, w = out_ref.shape
    f32 = jnp.float32
    ofs = ofs_ref[0]
    out_ref[:, :] = a_ref[:, :]
    info_ref[0] = 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    nsh = sh_ref.shape[0]  # micro + 1 (last row carries the perm)
    subs = jax.lax.broadcasted_iota(jnp.int32, (nsh, 1), 0)
    sh_ref[nsh - 1, :] = lanes[0, :].astype(f32)

    hi = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=hi)

    def step(i, carry, p0, nb):
        k = p0 + i
        gk = ofs + k
        rowr = sh_ref[pl.ds(i, 1), :]  # logical column k, lane-major
        if pivot:
            absrow = jnp.where(lanes >= gk, jnp.abs(rowr), -jnp.inf)
            maxv = jnp.max(absrow)
            kp = jnp.min(jnp.where(absrow == maxv, lanes, H))
            kp = jnp.minimum(kp, H - 1).astype(jnp.int32)
        else:
            kp = gk.astype(jnp.int32)
        piv_ref[k] = kp
        is_kp_l = lanes == kp
        is_k_l = lanes == gk
        pivval = jnp.sum(jnp.where(is_kp_l, rowr, 0.0))
        rk_val = jnp.sum(jnp.where(is_k_l, rowr, 0.0))
        nonzero = pivval != 0.0
        do_swap = nonzero & (kp != gk) if pivot else jnp.asarray(False)

        if pivot:

            @pl.when(do_swap)
            def _swap_main():
                rk = out_ref[pl.ds(gk, 1), :]
                rkp = out_ref[pl.ds(kp, 1), :]
                out_ref[pl.ds(gk, 1), :] = rkp
                out_ref[pl.ds(kp, 1), :] = rk

        @pl.when(jnp.logical_not(nonzero) & (info_ref[0] == 0))
        def _info():
            val = (k + 1) if pivot else -(k + 1)
            info_ref[0] = jnp.asarray(val, jnp.int32)

        # post-swap scaled row i, in registers ((1, H) ops only)
        rr = rowr
        if pivot:
            rr = jnp.where(
                do_swap & is_k_l, pivval,
                jnp.where(do_swap & is_kp_l, rk_val, rowr),
            )
        psafe = jnp.where(nonzero, pivval, 1.0)
        rr = jnp.where((lanes > gk) & nonzero, rr * (1.0 / psafe), rr)
        lrow = jnp.where(lanes > gk, rr, 0.0)

        sh = sh_ref[:, :]
        colk = jnp.sum(jnp.where(is_k_l, sh, 0.0), axis=1, keepdims=True)
        if pivot:
            colkp = jnp.sum(jnp.where(is_kp_l, sh, 0.0), axis=1,
                            keepdims=True)
            u = jnp.where(do_swap, colkp, colk)
            sh = jnp.where(
                do_swap & is_k_l, colkp,
                jnp.where(do_swap & is_kp_l, colk, sh),
            )
        else:
            u = colk
        rmask = (subs > i) & (subs < nb)
        sh_ref[:, :] = jnp.where(
            subs == i, rr, sh - jnp.where(rmask, u, 0.0) * lrow
        )
        return carry

    for p0 in range(0, w, micro):
        p1 = min(p0 + micro, w)
        nb = p1 - p0
        sh_ref[:nb, :] = jnp.transpose(out_ref[:, p0:p1])

        ub = unroll if unroll > 1 and nb % unroll == 0 else 1
        if ub > 1:

            def body_u(j, carry, p0=p0, nb=nb):
                c = carry
                for t in range(ub):
                    c = step(j * ub + t, c, p0, nb)
                return c

            jax.lax.fori_loop(0, nb // ub, body_u, 0)
        else:
            jax.lax.fori_loop(
                0, nb, functools.partial(step, p0=p0, nb=nb), 0
            )
        out_ref[:, p0:p1] = jnp.transpose(sh_ref[:nb, :])

        if p1 < w:
            # forward substitution brings trailing columns of the
            # block's OWN rows up to date (dynamic sublane RMWs,
            # static sizes)
            for i in range(p0, p1 - 1):
                gi = ofs + i
                ln = p1 - i - 1
                lcol = out_ref[pl.ds(gi + 1, ln), i : i + 1]
                urow = out_ref[pl.ds(gi, 1), p1:w]
                out_ref[pl.ds(gi + 1, ln), p1:w] -= lcol * urow
            # ONE full-height rank-nb MXU Schur, L masked to rows
            # >= ofs+p1 (masked rows subtract exactly zero)
            Lm = jnp.where(rows2 >= ofs + p1, out_ref[:, p0:p1], 0.0)
            U12 = out_ref[pl.ds(ofs + p0, nb), p1:w]
            out_ref[:, p1:w] -= mm(Lm, U12)

    perm_ref[:, :] = jnp.transpose(
        sh_ref[nsh - 1 : nsh, :]
    ).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("pivot", "interpret", "micro", "unroll"),
)
@trace32
def offset_panel_factor_pallas(
    panel: jax.Array,
    ofs,
    pivot: bool,
    interpret=None,
    micro: int = 32,
    unroll: int = 1,
):
    """LU of a full-height (H, w) panel starting at traced row ``ofs``.

    Drop-in Pallas counterpart of
    :func:`~..parallel.blockcyclic._offset_panel_lu` (same returns:
    ``(factors, piv (w,) global, perm (H,) composed, info signed)``).
    """
    H, w = panel.shape
    if interpret is None:
        interpret = not is_tpu_backend()
    kernel = functools.partial(
        _offset_panel_kernel, pivot=pivot, micro=micro, unroll=unroll
    )
    ofs_arr = jnp.asarray(ofs, jnp.int32).reshape(1)
    # Under shard_map with vma checking, pallas outputs must declare
    # how they vary over mesh axes; they inherit the inputs' union
    # (the tp caller passes a replicated psum'd panel + replicated
    # offset, so everything stays replicated, keeping the P() specs).
    try:
        vma = jax.typeof(panel).vma | jax.typeof(ofs_arr).vma
    except AttributeError:  # pragma: no cover - older JAX
        vma = None

    def mk(shape, dt):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, dt)
        return jax.ShapeDtypeStruct(shape, dt, vma=vma)

    out, piv, perm, info = pl.pallas_call(
        kernel,
        out_shape=(
            mk((H, w), panel.dtype),
            mk((w,), jnp.int32),
            mk((H, 1), jnp.int32),
            mk((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((micro + 1, H), panel.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(
                    100 * 1024 * 1024,
                    max(3 * H * w * 4 + 2 * micro * H * 4, 1 << 24),
                )
            )
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(ofs_arr, panel)
    return out, piv, perm[:, 0], info[0]

"""Configuration for the TPU LU schedule.

The reference tunes itself to the CPU memory hierarchy: recursion
``threshold`` 40 (48 on AVX-512) (reference src/lu.jl:85-86), base
``blocksize`` 16 (8 once the matrix exceeds 40_000 elements,
src/lu.jl:97), split points rounded to 64-byte cachelines
(``nsplit``, src/lu.jl:150-154), and an L2-residency gate for threading
(src/lu.jl:124-132).

On TPU the hierarchy is explicit, so the analogous knobs are derived from
MXU tile (128x128), VPU lanes (8x128) and VMEM capacity (~16 MiB more
recently up to ~128 MiB on v5e/v6e... we assume 16 MiB usable budget per
kernel by default, conservatively):

* ``panel_width`` — the blocked schedule's panel (the ``blocksize`` analog),
  a multiple of the 128 MXU lane dim.
* ``small_threshold`` — below this min(m, n), a single fused whole-matrix
  kernel is used instead of the blocked schedule (the analog of both the
  ``min(m,n) < 10`` stdlib escape hatch at src/lu.jl:70 and the recursion
  ``threshold`` at src/lu.jl:86,98).
* ``schur_precision`` — 'float32' (exact f32 accumulate) or 'bf16' for
  bf16-compute/f32-accumulate Schur updates on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

LANE = 128           # TPU lane count / MXU dimension
SUBLANE_F32 = 8      # f32 sublane tile
VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # conservative per-kernel budget
# The static-unroll panel kernels' scoped-vmem footprint is ~6x the raw
# panel bytes (aliased staging + shadow scratch + compiler scratch).
# Empirically a 4096x256 f32 panel (25 MiB scoped by that estimate)
# compiles AND is the fastest schedule on v5e (w256 8.3 ms vs w128
# 8.8 ms at n=4096), so the panel-width picker gets its own, larger
# budget; the conservative constant above still bounds the batched
# kernels.
PANEL_VMEM_BUDGET_BYTES = 26 * 1024 * 1024
# The fori kernels alias in/out and keep only a (micro+1, m) shadow
# (~3x panel bytes) and are proven far past the old bound: the DEFAULT
# whole-matrix call at n=2048 f32 (16 MiB panel, ~50 MiB by the 3x
# estimate) compiles and runs on v5e.  Their width picker and the
# direct-whole-panel gate in ops/panel.py share this budget, so e.g.
# n=8192 keeps w=512 panels (the same 50 MiB class) instead of
# dropping to w=256 — the composed-graph width that crashes the TPU
# compile helper (LUConfig.blocked_panel_variant).
FORI_VMEM_BUDGET_BYTES = 100 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class LUConfig:
    """Static (trace-time) configuration of the LU schedule."""

    # Panel width of the blocked right-looking schedule. None -> derived.
    panel_width: Optional[int] = None
    # min(m,n) at or below which a single fused kernel factors the whole
    # matrix (VMEM-resident).  2048: an f32 matrix of that size is
    # 16 MiB — the fori kernel holds it entirely in VMEM (measured
    # footprint ~3x panel bytes), eliminating every per-panel dispatch
    # and HBM round-trip of the blocked schedule (round 3).
    small_threshold: int = 2048
    # 'auto' | 'float32' (6-pass HIGHEST) | 'bf16x3' (3-pass HIGH) |
    # 'bf16' (single-pass) : compute precision of the Schur-complement
    # matmul (accumulation is always f32).  See ops/schur.py.
    # 'auto' (round-4 default) resolves to bf16x3 on the TPU f32
    # blocked path at minmn >= AUTO_BF16X3_MIN and float32 everywhere
    # else: bf16x3 passes the reference's own residual gate
    # (scaled resid ~5 vs the 20*n*eps gate's ~20, measured on chip at
    # n=4096 — test_bf16x3_schur_residual_on_chip pins it) and is
    # measured 1.41-1.51x vs XLA at 4096 against f32's 1.29-1.46x.
    # Callers needing bit-level f32 Schur accuracy pin 'float32'.
    schur_precision: str = "auto"
    # 'auto' | 'pallas' | 'xla' : kernel backend. 'auto' = Pallas on TPU,
    # pure-XLA elsewhere (the f32/f64 fast path vs generic fallback split of
    # reference src/lu.jl:107-118).
    backend: str = "auto"
    # Block size for the blocked triangular solves (TRSM) and triangular
    # inversion base case.
    trsm_block: int = 128
    # Sub-panel width of the two-level panel factorization: a panel wider
    # than this is itself factored as a blocked schedule (sub-panel Pallas
    # kernel + MXU TRSM/Schur within the panel).  The reference's analog
    # is the recursion bottoming out at `blocksize` (src/lu.jl:97,184).
    # Default 256 (== the max panel width) disables two-level blocking:
    # with the 'shadow' kernel the pivot chain is already lane-parallel
    # and the extra per-sub-panel laswp/TRSM glue measured slower
    # (n=2048: 3.8 ms two-level vs 2.3 ms single-level).
    inner_panel_width: int = 256
    # Micro-panel width inside the Pallas panel kernel (rank-1 updates are
    # confined to this width; a delayed rank-`panel_micro` MXU update runs
    # at each boundary).  >= panel width disables in-kernel blocking.
    # 'auto' resolves by factored size (`resolved_panel_micro`): 32
    # everywhere except whole-matrix calls with min(m, n) in
    # [1024, 2048), where 64 measured best on v5e (fori3+u2 @1024:
    # 0.60 ms vs 0.75 at micro=32, XLA 0.64-0.77 — fatter blocks halve
    # the chain's boundary count and the size is big enough to absorb
    # the wider rank-1 region); 64 LOSES at 512, 2048 and 4096-blocked.
    panel_micro: object = "auto"
    # Panel kernel variant (see ops/panel.py):
    #   'fori3'  — fori-loop shadow kernel, slim per-step pass + two-
    #              level trailing updates (rank-`panel_outer` MXU Schur);
    #              scales to whole-matrix panels.  Default (round 3).
    #   'fori2'  — fori kernel, slim step, single-level boundaries.
    #   'fori'   — fori kernel, basic step.
    #   'shadow' — static-unroll shadow kernel (width <= inner only).
    #   'basic'  — static-unroll column-layout kernel.
    panel_variant: str = "fori3"
    # Outer block width of the fori3 kernel's two-level trailing updates.
    panel_outer: int = 256
    # Panel-chain backend of the tensor-parallel LU
    # (parallel/blockcyclic.py): 'pallas' runs each panel's replicated
    # offset factorization in the offset Pallas kernel
    # (ops/panel.py offset_panel_factor_pallas — VMEM-resident shadow
    # chain); 'jax' keeps the pure-JAX select chain (~6 full (H, w)
    # XLA passes per elimination step); 'auto' = pallas on the TPU
    # f32 path, jax elsewhere (mirrors `backend`).
    tp_panel_backend: str = "auto"
    # Compute precision of the fori panel kernels' IN-PANEL boundary
    # matmuls (the micro-boundary TRSM applies and rank-micro/outer
    # Schur updates — HIGHEST 6-pass f32 with 'float32').  'bf16x3'
    # runs them as a hand-built 3-pass bf16 split: eps ~ 2^-21 per
    # product — the same accuracy class as the blocked-level bf16x3
    # Schur mode, which passes the reference residual gate with ~3
    # bits of headroom (measured on chip,
    # test_bf16x3_schur_residual_on_chip).  The micro-block INVERSE
    # (nilpotent repeated squaring) always stays HIGHEST — its
    # conditioning drives the whole panel.  'auto' (default) resolves
    # bf16x3 on the TPU f32 path at minmn >= AUTO_BPREC_MIN (8192 —
    # NOT the Schur knob's 4096 gate: bprec panel graphs at n=4096
    # deterministically crash the Mosaic compile helper, see
    # AUTO_BPREC_MIN), float32 elsewhere.  Measured r5 on chip at
    # n=8192: 36.12 ms vs 37.27 ms HIGHEST (+3%), scaled residual
    # 2.88 @2048 / 3.59 @4096 with explicit bprec configs (O(1),
    # LAPACK-class); see perf/results_r05_phase.json.
    panel_boundary_precision: str = "auto"
    # Elimination steps per fori-loop iteration inside the fori panel
    # kernels (program order unchanged — results are bitwise-identical).
    # >1 amortizes per-step loop bookkeeping and lets Mosaic overlap
    # independent ops across adjacent steps of the serial pivot chain
    # (the ~0.6 us/step single-matrix floor, docs/DESIGN.md lesson 2),
    # at the cost of a ~`unroll`x larger traced program.  Default 2 —
    # measured v5e f32, u2 vs u1: whole-matrix 0.36->0.22 ms @512,
    # 0.85->0.75 @1024, 2.08->2.00 @2048; blocked w512 @4096
    # 8.11->7.65 ms.  u4 ties u2 at 1024 and LOSES at 2048 (2.47 ms:
    # the 4x program under-schedules), so 2 is the sweet spot.
    panel_unroll: int = 2
    # Panel kernel variant used by the BLOCKED schedule's panels (the
    # whole-matrix path keeps `panel_variant`).  None -> same as
    # panel_variant.  Empirical Mosaic workaround (v5e, 2026-08): the
    # composed blocked graph with fori panels at n=4096 / w=256 crashes
    # the TPU compile helper (exit 1, no message; the same kernel
    # compiles standalone and as a whole-matrix call) — a new instance
    # of the round-2 nopivot-w256 crash class.
    blocked_panel_variant: Optional[str] = None

    def resolved_blocked_variant(self) -> str:
        return self.blocked_panel_variant or self.panel_variant
    # min(m, n) at or below which the PLATFORM LU (XLA's lax.linalg.lu)
    # is used instead of this package's kernels — the analog of the
    # reference's stdlib escape hatch for small matrices
    # (`LinearAlgebra.generic_lufact!` below min(m,n) < 10,
    # ref src/lu.jl:70-73).  Measured on v5e f32: XLA's single-matrix
    # lu is faster below n ~ 3000, ours above (see perf/results_r02);
    # batched workloads always use this package's lane kernels.
    # Round-3 default 'auto': on the TPU f32 path, delegate below the
    # measured crossover (fixed per-step issue latency dominates there
    # and the platform kernel ties or wins; above it this package's
    # kernels win) — everywhere else no escape, this package's kernels
    # handle all sizes.  An explicit int is honored on any backend;
    # None disables the escape entirely.
    xla_threshold: object = "auto"
    # Blocked schedule: 'swap' moves rows into pivoted order as it goes
    # (LAPACK-layout factors and a true ipiv swap sequence); 'physical'
    # never moves rows — the no-swap panel kernel plus full-height
    # masked trailing updates remove the per-step interchanges and the
    # per-panel laswp entirely, with ONE global row gather at the end
    # (ops/blocked.py blocked_lu_physical).  Under 'physical' the
    # returned ipiv is the pivot-ROW sequence (perm prefix), not a swap
    # sequence — solves use the composed perm either way.
    schedule: str = "swap"
    # Recursive tail of the blocked schedule: once the TRAILING block's
    # width drops to <= this, finish it in ONE whole-matrix fused kernel
    # call instead of more panel rounds (the exact analog of the
    # reference recursing until min(m,n) <= threshold and then running
    # the base kernel, ref src/lu.jl:98-106).  Measured v5e f32: the
    # whole-matrix fori3 kernel at n=2048 is 2.08 ms vs ~2.9 ms for the
    # blocked schedule of the same block.  'auto' -> small_threshold
    # when the panel variant is a fori kernel (it alone scales to
    # whole-matrix widths); None disables; an int is honored as given.
    # Default 'auto' (round-3 A/B at n=4096 f32: 8.29 ms with the tail
    # vs 8.45 without; wider panels first, w1024/w2048, both lose —
    # w2048 9.94 ms, w1024 hits the compile-helper crash class).
    tail_threshold: object = "auto"

    def resolved_tail_threshold(self) -> Optional[int]:
        if self.tail_threshold == "auto":
            if self.resolved_blocked_variant().startswith("fori"):
                return self.small_threshold
            return None
        return self.tail_threshold

    # Round-4 calibration (perf/results_r04_band.json): ONE session,
    # interleaved per-rep marginals, rf_whole (current defaults) vs
    # xla_lu over the WHOLE band 512..2048 — rf/xla speedup 0.72@512,
    # 0.76@640, 0.90@768, 0.93@896, 0.93@1024, 0.97@1152, 0.97@1280,
    # 1.01@1536, 1.08@1792, 1.19@2048.  Monotone rise, crossover
    # ~1500: delegate through 1535, this package's whole-matrix kernel
    # from n=1536 (tie) up.  Supersedes round 3's 1023, which was
    # calibrated from two endpoints: that session measured the kernel
    # at 0.60 ms @1024 vs a bimodal XLA 0.64-0.77; this session the
    # same two binaries measured 0.79 vs 0.73 (XLA not bimodal) — at
    # the tie region, cross-session drift exceeds the margin, so the
    # threshold sits at the first size whose win holds within-session.
    # The dispatcher compares `minmn <= threshold`.
    AUTO_XLA_THRESHOLD = 1535

    # Complex64 delegation threshold.  Round 4 delegated at every size
    # (1 << 30) because complex panels were the masked pure-JAX loop;
    # round 5's split-plane fori kernel (ops/panel.py, CABS1 pivoting)
    # makes the native path competitive.  Measured on chip (2026-08-20
    # v5e, interleaved marginals, perf/results_r05_c64.json): n <= 768
    # is a tie within the relay noise floor (both arms < 1 ms; n=512
    # flipped 5.7x/0.46x across sessions, heavier averaging says tie),
    # n=1024 is a consistent rf win (1.53x / 1.56x in two sessions).
    # Same policy as f32's AUTO_XLA_THRESHOLD: the threshold sits at
    # the first size whose win holds — delegate through 1023 (compared
    # as `minmn <= threshold`).  C128 never delegates (XLA's TPU lu is
    # F32/C64-only).
    AUTO_XLA_THRESHOLD_C64 = 1023

    # Upper bound of the native c64 window (auto backend, TPU).  The
    # split-plane whole-matrix kernel compile-verified through n=1536
    # (286 s Mosaic compile, factors correct on chip); at n=2048 the
    # same route hits the known Mosaic compile-crash class
    # (tpu_compile_helper exit 1) and at 4096 the compile-hang flavor
    # (perf/results_r05_c64.json session-1 rows).  Above the ceiling,
    # pivoted c64 delegates back to the platform kernel; no-pivot /
    # C128 keep the pure-JAX-panel complex routes (which compile at
    # every size).  A forced `backend="pallas"` config bypasses the
    # ceiling (interpret-mode CPU runs have no Mosaic to crash).
    C64_NATIVE_CEILING = 1536

    # micro=64 band of the 'auto' micro resolution (whole-matrix only).
    AUTO_MICRO_WIDE_LO = 1024
    AUTO_MICRO_WIDE_HI = 2048  # exclusive

    # minmn from which 'auto' schur_precision picks bf16x3 (f32 TPU
    # blocked path only).  4096: the measured-win regime; below it the
    # default path is the whole-matrix Pallas kernel, which has no
    # XLA-level Schur updates for this knob to touch anyway.
    AUTO_BF16X3_MIN = 4096

    # Separate gate for the IN-PANEL boundary knob's 'auto' (round 5).
    # bf16x3 panel boundaries measured a win only at n=8192 (36.12 vs
    # 37.27 ms, perf/results_r05_phase.json), and at n=4096 the bprec
    # panel graphs hit the Mosaic compile-crash class DETERMINISTICALLY
    # (tpu_compile_helper exit 1, with and without the scoped-vmem
    # raise — perf/experiments/r5_bisect4096.py, 2026-08-20) while the
    # float32-boundary default compiles fine.  Gate at the size where
    # the win is measured and the compile proven; the blocked-level
    # Schur knob keeps AUTO_BF16X3_MIN = 4096 (in place since r4,
    # measured at 4096).
    AUTO_BPREC_MIN = 8192

    def resolved_schur_precision(self, minmn: int, dtype, tpu=None) -> str:
        """Schur-matmul precision for a factorization of min dim
        ``minmn``.  Explicit values pass through; 'auto' resolves
        bf16x3 only where measured to win on chip (see the field
        docstring).  ``tpu`` overrides backend detection for tests."""
        if self.schur_precision != "auto":
            return self.schur_precision
        import jax.numpy as jnp

        if tpu is None:
            tpu = is_tpu_backend()
        if (
            tpu
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and minmn >= self.AUTO_BF16X3_MIN
        ):
            return "bf16x3"
        return "float32"

    def resolved_panel_boundary_precision(
        self, minmn: int, dtype, tpu=None
    ) -> str:
        """In-panel boundary-matmul precision for a factorization of
        min dim ``minmn`` (see the ``panel_boundary_precision`` field).
        Explicit values pass through; 'auto' resolves bf16x3 on the
        (TPU, f32, minmn >= AUTO_BPREC_MIN) gate — the regime where it
        measured faster on chip with O(1) scaled residuals AND where
        the composed graph is compile-proven (n=4096 bprec panels
        crash Mosaic; see AUTO_BPREC_MIN).  ``tpu`` overrides
        detection for tests."""
        if self.panel_boundary_precision != "auto":
            return self.panel_boundary_precision
        import jax.numpy as jnp

        if tpu is None:
            tpu = is_tpu_backend()
        if (
            tpu
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and minmn >= self.AUTO_BPREC_MIN
        ):
            return "bf16x3"
        return "float32"

    def resolved_panel_micro(self, m: int, w: int) -> int:
        """Micro-panel width for a panel-kernel call on an (m, w) block.

        Explicit ints pass through; 'auto' picks 64 only for
        whole-matrix-sized calls (min(m, w) in [1024, 2048)) where it
        measured ~25% faster, and 32 everywhere else (blocked-schedule
        panels are <= 512 wide and always resolve 32)."""
        if self.panel_micro != "auto":
            return self.panel_micro
        minmn = min(m, w)
        if self.AUTO_MICRO_WIDE_LO <= minmn < self.AUTO_MICRO_WIDE_HI:
            return 64
        return 32

    def resolved_xla_threshold(self, dtype, tpu: Optional[bool] = None) -> Optional[int]:
        """``tpu`` overrides backend detection (routing tests pin the TPU
        decision from a CPU session; None -> detect)."""
        if self.xla_threshold == "auto":
            import jax.numpy as jnp

            if tpu is None:
                tpu = is_tpu_backend()
            if tpu and dtype == jnp.dtype(jnp.float32):
                return self.AUTO_XLA_THRESHOLD
            if tpu and dtype == jnp.dtype(jnp.complex64):
                return self.AUTO_XLA_THRESHOLD_C64
            return None
        return self.xla_threshold

    def resolved_panel_width(self, m: int, n: int, itemsize: int) -> int:
        if self.panel_width is not None:
            return self.panel_width
        # Mirror the spirit of the reference's size-adaptive blocksize
        # (src/lu.jl:97): smaller panels for huge matrices keep the tall
        # panel within VMEM; larger panels amortize per-panel latency.
        # VMEM footprint: the static-unroll kernels stage ~5.5-6x the
        # raw panel bytes (measured: a 3072x256 f32 panel allocates
        # 17.4 MiB scoped); the fori kernels alias in/out and keep only
        # a (micro+1, m) shadow — ~3x panel bytes — so they afford
        # 2x wider panels (fewer blocked rounds, less HBM traffic).
        if self.panel_variant.startswith("fori"):
            w = 512 if min(m, n) >= 2048 else 256
            mult = 3
            budget = FORI_VMEM_BUDGET_BYTES
        else:
            w = 256 if min(m, n) >= 1024 else 128
            mult = 6
            budget = PANEL_VMEM_BUDGET_BYTES
        while mult * m * w * itemsize > budget and w > LANE // 2:
            w //= 2
        return max(w, 32)


def default_config() -> LUConfig:
    return LUConfig()


def full_matmul_precision(fn):
    """Trace ``fn`` under ``jax.default_matmul_precision('highest')``.

    On TPU, f32 matmuls at DEFAULT precision run bf16 multiply passes
    (eps ~ 8e-3) — catastrophic for a factorization whose accuracy
    contract is ~n*eps(f32) (the reference's residual gate,
    test/runtests.jl:17-18).  HIGHEST uses 6-pass f32 emulation on the
    MXU.  The deliberate reduced-precision path is the explicit
    ``schur_precision='bf16'`` knob (ops/schur.py), which bypasses this
    via explicit bf16 operands.
    """
    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def trace32(fn):
    """Trace ``fn`` with 64-bit weak-literal promotion disabled.

    Mosaic/TPU has no 64-bit types: when a user enables
    ``jax_enable_x64`` (normal for f64 work — this package's own f64
    sweep does it), the f32 Pallas kernels' Python int/float literals
    weakly promote to i64/f64 during kernel tracing, and Mosaic's
    unsupported-conversion helper recurses INFINITELY trying to lower
    the convert — a RecursionError at jit-lower time for any matrix
    size (measured 2026-08-19, jax 0.9, v5e).  Wrapping every Pallas
    wrapper's trace in ``jax.enable_x64(False)`` pins the kernels'
    literal promotion to 32-bit regardless of the process setting; the
    kernels only ever receive 32-bit operands (routing guarantees it),
    so array dtypes are unaffected.

    The guard skips when the input itself is a 64-bit dtype (the
    f64/c128 interpret-mode paths of the CPU test suite): disabling x64
    there would truncate the kernel's own intermediates to 32-bit and
    mismatch the 64-bit refs.  Such inputs never reach Mosaic (routing
    sends them to interpret mode or pure-JAX paths)."""
    import jax
    import numpy as np

    def _is64(a):
        try:
            dt = np.dtype(a.dtype)
        except Exception:
            return False
        return dt.itemsize == 8 and dt.kind in "fiu" or dt == np.complex128

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if args and _is64(args[0]):
            return fn(*args, **kwargs)
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


def is_tpu_backend() -> bool:
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False

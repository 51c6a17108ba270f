"""Kernel-routing matrix tests (VERDICT r3 item 6).

The empirical Mosaic crash-class workarounds (fori->shadow fallback,
no-pivot width cap, blocked_panel_variant) and the measured dispatch
thresholds (xla delegation, whole-matrix gate, micro/tail resolution)
are hard-coded to v5e 2026-08 behavior.  These tests pin every routing
decision as a pure function of (shape, dtype, pivot, config, backend)
so a future JAX/Mosaic bump cannot silently re-route the default path
to slower kernels or re-expose a crash: any change to the routing
tables fails here first and must be re-measured.

All decisions are trace-time statics; the `tpu=` override lets a CPU
session pin the TPU routing (the reference's analog is the implicit
dispatch coverage of its dtype x size sweep, ref test/runtests.jl:31-66
exercising src/lu.jl:63-118).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import recursivefactorization_jl_tpu as rf
from recursivefactorization_jl_tpu.models.lu import dispatch_route
from recursivefactorization_jl_tpu.ops.blocked import resolve_blocked_schedule
from recursivefactorization_jl_tpu.ops.panel import _use_pallas, panel_route
from recursivefactorization_jl_tpu.utils.config import LUConfig

CFG = LUConfig()


# ---------------------------------------------------------------------------
# LUConfig resolvers
# ---------------------------------------------------------------------------


class TestResolvedPanelWidth:
    @pytest.mark.parametrize(
        "m,n,itemsize,expect",
        [
            # fori kernels: 512 from minmn>=2048, 256 below; ~3x panel
            # bytes against the 100 MiB fori budget
            (512, 512, 4, 256),
            (1024, 1024, 4, 256),
            (2048, 2048, 4, 512),
            (4096, 4096, 4, 512),
            (8192, 8192, 4, 512),
            # m=16384 f32 w=512: 3*16384*512*4 = 96 MiB <= 100 MiB budget
            (16384, 16384, 4, 512),
            # m=32768 f32: w=512 is 192 MiB -> halve once to 256 (96 MiB)
            (32768, 32768, 4, 256),
            # f64 doubles the footprint: 16384 drops to 256
            (4096, 4096, 8, 512),
            (16384, 16384, 8, 256),
        ],
    )
    def test_fori_widths(self, m, n, itemsize, expect):
        assert CFG.resolved_panel_width(m, n, itemsize) == expect

    @pytest.mark.parametrize(
        "m,n,itemsize,expect",
        [
            # static-unroll kernels: 256 from minmn>=1024, 128 below;
            # ~6x panel bytes against the 26 MiB panel budget
            (512, 512, 4, 128),
            (2048, 2048, 4, 256),
            (4096, 4096, 4, 256),   # 24 MiB <= 26 MiB
            (8192, 8192, 4, 128),   # 256 would be 48 MiB
            (32768, 32768, 4, 64),  # halving floors at LANE//2
        ],
    )
    def test_shadow_widths(self, m, n, itemsize, expect):
        cfg = LUConfig(panel_variant="shadow")
        assert cfg.resolved_panel_width(m, n, itemsize) == expect

    def test_explicit_width_honored(self):
        cfg = LUConfig(panel_width=192)
        assert cfg.resolved_panel_width(32768, 32768, 8) == 192


class TestResolvedPanelMicro:
    def test_auto_wide_band(self):
        # 64 only for whole-matrix calls with minmn in [1024, 2048)
        assert CFG.resolved_panel_micro(1024, 1024) == 64
        assert CFG.resolved_panel_micro(1536, 1536) == 64
        assert CFG.resolved_panel_micro(2047, 2047) == 64

    def test_auto_outside_band(self):
        assert CFG.resolved_panel_micro(512, 512) == 32
        assert CFG.resolved_panel_micro(2048, 2048) == 32
        # blocked-schedule panels (w <= 512) always resolve 32
        assert CFG.resolved_panel_micro(4096, 512) == 32
        assert CFG.resolved_panel_micro(8192, 512) == 32

    def test_explicit_passthrough(self):
        assert LUConfig(panel_micro=16).resolved_panel_micro(1024, 1024) == 16


class TestResolvedXlaThreshold:
    def test_auto_tpu_f32(self):
        assert (
            CFG.resolved_xla_threshold(jnp.float32, tpu=True)
            == LUConfig.AUTO_XLA_THRESHOLD
        )

    def test_auto_tpu_other_dtypes(self):
        assert CFG.resolved_xla_threshold(jnp.float64, tpu=True) is None
        assert CFG.resolved_xla_threshold(jnp.bfloat16, tpu=True) is None

    def test_auto_cpu(self):
        assert CFG.resolved_xla_threshold(jnp.float32, tpu=False) is None

    def test_explicit_any_backend(self):
        cfg = LUConfig(xla_threshold=64)
        assert cfg.resolved_xla_threshold(jnp.float64, tpu=False) == 64
        assert LUConfig(xla_threshold=None).resolved_xla_threshold(
            jnp.float32, tpu=True
        ) is None


class TestResolvedTailThreshold:
    def test_auto_fori(self):
        assert CFG.resolved_tail_threshold() == CFG.small_threshold

    def test_auto_non_fori(self):
        assert LUConfig(panel_variant="shadow").resolved_tail_threshold() is None

    def test_auto_respects_blocked_variant_override(self):
        cfg = LUConfig(panel_variant="fori3", blocked_panel_variant="shadow")
        assert cfg.resolved_tail_threshold() is None

    def test_explicit(self):
        assert LUConfig(tail_threshold=512).resolved_tail_threshold() == 512
        assert LUConfig(tail_threshold=None).resolved_tail_threshold() is None


class TestResolvedSchurPrecision:
    def test_auto_bf16x3_band(self):
        # bf16x3 only on the TPU f32 blocked path at minmn >= 4096
        assert CFG.resolved_schur_precision(4096, jnp.float32, tpu=True) == "bf16x3"
        assert CFG.resolved_schur_precision(8192, jnp.float32, tpu=True) == "bf16x3"

    def test_auto_f32_everywhere_else(self):
        assert CFG.resolved_schur_precision(4095, jnp.float32, tpu=True) == "float32"
        assert CFG.resolved_schur_precision(2048, jnp.float32, tpu=True) == "float32"
        assert CFG.resolved_schur_precision(4096, jnp.float64, tpu=True) == "float32"
        assert CFG.resolved_schur_precision(4096, jnp.complex64, tpu=True) == "float32"
        assert CFG.resolved_schur_precision(4096, jnp.float32, tpu=False) == "float32"

    def test_explicit_passthrough(self):
        for p in ("float32", "bf16x3", "bf16"):
            cfg = LUConfig(schur_precision=p)
            assert cfg.resolved_schur_precision(8192, jnp.float32, tpu=True) == p


class TestPanelBoundaryPrecisionResolution:
    """The in-panel boundary knob's 'auto' resolves on a
    (TPU, f32, minmn >= AUTO_BPREC_MIN=8192) gate — its OWN gate, not
    the Schur knob's 4096: bprec measured its win only at n=8192
    (+3%, perf/results_r05_phase.json) and the bprec panel graphs at
    n=4096 deterministically crash the Mosaic compile helper
    (perf/experiments/r5_bisect4096.py, 2026-08-20)."""

    def test_auto_bf16x3_band(self):
        f = CFG.resolved_panel_boundary_precision
        assert f(8192, jnp.float32, tpu=True) == "bf16x3"
        assert f(12288, jnp.float32, tpu=True) == "bf16x3"

    def test_auto_float32_everywhere_else(self):
        f = CFG.resolved_panel_boundary_precision
        # 4096 is float32 BY REQUIREMENT: bf16x3 boundaries crash the
        # 4096 compile (r5 bisect) — this pin is load-bearing
        assert f(4096, jnp.float32, tpu=True) == "float32"
        assert f(8191, jnp.float32, tpu=True) == "float32"
        assert f(2048, jnp.float32, tpu=True) == "float32"
        assert f(8192, jnp.float64, tpu=True) == "float32"
        assert f(8192, jnp.float32, tpu=False) == "float32"

    def test_explicit_passthrough(self):
        for p in ("float32", "bf16x3"):
            cfg = LUConfig(panel_boundary_precision=p)
            assert (
                cfg.resolved_panel_boundary_precision(
                    8192, jnp.float32, tpu=True
                )
                == p
            )


# ---------------------------------------------------------------------------
# _use_pallas backend gate
# ---------------------------------------------------------------------------


class TestUsePallas:
    def test_auto(self):
        assert _use_pallas(jnp.dtype(jnp.float32), CFG, tpu=True)
        assert not _use_pallas(jnp.dtype(jnp.float64), CFG, tpu=True)
        assert not _use_pallas(jnp.dtype(jnp.float32), CFG, tpu=False)

    def test_forced(self):
        assert _use_pallas(
            jnp.dtype(jnp.float64), LUConfig(backend="pallas"), tpu=False
        )
        assert not _use_pallas(
            jnp.dtype(jnp.float32), LUConfig(backend="xla"), tpu=True
        )


# ---------------------------------------------------------------------------
# blocked-schedule resolution (the crash-class fallbacks)
# ---------------------------------------------------------------------------


class TestResolveBlockedSchedule:
    def test_default_4096_f32_tpu(self):
        # the default n=4096 on-chip path: fori3 panels at w=512
        cfg, w = resolve_blocked_schedule(
            4096, 4096, jnp.float32, True, CFG, tpu=True
        )
        assert cfg.panel_variant == "fori3" and w == 512

    def test_fori_to_shadow_fallback(self):
        # v5e crash class: fori panels below w=512 at minmn>=4096 on the
        # Pallas path must re-route to the shadow kernel class
        cfg, w = resolve_blocked_schedule(
            32768, 32768, jnp.float32, True, CFG, tpu=True
        )
        assert cfg.panel_variant == "shadow"
        assert w == 64  # shadow width resolution at m=32768

    def test_no_fallback_off_tpu(self):
        cfg, w = resolve_blocked_schedule(
            32768, 32768, jnp.float32, True, CFG, tpu=False
        )
        assert cfg.panel_variant == "fori3" and w == 256

    def test_no_fallback_f64(self):
        # f64 never takes the Pallas path -> fori JAX-loop panels keep
        # their width (no Mosaic involved)
        cfg, w = resolve_blocked_schedule(
            32768, 32768, jnp.float64, True, CFG, tpu=True
        )
        # f64 doubles the footprint: 3*32768*128*8 = 96 MiB fits
        assert cfg.panel_variant == "fori3" and w == 128

    def test_nopivot_width_cap(self):
        # v5e crash class (no-pivot flavor): auto width capped at 128
        # for minmn >= 4096
        cfg, w = resolve_blocked_schedule(
            4096, 4096, jnp.float32, False, CFG, tpu=True
        )
        assert cfg.panel_variant == "fori3" and w == 128

    def test_nopivot_cap_spares_small(self):
        _, w = resolve_blocked_schedule(
            2048, 2048, jnp.float32, False, CFG, tpu=True
        )
        assert w == 512

    def test_nopivot_explicit_width_honored(self):
        cfg = LUConfig(panel_width=256)
        _, w = resolve_blocked_schedule(
            4096, 4096, jnp.float32, False, cfg, tpu=True
        )
        assert w == 256

    def test_blocked_variant_override(self):
        cfg = LUConfig(panel_variant="fori3", blocked_panel_variant="shadow")
        out, w = resolve_blocked_schedule(
            4096, 4096, jnp.float32, True, cfg, tpu=True
        )
        assert out.panel_variant == "shadow" and w == 256


# ---------------------------------------------------------------------------
# panel_factor routing
# ---------------------------------------------------------------------------


class TestPanelRoute:
    def test_fori_direct_any_width(self):
        # fori kernels take whole-matrix widths directly while resident
        assert panel_route(2048, 2048, jnp.float32, CFG, tpu=True) == "pallas"
        assert panel_route(4096, 512, jnp.float32, CFG, tpu=True) == "pallas"

    def test_fori_residency_bound_splits(self):
        # beyond the fori VMEM budget the wide call splits into a
        # blocked schedule of inner-width panels
        assert panel_route(8192, 8192, jnp.float32, CFG, tpu=True) == "split"

    def test_static_kernels_cap_at_inner(self):
        cfg = LUConfig(panel_variant="shadow")
        assert panel_route(2048, 512, jnp.float32, cfg, tpu=True) == "split"
        assert panel_route(2048, 256, jnp.float32, cfg, tpu=True) == "pallas"

    def test_non_pallas_unblocked(self):
        assert panel_route(2048, 256, jnp.float64, CFG, tpu=True) == "unblocked"
        assert panel_route(256, 256, jnp.float32, CFG, tpu=False) == "unblocked"
        # wide non-Pallas calls still split to inner-width sub-panels
        assert panel_route(512, 512, jnp.float32, CFG, tpu=False) == "split"

    def test_c64_split_plane_kernel(self):
        # c64 on TPU rides the split-plane fori kernel (round 5) —
        # whole matrices to the 2-plane VMEM bound, splits above it;
        # c128 has no kernel, CPU stays on the pure-JAX loop
        assert panel_route(1024, 1024, jnp.complex64, CFG, tpu=True) == "pallas-c64"
        assert panel_route(4096, 512, jnp.complex64, CFG, tpu=True) == "pallas-c64"
        assert panel_route(4096, 4096, jnp.complex64, CFG, tpu=True) == "split"
        assert panel_route(1024, 1024, jnp.complex128, CFG, tpu=True) == "split"
        assert panel_route(256, 256, jnp.complex128, CFG, tpu=True) == "unblocked"
        assert panel_route(256, 256, jnp.complex64, CFG, tpu=False) == "unblocked"
        # the c64 kernel is fori-only: a static variant config skips it
        cfg = LUConfig(panel_variant="shadow")
        assert panel_route(256, 256, jnp.complex64, cfg, tpu=True) == "unblocked"


# ---------------------------------------------------------------------------
# top-level dispatch
# ---------------------------------------------------------------------------


class TestDispatchRoute:
    @pytest.mark.parametrize(
        "shape,dtype,pivot,tpu,expect",
        [
            # generic fallback: non-float non-complex dtypes, empty dims
            ((0, 5), jnp.float32, True, True, "generic"),
            # half-precision inputs promote to the f32 fast path
            # (exact cast, factors rounded back — VERDICT r4 weak #4:
            # bf16 was classified fast but had no fast path)
            ((64, 64), jnp.float16, True, True, "promote"),
            ((512, 512), jnp.bfloat16, True, True, "promote"),
            ((4096, 4096), jnp.bfloat16, True, True, "promote"),
            # pivoted c64 on TPU: native split-plane kernel only inside
            # the measured window [1024, 1536] — delegated below (tie
            # within noise through 768, perf/results_r05_c64.json) and
            # above (Mosaic compile-crash class from n=2048)
            ((512, 512), jnp.complex64, True, True, "xla"),
            ((130, 132), jnp.complex64, True, True, "xla"),
            ((1024, 1024), jnp.complex64, True, True, "whole"),
            ((1536, 1536), jnp.complex64, True, True, "whole"),
            ((2048, 2048), jnp.complex64, True, True, "xla"),
            ((4096, 4096), jnp.complex64, True, True, "xla"),
            # c64 off the delegated path on TPU takes the split-plane
            # Pallas kernel through the whole/blocked routes (round 5);
            # no-pivot can't delegate, so above the native ceiling it
            # keeps the pure-JAX-panel complex routes
            ((512, 512), jnp.complex64, False, True, "whole"),
            ((1536, 1537), jnp.complex64, False, True, "blocked"),
            ((4096, 4096), jnp.complex64, False, True, "complex-blocked"),
            # complex with no Pallas kernel (C128, CPU): unblocked to
            # small_threshold, blocked above; fat complex goes blocked
            # (its fat wrapper needs the TRSM tail)
            ((512, 512), jnp.complex64, True, False, "complex-unblocked"),
            ((4096, 4096), jnp.complex128, True, True, "complex-blocked"),
            ((130, 132), jnp.complex128, True, True, "complex-blocked"),
            # the delegation band: platform kernel through n=1535 on the
            # TPU f32 pivoted path (round-4 whole-band calibration,
            # perf/results_r04_band.json), package kernels from 1536 up
            ((512, 512), jnp.float32, True, True, "xla"),
            ((1024, 1024), jnp.float32, True, True, "xla"),
            ((1535, 1535), jnp.float32, True, True, "xla"),
            ((1536, 1536), jnp.float32, True, True, "whole"),
            ((2048, 2048), jnp.float32, True, True, "whole"),
            ((2049, 2049), jnp.float32, True, True, "blocked"),
            ((4096, 4096), jnp.float32, True, True, "blocked"),
            # fat shapes delegate by minmn
            ((512, 1024), jnp.float32, True, True, "xla"),
            # no escape for: no-pivot, f64, or off-TPU
            ((512, 512), jnp.float32, False, True, "whole"),
            ((512, 512), jnp.float64, True, True, "whole"),
            ((512, 512), jnp.float32, True, False, "whole"),
            ((4096, 4096), jnp.float64, True, True, "blocked"),
            # fat shapes delegate by minmn under the threshold...
            ((1024, 2048), jnp.float32, True, True, "xla"),
            # ...and go blocked above it (whole needs m >= n)
            ((2048, 4096), jnp.float32, True, True, "blocked"),
        ],
    )
    def test_default_config(self, shape, dtype, pivot, tpu, expect):
        assert dispatch_route(shape, dtype, pivot, tpu=tpu) == expect

    def test_xla_threshold_overrides(self):
        cfg = LUConfig(xla_threshold=None)
        assert dispatch_route((512, 512), jnp.float32, True, cfg, tpu=True) == "whole"
        cfg = LUConfig(xla_threshold=64)
        # explicit int honored on any backend/dtype
        assert dispatch_route((32, 32), jnp.float64, True, cfg, tpu=False) == "xla"
        assert (
            dispatch_route((128, 128), jnp.float64, True, cfg, tpu=False)
            == "whole"
        )

    def test_physical_schedule_gates(self):
        cfg = LUConfig(schedule="physical", xla_threshold=None)
        # f32 on chip and anything off-chip run physical; other dtypes
        # on chip fall through to the swap schedule
        assert dispatch_route((1024, 1024), jnp.float32, True, cfg, tpu=True) == "physical"
        assert dispatch_route((1024, 1024), jnp.float64, True, cfg, tpu=True) == "whole"
        assert dispatch_route((1024, 1024), jnp.float64, True, cfg, tpu=False) == "physical"
        # the xla escape outranks physical (dispatch order)
        cfg2 = LUConfig(schedule="physical")
        assert dispatch_route((512, 512), jnp.float32, True, cfg2, tpu=True) == "xla"

    def test_delegated_complex_shapes_and_solves(self):
        # pivoted c64 on TPU delegates at every size (round 4); pin on
        # CPU (explicit-int threshold is honored on any backend) that
        # the delegated route handles square AND fat/tall complex
        # shapes and that all three trans solves work on its factors
        rng = np.random.RandomState(3)
        cfg = LUConfig(xla_threshold=4096)
        for shape in [(24, 24), (24, 32), (40, 24)]:
            A = (rng.standard_normal(shape)
                 + 1j * rng.standard_normal(shape)).astype(np.complex64)
            F = rf.lu(jnp.asarray(A), config=cfg)
            L, U, p = np.asarray(F.L), np.asarray(F.U), np.asarray(F.p)
            assert np.max(np.abs(L @ U - A[p, :])) < 1e-5, shape
            assert int(F.info) == 0
        A = (rng.standard_normal((32, 32))
             + 1j * rng.standard_normal((32, 32))).astype(np.complex64)
        F = rf.lu(jnp.asarray(A), config=cfg)
        b = jnp.asarray(
            (rng.standard_normal(32)
             + 1j * rng.standard_normal(32)).astype(np.complex64)
        )
        for tr, M in (("N", A), ("T", A.T), ("H", A.conj().T)):
            x = np.asarray(rf.lu_solve(F, b, trans=tr))
            assert np.max(np.abs(M @ x - np.asarray(b))) < 1e-4, tr

    def test_execution_matches_route(self):
        # the dispatcher executes what dispatch_route reports: factor a
        # matrix on each CPU-reachable route and verify L@U == A[p, :]
        rng = np.random.RandomState(0)
        for shape, dtype, pivot, cfg in [
            ((20, 20), np.float16, True, None),                     # promote
            ((24, 24), np.complex64, True, None),                   # c-unblocked
            ((40, 40), np.complex128, True, LUConfig(small_threshold=16, panel_width=16)),  # c-blocked
            ((32, 32), np.float64, True, LUConfig(xla_threshold=64)),  # xla
            ((32, 32), np.float64, True, LUConfig(schedule="physical", small_threshold=8, panel_width=8)),  # physical
            ((32, 32), np.float64, True, None),                     # whole
            ((64, 64), np.float64, True, LUConfig(small_threshold=16, panel_width=16)),  # blocked
        ]:
            A = rng.rand(*shape).astype(dtype) + np.eye(*shape, dtype=dtype)
            if np.issubdtype(dtype, np.complexfloating):
                A = A + 1j * rng.rand(*shape).astype(A.real.dtype)
            F = rf.lu(jnp.asarray(A), pivot, config=cfg)
            L, U, p = np.asarray(F.L), np.asarray(F.U), np.asarray(F.p)
            resid = np.max(np.abs(L @ U - A[p, :]))
            tol = 1e-2 if dtype == np.float16 else 1e-4
            assert resid < tol, (shape, dtype, resid)

"""Config, warmup, and precision-mode tests."""

import numpy as np

import jax.numpy as jnp

import recursivefactorization_jl_tpu as rf
from recursivefactorization_jl_tpu.models.lu import normalize_pivot
from recursivefactorization_jl_tpu.utils.config import LUConfig
from recursivefactorization_jl_tpu.utils.warmup import warmup

import pytest

RNG = np.random.RandomState(9)


def test_normalize_pivot():
    assert normalize_pivot(True) is True
    assert normalize_pivot(False) is False
    assert normalize_pivot(None) is False
    assert normalize_pivot("partial") is True
    assert normalize_pivot("RowMaximum") is True
    assert normalize_pivot("NoPivot") is False
    assert normalize_pivot("none") is False
    with pytest.raises(ValueError):
        normalize_pivot("bogus")


def test_resolved_panel_width_vmem_bound():
    cfg = LUConfig()
    # explicit width wins
    assert LUConfig(panel_width=64).resolved_panel_width(4096, 4096, 4) == 64
    # huge m shrinks the panel to fit VMEM (2*m*w*4 + m*512 <= budget)
    w_small = cfg.resolved_panel_width(512, 512, 4)
    w_huge = cfg.resolved_panel_width(65536, 65536, 4)
    assert w_huge < w_small
    assert w_huge >= 32
    # fori panels afford the proven ~50 MiB class: w=512 up to m=8192
    # f32 (the n=2048 whole-matrix call has the same footprint), so the
    # blocked schedule never auto-picks the w=256 compile-crash class
    # at headline sizes.
    assert cfg.resolved_panel_width(4096, 4096, 4) == 512
    assert cfg.resolved_panel_width(8192, 8192, 4) == 512


def test_blocked_panel_variant_override():
    """blocked_panel_variant pins the blocked schedule's panel kernel
    independently of the whole-matrix path; results must agree with the
    default-variant schedule (same algorithm, different kernel)."""
    import jax.numpy as jnp
    import recursivefactorization_jl_tpu as rf

    A = RNG.rand(96, 96).astype(np.float32)
    base = rf.LUConfig(panel_width=32, small_threshold=0)
    override = rf.LUConfig(
        panel_width=32, small_threshold=0, blocked_panel_variant="shadow"
    )
    assert override.resolved_blocked_variant() == "shadow"
    assert base.resolved_blocked_variant() == base.panel_variant
    F1 = rf.lu(jnp.asarray(A), config=base)
    F2 = rf.lu(jnp.asarray(A), config=override)
    np.testing.assert_array_equal(np.asarray(F1.ipiv), np.asarray(F2.ipiv))
    np.testing.assert_allclose(
        np.asarray(F1.factors), np.asarray(F2.factors), atol=2e-5
    )


def test_xla_threshold_auto_resolution():
    """'auto' resolves to None off-TPU (this suite runs on CPU) so the
    in-package kernels keep handling every size; explicit ints pass
    through."""
    from recursivefactorization_jl_tpu.utils.config import LUConfig
    import jax.numpy as jnp

    assert LUConfig().resolved_xla_threshold(jnp.dtype(jnp.float32)) is None
    assert LUConfig(xla_threshold=64).resolved_xla_threshold(
        jnp.dtype(jnp.float32)
    ) == 64
    assert LUConfig(xla_threshold=None).resolved_xla_threshold(
        jnp.dtype(jnp.float32)
    ) is None


def test_panel_micro_auto_resolution():
    """'auto' picks 64 only for whole-matrix-sized calls in
    [1024, 2048); blocked-schedule panels (w <= 512) and every other
    size resolve 32.  Explicit ints pass through."""
    from recursivefactorization_jl_tpu.utils.config import LUConfig

    cfg = LUConfig()
    assert cfg.resolved_panel_micro(512, 512) == 32
    assert cfg.resolved_panel_micro(1024, 1024) == 64
    assert cfg.resolved_panel_micro(1536, 1536) == 64
    assert cfg.resolved_panel_micro(2048, 2048) == 32
    # blocked-schedule panels: tall (m, w<=512) blocks stay at 32
    assert cfg.resolved_panel_micro(4096, 512) == 32
    assert cfg.resolved_panel_micro(1024, 128) == 32
    assert LUConfig(panel_micro=8).resolved_panel_micro(1024, 1024) == 8


def test_bf16_schur_mode():
    """schur_precision='bf16' stays within a bf16-appropriate residual."""
    n = 160
    A = RNG.rand(n, n).astype(np.float32)
    cfg = LUConfig(
        panel_width=32, small_threshold=0, schur_precision="bf16"
    )
    F = rf.lu(jnp.asarray(A), True, config=cfg)
    L = np.tril(np.asarray(F.factors), -1) + np.eye(n)
    U = np.triu(np.asarray(F.factors))
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p), :]))
    # bf16 products: eps ~ 2^-8 per product term, f32 accumulate
    assert resid < n * 2.0 ** -8, resid


def test_warmup_runs():
    warmup(shapes=((16, 16), (8, 12)), dtypes=(jnp.float32,))


def test_bfloat16_dtype_path():
    """bf16 inputs factor through the fast-dtype dispatch; residual at
    bf16 precision level."""
    n = 48
    A = RNG.rand(n, n).astype(np.float32)
    F = rf.lu(jnp.asarray(A, dtype=jnp.bfloat16))
    f = np.asarray(F.factors, dtype=np.float32)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p), :]))
    assert resid < n * 2.0 ** -7, resid


def test_panel_boundary_precision_knob():
    """panel_boundary_precision='bf16x3' plumbs through to the fori
    kernels.  The split is a hand-built 3-pass bf16 sum (Mosaic rejects
    Precision.HIGH), so it runs REAL bf16x3 arithmetic on every backend
    — factors agree with the HIGHEST run to ~2^-21-level, and the
    reconstruction residual stays at f32-ish level.  Local fixed RNG:
    the factor-difference tolerance is matrix-dependent (growth factor
    amplifies the 2^-21 boundary rounding), so the matrix must not
    depend on which tests ran before this one."""
    n = 96
    A = np.random.RandomState(7).standard_normal((n, n)).astype(np.float32)
    cfg_hi = LUConfig(backend="pallas", panel_variant="fori3",
                      panel_micro=16, panel_outer=32)
    import dataclasses

    cfg_bp = dataclasses.replace(cfg_hi, panel_boundary_precision="bf16x3")
    F1 = rf.lu(jnp.asarray(A), config=cfg_hi)
    F2 = rf.lu(jnp.asarray(A), config=cfg_bp)
    assert int(F1.info) == int(F2.info) == 0
    np.testing.assert_array_equal(np.asarray(F1.ipiv), np.asarray(F2.ipiv))
    np.testing.assert_allclose(
        np.asarray(F1.factors), np.asarray(F2.factors), atol=2e-3
    )
    f = np.asarray(F2.factors, dtype=np.float64)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A.astype(np.float64)[np.asarray(F2.p), :]))
    assert resid < 5e-4, resid

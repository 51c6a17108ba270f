"""Opt-in real-TPU smoke suite: ``RF_TPU_TESTS=1 pytest -m tpu tests/``.

Runs every Pallas kernel NON-interpreted (compiled by Mosaic on the
chip) and cross-checks against host numpy/scipy oracles.  The default
CPU suite validates the same kernels only through the Pallas
interpreter, whose semantics deviate from Mosaic exactly where TPU
kernels usually break (minor-dim insertion, SSA carries, dynamic
indexing rules) — this suite closes that gap.

All assertions are f32-tolerance (f64 on TPU is emulated); oracle math
runs in numpy f64 on the host.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import recursivefactorization_jl_tpu as rf

pytestmark = pytest.mark.tpu

RNG = np.random.RandomState(42)


def _on_tpu():
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="needs the real TPU backend"
)


def np_residual(A, factors, perm):
    A = np.asarray(A, dtype=np.float64)
    f = np.asarray(factors, dtype=np.float64)
    m, n = f.shape
    minmn = min(m, n)
    L = np.tril(f[:, :minmn], -1) + np.eye(m, minmn)
    U = np.triu(f[:minmn, :])
    return np.max(np.abs(L @ U - A[np.asarray(perm), :]))


@requires_tpu
def test_complex64_blocked_on_chip():
    """Complex64 through the blocked schedule on the chip: the
    TRSM/Schur matmuls run as native MXU C64 ops.

    Runs FIRST in this module: the axon runtime intermittently reports
    UNIMPLEMENTED at execute time for complex executables loaded late
    in a process that has already run several large f32 programs
    (deterministic under pytest ordering, not reproducible standalone —
    the identical sequence in a plain script passes).  Early placement
    sidesteps the platform flake; the path itself is verified."""
    n = 384
    A = (
        RNG.standard_normal((n, n)) + 1j * RNG.standard_normal((n, n))
    ).astype(np.complex64)
    # xla_threshold=None: pivoted c64 on TPU otherwise DELEGATES at
    # every size (round 4) — this test pins the in-package complex
    # blocked path; the delegated route is pinned separately below
    cfg = rf.LUConfig(panel_width=128, small_threshold=64,
                      xla_threshold=None)
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    f = np.asarray(F.factors)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p)]))
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))


@requires_tpu
def test_complex64_delegated_default_on_chip():
    """The DEFAULT pivoted c64 route on TPU is the platform escape
    below the native window (LUConfig.AUTO_XLA_THRESHOLD_C64 = 1023,
    round 5): pin that the delegated factors solve correctly and
    info == 0 on a well-conditioned matrix."""
    from recursivefactorization_jl_tpu.models.lu import dispatch_route

    n = 384
    assert dispatch_route((n, n), jnp.complex64, True, tpu=True) == "xla"
    A = (
        RNG.standard_normal((n, n)) + 1j * RNG.standard_normal((n, n))
    ).astype(np.complex64)
    F = rf.lu(jnp.asarray(A))
    assert int(F.info) == 0
    f = np.asarray(F.factors)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p)]))
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    x = np.asarray(rf.lu_solve(F, jnp.asarray(A[:, -1])))
    e = np.zeros(n); e[-1] = 1.0
    assert np.max(np.abs(x - e)) < 100 * 20 * n * np.finfo(np.float32).eps


@requires_tpu
@pytest.mark.parametrize("variant", ["shadow", "basic"])
def test_panel_kernel_on_chip(variant):
    from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

    m, w = 512, 128
    A = RNG.standard_normal((m, w)).astype(np.float32)
    out, piv, perm, info = jax.device_get(
        panel_factor_pallas(
            jnp.asarray(A), True, interpret=False, micro=32, variant=variant
        )
    )
    assert int(info) == 0
    assert np_residual(A, out, perm) < 20 * m * np.finfo(np.float32).eps
    # pivot sequence matches scipy exactly (first-occurrence argmax)
    import scipy.linalg

    _, piv_sp = scipy.linalg.lu_factor(A)
    np.testing.assert_array_equal(piv, piv_sp)


@requires_tpu
@pytest.mark.parametrize("pivot", [True, False])
def test_panel_zero_pivot_on_chip(pivot):
    from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

    m, w = 256, 64
    A = RNG.standard_normal((m, w)).astype(np.float32)
    A[:, 10] = 0.0
    out, piv, perm, info = jax.device_get(
        panel_factor_pallas(jnp.asarray(A), pivot, interpret=False, micro=32)
    )
    assert int(info) == (11 if pivot else -11)


@requires_tpu
def test_fori_whole_lu_on_chip():
    """The fori shadow kernel factoring a WHOLE n=1024 matrix in one
    Pallas call (VMEM-resident; round-3 small-medium-n design).  Checks
    residual, scipy ipiv parity, and zero-pivot info on chip."""
    from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

    n = 1024
    A = RNG.standard_normal((n, n)).astype(np.float32)
    out, piv, perm, info = jax.device_get(
        panel_factor_pallas(
            jnp.asarray(A), True, interpret=False, micro=32, variant="fori"
        )
    )
    assert int(info) == 0
    assert np_residual(A, out, perm) < 20 * n * np.finfo(np.float32).eps
    import scipy.linalg

    _, piv_sp = scipy.linalg.lu_factor(A)
    np.testing.assert_array_equal(piv, piv_sp)
    # zero-pivot info semantics through the fori kernel
    A2 = RNG.standard_normal((256, 256)).astype(np.float32)
    A2[:, 19] = 0.0
    _, _, _, info2 = jax.device_get(
        panel_factor_pallas(
            jnp.asarray(A2), True, interpret=False, micro=32, variant="fori"
        )
    )
    assert int(info2) == 20


@requires_tpu
def test_default_lu_first_in_package_size_on_chip():
    """The DEFAULT path at the first non-delegated size — n=1536, just
    above the round-4 whole-band delegation threshold (xla_threshold
    auto -> 1535, perf/results_r04_band.json): the in-package
    whole-matrix kernel (fori3, unroll 2).  Pins residual, scipy ipiv
    parity, and permutation validity on the real chip; also asserts
    n=1024 still factors correctly through the delegated route."""
    n = 1536
    assert rf.dispatch_route((n, n), jnp.float32, True, tpu=True) == "whole"
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F = rf.lu(jnp.asarray(A))
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    import scipy.linalg

    _, piv_sp = scipy.linalg.lu_factor(A)
    np.testing.assert_array_equal(np.asarray(F.ipiv), piv_sp)
    # the delegated route below the threshold stays correct too
    n2 = 1024
    assert rf.dispatch_route((n2, n2), jnp.float32, True, tpu=True) == "xla"
    A2 = RNG.standard_normal((n2, n2)).astype(np.float32)
    F2 = rf.lu(jnp.asarray(A2))
    assert int(F2.info) == 0
    assert np_residual(A2, F2.factors, F2.p) < (
        20 * n2 * np.finfo(np.float32).eps * np.max(np.abs(A2))
    )


@requires_tpu
def test_blocked_lu_4096_default_on_chip():
    """Headline-scale correctness pin: the DEFAULT schedule at n=4096
    (the exact path bench.py times: blocked with w=512 fori3 panels)
    must satisfy the reference residual gate on chip — not only at the
    n=512 smoke size.  (w=256 fori panels are known to crash the TPU
    compile helper — see LUConfig.blocked_panel_variant — so the
    default resolves w=512 there.)"""
    n = 4096
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F = rf.lu(jnp.asarray(A))
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    p = np.asarray(F.p)
    assert sorted(p) == list(range(n))


@requires_tpu
def test_blocked_lu_on_chip():
    n = 512
    A = RNG.standard_normal((n, n)).astype(np.float32)
    cfg = rf.LUConfig(small_threshold=0)  # force the blocked schedule
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    assert resid < 20 * n * np.finfo(np.float32).eps
    # solve through the chip too
    b = np.asarray(A[:, -1])
    x = np.asarray(rf.lu_solve(F, jnp.asarray(b)))
    rhs = np.zeros(n, dtype=np.float32)
    rhs[-1] = 1
    assert np.max(np.abs(x - rhs)) < 100 * 20 * n * np.finfo(np.float32).eps


@requires_tpu
def test_bf16x3_schur_refined_on_chip():
    """bf16x3 Schur + 2 refinement steps recovers the f32 solve gate at
    generic n=1024 (kappa * eps_bf16x3 << 1 so refinement contracts).
    Single-pass bf16 does NOT contract for generic matrices at this
    size (kappa ~ n, eps ~ 2^-8) — verified divergent on chip — so the
    bf16 pairing is exercised on a well-conditioned system instead."""
    n = 1024
    A = RNG.standard_normal((n, n)).astype(np.float32)
    cfg = rf.LUConfig(schur_precision="bf16x3", small_threshold=0)
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    b = np.asarray(A[:, -1])
    x = np.asarray(
        rf.lu_solve_refined(F, jnp.asarray(A), jnp.asarray(b), iters=2)
    )
    rhs = np.zeros(n, dtype=np.float32)
    rhs[-1] = 1
    E = 20 * n * np.finfo(np.float32).eps
    assert np.max(np.abs(x - rhs)) < 100 * E


@requires_tpu
def test_bf16_schur_refined_well_conditioned_on_chip():
    n = 1024
    A = RNG.standard_normal((n, n)).astype(np.float32) + np.float32(
        3 * np.sqrt(n)
    ) * np.eye(n, dtype=np.float32)
    cfg = rf.LUConfig(schur_precision="bf16", small_threshold=0)
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    b = RNG.standard_normal(n).astype(np.float32)
    x = np.asarray(
        rf.lu_solve_refined(F, jnp.asarray(A), jnp.asarray(b), iters=2)
    )
    r = np.abs(A.astype(np.float64) @ x.astype(np.float64) - b)
    # relative residual back at f32 level after refinement
    assert np.max(r) / np.max(np.abs(b)) < 1e-4


@requires_tpu
def test_physical_schedule_on_chip():
    """The physical (no row movement) schedule compiled by Mosaic: the
    noswap panel kernel's one-hot boundary algebra and the full-height
    masked Schur updates must reproduce a LAPACK-quality factorization.
    """
    n = 1024
    A = RNG.standard_normal((n, n)).astype(np.float32)
    cfg = rf.LUConfig(schedule="physical")
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    assert resid < 20 * n * np.finfo(np.float32).eps
    p = np.asarray(F.p)
    assert sorted(p) == list(range(n))


@requires_tpu
def test_bf16x3_schur_residual_on_chip():
    """schur_precision='bf16x3' (3-pass HIGH) must stay within a few
    bits of the f32 pivoted residual gate — it is only meaningful on
    TPU hardware (CPU HIGH == exact f32)."""
    n = 1024
    A = RNG.standard_normal((n, n)).astype(np.float32)
    cfg = rf.LUConfig(schur_precision="bf16x3", small_threshold=0)
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    # 8x headroom over the pivoted gate for the ~3 lost mantissa bits
    assert resid < 8 * 20 * n * np.finfo(np.float32).eps


@requires_tpu
@pytest.mark.parametrize("swap", [True, False])
def test_batched_kernels_on_chip(swap):
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_lu_pallas,
        batched_lu_pallas_noswap,
    )

    B, n = 300, 64
    A = RNG.standard_normal((B, n, n)).astype(np.float32)
    A[7, :, 3] = 0.0  # one singular matrix in the batch
    if swap:
        f, ipiv, perm, info = jax.device_get(
            batched_lu_pallas(jnp.asarray(A), True, interpret=False)
        )
    else:
        # col_chunks=8 is the production routing of
        # batched_lu_factor_perm above n=64 (bitwise == unchunked)
        f, perm, info = jax.device_get(
            batched_lu_pallas_noswap(
                jnp.asarray(A), True, interpret=False, col_chunks=8
            )
        )
    eps = np.finfo(np.float32).eps
    assert int(info[7]) == 4
    for i in [0, 7, 123, 299]:
        if int(info[i]) != 0:
            continue
        assert np_residual(A[i], f[i], perm[i]) < 20 * n * eps, i
    # spot-check swap-kernel pivot outputs: ipiv parity with scipy and
    # the in-kernel-tracked perm against the post-hoc composition
    if swap:
        import scipy.linalg

        from recursivefactorization_jl_tpu.utils.perm import ipiv_to_perm

        _, piv_sp = scipy.linalg.lu_factor(A[0])
        np.testing.assert_array_equal(ipiv[0], piv_sp)
        pref = jax.device_get(
            jax.vmap(lambda p: ipiv_to_perm(p, n))(jnp.asarray(ipiv))
        )
        np.testing.assert_array_equal(perm, pref)


@requires_tpu
def test_dispatch_small_fused_on_chip():
    """Small matrices through BOTH dispatch arms: the default config
    (auto xla_threshold -> platform kernel below the measured tie) and
    the in-package fused whole-matrix kernel (escape disabled)."""
    n = 200
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F = rf.lu(jnp.asarray(A))  # default: delegated below the tie point
    assert int(F.info) == 0
    assert np_residual(A, F.factors, F.p) < 20 * n * np.finfo(np.float32).eps
    F2 = rf.lu(jnp.asarray(A), config=rf.LUConfig(xla_threshold=None))
    assert int(F2.info) == 0
    assert np_residual(A, F2.factors, F2.p) < 20 * n * np.finfo(
        np.float32
    ).eps


@requires_tpu
def test_offset_panel_kernel_on_chip():
    """The TP schedule's offset Pallas panel kernel compiled by Mosaic:
    traced SMEM offset, dynamic-sublane swaps/substitution, masked
    boundary Schur — vs the pure-JAX offset chain."""
    from recursivefactorization_jl_tpu.ops.panel import (
        offset_panel_factor_pallas,
    )
    from recursivefactorization_jl_tpu.parallel.blockcyclic import (
        _offset_panel_lu,
    )

    H, w, ofs = 1024, 128, 256
    A = RNG.standard_normal((H, w)).astype(np.float32)
    f_k, piv_k, perm_k, info_k = jax.device_get(
        offset_panel_factor_pallas(
            jnp.asarray(A), ofs, True, interpret=False, micro=32, unroll=2
        )
    )
    f_o, piv_o, perm_o, info_o = jax.device_get(
        _offset_panel_lu(jnp.asarray(A), jnp.int32(ofs), True)
    )
    np.testing.assert_array_equal(piv_k, piv_o)
    np.testing.assert_array_equal(perm_k, perm_o)
    assert int(info_k) == int(info_o) == 0
    np.testing.assert_array_equal(f_k[:ofs], A[:ofs])
    # factored block residual: rows >= ofs, L (ofs+k.., k) unit-lower
    Ap = A[perm_k].astype(np.float64)[ofs : ofs + w + 64]
    fk = f_k.astype(np.float64)[ofs : ofs + w + 64]
    L = np.tril(fk, -1)[:, :w] + np.eye(w + 64, w)
    U = np.triu(f_k.astype(np.float64)[ofs : ofs + w])
    resid = np.max(np.abs(L @ U - Ap))
    scaled = resid / (H * np.finfo(np.float32).eps * np.max(np.abs(A)))
    assert scaled < 20, scaled


@requires_tpu
def test_tp_lu_pallas_panels_on_chip():
    """tp_lu over a ONE-device mesh on the real chip: the shard_map +
    psum + offset-Pallas-panel program compiled end to end by Mosaic
    (multi-device runs are covered by the CPU-mesh suite and the
    driver dryrun; this pins the kernel inside its real calling
    context on hardware)."""
    from jax.sharding import Mesh
    from recursivefactorization_jl_tpu.parallel.blockcyclic import (
        tp_lu_factor,
    )

    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    n, w = 1024, 128
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F, ipiv, info = tp_lu_factor(
        jnp.asarray(A), mesh, "tp", panel_width=w,
        config=rf.LUConfig(tp_panel_backend="pallas"),
    )
    assert int(info) == 0
    perm = np.arange(n)
    ip = np.asarray(ipiv)
    for k in range(n):
        perm[[k, ip[k]]] = perm[[ip[k], k]]
    resid = np_residual(A, F, perm)
    scaled = resid / (n * np.finfo(np.float32).eps * np.max(np.abs(A)))
    assert scaled < 20, scaled


@requires_tpu
def test_direct_blocked_lu_full_precision_on_chip():
    """Regression pin for the round-4 DEFAULT-precision corruption
    (docs/ROUND4.md §10): ``blocked_lu`` called DIRECTLY — outside the
    public wrappers' full_matmul_precision context — must still satisfy
    the residual gate on chip (its TRSM/Schur products carry explicit
    precision=FULL), and the degenerate D=1 ``tp_lu_factor`` must
    produce factors BITWISE equal to the plain blocked schedule's
    (same pivot decisions, same arithmetic; measured equal 2026-08-19
    post-fix, max delta 1.8e2 pre-fix)."""
    from jax.sharding import Mesh
    from recursivefactorization_jl_tpu.ops.blocked import blocked_lu
    from recursivefactorization_jl_tpu.parallel.blockcyclic import (
        tp_lu_factor,
    )

    n, w = 1024, 128
    A = RNG.standard_normal((n, n)).astype(np.float32)
    cfg = rf.LUConfig(panel_width=w, tail_threshold=None, small_threshold=0)
    F, ipiv, perm, info = jax.device_get(
        jax.jit(lambda a: blocked_lu(a, True, cfg))(jnp.asarray(A))
    )
    assert int(info) == 0
    scaled = np_residual(A, F, perm) / (
        n * np.finfo(np.float32).eps * np.max(np.abs(A))
    )
    assert scaled < 20, f"direct blocked_lu lost full precision: {scaled}"

    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    Ftp, ipivtp, infotp = tp_lu_factor(
        jnp.asarray(A), mesh, "tp", panel_width=w,
        config=rf.LUConfig(tp_panel_backend="pallas"),
    )
    np.testing.assert_array_equal(np.asarray(ipivtp), ipiv)
    np.testing.assert_array_equal(np.asarray(Ftp), F)


@requires_tpu
def test_blocked_lu_8192_on_chip():
    """The n >= 8192 regime (VERDICT r4 item 1): the framework's own
    scale claim — the 100 MiB fori budget keeps w=512 panels to m~16k
    (utils/config.py) and the crash-class fallbacks in ops/blocked.py
    gate exactly this region.  Factor n=8192 f32 through the DEFAULT
    schedule on chip; reference residual gate + perm validity."""
    n = 8192
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F = rf.lu(jnp.asarray(A))
    assert int(F.info) == 0
    resid = np_residual(A, F.factors, F.p)
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    p = np.asarray(F.p)
    assert sorted(p) == list(range(n))


@requires_tpu
def test_batched_solve_kernel_on_chip():
    """Lane-batched substitution kernel compiled by Mosaic: the full
    batched factor+solve pipeline (batched_lu_factor_perm ->
    batched_lu_solve_perm) at the 10k x 64 workload shape class."""
    from recursivefactorization_jl_tpu.parallel import (
        batched_lu_factor_perm,
        batched_lu_solve_perm,
    )

    B, n = 300, 64
    A = RNG.standard_normal((B, n, n)).astype(np.float32)
    b = RNG.standard_normal((B, n)).astype(np.float32)
    f, perm, info = batched_lu_factor_perm(jnp.asarray(A))
    x = np.asarray(
        batched_lu_solve_perm(f, perm, jnp.asarray(b))
    )
    eps = np.finfo(np.float32).eps
    for i in [0, 13, 299]:
        r = np.max(np.abs(A[i].astype(np.float64) @ x[i] - b[i]))
        assert r < 100 * 20 * n * eps * np.max(np.abs(A[i])), (i, r)
    # parity with the vmapped TRSM path on the same factors
    from recursivefactorization_jl_tpu.models.solve import _lu_solve_impl

    x_ref = np.asarray(jax.vmap(
        lambda fc, p, rhs: _lu_solve_impl(fc, p, rhs, True, 0)
    )(f, perm, jnp.asarray(b)))
    assert np.max(np.abs(x - x_ref)) < 1e-3 * np.max(np.abs(x_ref)), (
        np.max(np.abs(x - x_ref))
    )


# ---------------------------------------------------------------------------
# round 5 additions
# ---------------------------------------------------------------------------


def _wilkinson(n):
    A = np.zeros((n, n), dtype=np.float32)
    np.fill_diagonal(A, 1.0)
    A[:, -1] = 1.0
    A[np.tril_indices(n, -1)] = -1.0
    return A


@requires_tpu
def test_rbt_wilkinson_2048_on_chip():
    """RBT regression pin (VERDICT r4 weak #5): the n=2048 f32
    Wilkinson system — worst-case 2^n pivot-growth where pivoted f32 LU
    overflows to NaN — must solve through butterfly_solve on the real
    chip at f32-appropriate accuracy.  BASELINE.md's claim (2.3e-5,
    perf session) becomes a pinned gate here."""
    n = 2048
    A = _wilkinson(n)
    b = RNG.standard_normal(n).astype(np.float32)
    ws = rf.butterfly_workspace(jnp.asarray(A), jnp.asarray(b))
    x = np.asarray(rf.butterfly_solve(ws, refine=2))
    r = np.abs(A.astype(np.float64) @ x.astype(np.float64) - b)
    rel = np.max(r) / np.max(np.abs(b))
    assert rel < 1e-3, rel
    # pivoted LU on the same system overflows (the reason RBT exists)
    F = rf.lu(jnp.asarray(A), check=False)
    assert not np.all(np.isfinite(np.asarray(F.factors)))


@requires_tpu
def test_butterfly_solve_4096_on_chip():
    """Butterfly pipeline at scale (VERDICT r4 weak #5: the quadrant
    concats at n >= 4096 were untried on chip)."""
    n = 4096
    A = RNG.standard_normal((n, n)).astype(np.float32) + np.float32(
        2 * np.sqrt(n)
    ) * np.eye(n, dtype=np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    ws = rf.butterfly_workspace(jnp.asarray(A), jnp.asarray(b))
    x = np.asarray(rf.butterfly_solve(ws, refine=1))
    r = np.abs(A.astype(np.float64) @ x.astype(np.float64) - b)
    assert np.max(r) / np.max(np.abs(b)) < 1e-4


@requires_tpu
def test_bf16_promote_on_chip():
    """bf16 inputs ride the f32 fast path on chip (VERDICT r4 weak #4):
    the promote route delegates/kernels exactly like f32 and the
    factors round back to bf16 at bf16-level residual."""
    assert rf.dispatch_route((1536, 1536), jnp.bfloat16, True,
                             tpu=True) == "promote"
    n = 1536  # inner f32 dispatch -> the whole-matrix Pallas kernel
    A = RNG.standard_normal((n, n)).astype(np.float32)
    F = rf.lu(jnp.asarray(A, dtype=jnp.bfloat16))
    assert F.factors.dtype == jnp.bfloat16
    assert int(F.info) == 0
    f = np.asarray(F.factors, dtype=np.float64)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p), :].astype(np.float64)))
    # bf16 storage eps 2^-8; elimination ran in f32
    assert resid < n * 2.0 ** -7 * np.max(np.abs(A)), resid


@requires_tpu
def test_c64_native_kernel_on_chip():
    """The split-plane c64 fori kernel compiled by Mosaic (round 5):
    whole-matrix route with delegation off, residual + solve +
    scipy ipiv parity (CABS1 pivoting)."""
    n = 512
    A = (RNG.standard_normal((n, n))
         + 1j * RNG.standard_normal((n, n))).astype(np.complex64)
    cfg = rf.LUConfig(xla_threshold=None)
    assert rf.dispatch_route((n, n), jnp.complex64, True, cfg,
                             tpu=True) == "whole"
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    f = np.asarray(F.factors)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p)]))
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    import scipy.linalg

    _, piv_sp = scipy.linalg.lu_factor(A)
    np.testing.assert_array_equal(np.asarray(F.ipiv), piv_sp)
    x = np.asarray(rf.lu_solve(F, jnp.asarray(A[:, -1])))
    e = np.zeros(n); e[-1] = 1.0
    assert np.max(np.abs(x - e)) < 100 * 20 * n * np.finfo(np.float32).eps


@requires_tpu
def test_c64_default_native_window_on_chip():
    """Under the DEFAULT config, pivoted c64 at n=1024 routes to the
    native split-plane whole-matrix kernel (the measured-win window
    [1024, 1536], perf/results_r05_c64.json) — factor correctness and
    scipy ipiv parity on chip."""
    n = 1024
    assert rf.dispatch_route((n, n), jnp.complex64, True,
                             tpu=True) == "whole"
    A = (RNG.standard_normal((n, n))
         + 1j * RNG.standard_normal((n, n))).astype(np.complex64)
    F = rf.lu(jnp.asarray(A))
    assert int(F.info) == 0
    f = np.asarray(F.factors)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p)]))
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    import scipy.linalg

    _, piv_sp = scipy.linalg.lu_factor(A)
    np.testing.assert_array_equal(np.asarray(F.ipiv), piv_sp)


@requires_tpu
def test_c64_blocked_kernel_on_chip():
    """The c64 blocked schedule with split-plane Pallas panels on chip
    (above small_threshold the whole-matrix kernel can't hold both
    planes; panels + native-c64 MXU Schur)."""
    n = 640
    cfg = rf.LUConfig(xla_threshold=None, small_threshold=256,
                      panel_width=128)
    assert rf.dispatch_route((n, n), jnp.complex64, True, cfg,
                             tpu=True) == "blocked"
    A = (RNG.standard_normal((n, n))
         + 1j * RNG.standard_normal((n, n))).astype(np.complex64)
    F = rf.lu(jnp.asarray(A), config=cfg)
    assert int(F.info) == 0
    f = np.asarray(F.factors)
    L = np.tril(f, -1) + np.eye(n)
    U = np.triu(f)
    resid = np.max(np.abs(L @ U - A[np.asarray(F.p)]))
    assert resid < 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))


@requires_tpu
def test_fused_solve_on_chip():
    """solve(A, b) fused fat-LU path on chip: the rhs rides the
    whole-matrix fori kernel as LANE-padded extra columns (round 5)."""
    n = 1536  # first non-delegated size -> whole route, fused kernel
    A = RNG.standard_normal((n, n)).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    x = np.asarray(rf.solve(jnp.asarray(A), jnp.asarray(b)))
    r = np.abs(A.astype(np.float64) @ x.astype(np.float64) - b)
    E = 20 * n * np.finfo(np.float32).eps * np.max(np.abs(A))
    assert np.max(r) < 100 * E
    # delegated band: fused fat platform getrf
    n2 = 1024
    A2 = RNG.standard_normal((n2, n2)).astype(np.float32)
    b2 = RNG.standard_normal(n2).astype(np.float32)
    x2 = np.asarray(rf.solve(jnp.asarray(A2), jnp.asarray(b2)))
    r2 = np.abs(A2.astype(np.float64) @ x2.astype(np.float64) - b2)
    assert np.max(r2) < 100 * 20 * n2 * np.finfo(np.float32).eps * np.max(
        np.abs(A2)
    )


@requires_tpu
def test_batched_mid_n_escape_on_chip():
    """Batched mid-n escape hatch on chip (VERDICT r4 missing #2): a
    (B, 256, 256) f32 batch routes to the platform's batched lu, not
    the vmapped pure-JAX loop, and the results satisfy the gate."""
    from recursivefactorization_jl_tpu.parallel.batched import (
        _use_batched_pallas,
        _use_batched_xla,
    )
    from recursivefactorization_jl_tpu.parallel import batched_lu_factor_perm

    B, n = 64, 256
    cfg = rf.LUConfig()
    assert not _use_batched_pallas(jnp.dtype(jnp.float32), n, n, cfg)
    assert _use_batched_xla(jnp.float32, True, cfg)
    A = RNG.standard_normal((B, n, n)).astype(np.float32)
    f, perm, info = jax.device_get(batched_lu_factor_perm(jnp.asarray(A)))
    assert np.all(info == 0)
    eps = np.finfo(np.float32).eps
    for i in [0, 31, 63]:
        assert np_residual(A[i], f[i], perm[i]) < 20 * n * eps * np.max(
            np.abs(A[i])
        ), i

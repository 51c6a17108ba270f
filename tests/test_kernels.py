"""Pallas kernels in interpret mode vs the pure-JAX oracle.

On the CPU test host the kernels run through the Pallas interpreter;
the real-TPU path is the same program (`interpret` only switches the
executor), so these tests pin the kernel algorithm — fused pivot
search/swap/scale/rank-1 semantics of reference src/lu.jl:282-330 —
against `unblocked_lu`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recursivefactorization_jl_tpu.ops.batched_kernel import batched_lu_pallas
from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas
from recursivefactorization_jl_tpu.ops.unblocked import unblocked_lu

RNG = np.random.RandomState(5)


@pytest.mark.parametrize("variant", ["basic", "shadow", "fori"])
@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize("shape", [(16, 8), (32, 32), (17, 16), (40, 33)])
def test_panel_kernel_matches_unblocked(pivot, shape, variant):
    Anp = RNG.rand(*shape)
    if not pivot:
        # keep unpivoted growth bounded so the element-wise comparison
        # against the differently-associated oracle stays meaningful
        Anp = Anp + max(shape) * np.eye(*shape)
    A = jnp.asarray(Anp, dtype=jnp.float32)
    f_k, piv_k, perm_k, info_k = panel_factor_pallas(
        A, pivot, interpret=True, variant=variant
    )
    f_o, piv_o, perm_o, info_o = unblocked_lu(A, pivot)
    np.testing.assert_array_equal(np.asarray(piv_k), np.asarray(piv_o))
    np.testing.assert_array_equal(np.asarray(perm_k), np.asarray(perm_o))
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_o), atol=2e-5
    )
    assert int(info_k) == int(info_o) == 0


@pytest.mark.parametrize("variant", ["shadow", "fori"])
@pytest.mark.parametrize("pivot", [True, False])
def test_panel_kernel_zero_pivot(pivot, variant):
    A = RNG.rand(12, 8).astype(np.float32)
    A[:, 3] = 0.0
    f_k, piv_k, perm_k, info_k = panel_factor_pallas(
        jnp.asarray(A), pivot, interpret=True, variant=variant
    )
    f_o, piv_o, perm_o, info_o = unblocked_lu(jnp.asarray(A), pivot)
    assert int(info_k) == int(info_o) != 0
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_o), atol=2e-5
    )


@pytest.mark.parametrize("variant", ["fori", "fori2", "fori3"])
@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize(
    "shape,micro", [((130, 130), 16), ((96, 130), 32), ((300, 96), 16)]
)
def test_fori_kernel_wide_and_ragged(pivot, shape, micro, variant):
    """The fori kernel at shapes exercising its block structure: ragged
    final micro-block (130 % 16 != 0), fat trailing columns handled by
    the last boundary, tall panels.  Residual-gated (the blocked
    boundary Schur associates differently from the oracle's rank-1
    chain, so element-wise comparison would be vacuous at these sizes).
    """
    m, w = shape
    Anp = RNG.rand(*shape)
    if not pivot:
        Anp = Anp + max(shape) * np.eye(*shape)
    A = jnp.asarray(Anp, dtype=jnp.float32)
    f, piv, perm, info = panel_factor_pallas(
        A, pivot, interpret=True, micro=micro, variant=variant, outer=64
    )
    assert int(info) == 0
    minmn = min(m, w)
    fnp = np.asarray(f, dtype=np.float64)
    L = np.tril(fnp[:, :minmn], -1) + np.eye(m, minmn)
    U = np.triu(fnp[:minmn, :])
    resid = np.max(np.abs(L @ U - Anp[np.asarray(perm), :]))
    E = 20 * max(shape) * np.finfo(np.float32).eps * np.max(np.abs(Anp))
    assert resid < (E if pivot else 10 * np.sqrt(E)), resid
    # ipiv composes to the returned perm
    p2 = np.arange(m)
    pk = np.asarray(piv)
    for k in range(minmn):
        p2[[k, pk[k]]] = p2[[pk[k], k]]
    np.testing.assert_array_equal(p2, np.asarray(perm))


@pytest.mark.parametrize("variant", ["fori2", "fori3"])
@pytest.mark.parametrize("unroll", [2, 4])
@pytest.mark.parametrize("shape", [(64, 64), (48, 33)])
def test_fori_kernel_unroll_bitwise(variant, unroll, shape):
    """`unroll` repackages the SAME elimination steps (u per fori
    iteration, program order unchanged), so every output must be
    bitwise-identical to unroll=1 — including the ragged final
    micro-block, which falls back to the plain loop when the block
    width is not a multiple of the unroll factor."""
    A = jnp.asarray(RNG.rand(*shape), dtype=jnp.float32)
    base = panel_factor_pallas(
        A, True, interpret=True, micro=16, variant=variant, outer=32
    )
    got = panel_factor_pallas(
        A, True, interpret=True, micro=16, variant=variant, outer=32,
        unroll=unroll,
    )
    for b, g, name in zip(base, got, ["factors", "piv", "perm", "info"]):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(g), err_msg=name
        )


@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize("shape,w", [((48, 48), 16), ((70, 50), 16),
                                     ((33, 33), 8)])
def test_physical_schedule_matches_unblocked(pivot, shape, w):
    """blocked_lu_physical (noswap panel kernel + full-height masked
    trailing updates + one final gather) vs the oracle — f64 so the
    comparison is exact up to rounding noise, not association."""
    import recursivefactorization_jl_tpu as rf
    from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

    Anp = RNG.rand(*shape)
    if not pivot:
        Anp = Anp + max(shape) * np.eye(*shape)
    A = jnp.asarray(Anp)
    m, n = shape
    mn = min(shape)
    cfg = rf.LUConfig(schedule="physical", panel_width=w)
    f, prow, perm, info = _dispatch_factor(A, pivot, cfg)
    f_o, piv_o, perm_o, info_o = unblocked_lu(A, pivot)
    # pivot-row choices match the oracle; the TAIL order (rows never
    # chosen, m > n only) is implementation-defined — physical uses
    # ascending original index, the swap oracle leaves swap order.
    np.testing.assert_array_equal(
        np.asarray(perm)[:mn], np.asarray(perm_o)[:mn]
    )
    assert sorted(np.asarray(perm)) == list(range(m))
    np.testing.assert_allclose(
        np.asarray(f)[:mn], np.asarray(f_o)[:mn], atol=1e-12
    )
    # full-factor check via the residual identity L @ U == A[perm, :]
    L = np.tril(np.asarray(f)[:, :mn], -1) + np.eye(m, mn)
    U = np.triu(np.asarray(f)[:mn, :])
    resid = np.max(np.abs(L @ U - Anp[np.asarray(perm), :]))
    assert resid < 1e-12, resid
    assert int(info) == int(info_o) == 0
    if pivot:
        # prow is the perm prefix (pivot-row sequence), by contract
        np.testing.assert_array_equal(
            np.asarray(prow), np.asarray(perm)[:mn]
        )


def test_physical_schedule_zero_pivot_and_solve():
    import recursivefactorization_jl_tpu as rf
    from recursivefactorization_jl_tpu.models.lu import _dispatch_factor

    n = 40
    A = RNG.rand(n, n)
    A[:, 7] = 0.0
    cfg = rf.LUConfig(schedule="physical", panel_width=16)
    f, prow, perm, info = _dispatch_factor(jnp.asarray(A), True, cfg)
    _, _, _, info_o = unblocked_lu(jnp.asarray(A), True)
    assert int(info) == int(info_o) != 0

    B = RNG.rand(n, n) + n * np.eye(n)
    F = rf.lu(jnp.asarray(B), config=cfg)
    b = RNG.rand(n)
    x = np.asarray(rf.lu_solve(F, jnp.asarray(b)))
    np.testing.assert_allclose(B @ x, b, atol=1e-10)
    # det must be right under the perm-parity formula
    np.testing.assert_allclose(
        float(F.det()), np.linalg.det(B), rtol=1e-9
    )


@pytest.mark.parametrize("pivot", [True, False])
def test_batched_kernel_matches_unblocked(pivot):
    B, m, n = 11, 16, 16  # non-multiple of group -> exercises padding
    A = jnp.asarray(RNG.rand(B, m, n), dtype=jnp.float32)
    f_k, piv_k, perm_k, info_k = batched_lu_pallas(
        A, pivot, interpret=True, group=4
    )
    assert f_k.shape == (B, m, n) and piv_k.shape == (B, 16)
    for i in range(B):
        f_o, piv_o, perm_o, info_o = unblocked_lu(A[i], pivot)
        np.testing.assert_array_equal(
            np.asarray(piv_k[i]), np.asarray(piv_o)
        )
        np.testing.assert_array_equal(
            np.asarray(perm_k[i]), np.asarray(perm_o)
        )
        np.testing.assert_allclose(
            np.asarray(f_k[i]), np.asarray(f_o), atol=2e-5
        )
        assert int(info_k[i]) == int(info_o)


@pytest.mark.parametrize("pivot", [True, False])
def test_batched_noswap_kernel(pivot):
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_lu_pallas_noswap,
    )

    B, n = 9, 20
    Anp = RNG.rand(B, n, n)
    if not pivot:
        Anp = Anp + n * np.eye(n)
    A = jnp.asarray(Anp, dtype=jnp.float32)
    f, perm, info = batched_lu_pallas_noswap(
        A, pivot, interpret=True, group=4
    )
    assert np.all(np.asarray(info) == 0)
    for i in range(B):
        Fi = np.asarray(f[i])
        L = np.tril(Fi, -1) + np.eye(n)
        U = np.triu(Fi)
        p = np.asarray(perm[i])
        assert sorted(p) == list(range(n)), "perm must be a permutation"
        resid = np.max(np.abs(L @ U - Anp[i][p, :]))
        assert resid < 20 * n * np.finfo(np.float32).eps * np.max(
            np.abs(Anp[i])
        ) * (1 if pivot else 50), resid
        if pivot:
            # partial pivoting bounds multipliers by 1
            assert np.max(np.abs(L)) <= 1.0 + 1e-6


def test_batched_noswap_col_chunks_bitwise():
    """col_chunks only re-tiles the per-step passes; results must be
    bitwise identical to the single-pass kernel."""
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_lu_pallas_noswap,
    )

    B, n = 6, 28
    A = jnp.asarray(RNG.rand(B, n, n), dtype=jnp.float32)
    f1, p1, i1 = batched_lu_pallas_noswap(A, True, interpret=True, group=4)
    for cc in (2, 4, 5):
        f2, p2, i2 = batched_lu_pallas_noswap(
            A, True, interpret=True, group=4, col_chunks=cc
        )
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_batched_swap_perm_rect_fallback():
    """Rectangular batches can't track the perm in-kernel (perm has m
    entries, piv minmn); with_perm must fall back to composing ipiv and
    produce the same permutation contract."""
    from recursivefactorization_jl_tpu.utils.perm import ipiv_to_perm

    B, m, n = 5, 14, 10
    A = jnp.asarray(RNG.rand(B, m, n), dtype=jnp.float32)
    f, ipiv, perm, info = batched_lu_pallas(A, True, interpret=True, group=4)
    pref = jax.vmap(lambda p: ipiv_to_perm(p, m))(ipiv)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(pref))


def test_batched_noswap_zero_pivot_info():
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_lu_pallas_noswap,
    )

    B, n = 4, 12
    A = RNG.rand(B, n, n).astype(np.float32)
    A[2, :, 5] = 0.0
    f, perm, info = batched_lu_pallas_noswap(
        jnp.asarray(A), True, interpret=True, group=4
    )
    for i in range(B):
        _, _, _, info_o = unblocked_lu(jnp.asarray(A[i]), True)
        assert int(info[i]) == int(info_o)


def test_batched_kernel_zero_pivot():
    B, m, n = 4, 12, 12
    A = RNG.rand(B, m, n).astype(np.float32)
    A[2, :, 5] = 0.0  # matrix 2 singular at column 5
    f_k, piv_k, perm_k, info_k = batched_lu_pallas(
        jnp.asarray(A), True, interpret=True, group=4
    )
    for i in range(B):
        _, _, _, info_o = unblocked_lu(jnp.asarray(A[i]), True)
        assert int(info_k[i]) == int(info_o)


@pytest.mark.parametrize("unroll", [2, 3])
def test_batched_kernel_unroll_bitwise(unroll):
    """Batched lane-kernel `unroll` repackages the same steps (program
    order unchanged, remainder steps run statically) — all outputs
    bitwise-identical to unroll=1, both variants."""
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_lu_pallas_noswap,
    )

    A = jnp.asarray(RNG.rand(4, 20, 20), dtype=jnp.float32)
    b0 = batched_lu_pallas(A, interpret=True)
    bu = batched_lu_pallas(A, interpret=True, unroll=unroll)
    for x, y, name in zip(b0, bu, ["factors", "ipiv", "perm", "info"]):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )
    n0 = batched_lu_pallas_noswap(A, interpret=True, col_chunks=2)
    nu = batched_lu_pallas_noswap(
        A, interpret=True, col_chunks=2, unroll=unroll
    )
    for x, y, name in zip(n0, nu, ["factors", "perm", "info"]):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )


def test_batched_solve_kernel_matches_vmapped():
    """Lane-batched substitution kernel (VERDICT r4 item 5) vs the
    vmapped blocked-TRSM solve: same x (f32-level), vector and matrix
    rhs, including a unit-group padded batch."""
    from recursivefactorization_jl_tpu.ops.batched_kernel import (
        batched_solve_pallas,
    )
    from recursivefactorization_jl_tpu.models.solve import _lu_solve_impl

    B, n = 6, 16
    A = RNG.rand(B, n, n).astype(np.float32) + 2 * np.eye(n, dtype=np.float32)
    b = RNG.rand(B, n).astype(np.float32)
    Bm = RNG.rand(B, n, 3).astype(np.float32)
    f, ipiv, perm, info = batched_lu_pallas(
        jnp.asarray(A), True, interpret=True, group=4
    )
    # kernel takes PRE-permuted rhs
    bp = jnp.take_along_axis(jnp.asarray(b)[:, :, None],
                             perm[:, :, None], axis=1)
    x_k = batched_solve_pallas(f, bp, interpret=True, group=4)[:, :, 0]
    x_ref = jax.vmap(
        lambda fc, p, rhs: _lu_solve_impl(fc, p, rhs, True, 0)
    )(f, perm, jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x_k), np.asarray(x_ref), rtol=0, atol=1e-4
    )
    # residual sanity in f64
    for i in range(B):
        r = np.max(np.abs(A[i].astype(np.float64) @
                          np.asarray(x_k)[i].astype(np.float64) - b[i]))
        assert r < 1e-3, (i, r)
    # matrix rhs
    Bp = jnp.take_along_axis(jnp.asarray(Bm), perm[:, :, None], axis=1)
    X_k = batched_solve_pallas(f, Bp, interpret=True, group=4)
    X_ref = jax.vmap(
        lambda fc, p, rhs: _lu_solve_impl(fc, p, rhs, True, 0)
    )(f, perm, jnp.asarray(Bm))
    np.testing.assert_allclose(
        np.asarray(X_k), np.asarray(X_ref), rtol=0, atol=1e-4
    )
    # unroll tail path (n not divisible by unroll handled statically)
    x_u = batched_solve_pallas(f, bp, interpret=True, group=4, unroll=3)
    np.testing.assert_allclose(
        np.asarray(x_u)[:, :, 0], np.asarray(x_k), rtol=0, atol=1e-6
    )


def test_kernels_under_x64_mode():
    """jax_enable_x64 regression (round 4): with x64 on, weak Python
    literals inside the Pallas kernels promoted to i64/f64 and Mosaic's
    conversion helper recursed infinitely at lowering (RecursionError
    at ANY size on chip).  Every Pallas wrapper now traces under
    jax.enable_x64(False) (utils/config.py trace32), so results and
    dtypes must be identical with and without the process-wide flag."""
    import jax

    B, n = 3, 12
    A = RNG.rand(B, n, n).astype(np.float32)
    base_f, base_piv, base_perm, base_info = jax.device_get(
        batched_lu_pallas(jnp.asarray(A), True, interpret=True, group=4)
    )
    from recursivefactorization_jl_tpu.ops.panel import panel_factor_pallas

    pbase = jax.device_get(
        panel_factor_pallas(jnp.asarray(A[0]), True, interpret=True,
                            micro=4)
    )
    with jax.enable_x64(True):
        f, piv, perm, info = jax.device_get(
            batched_lu_pallas(jnp.asarray(A), True, interpret=True,
                              group=4)
        )
        p64 = jax.device_get(
            panel_factor_pallas(jnp.asarray(A[0]), True, interpret=True,
                                micro=4)
        )
    np.testing.assert_array_equal(f, base_f)
    np.testing.assert_array_equal(piv, base_piv)
    assert f.dtype == np.float32 and piv.dtype == np.int32
    for a, b in zip(p64, pbase):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# complex64 split-plane fori kernel (round 5)
# ---------------------------------------------------------------------------


def _c64_residual(A, f, perm):
    A = np.asarray(A, dtype=np.complex128)
    f = np.asarray(f, dtype=np.complex128)
    m, n = f.shape
    minmn = min(m, n)
    L = np.tril(f[:, :minmn], -1) + np.eye(m, minmn)
    U = np.triu(f[:minmn, :])
    return np.max(np.abs(L @ U - A[np.asarray(perm), :]))


@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize(
    "shape", [(32, 32, 8), (96, 32, 16), (64, 96, 32), (130, 130, 32)]
)
def test_c64_kernel_residual(pivot, shape):
    """Split-plane c64 fori kernel vs the residual gate: square, tall,
    fat and ragged shapes, both pivot modes."""
    m, w, micro = shape
    from recursivefactorization_jl_tpu.ops.panel import (
        panel_factor_pallas_c64,
    )

    Anp = (RNG.standard_normal((m, w))
           + 1j * RNG.standard_normal((m, w))).astype(np.complex64)
    if not pivot:
        mm = min(m, w)
        Anp[:mm, :mm] += 4 * max(m, w) * np.eye(mm, dtype=np.complex64)
    A = jnp.asarray(Anp)
    f, piv, perm, info = jax.device_get(
        panel_factor_pallas_c64(A, pivot, interpret=True, micro=micro)
    )
    assert f.dtype == np.complex64
    assert int(info) == 0
    assert sorted(np.asarray(perm)[: m]. tolist()) == list(range(m))
    gate = 20 * max(m, w) * np.finfo(np.float32).eps * np.max(np.abs(Anp))
    r = _c64_residual(Anp, f, perm)
    assert r < (gate if pivot else 10 * np.sqrt(gate)), (shape, pivot, r)
    if not pivot:
        np.testing.assert_array_equal(piv, np.arange(min(m, w)))


def test_c64_kernel_scipy_ipiv_parity():
    """CABS1 pivoting matches LAPACK cgetrf's pivot sequence (scipy)."""
    import scipy.linalg

    from recursivefactorization_jl_tpu.ops.panel import (
        panel_factor_pallas_c64,
    )

    n = 48
    Anp = (RNG.standard_normal((n, n))
           + 1j * RNG.standard_normal((n, n))).astype(np.complex64)
    f, piv, perm, info = jax.device_get(
        panel_factor_pallas_c64(jnp.asarray(Anp), True, interpret=True,
                                micro=16)
    )
    _, piv_sp = scipy.linalg.lu_factor(Anp)
    np.testing.assert_array_equal(piv, piv_sp)


def test_c64_kernel_zero_pivot_info():
    from recursivefactorization_jl_tpu.ops.panel import (
        panel_factor_pallas_c64,
    )

    m, w = 64, 32
    Anp = (RNG.standard_normal((m, w))
           + 1j * RNG.standard_normal((m, w))).astype(np.complex64)
    Anp[:, 7] = 0.0
    f, piv, perm, info = jax.device_get(
        panel_factor_pallas_c64(jnp.asarray(Anp), True, interpret=True,
                                micro=16)
    )
    assert int(info) == 8
    f2, _, _, info2 = jax.device_get(
        panel_factor_pallas_c64(jnp.asarray(Anp), False, interpret=True,
                                micro=16)
    )
    assert int(info2) == -8


def test_c64_kernel_unroll_bitwise():
    """unroll only regroups fori iterations — bitwise-identical."""
    from recursivefactorization_jl_tpu.ops.panel import (
        panel_factor_pallas_c64,
    )

    n = 64
    Anp = (RNG.standard_normal((n, n))
           + 1j * RNG.standard_normal((n, n))).astype(np.complex64)
    f1, piv1, perm1, _ = jax.device_get(
        panel_factor_pallas_c64(jnp.asarray(Anp), True, interpret=True,
                                micro=16, unroll=1)
    )
    f2, piv2, perm2, _ = jax.device_get(
        panel_factor_pallas_c64(jnp.asarray(Anp), True, interpret=True,
                                micro=16, unroll=2)
    )
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(piv1, piv2)
    np.testing.assert_array_equal(perm1, perm2)


def test_c64_blocked_dispatch_cpu_interpret():
    """The c64 whole/blocked dispatch executed end to end with the
    kernel forced on (backend='pallas' -> interpret on CPU): residual
    + solve through the public API."""
    import recursivefactorization_jl_tpu as rf

    rng = np.random.RandomState(9)
    for n, cfg in [
        (96, rf.LUConfig(backend="pallas")),                      # whole
        (80, rf.LUConfig(backend="pallas", small_threshold=32,
                         panel_width=32)),                        # blocked
    ]:
        Anp = (rng.standard_normal((n, n))
               + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        route = rf.dispatch_route((n, n), jnp.complex64, True, cfg)
        assert route == ("whole" if n == 96 else "blocked")
        F = rf.lu(jnp.asarray(Anp), config=cfg)
        assert int(F.info) == 0
        gate = 20 * n * np.finfo(np.float32).eps * np.max(np.abs(Anp))
        assert _c64_residual(Anp, F.factors, F.p) < gate, n
        b = jnp.asarray((rng.standard_normal(n)
                         + 1j * rng.standard_normal(n)).astype(np.complex64))
        x = np.asarray(rf.lu_solve(F, b))
        assert np.max(np.abs(Anp @ x - np.asarray(b))) < 200 * gate

"""Matmul-precision audit over every factorization/solve entry point.

Round-4 regression lesson: on TPU, f32 (and complex64) matmuls at
``lax.Precision.DEFAULT`` run single-pass bf16 multiplies (eps ~ 8e-3) —
catastrophic for a factorization whose accuracy contract is ~n*eps(f32)
(the reference's residual gate, ref test/runtests.jl:17-18).  The public
``lu``/``lu_factor`` wrappers trace under
``jax.default_matmul_precision('highest')`` (utils/config.py
full_matmul_precision), which masked DEFAULT-precision dots on the
public path while every *direct* internal caller — the TP block-cyclic
kernel, perf probes, downstream users of ops.blocked — silently got
bf16 TRSM applies (measured scaled resid ~2300 at n=512/w=128, info=0,
identical across panel variants; the r4_tp_parity_probe finding —
TPU-only: real CPU f32 dots are full-precision at DEFAULT).

The package rule is therefore: every full-precision product carries an
EXPLICIT ``precision=`` (ops/schur.py FULL); ambient context is a
belt-and-suspenders, never the only guard.  This test walks the jaxpr
of each entry point traced WITHOUT the ambient context and asserts no
f32/c64 dot_general is left at DEFAULT — the deliberate exceptions are
dots whose operands are already bfloat16 (the explicit
``schur_precision='bf16'`` single-pass mode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import recursivefactorization_jl_tpu as rf
from recursivefactorization_jl_tpu.ops.blocked import (
    blocked_lu,
    blocked_lu_physical,
)
from recursivefactorization_jl_tpu.ops.unblocked import unblocked_lu
from recursivefactorization_jl_tpu.ops import trsm

INEXACT_FAST = (jnp.dtype(jnp.float32), jnp.dtype(jnp.complex64))


def _collect_dots(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _collect_dots(v.jaxpr, out)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        _collect_dots(x.jaxpr, out)
    return out


def assert_no_default_precision_dots(fn, *args, **kwargs):
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    dots = _collect_dots(jaxpr.jaxpr, [])
    bad = []
    for eqn in dots:
        dtypes = {jnp.dtype(v.aval.dtype) for v in eqn.invars}
        if jnp.dtype(jnp.bfloat16) in dtypes:
            continue  # deliberate single-pass bf16 product
        if not dtypes & set(INEXACT_FAST):
            continue  # f64/int dots: not subject to bf16 reduction
        if eqn.params.get("precision") is None:
            bad.append((dtypes, [v.aval.shape for v in eqn.invars]))
    assert not bad, (
        f"{len(bad)} dot_general ops at DEFAULT precision on f32/c64 "
        f"operands (first: {bad[0]}); every full-precision product must "
        f"carry an explicit precision= (ops/schur.py FULL)"
    )
    return len(dots)


A300 = np.random.RandomState(7).standard_normal((300, 300))


def test_blocked_lu_direct_f32():
    cfg = rf.LUConfig(panel_width=64, small_threshold=0, tail_threshold=None)
    A = jnp.asarray(A300, jnp.float32)
    n = assert_no_default_precision_dots(lambda a: blocked_lu(a, True, cfg), A)
    assert n > 0  # the audit actually saw the TRSM/Schur matmuls


def test_blocked_lu_direct_c64():
    cfg = rf.LUConfig(panel_width=64, small_threshold=0, tail_threshold=None)
    A = jnp.asarray(A300 + 1j * A300[::-1], jnp.complex64)
    assert_no_default_precision_dots(lambda a: blocked_lu(a, True, cfg), A)


def test_blocked_lu_fat_and_tall():
    cfg = rf.LUConfig(panel_width=64, small_threshold=0)
    tall = jnp.asarray(A300[:, :128], jnp.float32)
    fat = jnp.asarray(A300[:128, :], jnp.float32)
    assert_no_default_precision_dots(lambda a: blocked_lu(a, True, cfg), tall)
    assert_no_default_precision_dots(lambda a: blocked_lu(a, True, cfg), fat)


def test_blocked_lu_physical_direct():
    cfg = rf.LUConfig(panel_width=64, small_threshold=0, schedule="physical")
    A = jnp.asarray(A300, jnp.float32)
    assert_no_default_precision_dots(
        lambda a: blocked_lu_physical(a, True, cfg), A
    )


def test_unblocked_lu_direct():
    A = jnp.asarray(A300[:96, :96], jnp.float32)
    assert_no_default_precision_dots(lambda a: unblocked_lu(a, True), A)


def test_public_factor_routes():
    # whole-kernel, blocked, no-pivot — through the public lu_factor
    A = jnp.asarray(A300, jnp.float32)
    for cfg in [
        rf.LUConfig(),  # whole (small_threshold 2048)
        rf.LUConfig(panel_width=64, small_threshold=0),  # blocked
    ]:
        for pivot in (True, False):
            assert_no_default_precision_dots(
                lambda a: rf.lu_factor(a, pivot, config=cfg), A
            )


def test_solve_paths():
    A = jnp.asarray(A300, jnp.float32)
    F = rf.lu(A, True, config=rf.LUConfig(panel_width=64,
                                          small_threshold=0))
    b = jnp.asarray(A300[:, -1], jnp.float32)
    B = jnp.asarray(A300[:, :8], jnp.float32)
    for trans in ("N", "T", "H"):
        assert_no_default_precision_dots(
            lambda bb: rf.lu_solve(F, bb, trans=trans), b
        )
    assert_no_default_precision_dots(lambda bb: rf.lu_solve(F, bb), B)
    assert_no_default_precision_dots(lambda a, bb: rf.solve(a, bb), A, b)
    assert_no_default_precision_dots(
        lambda a, bb: rf.lu_solve_refined(F, a, bb, iters=2), A, b
    )


def test_trsm_direct():
    L = jnp.asarray(np.tril(A300) + 50 * np.eye(300), jnp.float32)
    B = jnp.asarray(A300[:, :64], jnp.float32)
    for fn in (trsm.solve_unit_lower, trsm.solve_lower, trsm.solve_upper,
               trsm.solve_unit_upper):
        assert_no_default_precision_dots(fn, L, B)
    for fn in (trsm.unit_lower_inverse, trsm.upper_inverse,
               trsm.lower_inverse, trsm.unit_upper_inverse):
        assert_no_default_precision_dots(fn, L)
        # power-of-2 batched-base route too
        assert_no_default_precision_dots(fn, L[:256, :256])


def test_butterfly_paths():
    n = 300  # pads to 304 internally
    A = jnp.asarray(A300, jnp.float32)
    b = jnp.asarray(A300[:, -1], jnp.float32)
    assert_no_default_precision_dots(
        lambda a, bb: rf.butterfly_solve(rf.butterfly_workspace(a, bb)), A, b
    )


def test_batched_paths():
    from recursivefactorization_jl_tpu.parallel.batched import (
        batched_lu_factor,
        batched_lu_solve,
    )

    A = jnp.asarray(
        np.random.RandomState(3).standard_normal((4, 64, 64)), jnp.float32
    )
    b = jnp.asarray(A[:, :, -1])
    assert_no_default_precision_dots(lambda a: batched_lu_factor(a), A)
    F, ipiv, info = batched_lu_factor(A)
    assert_no_default_precision_dots(
        lambda f, p, bb: batched_lu_solve(f, p, bb), F, ipiv, b
    )


def test_tp_lu_path():
    # Degenerate 1-device mesh on CPU: the block-cyclic kernel's TRSM
    # apply + Schur einsums (blockcyclic.py) must carry explicit
    # precision — this was the r4 on-chip corruption site.
    from recursivefactorization_jl_tpu.parallel import tp_lu

    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.asarray(devs[:1]), ("tp",))
    A = jnp.asarray(A300[:256, :256], jnp.float32)
    assert_no_default_precision_dots(
        lambda a: tp_lu(a, mesh=mesh, axis="tp", panel_width=64), A
    )

"""Schur-complement update ``C <- C - A @ B`` on the MXU.

Functional analog of ``schur_complement!`` (reference src/lu.jl:257-276),
which is the O(n^3) bulk of LU.  On TPU this is exactly what the MXU is
for: one fused matmul-subtract, with an optional bf16-compute /
f32-accumulate mode for ~2x MXU throughput at the cost of ~3 fewer
mantissa bits per product term (the accumulation itself stays f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# On TPU, f32 matmuls at Precision.DEFAULT run bf16 multiply passes
# (eps ~ 8e-3): catastrophic for a factorization whose accuracy contract
# is ~n*eps(f32).  Every full-precision product in the package uses
# HIGHEST (6-pass f32 emulation on the MXU); the deliberate
# reduced-precision mode is the explicit 'bf16' schur_precision knob.
FULL = lax.Precision.HIGHEST


def schur_update(
    C: jax.Array,
    A: jax.Array,
    B: jax.Array,
    precision: str = "float32",
) -> jax.Array:
    """Return ``C - A @ B`` with the requested MXU compute precision.

    precision:
    * 'float32' — 6-pass f32 emulation (HIGHEST), eps ~ 2^-24/product;
    * 'bf16x3'  — 3-pass bf16 splitting (HIGH), eps ~ 2^-21-ish: ~2x the
      HIGHEST matmul throughput at a few-bit residual inflation;
    * 'bf16'    — single-pass bf16 multiplies, f32 accumulation: fastest
      (~6x HIGHEST), pair with
      :func:`~..models.solve.lu_solve_refined` to recover f32 solve
      accuracy.
    """
    if precision == "bf16" and A.dtype == jnp.float32:
        # explicit DEFAULT so the surrounding full_matmul_precision
        # context doesn't upcast the deliberate single-pass bf16 product
        prod = jnp.dot(
            A.astype(jnp.bfloat16),
            B.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )
    elif precision == "bf16x3" and A.dtype == jnp.float32:
        prod = jnp.dot(
            A, B, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGH,
        )
    else:
        prod = jnp.dot(
            A, B, preferred_element_type=C.dtype, precision=FULL
        )
    return C - prod.astype(C.dtype)

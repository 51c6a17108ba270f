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


def schur_update(
    C: jax.Array,
    A: jax.Array,
    B: jax.Array,
    precision: str = "float32",
) -> jax.Array:
    """Return ``C - A @ B`` with the requested MXU compute precision."""
    if precision == "bf16" and A.dtype == jnp.float32:
        prod = jnp.dot(
            A.astype(jnp.bfloat16),
            B.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        prod = jnp.dot(A, B, preferred_element_type=C.dtype)
    return C - prod.astype(C.dtype)

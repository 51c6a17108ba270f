"""Compile-latency management — the PrecompileTools analog.

The reference cuts first-call latency by precompiling a tiny ``lu!``
during package load (reference src/RecursiveFactorization.jl:9-13).
The XLA analog has two parts:

* :func:`enable_persistent_cache` — turn on JAX's persistent compilation
  cache so traced programs survive process restarts (first compile is
  expensive on TPU; subsequent runs load from disk);
* :func:`warmup` — eagerly jit-compile the hot entry points for the
  shapes/dtypes a workload will use, so the first real call does not pay
  trace+compile.  Unlike Julia's precompile, XLA specializes on concrete
  shapes, so callers pass the shapes they care about.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp


def enable_persistent_cache(
    path: str = "~/.cache/recursivefactorization_jl_tpu/xla",
    min_compile_secs: float = 0.5,
) -> None:
    """Enable JAX's on-disk compilation cache (idempotent)."""
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )


def warmup(
    shapes: Sequence[Tuple[int, int]] = ((256, 256),),
    dtypes: Iterable = (jnp.float32,),
    pivot: bool = True,
    solve: bool = True,
    config=None,
) -> None:
    """Pre-compile ``lu_factor`` (and optionally the solve) for the given
    shapes/dtypes. Runs on whatever backend JAX selected."""
    from ..models.lu import lu_factor, LU
    from ..models.solve import lu_solve

    for dtype in dtypes:
        for m, n in shapes:
            A = jnp.zeros((m, n), dtype=dtype) + jnp.eye(m, n, dtype=dtype)
            factors, ipiv, info = lu_factor(A, pivot, config=config)
            jax.block_until_ready(factors)
            if solve and m == n:
                res = LU(factors, ipiv, info, pivoted=pivot)
                b = jnp.zeros((n,), dtype=dtype)
                jax.block_until_ready(lu_solve(res, b))

"""Parallel execution layer.

The reference's complete parallelism surface is shared-memory SIMD +
threads (SURVEY.md §2: `@turbo`/`@tturbo`, `@batch`, threaded TRSM —
reference src/lu.jl:156-180,257-276).  On TPU those map to VPU/MXU lane
parallelism and Pallas grid parallelism *inside* the kernels (ops/).
This package is the scale-out extension the reference never had:

* :mod:`batched` — vmap/batched LU for many small matrices (one grid
  cell per matrix), plus data-parallel sharding of the batch over a
  `jax.sharding.Mesh` axis;
* :mod:`blockcyclic` — a `shard_map` tensor-parallel right-looking LU
  with block-cyclic column distribution and panel broadcast over ICI
  (the ScaLAPACK getrf communication pattern, re-expressed with XLA
  collectives).
"""

from .batched import (
    batched_lu_factor,
    batched_lu_factor_perm,
    batched_lu_solve,
    batched_lu_solve_perm,
    sharded_batched_lu_factor,
    sharded_batched_lu_solve,
)
from .blockcyclic import tp_lu_factor, tp_lu, tp_lu_solve

__all__ = [
    "batched_lu_factor",
    "batched_lu_factor_perm",
    "batched_lu_solve_perm",
    "batched_lu_solve",
    "sharded_batched_lu_factor",
    "sharded_batched_lu_solve",
    "tp_lu_factor",
    "tp_lu",
    "tp_lu_solve",
]

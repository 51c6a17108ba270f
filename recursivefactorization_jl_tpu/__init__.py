"""recursivefactorization_jl_tpu — TPU-native dense LU factorization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JuliaLinearAlgebra/RecursiveFactorization.jl (reference: /root/reference,
v0.2.26): recursive/blocked LU with partial pivoting, pivot-free LU, the
random-butterfly-transform (RBT) pivot-free solver, batched small-matrix LU,
and triangular solves — all designed TPU-first:

* the Toledo cache-oblivious recursion (`reference src/lu.jl:181-255`)
  becomes a **static right-looking blocked schedule** XLA can pipeline;
* the `@turbo` SIMD panel factorization (`src/lu.jl:282-330`) becomes a
  **fused Pallas panel kernel** that keeps the tall panel VMEM-resident
  across all pivot steps;
* `schur_complement!` (`src/lu.jl:257-276`) becomes an MXU matmul with
  optional bf16-compute/f32-accumulate;
* `TriangularSolve.ldiv!` becomes blocked triangular-inverse + MXU matmul;
* `apply_permutation!` (laswp, `src/lu.jl:156-180`) becomes composed
  permutations applied as single gathers;
* the butterfly module (`src/butterflylu.jl`) becomes an implicit two-level
  radix transform over quadrants.

Public API (mirrors the reference's `lu/lu!` surface, functionally):

    lu(A, pivot=True)            -> LU result object (L, U, p, ipiv, info)
    lu_factor(A, pivot=True)     -> (factors, ipiv, info) jit-friendly
    lu_solve(lu_res, b)          -> x
    ldiv(lu_res, b)              -> x  (alias, reference naming)
    butterfly_workspace(A, b)    -> BWorkspace (RBT setup)
    butterfly_solve(ws)          -> x  (pivot-free RBT solve)
"""

import sys as _sys

# Mosaic's lowering of the composed blocked graphs recurses with program
# size: at n=6144 (12 panels of (m, 512) fori kernels + tail) it
# exceeds CPython's default 1000-frame limit with a RecursionError
# mid-lowering (n<=4096 fits; first seen 2026-08-19 on jax 0.9).
# Raise-only (never lower a user's higher limit): 20000 covers n=16384
# with ample margin.
if _sys.getrecursionlimit() < 20000:
    _sys.setrecursionlimit(20000)

from .models.lu import (
    LU,
    dispatch_route,
    lu,
    lu_factor,
    lu_factor_p,
    lu_inplace,
    normalize_pivot,
    SingularMatrixError,
)
from .models.solve import lu_solve, lu_solve_refined, ldiv, solve
from .models.butterfly import (
    BWorkspace,
    butterfly_workspace,
    butterfly_solve,
    butterfly_mul,
    generate_butterfly_values,
    materialize_uv,
    pad_to_multiple_of_4,
)
from .utils.config import LUConfig, default_config
from .utils.perm import ipiv_to_perm, perm_to_matrix
from .parallel import (
    batched_lu_factor,
    batched_lu_factor_perm,
    batched_lu_solve,
    batched_lu_solve_perm,
    sharded_batched_lu_factor,
    sharded_batched_lu_solve,
    tp_lu,
    tp_lu_factor,
    tp_lu_solve,
)

__version__ = "0.1.0"

__all__ = [
    "LU",
    "dispatch_route",
    "lu",
    "lu_factor",
    "lu_factor_p",
    "lu_inplace",
    "normalize_pivot",
    "lu_solve",
    "lu_solve_refined",
    "ldiv",
    "solve",
    "SingularMatrixError",
    "BWorkspace",
    "butterfly_workspace",
    "butterfly_solve",
    "butterfly_mul",
    "generate_butterfly_values",
    "materialize_uv",
    "pad_to_multiple_of_4",
    "LUConfig",
    "default_config",
    "ipiv_to_perm",
    "perm_to_matrix",
    "batched_lu_factor",
    "batched_lu_factor_perm",
    "batched_lu_solve",
    "batched_lu_solve_perm",
    "sharded_batched_lu_factor",
    "sharded_batched_lu_solve",
    "tp_lu",
    "tp_lu_factor",
    "tp_lu_solve",
]

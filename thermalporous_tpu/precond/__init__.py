from thermalporous_tpu.precond.chebyshev import (
    chebyshev,
    gershgorin_lambda_max,
    line_jacobi,
    red_black_gauss_seidel,
    tridiag_solve_along,
    weighted_jacobi,
    zebra_line_gs,
)
from thermalporous_tpu.precond.block_gmg import (
    BlockGMGState,
    block_galerkin_coarsen,
    block_gmg_apply,
    block_gmg_setup,
)
from thermalporous_tpu.precond.cpr import (
    CPRConfig,
    CPRState,
    cpr_apply,
    cpr_setup,
    make_preconditioner,
    resolve_adaptive_coarsening,
)
from thermalporous_tpu.precond.gmg import (
    GMGConfig,
    GMGState,
    galerkin_coarsen,
    gmg_apply,
    gmg_setup,
    axis_strengths,
    plan_coarsening,
)

__all__ = [
    "BlockGMGState",
    "block_galerkin_coarsen",
    "block_gmg_apply",
    "block_gmg_setup",
    "chebyshev",
    "gershgorin_lambda_max",
    "line_jacobi",
    "tridiag_solve_along",
    "zebra_line_gs",
    "red_black_gauss_seidel",
    "weighted_jacobi",
    "CPRConfig",
    "CPRState",
    "cpr_apply",
    "cpr_setup",
    "make_preconditioner",
    "GMGConfig",
    "GMGState",
    "galerkin_coarsen",
    "gmg_apply",
    "gmg_setup",
    "axis_strengths",
    "plan_coarsening",
    "resolve_adaptive_coarsening",
]

from thermalporous_tpu.solve.adjoint import (
    AdjointResult,
    adjoint_gradients,
    ensemble_adjoint_gradients,
    record_ensemble_trajectory,
    record_trajectory,
)
from thermalporous_tpu.solve.fgmres import FGMRESResult, fgmres
from thermalporous_tpu.solve.newton import NewtonConfig, NewtonStats, newton_solve
from thermalporous_tpu.solve.oracle import dense_newton_step, oracle_run
from thermalporous_tpu.solve.timeloop import (
    SimResult,
    Simulator,
    StepRecord,
    TimeConfig,
    BlockStats,
    make_block_step_fn,
    make_step_fn,
)

__all__ = [
    "AdjointResult",
    "adjoint_gradients",
    "ensemble_adjoint_gradients",
    "record_ensemble_trajectory",
    "record_trajectory",
    "FGMRESResult",
    "fgmres",
    "NewtonConfig",
    "NewtonStats",
    "newton_solve",
    "dense_newton_step",
    "oracle_run",
    "SimResult",
    "Simulator",
    "StepRecord",
    "TimeConfig",
    "BlockStats",
    "make_block_step_fn",
    "make_step_fn",
]

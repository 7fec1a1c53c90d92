from thermalporous_tpu.dist.ensemble import (
    make_ensemble_step_fn,
    shard_ensemble,
    stack_ensemble,
)
from thermalporous_tpu.dist.sharding import (
    field_spec,
    make_grid_mesh,
    replicated,
    shard_problem_data,
    shard_state,
    state_spec,
)

__all__ = [
    "make_ensemble_step_fn",
    "shard_ensemble",
    "stack_ensemble",
    "field_spec",
    "make_grid_mesh",
    "replicated",
    "shard_problem_data",
    "shard_state",
    "state_spec",
]

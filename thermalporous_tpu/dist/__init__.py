from thermalporous_tpu.dist.sharding import (
    field_spec,
    make_grid_mesh,
    replicated,
    shard_problem_data,
    shard_state,
    state_spec,
)

__all__ = [
    "field_spec",
    "make_grid_mesh",
    "replicated",
    "shard_problem_data",
    "shard_state",
    "state_spec",
]

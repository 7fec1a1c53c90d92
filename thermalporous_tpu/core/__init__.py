from thermalporous_tpu.core.grid import (
    Grid,
    divergence_add,
    harmonic_face_transmissibility,
    neighbor_plus,
    shift_minus,
    shift_plus,
)
from thermalporous_tpu.core.stencil import (
    BlockStencil,
    ScalarStencil,
    apply_blocks,
    invert_blocks,
)

__all__ = [
    "Grid",
    "BlockStencil",
    "ScalarStencil",
    "apply_blocks",
    "invert_blocks",
    "divergence_add",
    "harmonic_face_transmissibility",
    "neighbor_plus",
    "shift_minus",
    "shift_plus",
]

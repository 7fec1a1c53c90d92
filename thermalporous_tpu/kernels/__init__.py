from thermalporous_tpu.kernels.stencil_pallas import (
    block_matvec,
    chebyshev_smooth,
    fused_block_rbgs,
    fits_vmem,
    matvec,
    pack_stencil,
)

__all__ = ["block_matvec", "chebyshev_smooth", "fits_vmem",
           "fused_block_rbgs", "matvec", "pack_stencil"]

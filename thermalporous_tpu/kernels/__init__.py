from thermalporous_tpu.kernels.stencil_pallas import (
    chebyshev_smooth,
    fits_vmem,
    matvec,
    pack_stencil,
)

__all__ = ["chebyshev_smooth", "fits_vmem", "matvec", "pack_stencil"]

"""Fused Pallas residual and JVP kernels (2D and 3D models).

The residual is the analogue of the reference's TSFC-generated cell+facet
kernels (SURVEY.md §2.12): XLA executes it as ~a dozen separate HBM-
roundtrip fusions (pads, slices, upwind selects), measured ~3.7 ms at
1024² f32 where the pure-bandwidth bound is ~0.2 ms.  These kernels fuse
the ENTIRE residual — accumulation, all axis fluxes with upwinding,
conduction, wells, heaters — into one VMEM-tiled Pallas kernel.

Key design points:

- The kernel body calls the model's OWN ``residual`` method on the VMEM
  tile: no duplicated physics, so the fused path is exactly the jnp path
  by construction (asserted in tests).  The JVP kernel applies ``jax.jvp``
  to the same body, so Newton's Krylov operator stays exact.
- Inputs are packed into one channel-stacked array, edge/zero-padded by a
  ghost slab along x OUTSIDE the kernel; each tile then DMAs a single
  (C, T+2·halo, ...) window from HBM — one async copy per tile, no
  out-of-bounds cases.  Outputs use ordinary non-overlapping BlockSpecs.
- Halo width: in 2D the x axis is the SUBLANE dimension, and Mosaic DMA
  slices must be 8-aligned there → 8 ghost rows per side (only 1 is
  physically needed).  In 3D, (ny, nz) occupy the (sublane, lane) tile and
  x is a plain leading axis with no alignment constraint → halo 1.
- Tile size is the largest divisor of nx fitting the VMEM budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermalporous_tpu.models.base import ProblemData, ThermalModelBase
from thermalporous_tpu.physics.wells import WellFields

N_WELL_FIELDS = 6  # wi, pbh, tinj, has_tinj, qrate, qheat


def n_fields(dim: int) -> int:
    """Static field channels: tgeo·dim, tcond·dim, phi, well fields."""
    return 2 * dim + 1 + N_WELL_FIELDS


def _halo(dim: int) -> int:
    # 2D: x is the sublane axis → Mosaic DMA slices need 8-alignment.
    # 3D: x is a leading (untiled) axis → 1 ghost slice suffices.
    return 8 if dim == 2 else 1


def _pack_fields(data: ProblemData, dim: int, dtype):
    parts = list(data.tgeo) + list(data.tcond) + [data.phi]
    w = data.wells
    parts += [w.wi, w.pbh, w.tinj, w.has_tinj, w.qrate, w.qheat]
    return jnp.stack(parts).astype(dtype)


def _unpack_fields(f, dim: int) -> ProblemData:
    wells = WellFields(
        wi=f[2 * dim + 1], pbh=f[2 * dim + 2], tinj=f[2 * dim + 3],
        has_tinj=f[2 * dim + 4], qrate=f[2 * dim + 5], qheat=f[2 * dim + 6],
    )
    return ProblemData(
        tgeo=tuple(f[a] for a in range(dim)),
        tcond=tuple(f[dim + a] for a in range(dim)),
        phi=f[2 * dim],
        wells=wells,
    )


def _pad_x(a, halo: int, mode: str):
    pad = [(0, 0)] * a.ndim
    pad[1] = (halo, halo)
    return jnp.pad(a, pad, mode="edge") if mode == "edge" else jnp.pad(a, pad)


def pack_inputs(u, u_old, data: ProblemData):
    """(C, nx+2·halo, ...) with C = 2·nc + n_fields(dim).

    State channels are edge-padded (keeps property correlations finite on
    the ghost slabs); field channels zero-padded (zero transmissibility and
    zero well strength across ghost faces kill all ghost fluxes exactly).
    """
    dim = u.ndim - 1
    h = _halo(dim)
    fields = _pack_fields(data, dim, u.dtype)
    return jnp.concatenate(
        [_pad_x(u, h, "edge"), _pad_x(u_old, h, "edge"), _pad_x(fields, h, "zero")],
        axis=0,
    )


def _tile_size(shape, channels, itemsize, budget=9 * 2**20):
    """Largest x-slab thickness dividing nx within the VMEM budget.

    The budget charges ~2x the input channels to cover the kernel body's
    live temporaries (flux/property arrays of the same slab shape).
    """
    nx = shape[0]
    rest = 1
    for s in shape[1:]:
        rest *= s
    h = _halo(len(shape))
    for t in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if nx % t:
            continue
        if 2 * channels * (t + 2 * h) * rest * itemsize <= budget:
            return t
    return None


def supported(model: ThermalModelBase, dtype) -> bool:
    dim = model.grid.dim
    if dim not in (2, 3):
        return False
    nc = model.nc
    channels = 3 * nc + n_fields(dim)  # jvp packing is the widest
    return _tile_size(model.grid.shape, channels, jnp.dtype(dtype).itemsize) is not None


def _make_kernel(model: ThermalModelBase, with_tangent: bool, halo: int):
    nc = model.nc
    dim = model.grid.dim

    def body(dt_ref, in_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        t = out_ref.shape[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[(slice(None), pl.ds(i * t, t + 2 * halo))],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        tile = scratch[...]
        dt = dt_ref[0, 0]

        if not with_tangent:
            u = tile[0:nc]
            u_old = tile[nc : 2 * nc]
            data = _unpack_fields(tile[2 * nc :], dim)
            res = model.residual(u, u_old, dt, data)
        else:
            # jvp packing: [u, v, u_old, fields]
            u = tile[0:nc]
            v = tile[nc : 2 * nc]
            u_old = tile[2 * nc : 3 * nc]
            data = _unpack_fields(tile[3 * nc :], dim)
            res = jax.jvp(
                lambda x: model.residual(x, u_old, dt, data), (u,), (v,)
            )[1]
        out_ref[...] = res[:, halo : halo + t]

    return body


def _call(model, packed, dt, tile_t, with_tangent, interpret=False):
    nc = model.nc
    shape = model.grid.shape
    nx = shape[0]
    halo = _halo(len(shape))
    channels = packed.shape[0]
    grid = (nx // tile_t,)
    dt_arr = jnp.asarray(dt, dtype=packed.dtype).reshape(1, 1)
    kernel = _make_kernel(model, with_tangent, halo)
    block = (nc, tile_t) + shape[1:]
    index_map = lambda i: (0, i) + (0,) * (len(shape) - 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((nc,) + shape, packed.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((channels, tile_t + 2 * halo) + shape[1:], packed.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dt_arr, packed)


def fused_residual(model, u, u_old, dt, data, interpret=False):
    """Drop-in replacement for model.residual (jnp fallback when unsupported)."""
    from thermalporous_tpu.kernels.stencil_pallas import _pallas_available

    if not (_pallas_available(interpret) and supported(model, u.dtype)):
        return model.residual(u, u_old, dt, data)
    packed = pack_inputs(u, u_old, data)
    t = _tile_size(model.grid.shape, packed.shape[0], u.dtype.itemsize)
    return _call(model, packed, dt, t, with_tangent=False, interpret=interpret)


def fused_jvp(model, u, v, u_old, dt, data, interpret=False):
    """Fused J(u)·v: exact directional derivative of the fused residual."""
    from thermalporous_tpu.kernels.stencil_pallas import _pallas_available

    if not (_pallas_available(interpret) and supported(model, u.dtype)):
        return model.jvp(u, u_old, dt, data)(v)
    dim = model.grid.dim
    h = _halo(dim)
    fields = _pack_fields(data, dim, u.dtype)
    packed = jnp.concatenate(
        [_pad_x(u, h, "edge"), _pad_x(v, h, "edge"), _pad_x(u_old, h, "edge"),
         _pad_x(fields, h, "zero")],
        axis=0,
    )
    t = _tile_size(model.grid.shape, packed.shape[0], u.dtype.itemsize)
    if t is None:
        return model.jvp(u, u_old, dt, data)(v)
    return _call(model, packed, dt, t, with_tangent=True, interpret=interpret)

"""Fused Pallas residual and JVP kernels (2D models).

The residual is the analogue of the reference's TSFC-generated cell+facet
kernels (SURVEY.md §2.12): XLA executes it as ~a dozen separate HBM-
roundtrip fusions (pads, slices, upwind selects), measured ~3.7 ms at
1024² f32 where the pure-bandwidth bound is ~0.2 ms.  These kernels fuse
the ENTIRE residual — accumulation, both axis fluxes with upwinding,
conduction, wells, heaters — into one VMEM-tiled Pallas kernel.

Key design points:

- The kernel body calls the model's OWN ``residual`` method on the VMEM
  tile: no duplicated physics, so the fused path is exactly the jnp path
  by construction (asserted in tests).  The JVP kernel applies ``jax.jvp``
  to the same body, so Newton's Krylov operator stays exact.
- Inputs are packed into one channel-stacked array, edge/zero-padded by one
  ghost ring OUTSIDE the kernel; each tile then DMAs a single
  (C, T+2, T+2) window from HBM — one async copy per tile, no
  out-of-bounds cases.  Outputs use ordinary non-overlapping BlockSpecs.
- 2D only (the 3D path falls back to the jnp residual); tile size is the
  largest divisor of both grid dims fitting the VMEM budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermalporous_tpu.models.base import ProblemData, ThermalModelBase
from thermalporous_tpu.physics.wells import WellFields

# channel layout of the packed static fields (after the state channels)
_FIELD_KEYS = (
    "tgeo_x", "tgeo_y", "tcond_x", "tcond_y", "phi",
    "wi", "pbh", "tinj", "has_tinj", "qrate", "qheat",
)
N_FIELDS = len(_FIELD_KEYS)


# Mosaic DMA slices must be 8-aligned along the sublane (second-to-last)
# dimension, so the halo is 8 ghost rows per side (only 1 is physically
# needed) and tiling is in row bands over x with the lane (y) axis whole —
# the y-boundary semantics (zero boundary transmissibility + edge neighbor)
# are already exact on the full-extent axis.
HALO = 8


def _pad_edge(a):
    return jnp.pad(a, [(0, 0), (HALO, HALO), (0, 0)], mode="edge")


def _pad_zero(a):
    return jnp.pad(a, [(0, 0), (HALO, HALO), (0, 0)])


def pack_inputs(u, u_old, data: ProblemData):
    """(C, nx+2·HALO, ny) with C = 2·nc + N_FIELDS.

    State channels are edge-padded (keeps property correlations finite on
    the ghost rows); field channels zero-padded (zero transmissibility and
    zero well strength across ghost faces kill all ghost fluxes exactly).
    """
    fields = jnp.stack([
        data.tgeo[0], data.tgeo[1], data.tcond[0], data.tcond[1], data.phi,
        data.wells.wi, data.wells.pbh, data.wells.tinj, data.wells.has_tinj,
        data.wells.qrate, data.wells.qheat,
    ]).astype(u.dtype)
    return jnp.concatenate(
        [_pad_edge(u), _pad_edge(u_old), _pad_zero(fields)], axis=0
    )


def _unpack(tile, nc):
    u = tile[0:nc]
    u_old = tile[nc : 2 * nc]
    f = tile[2 * nc :]
    wells = WellFields(wi=f[5], pbh=f[6], tinj=f[7], has_tinj=f[8],
                       qrate=f[9], qheat=f[10])
    data = ProblemData(tgeo=(f[0], f[1]), tcond=(f[2], f[3]), phi=f[4],
                       wells=wells)
    return u, u_old, data


def _tile_size(shape, channels, itemsize, budget=9 * 2**20):
    """Largest row-band height dividing nx within the VMEM budget.

    The budget charges ~2x the input channels to cover the kernel body's
    live temporaries (flux/property arrays of the same row-band shape).
    """
    nx, ny = shape
    for t in (256, 128, 64, 32, 16, 8):
        if nx % t:
            continue
        if 2 * channels * (t + 2 * HALO) * ny * itemsize <= budget:
            return t
    return None


def supported(model: ThermalModelBase, dtype) -> bool:
    if model.grid.dim != 2:
        return False
    nc = model.nc
    channels = 3 * nc + N_FIELDS  # jvp packing is the widest
    return _tile_size(model.grid.shape, channels, jnp.dtype(dtype).itemsize) is not None


def _make_kernel(model: ThermalModelBase, with_tangent: bool):
    nc = model.nc

    def body(dt_ref, in_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        t = out_ref.shape[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(i * t, t + 2 * HALO), :],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        tile = scratch[...]
        dt = dt_ref[0, 0]

        if not with_tangent:
            u, u_old, data = _unpack(tile, nc)
            res = model.residual(u, u_old, dt, data)
        else:
            # jvp packing: [u, v, u_old, fields]
            u = tile[0:nc]
            v = tile[nc : 2 * nc]
            u_old = tile[2 * nc : 3 * nc]
            f = tile[3 * nc :]
            wells = WellFields(wi=f[5], pbh=f[6], tinj=f[7], has_tinj=f[8],
                               qrate=f[9], qheat=f[10])
            data = ProblemData(tgeo=(f[0], f[1]), tcond=(f[2], f[3]),
                               phi=f[4], wells=wells)
            res = jax.jvp(
                lambda x: model.residual(x, u_old, dt, data), (u,), (v,)
            )[1]
        out_ref[...] = res[:, HALO : HALO + t, :]

    return body


def _call(model, packed, dt, tile_t, with_tangent, interpret=False):
    nc = model.nc
    nx, ny = model.grid.shape
    channels = packed.shape[0]
    grid = (nx // tile_t,)
    dt_arr = jnp.asarray(dt, dtype=packed.dtype).reshape(1, 1)
    kernel = _make_kernel(model, with_tangent)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((nc, nx, ny), packed.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nc, tile_t, ny),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((channels, tile_t + 2 * HALO, ny), packed.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dt_arr, packed)


def fused_residual(model, u, u_old, dt, data, interpret=False):
    """Drop-in replacement for model.residual (2D; jnp fallback otherwise)."""
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
    fields = jnp.stack([
        data.tgeo[0], data.tgeo[1], data.tcond[0], data.tcond[1], data.phi,
        data.wells.wi, data.wells.pbh, data.wells.tinj, data.wells.has_tinj,
        data.wells.qrate, data.wells.qheat,
    ]).astype(u.dtype)
    packed = jnp.concatenate(
        [_pad_edge(u), _pad_edge(v), _pad_edge(u_old), _pad_zero(fields)], axis=0
    )
    t = _tile_size(model.grid.shape, packed.shape[0], u.dtype.itemsize)
    if t is None:
        return model.jvp(u, u_old, dt, data)(v)
    return _call(model, packed, dt, t, with_tangent=True, interpret=interpret)

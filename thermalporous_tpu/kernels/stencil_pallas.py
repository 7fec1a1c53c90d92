"""Pallas TPU kernels for scalar 7-point stencil operations.

The GMG smoother is the innermost hot loop of the CPR/CPTR preconditioner:
a degree-k Chebyshev smooth performs k+1 stencil matvecs plus diagonal
scalings, each of which XLA executes as separate HBM-roundtrip fusions.
These kernels fuse an entire matvec — and an entire Chebyshev smooth —
into ONE VMEM-resident kernel: the stencil coefficients and vectors are
read from HBM once, all shift/multiply/accumulate traffic stays on-chip.

Layout: the five (2D) or seven (3D) stencil coefficient arrays are stacked
into one (2·dim+1, *shape) array: [diag, up_0, lo_0, up_1, lo_1, ...].

Whole-array kernels: each operand must fit VMEM (~16 MB/core), which holds
through ~1024×512 f32 per level in 2D; callers fall back to the jnp path
above that (``fits_vmem``).  Zero-padded shifts are expressed with
lax.slice + concatenate on VMEM values, which Mosaic lowers to cheap
sublane/lane shifts.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermalporous_tpu.core.stencil import ScalarStencil


def pack_stencil(st: ScalarStencil) -> jax.Array:
    """Stack stencil coefficients: [diag, up_0, lo_0, up_1, lo_1, ...]."""
    parts = [st.diag]
    for up, lo in zip(st.upper, st.lower):
        parts.append(up)
        parts.append(lo)
    return jnp.stack(parts)


def _shift_m(v, axis):
    """v[i+1] at i, zero at the end (neighbour-plus coupling)."""
    n = v.shape[axis]
    body = jax.lax.slice_in_dim(v, 1, n, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis))
    return jax.lax.concatenate([body, zero], dimension=axis)


def _shift_p(v, axis):
    """v[i-1] at i, zero at the start."""
    n = v.shape[axis]
    body = jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis))
    return jax.lax.concatenate([zero, body], dimension=axis)


def _apply(stencil, v, dim):
    y = stencil[0] * v
    for a in range(dim):
        y = y + stencil[1 + 2 * a] * _shift_m(v, a)
        y = y + stencil[2 + 2 * a] * _shift_p(v, a)
    return y


def fits_vmem(shape, dtype, n_operands: int, budget_bytes: int = 12 * 2**20) -> bool:
    nbytes = math.prod(shape) * jnp.dtype(dtype).itemsize
    return n_operands * nbytes <= budget_bytes


def matvec(st: ScalarStencil, v: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused y = A·v; falls back to the jnp path when VMEM would overflow."""
    dim = len(st.grid_shape)
    if not fits_vmem(st.grid_shape, v.dtype, n_operands=2 * dim + 3):
        return st.matvec(v)
    packed = pack_stencil(st).astype(v.dtype)

    def kernel(s_ref, v_ref, o_ref):
        o_ref[...] = _apply(s_ref[...], v_ref[...], dim)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, v)


def chebyshev_smooth(
    st: ScalarStencil,
    b: jax.Array,
    x: jax.Array | None,
    lam_max: jax.Array,
    degree: int = 2,
    lam_min_frac: float = 0.25,  # matches precond.chebyshev.chebyshev default
    lam_max_safety: float = 1.05,
    interpret: bool = False,
) -> jax.Array:
    """Entire degree-k Chebyshev smooth in one kernel (matches
    precond.chebyshev.chebyshev numerically)."""
    dim = len(st.grid_shape)
    if not fits_vmem(st.grid_shape, b.dtype, n_operands=2 * dim + 7):
        from thermalporous_tpu.precond.chebyshev import chebyshev

        return chebyshev(st, b, x, degree=degree, lam_max=lam_max,
                         lam_min_frac=lam_min_frac, lam_max_safety=lam_max_safety)

    packed = pack_stencil(st).astype(b.dtype)
    x0 = jnp.zeros_like(b) if x is None else x
    lam = jnp.asarray(lam_max, dtype=b.dtype).reshape(1, 1)

    def kernel(lam_ref, s_ref, b_ref, x_ref, o_ref):
        s = s_ref[...]
        bb = b_ref[...]
        xx = x_ref[...]
        lmax = lam_ref[0, 0] * lam_max_safety
        lmin = lam_ref[0, 0] * lam_min_frac
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma1 = theta / delta
        inv_diag = 1.0 / s[0]

        z = inv_diag * (bb - _apply(s, xx, dim))
        d = z / theta
        rho = 1.0 / sigma1
        for _ in range(degree - 1):
            xx = xx + d
            z = inv_diag * (bb - _apply(s, xx, dim))
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * z
            rho = rho_new
        o_ref[...] = xx + d

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lam, packed, b, x0)

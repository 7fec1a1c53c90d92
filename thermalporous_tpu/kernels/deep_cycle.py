"""Fused multigrid deep-cycle kernel: the whole coarse subtree in ONE launch.

Why this exists (BASELINE.md round-3 flagship decomposition; VERDICT r3
next-#1): at full-SPE10 scale the CPTR apply costs ~6 ms against a ~1 ms
traffic bound because the K-cycle's 2-recursive coarse solves visit level
L 2^(L−1) times and every visit of a few-thousand-cell grid is pure
kernel-launch latency — the levels fit VMEM whole, so HBM bandwidth is
irrelevant and op COUNT is the cost.  Incremental fusion (the per-smoother
Pallas kernels behind ``GMGConfig.use_pallas``) was measured at only ~3%:
each level visit still dispatches its restrict/prolong/residual/K-glue
separately.  The fix is structural: once the recursion reaches a level
whose whole SUBTREE (stencils + dense coarse inverse + live vectors) fits
VMEM, run the ENTIRE remaining correction — K-cycle recursion, Chebyshev
smoothing, Galerkin transfers, dense coarsest solves — as one Pallas
kernel.  A flagship CPTR apply then launches a handful of fused subtrees
instead of hundreds of µs-scale kernels.

Numerics: `_correction_math` mirrors ``precond.gmg._coarse_correction`` /
``_v_cycle`` / ``precond.chebyshev.chebyshev`` operation-for-operation
(same recurrences, same pairwise Galerkin sums, same dense solve), so the
fused path is exact up to float reassociation in the dot products; the
constant-transfer restriction/prolongation are bit-exact (sums of ≤2
terms).  Exactness is pinned by tests/test_kernels.py against the jnp
recursion, and the integration honours the axon miscompile ledger's
lesson: no strided slices, no gathers — shifts are slice+concatenate,
masks come from iota comparisons, transfers from reshape-free pairwise
sums (see `_blocksum_pairwise`).

Reference anchor: SURVEY.md §2.14 (hypre BoomerAMG role) and §7 step 10
(the Pallas push); the reference delegates this entire layer to hypre.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermalporous_tpu.kernels.stencil_pallas import (
    _apply,
    _pallas_available,
    pack_stencil,
)


# ---------------------------------------------------------------- transfers
#
# Constant-transfer Galerkin pair on factor-2 axes (precond.gmg._blocksum /
# _prolong semantics, ragged tails included), in the one form Mosaic on
# axon lowers EXACTLY on every axis (probed 2026-08-20, /tmp/probe_mosaic*;
# maxerr 0.0): slice+concatenate along the SAME axis.  Everything else
# fails or is unsafe: strided slices and gathers miscompile at scale
# (CLAUDE.md ledger), reshapes hit "unsupported shape cast", concatenating
# pieces sliced along a DIFFERENT tiled dim hits "offset mismatch on
# non-concat dimension", and leading/batched dot_generals either fail or
# (without precision=HIGHEST) round through bf16.  The unrolled piece
# count is the coarse axis size — tiny at the depths this kernel runs.


def _shift_m_k(v, axis, k=1):
    """v[i+k] at i, zero-filled tail."""
    n = v.shape[axis]
    body = jax.lax.slice_in_dim(v, k, n, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, k, axis=axis))
    return jax.lax.concatenate([body, zero], dimension=axis)


def _blocksum_pairwise(x, factors):
    """Galerkin summation restriction == gmg._blocksum (bit-exact: sums of
    ≤2 terms), per factor-2 axis: pair-sum then same-axis slice+concat
    compaction of the even positions."""
    for axis in range(x.ndim):
        if factors[axis] == 1:
            continue
        n = x.shape[axis]
        m = -(-n // 2)
        pair = x + _shift_m_k(x, axis, 1)  # x[i] + x[i+1] at i
        pieces = [jax.lax.slice_in_dim(pair, 2 * k, 2 * k + 1, axis=axis)
                  for k in range(m)]
        x = (pieces[0] if m == 1
             else jax.lax.concatenate(pieces, dimension=axis))
    return x


def _prolong_pairwise(e, fine_shape, factors):
    """Piecewise-constant injection == gmg._prolong (bit-exact), per
    factor-2 axis: same-axis slice+concat interleave, ragged tail kept."""
    for axis in range(e.ndim):
        if factors[axis] == 1:
            continue
        n = fine_shape[axis]
        m = e.shape[axis]
        pieces = []
        for k in range(m):
            s = jax.lax.slice_in_dim(e, k, k + 1, axis=axis)
            pieces.append(s)
            if 2 * k + 1 < n:
                pieces.append(s)
        e = (pieces[0] if len(pieces) == 1
             else jax.lax.concatenate(pieces, dimension=axis))
    return e


# ------------------------------------------------- dense solve, flat-free
#
# The coarsest-level dense solve needs grid<->flat moves, but Mosaic has no
# working reshape for these shapes.  Probe-validated alternative: "modulo
# matmuls" — contract the LAST axis with periodic 0/1 matrices (each output
# element receives exactly one term; precision=HIGHEST keeps the MXU off
# its bf16 path) plus iota masks and sublane/leading reductions.

_HI = jax.lax.Precision.HIGHEST


def _iota2(sh, d):
    return jax.lax.broadcasted_iota(jnp.int32, sh, d)


def _modmat(p, q, dtype):
    """M (p, q) with M[i, j] = 1 iff j % p == i."""
    return (_iota2((p, q), 1) % p == _iota2((p, q), 0)).astype(dtype)


def _flatten_mm(b):
    """(c1[,c2],c3) -> (1[,1],n) row-major, reshape-free."""
    dt = b.dtype
    if b.ndim == 2:
        c1, c2 = b.shape
        n = c1 * c2
        t = jax.lax.dot_general(b, _modmat(c2, n, dt),
                                (((1,), (0,)), ((), ())), precision=_HI,
                                preferred_element_type=dt)
        xm = (_iota2((c1, n), 1) // c2 == _iota2((c1, n), 0)).astype(dt)
        return jnp.sum(t * xm, axis=0, keepdims=True)        # (1, n)
    c1, c2, c3 = b.shape
    M, n = c2 * c3, c1 * c2 * c3
    t = jax.lax.dot_general(b, _modmat(c3, M, dt),
                            (((2,), (0,)), ((), ())), precision=_HI,
                            preferred_element_type=dt)       # (c1,c2,M)
    ym = (_iota2((c2, M), 1) // c3 == _iota2((c2, M), 0)).astype(dt)
    s = jnp.sum(t * ym[None], axis=1, keepdims=True)         # (c1,1,M)
    t2 = jax.lax.dot_general(s, _modmat(M, n, dt),
                             (((2,), (0,)), ((), ())), precision=_HI,
                             preferred_element_type=dt)      # (c1,1,n)
    xm = (jax.lax.broadcasted_iota(jnp.int32, (c1, 1, n), 2) // M
          == jax.lax.broadcasted_iota(jnp.int32, (c1, 1, n), 0)).astype(dt)
    return jnp.sum(t2 * xm, axis=0, keepdims=True)           # (1,1,n)


def _unflatten_mm(ef, shape):
    """(1[,1],n) -> ``shape`` row-major, reshape-free."""
    dt = ef.dtype
    if len(shape) == 2:
        c1, c2 = shape
        n = c1 * c2
        b = jnp.broadcast_to(ef, (c1, n))
        xm = (_iota2((c1, n), 1) // c2 == _iota2((c1, n), 0)).astype(dt)
        return jax.lax.dot_general(b * xm, _modmat(c2, n, dt),
                                   (((1,), (1,)), ((), ())), precision=_HI,
                                   preferred_element_type=dt)
    c1, c2, c3 = shape
    M, n = c2 * c3, c1 * c2 * c3
    b = jnp.broadcast_to(ef, (c1, 1, n))
    xm = (jax.lax.broadcasted_iota(jnp.int32, (c1, 1, n), 2) // M
          == jax.lax.broadcasted_iota(jnp.int32, (c1, 1, n), 0)).astype(dt)
    e2 = jax.lax.dot_general(b * xm, _modmat(M, n, dt),
                             (((2,), (1,)), ((), ())), precision=_HI,
                             preferred_element_type=dt)      # (c1,1,M)
    e2 = jnp.broadcast_to(e2, (c1, c2, M))
    ym = (_iota2((c2, M), 1) // c3 == _iota2((c2, M), 0)).astype(dt)
    return jax.lax.dot_general(e2 * ym[None], _modmat(c3, M, dt),
                               (((2,), (1,)), ((), ())), precision=_HI,
                               preferred_element_type=dt)    # (c1,c2,c3)


# ------------------------------------------------------------- cycle math


def _cheb(packed, lam, b, x, dim, degree, lam_min_frac, safety=1.05):
    """Chebyshev smooth on a packed stencil value — the recurrence of
    ``precond.chebyshev.chebyshev`` verbatim (bit-exact, established by the
    round-3 fused-smoother A/B).  ``x=None`` = zero start: skips the first
    stencil application (b − A·0 = b exactly), matching the jnp path."""
    lmax = lam * safety
    lmin = lam * lam_min_frac
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    inv_diag = 1.0 / packed[0]
    if x is None:
        x = jnp.zeros_like(b)
        z = inv_diag * b
    else:
        z = inv_diag * (b - _apply(packed, x, dim))
    d = z / theta
    rho = 1.0 / sigma1
    for _ in range(degree - 1):
        x = x + d
        z = inv_diag * (b - _apply(packed, x, dim))
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        rho = rho_new
    return x + d


def _correction_math(levels, inv, rc, *, degree, lam_min_frac, cycle_type,
                     kcycle_min_cells):
    """Approximate A₀⁻¹ rc over ``levels`` — pure jnp on loaded values.

    ``levels``: list of (packed_stencil_value, lam_value, shape, factors)
    from the entry level down; ``factors`` maps level ℓ -> ℓ+1 (unused on
    the coarsest).  ``inv`` is the dense inverse of the coarsest operator.
    Mirrors ``gmg._coarse_correction`` / ``_v_cycle`` statically unrolled.
    """
    n_levels = len(levels)

    def v_cycle(ell, b):
        packed, lam, shape, factors = levels[ell]
        dim = len(shape)
        if ell == n_levels - 1:
            # dense solve: flat-free flatten -> one MXU matvec -> unflatten
            # (e_i = Σ_j inv[i,j]·b_j via contraction with inv's SECOND
            # axis, so no host-side transpose of the inverse is needed)
            flat = _flatten_mm(b)
            ef = jax.lax.dot_general(
                flat, inv, (((flat.ndim - 1,), (1,)), ((), ())),
                precision=_HI, preferred_element_type=b.dtype)
            return _unflatten_mm(ef, shape)
        x = _cheb(packed, lam, b, None, dim, degree, lam_min_frac)
        r = b - _apply(packed, x, dim)
        bc = _blocksum_pairwise(r, factors)
        ec = correction(ell + 1, bc)
        x = x + _prolong_pairwise(ec, shape, factors)
        return _cheb(packed, lam, b, x, dim, degree, lam_min_frac)

    def correction(ell, b):
        packed, lam, shape, factors = levels[ell]
        dim = len(shape)
        e1 = v_cycle(ell, b)
        if (
            cycle_type == "v"
            or ell == n_levels - 1
            or math.prod(shape) < kcycle_min_cells
        ):
            return e1
        a_mat = lambda v: _apply(packed, v, dim)
        if cycle_type == "w":
            r1 = b - a_mat(e1)
            return e1 + v_cycle(ell, r1)
        v1 = a_mat(e1)
        rho1 = jnp.sum(v1 * e1)
        alpha1 = jnp.sum(b * e1)
        safe = jnp.where(jnp.abs(rho1) > 0, rho1, 1.0)
        x = (alpha1 / safe) * e1
        r1 = b - (alpha1 / safe) * v1
        e2 = v_cycle(ell, r1)
        v2 = a_mat(e2)
        gamma = jnp.sum(v1 * e2)
        beta = jnp.sum(v2 * e2)
        alpha2 = jnp.sum(r1 * e2)
        rho2 = beta - gamma * gamma / safe
        safe2 = jnp.where(jnp.abs(rho2) > 0, rho2, 1.0)
        return x + (alpha2 / safe2) * (e2 - (gamma / safe) * e1)

    return correction(0, rc)


# ------------------------------------------------------------- entry point


def subtree_vmem_bytes(stencils, coarse_inv) -> int:
    """Static VMEM estimate of a fused subtree (inputs + working set)."""
    # size the estimate at the stencils' actual dtype (the kernel computes
    # at rc.dtype): an f64 subtree occupies 2x the f32 bytes, and an
    # undercounted estimate could pass _fusable yet blow the 120 MiB
    # scoped-VMEM request at compile time (ADVICE r4)
    itemsize = max(jnp.dtype(st.diag.dtype).itemsize for st in stencils)
    total = coarse_inv.size * itemsize
    for st in stencils:
        n = math.prod(st.grid_shape)
        # packed coefficients + ~8 live vectors during the recursion
        total += (2 * len(st.grid_shape) + 1 + 8) * n * itemsize
    return total


def deep_correction(
    stencils,
    lam_max,
    coarse_inv,
    rc: jax.Array,
    factors_list,
    *,
    degree: int,
    lam_min_frac: float,
    cycle_type: str,
    kcycle_min_cells: int,
    interpret: bool = False,
) -> jax.Array:
    """One-launch fused correction over ``stencils`` (entry level first).

    Args:
      stencils: ScalarStencil per level, entry level downward (all must be
        plain 7/5-point ScalarStencils — constant transfer).
      lam_max: per-level Chebyshev λ̂ for all but the coarsest level.
      coarse_inv: dense inverse of the coarsest operator.
      rc: entry-level right-hand side.
      factors_list: per-level coarsening factors (len == len(stencils)-1).
    """
    dtype = rc.dtype
    packed = [pack_stencil(s).astype(dtype) for s in stencils]
    shapes = [s.grid_shape for s in stencils]
    n_lev = len(stencils)
    lam_arr = jnp.stack(
        [jnp.asarray(l, dtype) for l in lam_max[: n_lev - 1]]
    ).reshape(1, -1) if n_lev > 1 else jnp.zeros((1, 1), dtype)
    inv = coarse_inv.astype(dtype)

    statics = dict(degree=degree, lam_min_frac=lam_min_frac,
                   cycle_type=cycle_type,
                   kcycle_min_cells=kcycle_min_cells)

    def kernel(lam_ref, inv_ref, rc_ref, *rest):
        sten_refs, o_ref = rest[:-1], rest[-1]
        levels = []
        for ell in range(n_lev):
            fac = factors_list[ell] if ell < n_lev - 1 else None
            levels.append((sten_refs[ell][...], lam_ref[0, ell]
                           if ell < n_lev - 1 else None,
                           shapes[ell], fac))
        o_ref[...] = _correction_math(levels, inv_ref[...], rc_ref[...],
                                      **statics)

    if not _pallas_available(interpret):
        # CPU fallback: same math, plain XLA (used by tests for parity and
        # by any CPU run that enables fuse_below)
        levels = [
            (packed[ell], lam_arr[0, ell] if ell < n_lev - 1 else None,
             shapes[ell],
             factors_list[ell] if ell < n_lev - 1 else None)
            for ell in range(n_lev)
        ]
        return _correction_math(levels, inv, rc, **statics)

    # Mosaic's scoped-VMEM stack runs far beyond the raw operand footprint:
    # unrolled smooths keep many temporaries live AND thin-z 3D levels pad
    # their lane dim to 128 (a (60,110,6) f32 array occupies 3.4 MiB of
    # VMEM, 21x its raw bytes) — measured 20.4 MiB needed for a 36k-cell
    # p-subtree and 60.4 MiB for a 4-level thin-z T-subtree against the
    # 16 MiB default.  The limit is an allowance, not an allocation, so
    # request a flat high bound with margin under the chip's VMEM; the
    # _fusable() data budget (precond/gmg.py) bounds entry sizes.
    vmem_limit = 120 * 2**20
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rc.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_lev),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)),
        interpret=interpret,
    )(lam_arr, inv, rc, *packed)

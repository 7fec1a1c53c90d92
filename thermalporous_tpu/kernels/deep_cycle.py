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
# _prolong semantics, ragged tails included).  Implemented with
# slice+concatenate shifts and iota masks only — the forms Mosaic lowers
# exactly on axon (CLAUDE.md ledger: strided slices and gathers miscompile
# at scale; leading-axis reshapes are fine but sublane-axis reshapes are
# not portable).  The price is that the pairwise sum runs at fine-level
# size — irrelevant here, the arrays are VMEM-resident and tiny.


def _shift_m_k(v, axis, k=1):
    """v[i+k] at i, zero-filled tail."""
    n = v.shape[axis]
    body = jax.lax.slice_in_dim(v, k, n, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, k, axis=axis))
    return jax.lax.concatenate([body, zero], dimension=axis)


def _blocksum_pairwise(x, factors):
    """Galerkin summation restriction == gmg._blocksum, Mosaic-safe form.

    Per factor-2 axis: pair-sum x[2k] + x[2k+1] (ragged tail keeps its
    lone entry), then COMPACT even positions to the front.  Compaction is
    a contraction with a 0/1 selection matrix: on the last axis a plain
    (n, nc) matmul; on leading axes via dot_general with the selection
    matrix on the LEFT so the output axis order is preserved (no
    transposes).  Sums involve ≤2 nonzero terms so the result is
    bit-identical to the reshape-based `_blocksum`.
    """
    dim = x.ndim
    for axis in range(dim):
        if factors[axis] == 1:
            continue
        n = x.shape[axis]
        m = -(-n // 2)
        pair = x + _shift_m_k(x, axis, 1)  # x[i] + x[i+1] at i
        # selection S (m, n): S[k, i] = 1 iff i == 2k  -> picks pair[2k]
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        sel = (cols == 2 * rows).astype(x.dtype)
        if axis == dim - 1:
            # (..., n) @ (n, m)
            x = jax.lax.dot_general(
                pair, sel, (((dim - 1,), (1,)), ((), ())),
                preferred_element_type=x.dtype)
        elif axis == 0:
            # (m, n) x (n, ...) -> (m, ...)
            x = jax.lax.dot_general(
                sel, pair, (((1,), (0,)), ((), ())),
                preferred_element_type=x.dtype)
        else:
            # middle axis: batch the leading axes, contract with sel on
            # the left: lhs (lead..., m, n) broadcast? dot_general cannot
            # broadcast — instead contract from the left with batching on
            # axis 0.  For 3D (X, Y, Z), axis=1: batch X, sel (m, n) has
            # no batch dim, so expand: sel_b (X, m, n) via broadcast.
            lead = x.shape[0]
            sel_b = jnp.broadcast_to(sel[None], (lead, m, n))
            x = jax.lax.dot_general(
                sel_b, pair, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=x.dtype)
    return x


def _prolong_pairwise(e, fine_shape, factors):
    """Piecewise-constant injection == gmg._prolong, Mosaic-safe form.

    Per factor-2 axis: expand coarse k -> fine {2k, 2k+1} (ragged tail
    truncated) with the transposed selection matrices; each fine entry
    receives exactly one coarse value, so this too is bit-exact.
    """
    dim = e.ndim
    for axis in range(dim):
        if factors[axis] == 1:
            continue
        n = fine_shape[axis]
        m = e.shape[axis]
        # expansion E (n, m): E[i, k] = 1 iff k == i // 2
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        exp = (cols == rows // 2).astype(e.dtype)
        if axis == dim - 1:
            e = jax.lax.dot_general(
                e, exp, (((dim - 1,), (1,)), ((), ())),
                preferred_element_type=e.dtype)
        elif axis == 0:
            e = jax.lax.dot_general(
                exp, e, (((1,), (0,)), ((), ())),
                preferred_element_type=e.dtype)
        else:
            lead = e.shape[0]
            exp_b = jnp.broadcast_to(exp[None], (lead, n, m))
            e = jax.lax.dot_general(
                exp_b, e, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=e.dtype)
    return e


# ------------------------------------------------------------- cycle math


def _cheb(packed, lam, b, x, dim, degree, lam_min_frac, safety=1.05):
    """Chebyshev smooth on a packed stencil value — the recurrence of
    ``precond.chebyshev.chebyshev`` verbatim (bit-exact, established by the
    round-3 fused-smoother A/B)."""
    lmax = lam * safety
    lmin = lam * lam_min_frac
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    inv_diag = 1.0 / packed[0]
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
            n = math.prod(shape)
            # dense solve as a (n,1) matmul; flattening happens through
            # the Mosaic-safe per-axis contraction of _blocksum_pairwise's
            # family only when needed — here the coarsest grid is tiny and
            # its reshape is leading-axes-only after the lane axis is kept
            e = jnp.dot(inv, b.reshape(n, 1),
                        preferred_element_type=b.dtype)
            return e.reshape(shape)
        x = _cheb(packed, lam, b, jnp.zeros_like(b), dim, degree,
                  lam_min_frac)
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
    itemsize = 4  # kernel computes in f32
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

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rc.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_lev),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lam_arr, inv, rc, *packed)

"""Operator-weighted prolongation and the wide (9/27-point) stencil class.

The last unmatched BoomerAMG capability (SURVEY.md §7 hard part 1,
VERDICT r2 item 4): the baseline GMG uses piecewise-constant injection /
summation transfer, whose coarse-grid correction degrades on SPE10-class
transmissibility contrast.  This module provides the cell-centred
Kwak/BoxMG-style alternative:

- :class:`WideStencil` — a scalar stencil over the full 3^dim neighbour
  box, stored as one ``(3,)*dim + shape`` coefficient array.  Weighted-P
  Galerkin coarse operators leave the 5/7-point class but stay inside
  the box class (see support analysis below); wide stencils appear ONLY
  on GMG levels below the finest, where the extra bandwidth rides on
  ≤ half-size grids.
- :func:`transfer_weights` — per-axis two-point interpolation weights
  from the level operator's own axis couplings (flux continuity: a fine
  cell's error is the |transmissibility|-weighted average of its parent
  coarse cell and the coarse cell across its outer face).  The
  full-shape zero-boundary convention makes domain edges fall back to
  parent injection automatically.
- :func:`prolong_weighted` — P applied axis-by-axis (tensor form;
  weights for a still-coarse axis are even-index subsampled).
  Restriction stays the SUMMATION operator of the baseline GMG (the
  Kwak cell-centred pair): with R = summation and this 2-point-per-axis
  P, every Galerkin product R·A·P of a box-support A has coarse support
  |i−j| ≤ 1 per axis — the 9/27-point class — whereas the adjoint pair
  R = Pᵀ would widen support to ±2 per axis.
- :func:`galerkin_wide` — A_c = R·A·P by 3^dim-colour probing: exact
  coefficient extraction of any ≤3-support-per-axis operator from
  3^dim composed applications, independent of the P/R details and
  testable against dense RAP.

TPU notes: the apply path (matvec, P) is pure shift/elementwise
arithmetic on full-shape arrays; probing performs one static gather per
offset at setup time only.  Signs are not assumed: weights use
|coupling|, so intermediate Galerkin levels need not be M-matrices.
"""

from __future__ import annotations

import dataclasses
import itertools
import math

import jax
import jax.numpy as jnp

from thermalporous_tpu.core.grid import shift_minus, shift_plus
from thermalporous_tpu.core.stencil import ScalarStencil


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WideStencil:
    """Scalar stencil over the full 3^dim neighbour box.

    ``coef[o0, o1(, o2)]`` couples cell ``i`` to ``i + (o-1)`` per axis;
    entries pointing outside the domain are zero (full-shape convention,
    same as :class:`ScalarStencil`).
    """

    coef: jax.Array  # (3,)*dim + shape

    @property
    def dim(self) -> int:
        return self.coef.ndim // 2  # (3,)*dim + shape, len(shape) == dim

    @property
    def grid_shape(self) -> tuple[int, ...]:
        return self.coef.shape[self.dim:]

    @property
    def diag(self) -> jax.Array:
        return self.coef[(1,) * self.dim]

    def matvec(self, v: jax.Array) -> jax.Array:
        dim = self.dim
        y = jnp.zeros_like(v)
        for off in itertools.product((0, 1, 2), repeat=dim):
            w = v
            for a, o in enumerate(off):
                if o == 2:      # neighbour at +a: bring v[i+1] to i
                    w = shift_minus(w, a, lead=0)
                elif o == 0:    # neighbour at -a
                    w = shift_plus(w, a, lead=0)
            y = y + self.coef[off] * w
        return y

    def row_abs_sum(self) -> jax.Array:
        dim = self.dim
        flat = self.coef.reshape((3 ** dim,) + self.grid_shape)
        return jnp.sum(jnp.abs(flat), axis=0)

    def to_dense(self) -> jax.Array:
        n = math.prod(self.grid_shape)
        eye = jnp.eye(n, dtype=self.coef.dtype)
        cols = eye.reshape((n,) + self.grid_shape)
        out = jax.vmap(self.matvec)(cols)
        return out.reshape(n, n).T


def as_wide(st: ScalarStencil) -> WideStencil:
    """Embed a 5/7-point ScalarStencil in the wide class (exact)."""
    dim = len(st.grid_shape)
    shape = st.grid_shape
    coef = jnp.zeros((3,) * dim + shape, dtype=st.diag.dtype)
    coef = coef.at[(1,) * dim].set(st.diag)
    for a in range(dim):
        up_idx = tuple(2 if i == a else 1 for i in range(dim))
        lo_idx = tuple(0 if i == a else 1 for i in range(dim))
        coef = coef.at[up_idx].set(st.upper[a])
        coef = coef.at[lo_idx].set(st.lower[a])
    return WideStencil(coef=coef)


def _axis_couplings(st, a: int) -> tuple[jax.Array, jax.Array]:
    """|coupling| of each cell to its -a / +a neighbour."""
    if isinstance(st, WideStencil):
        dim = st.dim
        lo = st.coef[tuple(0 if i == a else 1 for i in range(dim))]
        up = st.coef[tuple(2 if i == a else 1 for i in range(dim))]
    else:
        lo, up = st.lower[a], st.upper[a]
    return jnp.abs(lo), jnp.abs(up)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AxisWeights:
    """Per-axis interpolation weights at that axis's application shape.

    For each fine cell along the coarsened axis: ``w_self`` multiplies the
    parent coarse value, ``w_out`` the coarse neighbour across the cell's
    outer face (the previous coarse cell for even children, the next for
    odd children).  ``w_self + w_out = 1``; boundary cells have
    ``w_self = 1`` (their outer coupling is zero by convention).
    """

    w_self: jax.Array
    w_out: jax.Array


def _axis_weights(wl: jax.Array, wr: jax.Array, a: int) -> AxisWeights:
    """Resistance-calibrated 1D weights from |couplings| wl (-a) / wr (+a).

    Cell-centred geometry: fine cell centres sit at ±¼ coarse-cell units
    from their parent's centre, so homogeneous linear interpolation needs
    weights (¾ parent, ¼ outer) — NOT the (½, ½) a naive flux collapse
    gives.  (½, ½) is catastrophic under Galerkin with summation R: the
    averaging P makes the coarse DIFFUSION cancel (measured: level-1
    degenerates to the mass term and V-cycle iterations triple).  In
    resistance form the parent is reached through half the sibling face
    (conductance 2·T_sib → here folded as 3·T_sib against 1·T_out, which
    reproduces exactly ¾/¼ homogeneous):

      even child f (sibling at +a, outer at −a):
        w_parent = 3·wr / (3·wr + wl),  w_out = wl / (3·wr + wl)
      odd child mirrors.

    Heterogeneous limits: impermeable outer face (wl→0) → pure parent
    injection; in the other direction the parent weight is FLOORED at the
    homogeneous ¾ — heterogeneity may only pull P TOWARD injection, never
    below the linear-interpolation parent share.  Two measured failure
    modes motivate the floor (both summation-R pathologies — with R ≠ Pᵀ
    the pair is Petrov–Galerkin and has no variational safety net; dense
    two-level analysis in tests/test_transfer.py):
    - w_self → 0 (child defers to the neighbouring coarse cell) collapses
      the Galerkin coarse DIAGONAL: on full SPE10 (10⁶ channel contrast)
      row-sum/|diag| ratios reach 10⁹, Gershgorin λ overflows and the
      smoother NaNs, on CPU and TPU alike.
    - Even bounded w_self ∈ [½, ¾) on ROUGH (per-cell random) coefficient
      fields makes the two-level iteration DIVERGE outright (measured
      asymptotic ρ = 9.8 on a 4-decade lognormal 32² field, vs 0.93 for
      constant transfer; the variational pair Pᵀ·A·P is stable at 0.855
      but needs a 5-per-axis stencil class).  With the ¾ floor the same
      field CONVERGES and beats constant transfer (V-cycle FGMRES 33 vs
      42 in 2D, 34 vs 38 in 3D), while the smooth/layered wins are
      retained (Poisson 3D 20→7, layered 4-decade 2D 25→16).
    Zero-coupling cells inject from the parent.
    """
    shape = wl.shape
    idx = jnp.arange(shape[a]).reshape(
        tuple(shape[a] if i == a else 1 for i in range(len(shape)))
    )
    even = idx % 2 == 0
    se = 3.0 * wr + wl
    so = 3.0 * wl + wr
    w_par_even = jnp.where(se > 0, 3.0 * wr / jnp.where(se > 0, se, 1.0), 1.0)
    w_par_odd = jnp.where(so > 0, 3.0 * wl / jnp.where(so > 0, so, 1.0), 1.0)
    w_self = jnp.maximum(jnp.where(even, w_par_even, w_par_odd), 0.75)
    return AxisWeights(w_self=w_self, w_out=1.0 - w_self)


def _subsample(x: jax.Array, axes: tuple[int, ...]) -> jax.Array:
    """Even-index subsample along ``axes`` (tensor-form weight reduction).

    Implemented as even-mask × pairwise block-sum, NOT a strided slice:
    strided views inside the jitted Newton loop miscompile on axon at
    ~1M-cell scale (the BlockStencil.block family, CLAUDE.md), and this
    masked form is the same lowering the (proven) restriction uses.
    """
    from thermalporous_tpu.precond.gmg import _blocksum

    for a in axes:
        mask = _even_mask(x.shape, a, x.dtype)
        fac = tuple(2 if i == a else 1 for i in range(x.ndim))
        x = _blocksum(x * mask, x.shape, fac)
    return x


def transfer_weights(st, factors: tuple[int, ...]) -> tuple[AxisWeights | None, ...]:
    """Build per-axis weights for every coarsened axis of this level.

    Axis ``a``'s 1D interpolation is applied (during prolongation) when
    all LOWER-indexed coarsened axes are already at fine resolution and
    all higher-indexed ones are still coarse — so its weight arrays are
    the fine-grid weights even-index-subsampled along those higher axes.
    """
    dim = len(factors)
    out: list[AxisWeights | None] = []
    for a in range(dim):
        if factors[a] != 2:
            out.append(None)
            continue
        wl, wr = _axis_couplings(st, a)
        aw = _axis_weights(wl, wr, a)
        higher = tuple(b for b in range(a + 1, dim) if factors[b] == 2)
        out.append(AxisWeights(
            w_self=_subsample(aw.w_self, higher),
            w_out=_subsample(aw.w_out, higher),
        ))
    return tuple(out)


def _even_mask(shape: tuple[int, ...], a: int, dtype) -> jax.Array:
    idx = jnp.arange(shape[a]).reshape(
        tuple(shape[a] if i == a else 1 for i in range(len(shape)))
    )
    return (idx % 2 == 0).astype(dtype)


def _prolong_axis(e: jax.Array, fine_n: int, a: int, w: AxisWeights) -> jax.Array:
    """1D weighted prolongation along axis ``a`` (coarse m → fine n)."""
    inj = jnp.repeat(e, 2, axis=a)
    if inj.shape[a] != fine_n:
        inj = jax.lax.slice_in_dim(inj, 0, fine_n, axis=a)
    even = _even_mask(inj.shape, a, inj.dtype)
    # outer coarse neighbour's value: for even f it's the injected value
    # at f-1 (previous coarse cell), for odd f at f+1 (next coarse cell)
    outer = even * shift_plus(inj, a, lead=0) + (1.0 - even) * shift_minus(
        inj, a, lead=0
    )
    return w.w_self * inj + w.w_out * outer


def prolong_weighted(
    e: jax.Array,
    fine_shape: tuple[int, ...],
    weights: tuple[AxisWeights | None, ...],
) -> jax.Array:
    """P e: axis-by-axis weighted prolongation (axis 0 first)."""
    for a, w in enumerate(weights):
        if w is not None:
            e = _prolong_axis(e, fine_shape[a], a, w)
    return e


def galerkin_wide(
    st,
    weights: tuple[AxisWeights | None, ...],
    coarse_shape: tuple[int, ...],
) -> WideStencil:
    """A_c = R·A·P by 3^dim-colour probing, R = summation restriction.

    For every colour k ∈ {0,1,2}^dim, apply the composed operator to the
    coarse indicator of cells ≡ k (mod 3); entry (i → i+o-1) of A_c is
    then read off the probe whose colour matches the target cell.  One
    static gather per offset assembles the (3,)*dim coefficient array.
    Exactness requires coarse support |i−j| ≤ 1 per axis, which the
    summation-R / 2-point-P pair guarantees (module docstring).
    """
    from thermalporous_tpu.precond.gmg import _blocksum

    dim = len(coarse_shape)
    fine_shape = st.grid_shape
    dtype = st.diag.dtype
    factors = tuple(2 if c < f else 1 for f, c in zip(fine_shape, coarse_shape))
    idx = [
        jnp.arange(coarse_shape[a]).reshape(
            tuple(coarse_shape[a] if i == a else 1 for i in range(dim))
        )
        for a in range(dim)
    ]

    # one vmapped probe body instead of 3^dim unrolled copies: the
    # weighted hierarchy is rebuilt inside the jitted Newton loop, and an
    # unrolled probe loop over every level blows up remote compile time
    masks = []
    for k in itertools.product((0, 1, 2), repeat=dim):
        mask = jnp.ones(coarse_shape, dtype=dtype)
        for a in range(dim):
            mask = mask * (idx[a] % 3 == k[a]).astype(dtype)
        masks.append(mask)
    Y = jax.vmap(
        lambda m: _blocksum(
            st.matvec(prolong_weighted(m, fine_shape, weights)),
            fine_shape,
            factors,
        )
    )(jnp.stack(masks))  # (3^dim, *coarse)

    # Coefficient extraction WITHOUT a data-dependent gather.  Colours are
    # periodic with period 3 per axis, so every cell in residue class
    # r ∈ {0,1,2}^dim reads, for offset o, the CONSTANT colour
    # c(r,o) = colour(r + o - 1 mod 3): the per-cell colour lookup
    # factors into 3^dim residue masks (the SAME iota products used for
    # probing) times statically-indexed rows of Y.  The previous
    # `take_along_axis` gather over the colour axis miscompiles on the
    # axon TPU at full-SPE10 scale — NaN hierarchy out-of-loop AND a
    # wrong (λ→1e9) level-1 stencil in-loop, while this masked static
    # form matches the CPU bit-for-bit (tools/diag_wp.py, round 3; same
    # lowering family as the BlockStencil.block slice-view bug).
    coefs = []
    for off in itertools.product((0, 1, 2), repeat=dim):
        inside = jnp.ones(coarse_shape, dtype=bool)
        for a in range(dim):
            j = idx[a] + (off[a] - 1)
            inside = inside & (j >= 0) & (j < coarse_shape[a])
        acc = jnp.zeros(coarse_shape, dtype=dtype)
        for ri, r in enumerate(itertools.product((0, 1, 2), repeat=dim)):
            c = 0
            for a in range(dim):
                c = c * 3 + (r[a] + off[a] - 1) % 3
            acc = acc + masks[ri] * Y[c]
        coefs.append(jnp.where(inside, acc, 0.0))
    return WideStencil(coef=jnp.stack(coefs).reshape(
        (3,) * dim + coarse_shape))

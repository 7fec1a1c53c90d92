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

from thermalporous_tpu.core.stencil import BlockStencil, ScalarStencil


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


def _vmem_params(shape, dtype, n_operands: int) -> "pltpu.CompilerParams":
    """Scoped-VMEM request for a whole-array kernel.

    Mosaic's stack accounting runs far beyond the raw operand footprint
    (unrolled temporaries + lane padding of thin minor dims: measured a
    deg-4 Chebyshev smooth at a 145k-cell 3D level needing 36.2 MiB
    against a 7.5 MiB operand estimate), and its DEFAULT limit is 16 MiB —
    so kernels that pass ``fits_vmem`` can still be rejected at compile
    time.  The limit is an allowance, not an allocation; request a flat
    high bound with margin under the chip's VMEM.
    """
    del shape, dtype, n_operands
    return pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20)


# ---------------------------------------------------------------- row bands
# 2D levels too big for whole-array kernels are processed in row bands over
# the sublane (x) axis with an 8-row halo (Mosaic's DMA slice alignment),
# the lane (y) axis whole.  One smooth of Chebyshev degree d applies the
# stencil d times; contamination from the band edge penetrates d−1 rows, so
# the 8-row halo keeps the interior exact for any degree ≤ 8.

HALO = 8


def _band_tile(nx, ny, channels, itemsize, budget=9 * 2**20):
    for t in (256, 128, 64, 32, 16, 8):
        if nx % t:
            continue
        if 2 * channels * (t + 2 * HALO) * ny * itemsize <= budget:
            return t
    return None


def _band_call(body, packed, out_channels, nx, ny, tile_t, scalars=None,
               interpret=False):
    """Run ``body(scal_ref, window, out_ref)`` over row bands of ``packed``.

    ``packed``: (C, nx + 2·HALO, ny); each band DMAs one
    (C, tile+2·HALO, ny) window; body writes (out_channels, tile, ny).
    """
    channels = packed.shape[0]

    def kernel(scal_ref, in_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        t = out_ref.shape[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(i * t, t + 2 * HALO), :], scratch, sem
        )
        cp.start()
        cp.wait()
        body(scal_ref, scratch[...], out_ref)

    scal = jnp.zeros((1, 1), packed.dtype) if scalars is None else scalars
    out = pl.pallas_call(
        kernel,
        grid=(nx // tile_t,),
        out_shape=jax.ShapeDtypeStruct((out_channels, nx, ny), packed.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (out_channels, tile_t, ny), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((channels, tile_t + 2 * HALO, ny), packed.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scal, packed)
    return out


def _pad_rows(a: jax.Array) -> jax.Array:
    return jnp.pad(a, [(0, 0), (HALO, HALO), (0, 0)])


def _pallas_available(interpret: bool) -> bool:
    """Compiled Pallas needs a TPU backend; interpret mode runs anywhere."""
    return interpret or jax.default_backend() != "cpu"


def matvec(st: ScalarStencil, v: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused y = A·v: whole-array kernel when it fits VMEM, 2D row bands
    otherwise; jnp fallback for oversized 3D levels."""
    if not _pallas_available(interpret):
        return st.matvec(v)
    dim = len(st.grid_shape)
    packed = pack_stencil(st).astype(v.dtype)

    if fits_vmem(st.grid_shape, v.dtype, n_operands=2 * dim + 3):
        def kernel(s_ref, v_ref, o_ref):
            o_ref[...] = _apply(s_ref[...], v_ref[...], dim)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_vmem_params(st.grid_shape, v.dtype, 2 * dim + 3),
            interpret=interpret,
        )(packed, v)

    if dim == 2:
        nx, ny = st.grid_shape
        t = _band_tile(nx, ny, channels=2 * dim + 2, itemsize=v.dtype.itemsize)
        if t is not None:
            data = _pad_rows(jnp.concatenate([packed, v[None]], axis=0))

            def body(_scal, window, out_ref):
                tt = out_ref.shape[1]
                y = _apply(window[: 2 * dim + 1], window[2 * dim + 1], dim)
                out_ref[0] = y[HALO : HALO + tt, :]

            return _band_call(body, data, 1, nx, ny, t, interpret=interpret)[0]

    return st.matvec(v)


def pack_block_stencil(st: BlockStencil) -> jax.Array:
    """Flatten block coefficients to ((2·dim+1)·nc², *shape) channels:
    [diag, up_0, lo_0, up_1, lo_1, ...] × row-major (i, j) blocks."""
    parts = [st.diag]
    for up, lo in zip(st.upper, st.lower):
        parts.append(up)
        parts.append(lo)
    stacked = jnp.stack(parts)  # (2·dim+1, nc, nc, *shape)
    k = stacked.shape[0] * stacked.shape[1] * stacked.shape[2]
    return stacked.reshape((k,) + st.grid_shape)


def block_matvec(st: BlockStencil, v: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused y = A·v for a BLOCK 7-point stencil (the Newton Krylov matvec
    when ``NewtonConfig.krylov_op == "stencil"``).

    The x-shifts of ``v`` ride a manually-DMA'd halo window; the (large)
    coefficient array uses ordinary blocked in_specs, which Pallas
    double-buffers automatically — per-band traffic is therefore one read
    of the coefficients plus a slightly-overlapping read of ``v``.
    """
    if not _pallas_available(interpret):
        return st.matvec(v)
    nc = st.nc
    shape = st.grid_shape
    dim = len(shape)
    nco = 2 * dim + 1
    K = nco * nc * nc
    coef = pack_block_stencil(st).astype(v.dtype)

    def apply_tile(c, vwin, h, t):
        # c: (nco, nc, nc, t, *rest); vwin: (nc, t+2h, *rest)
        vc = jax.lax.slice_in_dim(vwin, h, h + t, axis=1)
        vxp = jax.lax.slice_in_dim(vwin, h + 1, h + t + 1, axis=1)
        vxm = jax.lax.slice_in_dim(vwin, h - 1, h + t - 1, axis=1) if h > 0 else None
        neigh = [(vxp if h > 0 else _shift_m(vc, 1),
                  vxm if h > 0 else _shift_p(vc, 1))]
        for a in range(1, dim):
            neigh.append((_shift_m(vc, 1 + a), _shift_p(vc, 1 + a)))
        rows = []
        for i in range(nc):
            acc = c[0, i, 0] * vc[0]
            for j in range(1, nc):
                acc = acc + c[0, i, j] * vc[j]
            for a in range(dim):
                vp, vm = neigh[a]
                for j in range(nc):
                    acc = acc + c[1 + 2 * a, i, j] * vp[j]
                    acc = acc + c[2 + 2 * a, i, j] * vm[j]
            rows.append(acc)
        return jnp.stack(rows)

    itemsize = jnp.dtype(v.dtype).itemsize
    if fits_vmem(shape, v.dtype, n_operands=2 * K + 4 * nc):
        def kernel(c_ref, v_ref, o_ref):
            c = c_ref[...].reshape((nco, nc, nc) + shape)
            vv = jnp.pad(v_ref[...], [(0, 0), (1, 1)] + [(0, 0)] * (dim - 1))
            o_ref[...] = apply_tile(c, vv, 1, shape[0])

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_vmem_params(shape, v.dtype, 2 * K + 4 * nc),
            interpret=interpret,
        )(coef, v)

    # banded over x: halo 8 in 2D (x is the sublane axis: DMA alignment),
    # 1 in 3D (x is a plain leading axis)
    h = HALO if dim == 2 else 1
    nx = shape[0]
    rest = math.prod(shape[1:])
    budget = 10 * 2**20
    tile = None
    for t in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if nx % t:
            continue
        per_band = (2 * K * t + 2 * nc * (t + 2 * h) + 2 * nc * t) * rest * itemsize
        if per_band <= budget:
            tile = t
            break
    if tile is None:
        return st.matvec(v)

    vp = jnp.pad(v, [(0, 0), (h, h)] + [(0, 0)] * (dim - 1))

    def kernel(c_ref, v_hbm, o_ref, vwin, sem):
        i = pl.program_id(0)
        t = o_ref.shape[1]
        cp = pltpu.make_async_copy(
            v_hbm.at[(slice(None), pl.ds(i * t, t + 2 * h))], vwin, sem
        )
        cp.start()
        cp.wait()
        c = c_ref[...].reshape((nco, nc, nc, t) + shape[1:])
        o_ref[...] = apply_tile(c, vwin[...], h, t)

    return pl.pallas_call(
        kernel,
        grid=(nx // tile,),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[
            pl.BlockSpec((K, tile) + shape[1:],
                         lambda i: (0, i) + (0,) * (dim - 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nc, tile) + shape[1:],
                               lambda i: (0, i) + (0,) * (dim - 1),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc, tile + 2 * h) + shape[1:], v.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(coef, vp)


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
    if not _pallas_available(interpret):
        from thermalporous_tpu.precond.chebyshev import chebyshev

        return chebyshev(st, b, x, degree=degree, lam_max=lam_max,
                         lam_min_frac=lam_min_frac, lam_max_safety=lam_max_safety)
    dim = len(st.grid_shape)

    def cheb_math(s, bb, xx, lam):
        lmax = lam * lam_max_safety
        lmin = lam * lam_min_frac
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
        return xx + d

    packed = pack_stencil(st).astype(b.dtype)
    x0 = jnp.zeros_like(b) if x is None else x
    lam = jnp.asarray(lam_max, dtype=b.dtype).reshape(1, 1)

    if fits_vmem(st.grid_shape, b.dtype, n_operands=2 * dim + 7):
        def kernel(lam_ref, s_ref, b_ref, x_ref, o_ref):
            o_ref[...] = cheb_math(s_ref[...], b_ref[...], x_ref[...], lam_ref[0, 0])

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
            compiler_params=_vmem_params(st.grid_shape, b.dtype, 2 * dim + 7),
            interpret=interpret,
        )(lam, packed, b, x0)

    # 2D row bands: degree stencil applications contaminate degree−1 rows
    # from the band edge, so the HALO-row halo keeps the interior exact for
    # degree ≤ HALO.  The ghost diagonal is padded with ONES (a zero diagonal
    # would put inf/NaN in the ghost rows through 1/diag).
    if dim == 2 and degree <= HALO:
        nx, ny = st.grid_shape
        t = _band_tile(nx, ny, channels=2 * dim + 3, itemsize=b.dtype.itemsize)
        if t is not None:
            diag_p = jnp.pad(packed[0:1], [(0, 0), (HALO, HALO), (0, 0)],
                             constant_values=1.0)
            rest_p = _pad_rows(jnp.concatenate(
                [packed[1:], b[None], x0[None]], axis=0))
            data = jnp.concatenate([diag_p, rest_p], axis=0)

            def body(lam_ref, window, out_ref):
                tt = out_ref.shape[1]
                s = window[: 2 * dim + 1]
                bb = window[2 * dim + 1]
                xx = window[2 * dim + 2]
                y = cheb_math(s, bb, xx, lam_ref[0, 0])
                out_ref[0] = y[HALO : HALO + tt, :]

            return _band_call(
                body, data, 1, nx, ny, t, scalars=lam, interpret=interpret
            )[0]

    from thermalporous_tpu.precond.chebyshev import chebyshev

    return chebyshev(st, b, x, degree=degree, lam_max=lam_max,
                     lam_min_frac=lam_min_frac, lam_max_safety=lam_max_safety)


def fused_block_rbgs(
    st: BlockStencil,
    dinv: jax.Array,
    b: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """One-sweep red-black BLOCK Gauss–Seidel from a zero start, fused.

    Computes ``block_red_black_gauss_seidel(st, dinv, b, x=None, sweeps=1)``
    — the CPR/CPTR stage-2 smoothing correction — in ONE banded kernel
    that streams the 63-field coefficient array ONCE.  The jnp form pays
    two full coefficient streams (the in-loop matvec of each half-sweep;
    the first is algebraically removable but its unrolled form miscompiles
    on axon — BASELINE.md round-4 ledger — so the fused kernel is where
    that traffic is actually recovered, plus the fused dinv/mask applies).

    Math (zero start, one sweep):
        x_r = red ⊙ D⁻¹b;   out = x_r + black ⊙ D⁻¹(b − A·x_r)
    Band layout (3D): output rows [a, a+t) need coefficients on their own
    rows only (auto-blocked, pipelined by Pallas) and dinv/b on rows
    [a−1, a+t+1) (small manual-DMA windows) — x_r on the halo comes from
    dinv·b there, no coefficient halo required.

    3D only (the flagship regime); callers fall back to the jnp form
    elsewhere.  sweeps>1 is out of scope by design (the production preset
    runs 1).

    STATUS (2026-08-20, final): WORKS but wall-negative.  Two hardware
    root-causes got it running: the original 4D manual-DMA window
    faults the TPU worker at runtime (a bare roundtrip reproduced it),
    so the kernel was rewritten on the lane-flattened lane-banded
    layout below, with x padded to the 8-sublane multiple and z to the
    128-lane block.  It now compiles and is EXACT at full-SPE10 scale
    standalone AND in-loop (tools/diag_s2fused.py: rel 1.1e-07 /
    1.5e-07) — but measures 7.84 ms/apply vs 5.67 for the jnp
    two-stream form: the z-padding (128/85) and x-padding (64/60)
    inflate its coefficient stream ~1.6x, the halo windows add serial
    DMA, and Mosaic's generated code trails XLA's fusions on this
    unrolled body.  ``CPRConfig.stage2_pallas`` therefore stays
    default-False: stage 2's 2.5 ms vs its 0.46 ms bound remains open,
    and the measured lesson is that closing it needs a layout with
    NATIVE (y, z) tiling (e.g. a z-on-sublanes transpose), not
    lane-flattening — BASELINE.md round-4.
    """
    shape = st.grid_shape
    dim = len(shape)
    nc = st.nc
    if not _pallas_available(interpret) or dim != 3:
        from thermalporous_tpu.precond.chebyshev import (
            block_red_black_gauss_seidel,
        )

        return block_red_black_gauss_seidel(st, dinv, b, None, sweeps=1)

    nco = 2 * dim + 1
    K = nco * nc * nc
    coef = pack_block_stencil(st).astype(b.dtype)
    dinv_flat = dinv.reshape((nc * nc,) + shape).astype(b.dtype)

    nx, ny, nz = shape
    # LANE-FLATTENED, LANE-BANDED layout.  Two hard Mosaic constraints met
    # at once: (a) every proven async-copy here is 3D (C, rows, lanes) —
    # the 4D window DMA faults the worker at runtime; (b) a blocked
    # in_spec's second-to-last dim must be divisible by 8 or equal the
    # full dim — nx=60 bands can't satisfy it, so the SUBLANE dim stays
    # the FULL x extent and the kernel bands over LANES instead.  (y, z)
    # flatten into the lane dim with z padded to a 128 block: x-shifts
    # are row shifts (all rows resident), y-shifts lane shifts of Z,
    # z-shifts lane shifts of 1; zero coefficient padding masks the
    # z-block seams, the z padding columns, AND the y wrap at lane-band
    # edges (the halo supplies real neighbor values there).
    Z = -(-nz // 128) * 128
    L = ny * Z
    # DMA slices on the sublane (row) dim must be 8-aligned too — pad x
    # with zero rows (zero coefficients/dinv there make them inert)
    X = -(-nx // 8) * 8
    itemsize = jnp.dtype(b.dtype).itemsize
    budget = 60 * 2**20
    lb = None
    for cand in (2560, 1280, 640, 256, 128):
        if L % cand:
            continue
        per_band = (2 * K * X * cand
                    + (nc * nc + 2 * nc) * X * (cand + 2 * Z)
                    + nc * X * cand) * itemsize
        if per_band <= budget:
            lb = cand
            break
    if lb is None:
        from thermalporous_tpu.precond.chebyshev import (
            block_red_black_gauss_seidel,
        )

        return block_red_black_gauss_seidel(st, dinv, b, None, sweeps=1)

    def flat(a):
        # (C, nx, ny, nz) -> (C, X, ny*Z): z zero-padded to the lane
        # block, x zero-padded to the sublane multiple
        a = jnp.pad(a, [(0, 0), (0, X - nx), (0, 0), (0, Z - nz)])
        return a.reshape(a.shape[0], X, L)

    coef_f = flat(coef)
    # y-halo of one lane block on each side for the window DMAs
    dinv_f = jnp.pad(flat(dinv_flat), [(0, 0), (0, 0), (Z, Z)])
    b_f = jnp.pad(flat(b), [(0, 0), (0, 0), (Z, Z)])

    def rshift_m(v):
        # v[x+1] at x (rows = dim 1), zero at the end — the x+ neighbor
        n = v.shape[1]
        body_ = jax.lax.slice_in_dim(v, 1, n, axis=1)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=1))
        return jax.lax.concatenate([body_, zero], dimension=1)

    def rshift_p(v):
        n = v.shape[1]
        body_ = jax.lax.slice_in_dim(v, 0, n - 1, axis=1)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=1))
        return jax.lax.concatenate([zero, body_], dimension=1)

    def block_solve(dwin, vwin):
        # per-cell block multiply y_i = sum_j dinv[i,j]*v_j
        rows = []
        for i in range(nc):
            acc = dwin[i * nc + 0] * vwin[0]
            for j in range(1, nc):
                acc = acc + dwin[i * nc + j] * vwin[j]
            rows.append(acc)
        return jnp.stack(rows)

    def apply_flat(c, vwin):
        # y = A*v on the lane band; c (nco,nc,nc,nx,lb); vwin
        # (nc,nx,lb+2Z) with the band at lane offset Z.
        width = vwin.shape[2]

        def lanes(off):
            return jax.lax.slice_in_dim(vwin, Z + off, Z + off + c.shape[4],
                                        axis=2)

        vc = lanes(0)
        neigh = [(rshift_m(vc), rshift_p(vc)),     # x: row shifts
                 (lanes(Z), lanes(-Z)),            # y: lane +-Z (halo'd)
                 (lanes(1), lanes(-1))]            # z: lane +-1
        rows = []
        for i in range(nc):
            acc = c[0, i, 0] * vc[0]
            for j in range(1, nc):
                acc = acc + c[0, i, j] * vc[j]
            for a in range(dim):
                vp, vm = neigh[a]
                for j in range(nc):
                    acc = acc + c[1 + 2 * a, i, j] * vp[j]
                    acc = acc + c[2 + 2 * a, i, j] * vm[j]
            rows.append(acc)
        return jnp.stack(rows)

    n_bands = L // lb

    def parity_mask(i, width, lane0_off):
        # red = even (x+y+z) parity on lanes [i*lb + lane0_off,
        # i*lb + lane0_off + width) for every x row; y = lane//Z,
        # z = lane%Z.  The +2Z keeps the argument non-negative at the
        # band-0 halo (lowered signed rem may truncate C-style); adding
        # an even multiple of Z never changes the parity of y + z.
        gx = jax.lax.broadcasted_iota(jnp.int32, (X, width), 0)
        lane = (jax.lax.broadcasted_iota(jnp.int32, (X, width), 1)
                + i * lb + lane0_off + 2 * Z)
        p = gx + lane // Z + lane % Z
        return (p % 2 == 0)

    def kernel(c_ref, d_hbm, b_hbm, o_ref, dwin, bwin, sem_d, sem_b):
        i = pl.program_id(0)
        cp_d = pltpu.make_async_copy(
            d_hbm.at[(slice(None), slice(None), pl.ds(i * lb, lb + 2 * Z))],
            dwin, sem_d)
        cp_b = pltpu.make_async_copy(
            b_hbm.at[(slice(None), slice(None), pl.ds(i * lb, lb + 2 * Z))],
            bwin, sem_b)
        cp_d.start()
        cp_b.start()
        cp_d.wait()
        cp_b.wait()
        c = c_ref[...].reshape((nco, nc, nc, X, lb))
        dw = dwin[...]
        bw = bwin[...]
        red_w = parity_mask(i, lb + 2 * Z, -Z).astype(bw.dtype)
        xr_win = red_w[None] * block_solve(dw, bw)      # (nc, nx, lb+2Z)
        ax = apply_flat(c, xr_win)                      # A*x_r, band lanes
        ctr = lambda v: jax.lax.slice_in_dim(v, Z, Z + lb, axis=2)
        bc, dc, xr = ctr(bw), ctr(dw), ctr(xr_win)
        black_c = 1.0 - jax.lax.slice_in_dim(red_w, Z, Z + lb, axis=1
                                             ).astype(bw.dtype)
        o_ref[...] = xr + black_c[None] * block_solve(dc, bc - ax)

    out_flat = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=jax.ShapeDtypeStruct((nc, X, L), b.dtype),
        in_specs=[
            pl.BlockSpec((K, X, lb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nc, X, lb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc * nc, X, lb + 2 * Z), b.dtype),
            pltpu.VMEM((nc, X, lb + 2 * Z), b.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        interpret=interpret,
    )(coef_f, dinv_f, b_f)
    out = jax.lax.slice_in_dim(out_flat, 0, nx, axis=1).reshape(
        nc, nx, ny, Z)
    return jax.lax.slice_in_dim(out, 0, nz, axis=3)

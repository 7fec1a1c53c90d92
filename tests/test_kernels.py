"""Pallas stencil kernels match the jnp reference implementations.

Run in interpreter mode on CPU (the tests' platform); the same kernels
compile to Mosaic on the TPU path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.kernels import chebyshev_smooth, matvec
from thermalporous_tpu.precond import chebyshev, gershgorin_lambda_max

from tests.test_gmg import poisson_stencil


@pytest.mark.parametrize("shape", [(16, 16), (13, 7), (8, 16, 8)])
def test_pallas_matvec_matches(shape, rng):
    k = jnp.asarray(np.exp(rng.standard_normal(shape)))
    st = poisson_stencil(shape, k=k, shift=0.5)
    v = jnp.asarray(rng.standard_normal(shape))
    ref = st.matvec(v)
    out = matvec(st, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("degree", [1, 2, 4])
def test_pallas_chebyshev_matches(degree, rng):
    shape = (16, 16)
    st = poisson_stencil(shape, shift=0.1)
    b = jnp.asarray(rng.standard_normal(shape))
    x0 = jnp.asarray(rng.standard_normal(shape))
    lam = gershgorin_lambda_max(st)
    ref = chebyshev(st, b, x0, degree=degree, lam_max=lam)
    out = chebyshev_smooth(st, b, x0, lam, degree=degree, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10, atol=1e-12)


def test_pallas_fallback_large(rng):
    # exceeds the VMEM budget → falls back to the jnp path transparently
    shape = (2048, 2048)
    st = poisson_stencil(shape, shift=0.1)
    v = jnp.ones(shape)
    out = matvec(st, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(st.matvec(v)), rtol=1e-12)


def _fused_case(model_cls, shape=(64, 64)):
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well

    pp = PhysicalParams()
    dim = len(shape)
    g = Grid(shape=shape, spacing=tuple(5.0 for _ in shape),
             thickness=10.0 if dim == 2 else None,
             gravity=9.81 if dim == 3 else 0.0)
    rng = np.random.default_rng(0)
    k = 2e-13 * np.exp(0.5 * rng.standard_normal(g.shape))
    corner = tuple(n - 1 for n in shape)
    wells = [
        Well(cells=(tuple(0 for _ in shape),), control="bhp", p_bh=4.0e7,
             T_inj=420.0),
        Well(cells=(corner,), control="bhp", p_bh=1.0e7),
        Well(cells=(tuple(2 for _ in shape),), control="rate", rate=-0.5),
    ]
    data = make_problem_data(g, pp, kx=k, phi=0.2, wells=wells)
    model = model_cls(g, pp)
    u0 = model.initial_state(data)
    u = u0 + jnp.stack([1e5 * jnp.ones(g.shape), 5.0 * jnp.ones(g.shape)]
                       + ([0.1 * jnp.ones(g.shape)] if model.nc == 3 else []))
    v = jnp.asarray(np.random.default_rng(1).standard_normal(u.shape))
    return model, data, u0, u, v


@pytest.mark.parametrize("model_name,shape", [
    ("sp", (64, 64)), ("tp", (64, 64)),
    ("sp", (12, 16, 8)), ("tp", (12, 16, 8)),
])
def test_fused_residual_and_jvp_match(model_name, shape):
    from thermalporous_tpu.kernels.residual_pallas import (
        fused_jvp,
        fused_residual,
        supported,
    )
    from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel

    cls = SinglePhaseModel if model_name == "sp" else TwoPhaseModel
    model, data, u0, u, v = _fused_case(cls, shape)
    assert supported(model, jnp.float64)

    ref = model.residual(u, u0, 1200.0, data)
    out = fused_residual(model, u, u0, 1200.0, data, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12 * scale, rtol=1e-12)

    jr = model.jvp(u, u0, 1200.0, data)(v)
    jo = fused_jvp(model, u, v, u0, 1200.0, data, interpret=True)
    scale = float(jnp.abs(jr).max())
    np.testing.assert_allclose(np.asarray(jo), np.asarray(jr),
                               atol=1e-12 * scale, rtol=1e-12)


def test_fused_fallback_oversized():
    """An over-VMEM grid is reported unsupported and falls back to jnp."""
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.kernels.residual_pallas import (
        _tile_size,
        fused_residual,
        supported,
    )
    from thermalporous_tpu.models import SinglePhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams

    # a 3D grid whose single x-slab (channels × ny × nz) exceeds the VMEM
    # budget at any tile size → unsupported
    assert _tile_size((7, 2048, 512), channels=19, itemsize=8) is None

    pp = PhysicalParams()
    g = Grid(shape=(4, 4, 4), spacing=(1.0, 1.0, 1.0))
    data = make_problem_data(g, pp, kx=1e-13)
    model = SinglePhaseModel(g, pp)
    assert supported(model, jnp.float64)  # tiny 3D grids are now fused
    u0 = model.initial_state(data)
    u = u0 + 1e5 * jnp.asarray(
        np.random.default_rng(3).standard_normal(u0.shape))
    ref = np.asarray(model.residual(u, u0, 100.0, data))
    out = fused_residual(model, u, u0, 100.0, data, interpret=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12 * scale,
                               rtol=1e-12)


def test_band_matvec_and_chebyshev_match(rng, monkeypatch):
    """Force the row-band path (as used for large 2D levels) on a small grid."""
    import thermalporous_tpu.kernels.stencil_pallas as sp

    monkeypatch.setattr(sp, "fits_vmem", lambda *a, **k: False)
    shape = (64, 96)
    k = jnp.asarray(np.exp(rng.standard_normal(shape)))
    st = poisson_stencil(shape, k=k, shift=0.3)
    v = jnp.asarray(rng.standard_normal(shape))
    out = sp.matvec(st, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(st.matvec(v)),
                               rtol=1e-12, atol=1e-14)

    b = jnp.asarray(rng.standard_normal(shape))
    x0 = jnp.asarray(rng.standard_normal(shape))
    lam = gershgorin_lambda_max(st)
    for degree in (2, 4):
        ref = chebyshev(st, b, x0, degree=degree, lam_max=lam)
        got = sp.chebyshev_smooth(st, b, x0, lam, degree=degree, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("shape,nc", [((16, 16), 2), ((16, 16), 3),
                                      ((13, 7), 3), ((8, 16, 8), 3)])
def test_pallas_block_matvec_matches(shape, nc, rng):
    """Fused block 7-point matvec (the stencil Krylov operator) == jnp."""
    from thermalporous_tpu.core.stencil import BlockStencil
    from thermalporous_tpu.kernels import block_matvec

    dim = len(shape)
    blk = lambda: jnp.asarray(rng.standard_normal((nc, nc) + shape))
    st = BlockStencil(
        diag=blk() + 4.0 * jnp.eye(nc).reshape((nc, nc) + (1,) * dim),
        upper=tuple(blk() for _ in range(dim)),
        lower=tuple(blk() for _ in range(dim)),
    )
    v = jnp.asarray(rng.standard_normal((nc,) + shape))
    ref = st.matvec(v)
    out = block_matvec(st, v, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-13 * scale)


def test_pallas_block_matvec_banded(rng, monkeypatch):
    """Force the banded path (large 2D stencils) on a small grid."""
    import thermalporous_tpu.kernels.stencil_pallas as sp
    from thermalporous_tpu.core.stencil import BlockStencil

    monkeypatch.setattr(sp, "fits_vmem", lambda *a, **k: False)
    shape, nc = (64, 32), 3
    blk = lambda: jnp.asarray(rng.standard_normal((nc, nc) + shape))
    st = BlockStencil(
        diag=blk() + 4.0 * jnp.eye(nc).reshape((nc, nc, 1, 1)),
        upper=(blk(), blk()),
        lower=(blk(), blk()),
    )
    v = jnp.asarray(rng.standard_normal((nc,) + shape))
    ref = st.matvec(v)
    out = sp.block_matvec(st, v, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-13 * scale)


# ------------------------------------------------------- fused deep cycle


def _random_hierarchy(shape, cycle_type, rng, degree=3):
    """A GMG hierarchy on a heterogeneous SPD-ish stencil + the fused
    subtree view of it from level 1 down."""
    import dataclasses

    from thermalporous_tpu.precond.gmg import (
        GMGConfig,
        _coarse_correction,
        gmg_setup,
    )

    k = jnp.asarray(np.exp(rng.standard_normal(shape)))
    st = poisson_stencil(shape, k=k, shift=0.3)
    cfg = GMGConfig(cycle_type=cycle_type, degree=degree,
                    max_coarse_cells=64, kcycle_min_cells=128)
    state = gmg_setup(st, cfg)
    b = jnp.asarray(rng.standard_normal(state.stencils[1].grid_shape))
    ref = _coarse_correction(state, 1, b, cfg)
    return state, cfg, b, ref


@pytest.mark.parametrize("shape,cycle_type", [
    ((24, 44, 10), "k"), ((24, 44, 10), "v"), ((24, 44, 10), "w"),
    ((33, 17), "k"),
])
def test_deep_cycle_kernel_matches_recursion(shape, cycle_type, rng):
    """The fused deep-cycle Pallas kernel (interpret mode) reproduces the
    jnp multigrid recursion — K/V/W cycles, ragged 3D and 2D shapes."""
    from thermalporous_tpu.kernels.deep_cycle import deep_correction

    state, cfg, b, ref = _random_hierarchy(shape, cycle_type, rng)
    subtree = state.stencils[1:]
    factors = tuple(
        tuple(2 if c < f else 1 for f, c in zip(a.grid_shape, bb.grid_shape))
        for a, bb in zip(subtree[:-1], subtree[1:]))
    out = deep_correction(
        subtree, state.lam_max[1:], state.coarse_inv, b, factors,
        degree=cfg.degree, lam_min_frac=cfg.lam_min_frac,
        cycle_type=cycle_type, kcycle_min_cells=cfg.kcycle_min_cells,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-13)


def test_deep_cycle_integration_fuse_below(rng):
    """gmg_apply with fuse_below routes through the fused math (the CPU
    fallback path — identical code to the kernel body) and matches the
    unfused recursion; eligibility degrades transparently."""
    import dataclasses

    from thermalporous_tpu.precond.gmg import GMGConfig, gmg_apply, gmg_setup

    shape = (24, 44, 10)
    k = jnp.asarray(np.exp(rng.standard_normal(shape)))
    st = poisson_stencil(shape, k=k, shift=0.3)
    cfg = GMGConfig(cycle_type="k", degree=3, max_coarse_cells=64,
                    kcycle_min_cells=128)
    state = gmg_setup(st, cfg)
    b = jnp.asarray(rng.standard_normal(shape))
    ref = gmg_apply(state, b, cfg)
    fused_cfg = dataclasses.replace(cfg, fuse_below=10**9)
    out = gmg_apply(state, b, fused_cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-13)
    # non-chebyshev smoother: eligibility check turns the fusion off (the
    # result must equal the rbgs recursion, not raise or drift)
    cfg_rb = dataclasses.replace(cfg, smoother="rbgs")
    state_rb = gmg_setup(st, cfg_rb)
    ref_rb = gmg_apply(state_rb, b, cfg_rb)
    out_rb = gmg_apply(state_rb, b,
                       dataclasses.replace(cfg_rb, fuse_below=10**9))
    np.testing.assert_allclose(np.asarray(out_rb), np.asarray(ref_rb),
                               rtol=1e-12)


@pytest.mark.parametrize("shape", [(12, 10, 6), (8, 14, 5)])
def test_fused_block_rbgs_matches(shape, rng):
    """The fused stage-2 RBGS kernel (interpret mode) matches the jnp
    one-sweep zero-start block red-black Gauss-Seidel."""
    import jax

    from thermalporous_tpu.kernels import fused_block_rbgs
    from thermalporous_tpu.precond.chebyshev import (
        block_red_black_gauss_seidel,
    )
    from tests.test_block_gmg import random_block_stencil

    st = random_block_stencil(shape, nc=3, rng=rng)
    dinv = st.diag_inverse()
    b = jnp.asarray(rng.standard_normal((3,) + shape))
    ref = block_red_black_gauss_seidel(st, dinv, b, None, sweeps=1)
    out = fused_block_rbgs(st, dinv, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-12)

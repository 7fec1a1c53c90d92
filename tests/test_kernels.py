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


def _fused_case(model_cls):
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well

    pp = PhysicalParams()
    n = 64
    g = Grid(shape=(n, n), spacing=(5.0, 5.0), thickness=10.0)
    rng = np.random.default_rng(0)
    k = 2e-13 * np.exp(0.5 * rng.standard_normal(g.shape))
    wells = [
        Well(cells=((0, 0),), control="bhp", p_bh=4.0e7, T_inj=420.0),
        Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7),
        Well(cells=((5, 5),), control="rate", rate=-0.5),
    ]
    data = make_problem_data(g, pp, kx=k, phi=0.2, wells=wells)
    model = model_cls(g, pp)
    u0 = model.initial_state(data)
    u = u0 + jnp.stack([1e5 * jnp.ones(g.shape), 5.0 * jnp.ones(g.shape)]
                       + ([0.1 * jnp.ones(g.shape)] if model.nc == 3 else []))
    v = jnp.asarray(np.random.default_rng(1).standard_normal(u.shape))
    return model, data, u0, u, v


@pytest.mark.parametrize("model_name", ["sp", "tp"])
def test_fused_residual_and_jvp_match(model_name):
    from thermalporous_tpu.kernels.residual_pallas import (
        fused_jvp,
        fused_residual,
        supported,
    )
    from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel

    cls = SinglePhaseModel if model_name == "sp" else TwoPhaseModel
    model, data, u0, u, v = _fused_case(cls)
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


def test_fused_fallback_3d():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.kernels.residual_pallas import fused_residual, supported
    from thermalporous_tpu.models import SinglePhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams

    pp = PhysicalParams()
    g = Grid(shape=(4, 4, 4), spacing=(1.0, 1.0, 1.0))
    data = make_problem_data(g, pp, kx=1e-13)
    model = SinglePhaseModel(g, pp)
    assert not supported(model, jnp.float64)
    u = model.initial_state(data)
    out = fused_residual(model, u, u, 100.0, data)  # silently uses jnp path
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(model.residual(u, u, 100.0, data)))


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

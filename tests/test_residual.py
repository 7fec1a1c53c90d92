"""Consistency tests: residual physics, matrix-free JVP, stencil assembly.

The load-bearing guarantee of the whole solver stack: the residual, the
jvp-based Krylov operator, and the assembled block 7-point stencil (used
only by the preconditioner) agree with dense ``jax.jacfwd`` to machine
precision — on heterogeneous fields, with gravity, wells and heaters, for
both models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import Grid
from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel, make_problem_data
from thermalporous_tpu.physics import Heater, PhysicalParams, Well


def _perturbed_state(model, data, rng, scale=(1e6, 30.0, 0.3)):
    u = model.initial_state(data)
    noise = [
        scale[c] * rng.standard_normal(model.grid.shape) for c in range(model.nc)
    ]
    if model.nc == 3:
        u = u.at[2].set(jnp.clip(u[2] + noise[2], 0.05, 0.95))
        noise[2] = np.zeros(model.grid.shape)
    return u + jnp.stack([jnp.asarray(n) for n in noise])


def _cases(rng):
    pp = PhysicalParams()
    cases = []

    # 2D single-phase, heterogeneous K, one injector + one producer + heater
    g2 = Grid(shape=(5, 4), spacing=(10.0, 12.0), thickness=3.0)
    k2 = 1e-13 * np.exp(rng.standard_normal(g2.shape))
    wells2 = [
        Well(cells=((0, 0),), control="bhp", p_bh=3.0e7, T_inj=420.0),
        Well(cells=((4, 3),), control="bhp", p_bh=1.0e7),
    ]
    d2 = make_problem_data(
        g2, pp, kx=k2, phi=0.2 + 0.1 * rng.random(g2.shape),
        wells=wells2, heaters=[Heater(cells=((2, 2),), power=1e4)],
    )
    cases.append((SinglePhaseModel(g2, pp), d2))

    # 3D single-phase with gravity + rate well
    g3 = Grid(shape=(3, 4, 3), spacing=(10.0, 10.0, 5.0), gravity=9.81)
    k3 = 5e-14 * np.exp(rng.standard_normal(g3.shape))
    wells3 = [
        Well(cells=((0, 0, 0), (0, 0, 1)), control="rate", rate=2.0, T_inj=430.0),
        Well(cells=((2, 3, 2),), control="bhp", p_bh=1.5e7),
    ]
    d3 = make_problem_data(g3, pp, kx=k3, ky=2 * k3, kz=0.1 * k3, phi=0.25, wells=wells3)
    cases.append((SinglePhaseModel(g3, pp), d3))

    # 2D two-phase with both well kinds
    wells_tp = [
        Well(cells=((0, 0),), control="bhp", p_bh=3.0e7, T_inj=420.0),
        Well(cells=((4, 3),), control="bhp", p_bh=1.0e7),
        Well(cells=((2, 0),), control="rate", rate=-0.5),
    ]
    d2tp = make_problem_data(g2, pp, kx=k2, phi=0.2, wells=wells_tp)
    cases.append((TwoPhaseModel(g2, pp), d2tp))

    # 3D two-phase with gravity (segregation regime)
    d3tp = make_problem_data(g3, pp, kx=k3, phi=0.25, wells=wells3)
    cases.append((TwoPhaseModel(g3, pp), d3tp))
    return cases


@pytest.fixture
def cases(rng):
    return _cases(rng)


def test_mass_conservation_no_wells(rng):
    """With no wells/heaters, fluxes telescope: residual sums to pure accumulation."""
    pp = PhysicalParams()
    g = Grid(shape=(6, 5), spacing=(7.0, 9.0))
    data = make_problem_data(g, pp, kx=1e-13 * np.exp(rng.standard_normal(g.shape)))
    model = SinglePhaseModel(g, pp)
    u_old = model.initial_state(data)
    u = _perturbed_state(model, data, rng)
    dt = 1000.0
    res = model.residual(u, u_old, dt, data)

    # accumulation-only reference
    acc = model.cell_terms(u, u_old, dt, data.phi, data.wells)
    np.testing.assert_allclose(
        float(res[0].sum()), float(acc[0].sum()), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(res[1].sum()), float(acc[1].sum()), rtol=1e-12
    )


def test_uniform_state_zero_flux(rng):
    """A uniform (p,T) state with no gravity/wells has zero residual after one step."""
    pp = PhysicalParams()
    g = Grid(shape=(4, 4), spacing=(5.0, 5.0))
    data = make_problem_data(g, pp, kx=1e-13 * np.exp(rng.standard_normal(g.shape)))
    model = SinglePhaseModel(g, pp)
    u = model.initial_state(data)
    res = model.residual(u, u, 100.0, data)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-8)


@pytest.mark.slow
def test_stencil_matches_dense_jacobian(cases, rng):
    for model, data in cases:
        u_old = model.initial_state(data)
        u = _perturbed_state(model, data, rng)
        dt = 500.0

        dense = jax.jacfwd(lambda x: model.residual(x, u_old, dt, data))(u)
        n = model.nc * model.grid.ncells
        dense = np.asarray(dense).reshape(n, n)

        st = model.assemble_stencil(u, u_old, dt, data)
        dense_st = np.asarray(st.to_dense())

        scale = np.abs(dense).max()
        np.testing.assert_allclose(dense_st, dense, atol=1e-9 * scale, rtol=1e-9)


def test_jvp_matches_dense(cases, rng):
    for model, data in cases:
        u_old = model.initial_state(data)
        u = _perturbed_state(model, data, rng)
        dt = 500.0
        v = jnp.asarray(rng.standard_normal(u.shape))

        dense = jax.jacfwd(lambda x: model.residual(x, u_old, dt, data))(u)
        n = model.nc * model.grid.ncells
        jv_dense = np.asarray(dense).reshape(n, n) @ np.asarray(v).reshape(n)

        jv = np.asarray(model.jvp(u, u_old, dt, data)(v)).reshape(n)
        scale = np.abs(jv_dense).max() + 1e-30
        np.testing.assert_allclose(jv, jv_dense, atol=1e-9 * scale, rtol=1e-9)


def test_stencil_matvec_matches_jvp(cases, rng):
    for model, data in cases:
        u_old = model.initial_state(data)
        u = _perturbed_state(model, data, rng)
        dt = 500.0
        v = jnp.asarray(rng.standard_normal(u.shape))
        st = model.assemble_stencil(u, u_old, dt, data)
        a = np.asarray(st.matvec(v)).ravel()
        b = np.asarray(model.jvp(u, u_old, dt, data)(v)).ravel()
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(a, b, atol=1e-9 * scale, rtol=1e-9)

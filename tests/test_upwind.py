"""Upwind-selection truth tables (SURVEY.md §4 item 1).

Direct unit checks that face fluxes pick the correct upwind cell for every
sign combination of the driving force — including two-phase gravity
segregation where water and oil upwind in OPPOSITE directions on the same
face.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import Grid
from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel
from thermalporous_tpu.physics import PhysicalParams


@pytest.fixture
def pp():
    return PhysicalParams()


def test_sp_upwind_mobility_selection(pp):
    g = Grid(shape=(2, 1), spacing=(1.0, 1.0))
    model = SinglePhaseModel(g, pp)
    t_hot, t_cold = 420.0, 300.0

    # flow L→R (p_l > p_r): mobility and enthalpy must come from the LEFT
    u_l = jnp.array([2.0e7, t_hot])
    u_r = jnp.array([1.0e7, t_cold])
    f = model.face_terms(0, u_l, u_r, jnp.array(1e-12), jnp.array(0.0))
    rho = float(pp.rho_w(2.0e7, t_hot))
    mu = float(pp.mu_w(jnp.array(t_hot)))
    expect = 1e-12 * rho / mu * 1.0e7
    assert float(f[0]) == pytest.approx(expect, rel=1e-12)
    assert float(f[1]) == pytest.approx(expect * pp.cp_w * t_hot, rel=1e-12)

    # flow R→L: right-side properties
    f = model.face_terms(0, u_r, u_l, jnp.array(1e-12), jnp.array(0.0))
    assert float(f[0]) == pytest.approx(-expect, rel=1e-12)
    assert float(f[1]) == pytest.approx(-expect * pp.cp_w * t_hot, rel=1e-12)


def test_tp_counter_current_gravity_upwinding(pp):
    """Counter-current segregation: with the vertical pressure gradient
    between the two phases' hydrostatic gradients (ρ_o·g·dz < Δp < ρ_w·g·dz)
    water flows DOWN while oil flows UP — opposite upwind directions on the
    SAME face."""
    g = Grid(shape=(1, 1, 2), spacing=(1.0, 1.0, 1.0), gravity=9.81)
    model = TwoPhaseModel(g, pp)
    # face along z: L = shallower cell, R = deeper cell; ddepth = z_L−z_R = −dz
    p, T = 2.0e7, 350.0
    rho_w = float(pp.rho_w(p, T))
    rho_o = float(pp.rho_o(p, T))
    dp = 0.5 * (rho_w + rho_o) * 9.81  # between the hydrostatic gradients
    u_l = jnp.array([p, T, 0.5])
    u_r = jnp.array([p + dp, T, 0.5])
    f = model.face_terms(2, u_l, u_r, jnp.array(1e-12), jnp.array(0.0))
    f_w, f_e, f_o = (float(v) for v in f)
    # positive flux = toward +z = downward
    assert f_w > 0.0, "water (denser) must flow down"
    assert f_o < 0.0, "oil (lighter) must flow up"

    # saturation endpoints kill the corresponding phase flux entirely
    f = model.face_terms(2, jnp.array([p, T, 0.0]), jnp.array([p + dp, T, 0.0]),
                         jnp.array(1e-12), jnp.array(0.0))
    assert float(f[0]) == 0.0  # no mobile water anywhere
    f = model.face_terms(2, jnp.array([p, T, 1.0]), jnp.array([p + dp, T, 1.0]),
                         jnp.array(1e-12), jnp.array(0.0))
    assert float(f[2]) == 0.0  # no mobile oil


def test_conduction_independent_of_flow_direction(pp):
    g = Grid(shape=(2, 1), spacing=(1.0, 1.0))
    model = SinglePhaseModel(g, pp)
    u_l = jnp.array([1.0e7, 400.0])
    u_r = jnp.array([3.0e7, 300.0])  # flow R→L but heat conducts L→R
    f = model.face_terms(0, u_l, u_r, jnp.array(0.0), jnp.array(2.5))
    assert float(f[0]) == 0.0
    assert float(f[1]) == pytest.approx(2.5 * 100.0)


def test_zero_transmissibility_kills_flux_and_derivatives(pp):
    import jax

    g = Grid(shape=(2, 1), spacing=(1.0, 1.0))
    model = TwoPhaseModel(g, pp)
    u_l = jnp.array([2.0e7, 420.0, 0.7])
    u_r = jnp.array([1.0e7, 300.0, 0.2])
    f, df = jax.jvp(
        lambda a: model.face_terms(0, a, u_r, jnp.array(0.0), jnp.array(0.0)),
        (u_l,), (jnp.ones(3),),
    )
    np.testing.assert_array_equal(np.asarray(f), 0.0)
    np.testing.assert_array_equal(np.asarray(df), 0.0)

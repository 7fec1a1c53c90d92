"""Unit tests: fluid property correlations against hand values."""

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.physics import CoreyRelPerm, PhysicalParams, peaceman_well_index


@pytest.fixture
def pp():
    return PhysicalParams()


def test_water_viscosity_vogel(pp):
    # known values of the Vogel fit: ~1.0 mPa·s at 20 °C, ~0.28 mPa·s at 100 °C
    assert float(pp.mu_w(jnp.array(293.15))) == pytest.approx(1.0e-3, rel=0.05)
    assert float(pp.mu_w(jnp.array(373.15))) == pytest.approx(2.8e-4, rel=0.1)
    # strictly decreasing in T
    T = jnp.linspace(280.0, 500.0, 50)
    mu = np.asarray(pp.mu_w(T))
    assert (np.diff(mu) < 0).all()


def test_water_density(pp):
    assert float(pp.rho_w(pp.p_ref, pp.T_ref)) == pytest.approx(1000.0)
    # compressibility raises, heating lowers
    assert float(pp.rho_w(pp.p_ref + 1e7, pp.T_ref)) > 1000.0
    assert float(pp.rho_w(pp.p_ref, pp.T_ref + 50.0)) < 1000.0


def test_heavy_oil_viscosity_thinning(pp):
    # thermal recovery premise: orders of magnitude thinning on heating
    mu_cold = float(pp.mu_o(jnp.array(293.15)))
    mu_hot = float(pp.mu_o(jnp.array(420.0)))
    assert mu_cold / mu_hot > 50.0
    assert mu_cold == pytest.approx(1.0, rel=0.05)


def test_energy_density_consistency(pp):
    # single-phase energy reduces to two-phase with S=1 and matching oil terms
    p, T, phi = 2.0e7, 350.0, 0.25
    e_sp = float(pp.energy_density_sp(p, T, phi))
    e_tp = float(pp.energy_density_tp(p, T, 1.0, phi))
    assert e_sp == pytest.approx(e_tp, rel=1e-12)


def test_corey_relperm():
    rp = CoreyRelPerm(s_wr=0.1, s_or=0.2, n_w=2.0, n_o=2.0)
    assert float(rp.krw(0.1)) == 0.0
    assert float(rp.krw(0.8)) == pytest.approx(1.0)
    assert float(rp.kro(0.8)) == 0.0
    assert float(rp.kro(0.1)) == pytest.approx(1.0)
    s = 0.45  # Se = 0.5
    assert float(rp.krw(s)) == pytest.approx(0.25)
    assert float(rp.kro(s)) == pytest.approx(0.25)
    # clipping outside the mobile range
    assert float(rp.krw(0.0)) == 0.0
    assert float(rp.kro(1.0)) == 0.0


def test_peaceman_isotropic():
    # isotropic square cell: r_e = 0.28*sqrt(2)*dx/2 ≈ 0.19799 dx
    k, dx, dz, rw = 1e-13, 10.0, 2.0, 0.1
    wi = peaceman_well_index(k, k, dx, dx, dz, rw)
    import math

    r_e = 0.28 * math.sqrt(2 * dx * dx) / 2.0
    expected = 2 * math.pi * k * dz / math.log(r_e / rw)
    assert wi == pytest.approx(expected, rel=1e-12)
    assert r_e == pytest.approx(0.19799 * dx, rel=1e-3)

"""Physics validation against analytic solutions (SURVEY.md §4 item 2).

The reference has only end-to-end regression tests; these pin the
discretization to known physics: heat-conduction mode decay, the
Buckley–Leverett frontal solution (isothermal two-phase limit), and
gravity segregation equilibrium.
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import Grid
from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel, make_problem_data
from thermalporous_tpu.physics import CoreyRelPerm, PhysicalParams, Well
from thermalporous_tpu.solve import NewtonConfig, Simulator, TimeConfig


def test_conduction_mode_decay():
    """Pure conduction: lowest Neumann eigenmode decays at rate α(π/L)².

    Zero permeability kills advection; small temperature amplitude keeps the
    problem linear.  Backward Euler with small steps should match the
    continuous decay to ~1%.
    """
    pp = PhysicalParams()
    n, length = 64, 64.0
    g = Grid(shape=(n, 1), spacing=(length / n, 1.0), thickness=1.0)
    phi = 0.2
    data = make_problem_data(g, pp, kx=0.0, phi=phi)
    model = SinglePhaseModel(g, pp)

    t0_ref = 300.0
    rho = float(pp.rho_w(pp.p_init, t0_ref))
    c_eff = (1 - phi) * pp.rho_c_rock + phi * rho * pp.cp_w
    alpha = pp.kappa_eff / c_eff

    x = (np.arange(n) + 0.5) * (length / n)
    amp = 1.0
    t_field = t0_ref + amp * np.cos(math.pi * x / length)
    u = jnp.stack([
        pp.p_init * jnp.ones(g.shape),
        jnp.asarray(t_field).reshape(g.shape),
    ])

    sim = Simulator(model, data, precond="jacobi",
                    newton_cfg=NewtonConfig(rtol=1e-10, ksp_rtol=1e-9, ksp_maxiter=120))
    t_end = 0.05 / (alpha * (math.pi / length) ** 2)  # ~5% decay
    nsteps = 20
    dt = t_end / nsteps
    for _ in range(nsteps):
        u, stats = sim.step(u, dt)
        assert bool(stats.converged)

    decay_num = (np.asarray(u[1]).ravel() - t0_ref) / (t_field - t0_ref)
    decay_ref = math.exp(-alpha * (math.pi / length) ** 2 * t_end)
    np.testing.assert_allclose(decay_num.mean(), decay_ref, rtol=0.01)
    # the mode shape is preserved (no spurious advection)
    assert decay_num.std() < 0.01


def _isothermal_params():
    # switch off thermal coupling and compressibility for the BL limit
    return dataclasses.replace(
        PhysicalParams(),
        beta_w=0.0, beta_o=0.0, c_w=1e-12, c_o=1e-12,
        T_init=350.0, T_inj=350.0,
    )


def test_buckley_leverett_front():
    """Isothermal 1D waterflood: shock front position matches Welge theory."""
    pp = _isothermal_params()
    rp = CoreyRelPerm()
    n, length = 150, 150.0
    phi = 0.25
    area = 1.0  # dy * thickness
    g = Grid(shape=(n, 1), spacing=(length / n, 1.0), thickness=1.0)

    mu_w = float(pp.mu_w(pp.T_init))
    mu_o = float(pp.mu_o(pp.T_init))
    rho_w = float(pp.rho_w(pp.p_init, pp.T_init))

    q_vol = 2.0e-6  # m³/s injected water
    wells = [
        Well(cells=((0, 0),), control="rate", rate=q_vol * rho_w, T_inj=pp.T_init),
        Well(cells=((n - 1, 0),), control="bhp", p_bh=pp.p_init),
    ]
    data = make_problem_data(g, pp, kx=1e-12, phi=phi, wells=wells)
    model = TwoPhaseModel(g, pp, relperm=rp, s_init=0.0)

    # Welge construction for fw(S) = (S²/μw)/(S²/μw + (1-S)²/μo), S_wi = 0:
    # frontal saturation at the tangent point fw'(Sf) = fw(Sf)/Sf.
    s_grid = np.linspace(1e-6, 1 - 1e-6, 20001)
    fw = (s_grid**2 / mu_w) / (s_grid**2 / mu_w + (1 - s_grid) ** 2 / mu_o)
    i_front = int(np.argmin(np.abs(np.gradient(fw, s_grid) - fw / s_grid)))
    s_front = s_grid[i_front]
    v_front = (q_vol / (area * phi)) * fw[i_front] / s_front
    t_end = 0.6 * length / v_front  # front at ~60% of the domain
    x_front_theory = v_front * t_end

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(ksp_maxiter=100),
                    time_cfg=TimeConfig(dt_init=t_end / 400, dt_max=t_end / 60,
                                        growth=1.3))
    res = sim.run(t_end=t_end, u0=model.initial_state(data))
    s_num = np.asarray(res.u[2]).ravel()

    # numerical front: where S crosses half the frontal saturation
    x = (np.arange(n) + 0.5) * (length / n)
    crossing = np.where(s_num < 0.5 * s_front)[0]
    assert crossing.size, "front left the domain"
    x_front_num = x[crossing[0]]

    assert x_front_theory < length, "test setup: front must stay inside"
    # first-order upwinding smears the shock; allow ~8% of domain
    assert abs(x_front_num - x_front_theory) < 0.08 * length, (
        f"BL front at {x_front_num:.1f} m, theory {x_front_theory:.1f} m"
    )
    # behind the front saturation exceeds the frontal value (rarefaction)
    assert s_num[0] > s_front


def test_thermal_front_retardation():
    """1D hot-water injection: the T front travels at u_D·ρ_w c_p,w / c_eff.

    The classic thermal-recovery kinematics (energy balance with local
    thermal equilibrium): with conduction off, c_eff ∂T/∂t +
    ρ_w c_p,w u_D ∂T/∂x = 0, so the temperature front is retarded
    relative to the fluid front by φ ρ_w c_p,w / c_eff (~1/3 here —
    the rock matrix absorbs the injected heat).  Pins the enthalpy flux
    and energy accumulation terms jointly; neither the conduction-decay
    test (no flow) nor Buckley–Leverett (isothermal) covers them.
    """
    pp = dataclasses.replace(
        PhysicalParams(),
        beta_w=0.0, c_w=1e-12,  # constant density -> uniform Darcy flux
        kappa_eff=1e-6,         # conduction off: pure advection kinematics
        T_init=300.0,
    )
    n, length = 120, 120.0
    phi = 0.2
    area = 1.0  # dy * thickness
    g = Grid(shape=(n, 1), spacing=(length / n, 1.0), thickness=1.0)

    t_inj = 400.0
    rho_w = float(pp.rho_w(pp.p_init, pp.T_init))
    c_eff = (1 - phi) * pp.rho_c_rock + phi * rho_w * pp.cp_w

    q_vol = 2.0e-6  # m³/s injected water
    wells = [
        Well(cells=((0, 0),), control="rate", rate=q_vol * rho_w, T_inj=t_inj),
        Well(cells=((n - 1, 0),), control="bhp", p_bh=pp.p_init),
    ]
    data = make_problem_data(g, pp, kx=1e-12, phi=phi, wells=wells)
    model = SinglePhaseModel(g, pp)

    u_darcy = q_vol / area
    v_thermal = u_darcy * rho_w * pp.cp_w / c_eff
    t_end = 0.5 * length / v_thermal  # thermal front at mid-domain
    x_front_theory = v_thermal * t_end

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(ksp_maxiter=100),
                    time_cfg=TimeConfig(dt_init=t_end / 400, dt_max=t_end / 60,
                                        growth=1.3))
    res = sim.run(t_end=t_end, u0=model.initial_state(data))
    t_num = np.asarray(res.u[1]).ravel()

    # numerical front: where T crosses the contact midpoint
    x = (np.arange(n) + 0.5) * (length / n)
    below = np.where(t_num < 0.5 * (t_inj + pp.T_init))[0]
    assert below.size, "thermal front left the domain"
    x_front_num = x[below[0]]

    assert x_front_theory < length
    # the contact is linearly degenerate: upwinding smears it O(sqrt(steps)),
    # but the midpoint crossing tracks the front; allow ~8% of the domain
    assert abs(x_front_num - x_front_theory) < 0.08 * length, (
        f"thermal front at {x_front_num:.1f} m, theory {x_front_theory:.1f} m"
    )
    # the fluid front has passed far ahead: injector-adjacent cells are at
    # the injection temperature, outlet cells still at reservoir T
    assert t_num[0] > t_inj - 2.0
    assert abs(t_num[-1] - pp.T_init) < 2.0


def test_gravity_segregation_equilibrium():
    """Closed 1D column, S=0.5: water (denser) settles to the bottom."""
    pp = dataclasses.replace(PhysicalParams(), T_init=350.0)
    nz = 16
    g = Grid(shape=(1, 1, nz), spacing=(1.0, 1.0, 1.0), gravity=9.81)
    data = make_problem_data(g, pp, kx=5e-12, phi=0.3)
    model = TwoPhaseModel(g, pp, s_init=0.5)

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(ksp_maxiter=80),
                    time_cfg=TimeConfig(dt_init=1e4, dt_max=5e6, growth=1.5))
    res = sim.run(t_end=3e8, max_steps=300)
    s = np.asarray(res.u[2]).ravel()  # index = depth (z grows downward)

    assert s[-1] > 0.95, f"bottom not water-filled: {s}"
    assert s[0] < 0.05, f"top not oil-filled: {s}"
    assert (np.diff(s) >= -1e-6).all(), "saturation profile not monotone in depth"
    # mass conservation: closed domain, ~incompressible regime
    np.testing.assert_allclose(s.mean(), 0.5, atol=0.02)


@pytest.mark.slow
def test_theis_drawdown():
    """Constant-rate producer in an infinite-acting 2D aquifer: Theis curve.

    Single-phase slightly-compressible flow with uniform temperature reduces
    to the radial diffusivity equation; the drawdown at radius r and time t
    is the exponential-integral solution

        Δp(r, t) = (q μ) / (4π k h) · W(u),   u = r² φ μ c_t / (4 k t)

    (Theis 1935; W = scipy.special.exp1).  This pins the TPFA flux operator,
    the linearized-compressibility accumulation term, AND the rate-controlled
    well source in one go — the well-test analog of the reference's
    injection cases (SURVEY.md §2.7), which have no analytic pressure check.
    """
    from scipy.special import exp1

    pp = PhysicalParams()
    n, dx, h = 101, 10.0, 10.0
    k, phi = 1e-13, 0.2
    g = Grid(shape=(n, n), spacing=(dx, dx), thickness=h)

    mu = float(pp.mu_w(pp.T_init))
    c_t = pp.c_w                      # porosity is constant (no rock compr.)
    eta = k / (phi * mu * c_t)        # hydraulic diffusivity [m²/s]

    q_mass = 5.0                      # [kg/s] produced
    rho0 = float(pp.rho_w(pp.p_init, pp.T_init))
    q_vol = q_mass / rho0             # Theis wants the volumetric rate

    ic = n // 2
    well = Well(cells=((ic, ic),), control="rate", rate=-q_mass, T_inj=None)
    data = make_problem_data(g, pp, kx=k, phi=phi, wells=(well,))
    model = SinglePhaseModel(g, pp)

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-9, ksp_rtol=1e-8,
                                            ksp_maxiter=120))

    # grow Δt geometrically: resolves the early log(t) transient, and the
    # investigation radius 2√(ηt) stays ≤ ~300 m — the 505 m no-flow
    # boundary never matters (infinite-acting window)
    u = model.initial_state(data)
    t, dt = 0.0, 20.0
    t_end = 1.0e4
    while t < t_end:
        dt = min(dt, t_end - t)
        u, stats = sim.step(u, dt)
        assert bool(stats.converged)
        t += dt
        dt *= 1.5

    p_num = np.asarray(u[0])
    xy = (np.arange(n) - ic) * dx     # cell-center offsets from the well

    # observation cells along the +x row: outside the Peaceman cell's
    # near-well region, inside the well-resolved investigation radius
    for j_off in (4, 6, 9, 13):
        r = abs(xy[ic + j_off])
        uu = r * r * phi * mu * c_t / (4.0 * k * t_end)
        dp_theory = q_vol * mu / (4.0 * math.pi * k * h) * exp1(uu)
        dp_num = pp.p_init - p_num[ic + j_off, ic]
        np.testing.assert_allclose(dp_num, dp_theory, rtol=0.05)

    # radial symmetry of the discrete solution (x row vs y column)
    np.testing.assert_allclose(p_num[ic + 6, ic], p_num[ic, ic + 6], rtol=1e-10)

"""Well diagnostics: per-well rates, mass balance between wells and reservoir."""

import numpy as np

from thermalporous_tpu.core import Grid
from thermalporous_tpu.models import SinglePhaseModel, TwoPhaseModel, make_problem_data
from thermalporous_tpu.physics import PhysicalParams, Well, per_well_masks, well_rates
from thermalporous_tpu.solve import Simulator, TimeConfig


def test_well_rates_signs_and_balance():
    pp = PhysicalParams()
    n = 12
    g = Grid(shape=(n, n), spacing=(10.0, 10.0), thickness=5.0)
    wells = [
        Well(cells=((0, 0),), control="bhp", p_bh=3.0e7, T_inj=420.0, name="INJ"),
        Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7, name="PROD"),
    ]
    data = make_problem_data(g, pp, kx=1e-13, phi=0.2, wells=wells)
    model = SinglePhaseModel(g, pp)
    masks = per_well_masks(g, wells)

    sim = Simulator(model, data, precond="cptr",
                    time_cfg=TimeConfig(dt_init=3600.0))
    res = sim.run(t_end=20 * 86400.0)

    rates = well_rates(model, res.u, data, masks)
    assert rates["INJ"]["mass_kg_s"] > 0.0
    assert rates["PROD"]["mass_kg_s"] < 0.0
    assert rates["INJ"]["energy_W"] > 0.0

    # near-incompressible quasi-steady state: injection ≈ production
    total = rates["INJ"]["mass_kg_s"] + rates["PROD"]["mass_kg_s"]
    assert abs(total) < 0.05 * abs(rates["INJ"]["mass_kg_s"])


def test_mass_balance_reservoir_vs_wells():
    """d/dt(total fluid mass) equals net well mass rate (discrete conservation)."""
    pp = PhysicalParams()
    n = 10
    g = Grid(shape=(n, n), spacing=(10.0, 10.0), thickness=5.0)
    wells = [
        Well(cells=((0, 0),), control="bhp", p_bh=3.5e7, T_inj=420.0, name="INJ"),
        Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7, name="PROD"),
    ]
    data = make_problem_data(g, pp, kx=2e-13, phi=0.2, wells=wells)
    model = TwoPhaseModel(g, pp, s_init=0.3)
    masks = per_well_masks(g, wells)

    sim = Simulator(model, data, precond="cptr")
    u0 = model.initial_state(data)
    dt = 3600.0
    u1, stats = sim.step(u0, dt)
    assert bool(stats.converged)

    def total_mass(u):
        p, T, s = np.asarray(u[0]), np.asarray(u[1]), np.asarray(u[2])
        rw = np.asarray(pp.rho_w(p, T))
        ro = np.asarray(pp.rho_o(p, T))
        phi = np.asarray(data.phi)
        return (g.cell_volume * phi * (rw * s + ro * (1 - s))).sum()

    dm_dt = (total_mass(u1) - total_mass(u0)) / dt
    # implicit Euler: sources evaluated at the NEW state
    rates = well_rates(model, u1, data, masks)
    net = sum(r["water_kg_s"] + r["oil_kg_s"] for r in rates.values())
    assert abs(dm_dt - net) < 1e-6 * max(abs(net), 1.0), (dm_dt, net)

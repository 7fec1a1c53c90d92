"""Time-varying well controls (Simulator.run_schedule).

Piecewise-constant control segments over one compiled step (well fields
are jit data, not shapes).  Pins: (a) a single-segment schedule is
bit-identical to a plain run; (b) controls switch EXACTLY at the segment
boundary (a step lands on it) and take effect (shut-in); (c) the balance
audit closes across the switch via its set_data rebind.
"""

from __future__ import annotations

import numpy as np

from thermalporous_tpu.core import Grid
from thermalporous_tpu.io import BalanceAuditor
from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
from thermalporous_tpu.physics import (
    PhysicalParams,
    Well,
    build_well_fields,
    per_well_masks,
    well_rates,
)
from thermalporous_tpu.solve import NewtonConfig, Simulator, TimeConfig


def _case(n=10):
    pp = PhysicalParams()
    g = Grid(shape=(n, n), spacing=(10.0, 10.0), thickness=5.0)
    rng = np.random.default_rng(7)
    kx = 2e-13 * np.exp(0.5 * rng.standard_normal(g.shape))
    inj = Well(cells=((0, 0),), control="rate", rate=1.0, T_inj=420.0,
               name="INJ")
    prod = Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7,
                name="PROD")
    data = make_problem_data(g, pp, kx=kx, phi=0.2, wells=[inj, prod])
    model = TwoPhaseModel(g, pp, s_init=0.3)
    return pp, g, kx, model, data, inj, prod


def test_single_segment_schedule_matches_plain_run():
    pp, g, kx, model, data, inj, prod = _case()
    sim = Simulator(model, data, precond="cptr",
                    time_cfg=TimeConfig(dt_init=1800.0))
    u0 = model.initial_state(data)
    t_end = 6 * 3600.0

    plain = sim.run(t_end=t_end, u0=u0)
    sched = sim.run_schedule([(0.0, data.wells)], t_end=t_end, u0=u0)

    assert sched.t == plain.t
    assert sched.steps == plain.steps
    np.testing.assert_array_equal(np.asarray(sched.u), np.asarray(plain.u))
    np.testing.assert_allclose([r.dt for r in sched.records],
                               [r.dt for r in plain.records])


def test_shut_in_switches_exactly_at_boundary():
    pp, g, kx, model, data, inj, prod = _case()
    n = g.shape[0]
    # segment 2: injector shut in (producer keeps flowing)
    wf2 = build_well_fields(g, [prod], [], kx=kx, ky=kx)
    t_sw = 4 * 3600.0
    t_end = 8 * 3600.0

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-10),
                    time_cfg=TimeConfig(dt_init=1800.0))
    u0 = model.initial_state(data)
    aud = BalanceAuditor(model, data, u0)
    res = sim.run_schedule([(0.0, data.wells), (t_sw, wf2)],
                           t_end=t_end, u0=u0, callback=aud)

    assert res.t == t_end
    # a step landed exactly on the control switch
    assert any(abs(r.t - t_sw) < 1e-9 * t_sw for r in res.records)
    # step numbering is continuous across segments
    assert [r.step for r in res.records] == list(
        range(1, len(res.records) + 1))

    # the switch took effect: no injection in the final state's rates
    masks = per_well_masks(g, [prod])
    rates = well_rates(model, res.u, sim.data, masks)
    assert "INJ" not in rates
    assert rates["PROD"]["water_kg_s"] + rates["PROD"]["oil_kg_s"] < 0.0
    # injector cell no longer sources mass: total source = producer only
    q = np.asarray(model.source_totals(res.u, sim.data))
    assert q[0] + q[2] < 0.0

    # balance audit closes ACROSS the control switch (set_data rebind)
    rep = aud.report()
    assert rep["complete"]
    for lab in ("water_kg", "oil_kg", "energy_J"):
        assert rep["rows"][lab]["rel_error"] < 1e-9, (lab, rep["rows"][lab])
    # and it saw both regimes: water was injected, then the in-place water
    # stopped growing — cumulative water source below rate*t_end
    assert 0.0 < rep["rows"]["water_kg"]["cum_source"] < 1.0 * t_end


def test_blocked_schedule_balance_closes():
    """Control schedules compose with the jitted blocked loop AND the
    in-device balance integrals: a two-segment schedule run at
    block_steps=2 must close the audit across the control switch (the
    per-step source integrals are computed in the block body from the
    segment's own well fields)."""
    pp, g, kx, model, data, inj, prod = _case()
    from thermalporous_tpu.solve import Simulator, TimeConfig

    tight = NewtonConfig(rtol=1e-11, max_iters=20)
    sim = Simulator(model, data, precond="cptr", newton_cfg=tight,
                    time_cfg=TimeConfig(dt_init=1800.0, block_steps=2))
    u0 = model.initial_state(data)
    t_mid, t_end = 3 * 3600.0, 6 * 3600.0
    wf_off = build_well_fields(g, [prod], kx=np.asarray(kx))  # shut-in
    schedule = [(0.0, data.wells), (t_mid, wf_off)]

    aud = BalanceAuditor(model, data, u0)
    res = sim.run_schedule(schedule, t_end=t_end, u0=u0, callback=aud)
    assert res.t >= t_end - 1e-6

    rep = aud.report()
    assert rep["complete"], rep
    assert rep["steps"] == res.steps
    for lab in ("water_kg", "oil_kg", "energy_J"):
        assert rep["rows"][lab]["rel_error"] < 1e-9, (lab, rep["rows"][lab])

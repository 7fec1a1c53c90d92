"""Preconditioner decoupling variants, lagged PC, and utils."""

import numpy as np
import pytest

import jax.numpy as jnp

from thermalporous_tpu.precond import CPRConfig
from thermalporous_tpu.solve import NewtonConfig, Simulator, oracle_run
from thermalporous_tpu.utils import (
    all_finite,
    assert_all_finite,
    convergence_summary,
    power_iteration,
)

from tests.test_newton_cptr import TIGHT, _compare_states, _sp_case, _tp_case


@pytest.mark.parametrize("decoupling", ["abf", "qimpes", "timpes"])
def test_decoupling_variants_match_oracle(decoupling):
    """All decoupling variants are preconditioning only — same answers."""
    model, data = _tp_case(n=6)
    dts = [3600.0]
    oracle_states = oracle_run(model, data, dts)
    sim = Simulator(model, data, precond="cptr",
                    pc_cfg=CPRConfig(decoupling=decoupling), newton_cfg=TIGHT)
    u = model.initial_state(data)
    u, stats = sim.step(u, dts[0])
    assert bool(stats.converged), decoupling
    _compare_states(u, oracle_states[0])


def test_pc_lag_step_matches_and_converges():
    model, data = _sp_case(n=12)
    dts = [3600.0, 7200.0]
    oracle_states = oracle_run(model, data, dts)
    import dataclasses

    cfg = dataclasses.replace(TIGHT, pc_lag="step")
    sim = Simulator(model, data, precond="cptr", newton_cfg=cfg)
    u = model.initial_state(data)
    for dt, ref in zip(dts, oracle_states):
        u, stats = sim.step(u, dt)
        assert bool(stats.converged)
        _compare_states(u, ref)


def test_utils_finite_and_summary():
    assert all_finite({"a": jnp.ones(3), "b": [jnp.zeros((2, 2))]})
    assert not all_finite(jnp.array([1.0, np.nan]))
    with pytest.raises(FloatingPointError):
        assert_all_finite(jnp.array([np.inf]))

    from thermalporous_tpu.solve import StepRecord

    recs = [
        StepRecord(step=i + 1, t=float(i), dt=1.0, newton_iters=3, ksp_iters=12,
                   retries=0, residual_norm0=1.0, residual_norm=1e-9, wall_s=0.1)
        for i in range(4)
    ]
    s = convergence_summary(recs)
    assert s["steps"] == 4
    assert s["ksp_per_newton_mean"] == pytest.approx(4.0)
    assert s["total_newton"] == 12


def test_power_iteration():
    a = jnp.diag(jnp.asarray([1.0, -5.0, 2.0]))
    lam = power_iteration(lambda v: a @ v, (3,), iters=50)
    assert float(lam) == pytest.approx(5.0, rel=1e-3)

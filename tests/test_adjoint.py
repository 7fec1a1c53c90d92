"""Discrete-adjoint gradients: transpose exactness and finite-difference
validation of dJ/d(data) through the implicit stepper (CPU f64).

The adjoint is exact for the DISCRETE scheme (vjp of the same residual
that defines the forward physics, upwind branches included), so central
finite differences on the full nonlinear simulation must match to the
accuracy the Newton/KSP tolerances allow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import Grid
from thermalporous_tpu.models import (
    SinglePhaseModel,
    TwoPhaseModel,
    make_problem_data,
)
from thermalporous_tpu.physics import PhysicalParams, Well
from thermalporous_tpu.solve import (
    NewtonConfig,
    Simulator,
    adjoint_gradients,
    record_trajectory,
)


def _case(model_cls, shape=(12, 10), seed=7):
    pp = PhysicalParams()
    g = Grid(shape=shape, spacing=(10.0, 10.0), thickness=5.0)
    rng = np.random.default_rng(seed)
    k = 1e-13 * np.exp(0.8 * rng.standard_normal(g.shape))
    wells = [
        Well(cells=((0, 0),), control="bhp", p_bh=3.0e7, T_inj=420.0),
        Well(cells=((shape[0] - 1, shape[1] - 1),), control="bhp",
             p_bh=1.0e7),
    ]
    data = make_problem_data(g, pp, kx=k, phi=0.2, wells=wells)
    return model_cls(g, pp), data


def test_block_stencil_transpose_matches_dense():
    model, data = _case(TwoPhaseModel, shape=(5, 4))
    u0 = model.initial_state(data)
    st = model.assemble_stencil(u0, u0, 1800.0, data)
    a = np.asarray(st.to_dense())
    at = np.asarray(st.transpose().to_dense())
    np.testing.assert_allclose(at, a.T, rtol=1e-12, atol=1e-12 * np.abs(a).max())


def _fd_directional(model, data, u0, dts, objective_fns, leaf, delta, eps):
    """Central difference of J along data-leaf perturbation ``delta``."""
    terminal, running = objective_fns

    def run_J(d):
        sim = Simulator(model, d, precond="cptr",
                        newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                                ksp_maxiter=120))
        states = record_trajectory(sim, u0, dts)
        val = 0.0
        if terminal is not None:
            val = val + terminal(states[-1], d)
        if running is not None:
            for k, dt in enumerate(dts, start=1):
                val = val + running(states[k], jnp.asarray(dt), d)
        return float(val)

    def perturbed(sign):
        return leaf(data, lambda x: x + sign * eps * delta)

    return (run_J(perturbed(+1.0)) - run_J(perturbed(-1.0))) / (2.0 * eps)


def _phi_leaf(data, f):
    import dataclasses

    return dataclasses.replace(data, phi=f(data.phi))


def _tgeo0_leaf(data, f):
    import dataclasses

    return dataclasses.replace(
        data, tgeo=(f(data.tgeo[0]),) + tuple(data.tgeo[1:]))


@pytest.mark.slow
@pytest.mark.parametrize("model_cls", [SinglePhaseModel, TwoPhaseModel])
def test_adjoint_matches_fd_terminal(model_cls):
    """dJ/dφ and dJ/dT_geo for a terminal objective vs central differences."""
    model, data = _case(model_cls)
    u0 = model.initial_state(data)
    dts = [1800.0, 2700.0, 4050.0]

    def terminal(u, d):
        # mean temperature around the injector — the thermal front is
        # active there within a few steps, so dJ/dθ is well-scaled
        return jnp.mean(u[1, :6, :5])

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                            ksp_maxiter=120))
    states = record_trajectory(sim, u0, dts)
    res = adjoint_gradients(model, data, states, dts, terminal=terminal,
                            rtol=1e-11, maxiter=300)
    assert res.converged

    # multiplicative (relative) perturbations: δθ = θ·ξ keeps every leaf
    # well-scaled and leaves the structural zeros (boundary faces) zero
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.standard_normal(data.phi.shape))
    dphi = data.phi * xi
    got = float(jnp.vdot(res.grad_data.phi, dphi))
    want = _fd_directional(model, data, u0, dts, (terminal, None),
                           _phi_leaf, dphi, eps=1e-4)
    assert abs(got - want) <= 1e-3 * max(abs(want), 1e-12), (got, want)

    xit = jnp.asarray(rng.standard_normal(data.tgeo[0].shape))
    dtg = data.tgeo[0] * xit
    got_t = float(jnp.vdot(res.grad_data.tgeo[0], dtg))
    want_t = _fd_directional(model, data, u0, dts, (terminal, None),
                             _tgeo0_leaf, dtg, eps=1e-4)
    assert abs(got_t - want_t) <= 1e-3 * max(abs(want_t), 1e-12), (got_t, want_t)


@pytest.mark.slow
def test_adjoint_matches_fd_running_two_phase():
    """Cumulative (running) objective on the two-phase model: Σ dt·⟨S⟩_prod —
    a produced-water-volume analog touching the saturation physics."""
    model, data = _case(TwoPhaseModel, shape=(10, 8), seed=3)
    u0 = model.initial_state(data)
    dts = [3600.0, 5400.0]

    def running(u, dt, d):
        return dt * jnp.mean(u[2, 5:, 4:] * d.phi[5:, 4:])

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                            ksp_maxiter=120))
    states = record_trajectory(sim, u0, dts)
    res = adjoint_gradients(model, data, states, dts, running=running,
                            rtol=1e-11, maxiter=300)
    assert res.converged

    rng = np.random.default_rng(5)
    dphi = jnp.asarray(rng.standard_normal(data.phi.shape))
    got = float(jnp.vdot(res.grad_data.phi, dphi))
    want = _fd_directional(model, data, u0, dts, (None, running),
                           _phi_leaf, dphi, eps=1e-6)
    assert abs(got - want) <= 5e-4 * max(abs(want), 1e-12), (got, want)


@pytest.mark.slow
def test_adjoint_grad_u0_matches_fd():
    """dJ/du₀ (the λ₀ output) against a state-perturbation difference."""
    model, data = _case(SinglePhaseModel, shape=(8, 8), seed=9)
    u0 = model.initial_state(data)
    dts = [3600.0, 3600.0]

    def terminal(u, d):
        return jnp.mean(u[0])

    def run_J(u_start):
        sim = Simulator(model, data, precond="cptr",
                        newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                                ksp_maxiter=120))
        states = record_trajectory(sim, u_start, dts)
        return float(terminal(states[-1], data))

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                            ksp_maxiter=120))
    states = record_trajectory(sim, u0, dts)
    res = adjoint_gradients(model, data, states, dts, terminal=terminal,
                            rtol=1e-11, maxiter=300)

    rng = np.random.default_rng(2)
    du = jnp.asarray(rng.standard_normal(u0.shape))
    # scale to the state's magnitudes so both components move meaningfully
    du = du * jnp.asarray([1.0e5, 1.0])[:, None, None]
    got = float(jnp.vdot(res.grad_u0, du))
    eps = 1e-4
    want = (run_J(u0 + eps * du) - run_J(u0 - eps * du)) / (2.0 * eps)
    assert abs(got - want) <= 2e-4 * max(abs(want), 1e-12), (got, want)


@pytest.mark.slow
def test_ensemble_adjoint_matches_per_member():
    """ensemble_adjoint_gradients ≡ per-member adjoint_gradients: the
    vmapped batched sweep computes exactly the gradients each member's
    solo sweep computes (one XLA program for E history-matching
    gradients — the dist/ensemble.py DP axis, adjoint side)."""
    from thermalporous_tpu.dist import stack_ensemble, make_ensemble_step_fn
    from thermalporous_tpu.solve import (
        NewtonConfig,
        Simulator,
        ensemble_adjoint_gradients,
        record_ensemble_trajectory,
    )

    members = [_case(TwoPhaseModel, shape=(8, 6), seed=s) for s in (1, 2, 3)]
    model = members[0][0]
    datas = [d for _, d in members]
    data_e = stack_ensemble(datas)
    dts = [1800.0, 2700.0]
    ncfg = NewtonConfig(rtol=1e-12, ksp_rtol=1e-10, ksp_maxiter=120)

    def terminal(u, d):
        return jnp.mean(u[1, :4, :3])

    step_e = jax.jit(make_ensemble_step_fn(model, "cptr", ncfg))
    u0_e = jnp.stack([model.initial_state(d) for d in datas])
    states_e = record_ensemble_trajectory(step_e, u0_e, dts, data_e)
    res_e = ensemble_adjoint_gradients(model, data_e, states_e, dts,
                                       terminal=terminal, rtol=1e-11,
                                       maxiter=300)
    assert res_e.converged
    assert res_e.grad_u0.shape[0] == 3

    for i, data in enumerate(datas):
        sim = Simulator(model, data, precond="cptr", newton_cfg=ncfg)
        states = record_trajectory(sim, model.initial_state(data), dts)
        res = adjoint_gradients(model, data, states, dts, terminal=terminal,
                                rtol=1e-11, maxiter=300)
        np.testing.assert_allclose(float(res_e.value[i]), float(res.value),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(res_e.grad_u0[i]),
                                   np.asarray(res.grad_u0),
                                   rtol=1e-6, atol=1e-14)
        np.testing.assert_allclose(np.asarray(res_e.grad_data.phi[i]),
                                   np.asarray(res.grad_data.phi),
                                   rtol=1e-6, atol=1e-14)


@pytest.mark.slow
def test_adjoint_orth_gram_matches_cgs2():
    """adjoint_gradients(orth="cgs2g2"/"cgs2g") — the low-synch Gram-matrix
    orthogonalization — reproduces the classic-CGS2 gradients to solver
    tolerance (the backward sweep's full-precision basis is exactly the
    regime the 2-read variant supports)."""
    from thermalporous_tpu.models import TwoPhaseModel

    model, data = _case(TwoPhaseModel)
    u0 = model.initial_state(data)
    dts = [1800.0, 2700.0]

    def terminal(u, d):
        return jnp.mean(u[1, :6, :5])

    sim = Simulator(model, data, precond="cptr",
                    newton_cfg=NewtonConfig(rtol=1e-12, ksp_rtol=1e-10,
                                            ksp_maxiter=120))
    states = record_trajectory(sim, u0, dts)
    ref = adjoint_gradients(model, data, states, dts, terminal=terminal,
                            rtol=1e-11, maxiter=300)
    assert ref.converged
    for orth in ("cgs2g2", "cgs2g"):
        got = adjoint_gradients(model, data, states, dts, terminal=terminal,
                                rtol=1e-11, maxiter=300, orth=orth)
        assert got.converged, orth
        # same solves to solver tolerance -> gradients match to ~8 digits
        ref_g = np.asarray(ref.grad_data.phi, np.float64)
        got_g = np.asarray(got.grad_data.phi, np.float64)
        denom = np.linalg.norm(ref_g) or 1.0
        assert np.linalg.norm(got_g - ref_g) / denom < 1e-7, orth

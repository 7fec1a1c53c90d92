"""FGMRES unit tests against dense direct solves."""

import jax.numpy as jnp
import numpy as np

from thermalporous_tpu.solve import fgmres


def _random_system(rng, n=40, cond_shift=2.0):
    a = rng.standard_normal((n, n)) / np.sqrt(n)
    a = a + cond_shift * np.eye(n)  # diagonally-shifted: nonsymmetric, invertible
    x = rng.standard_normal(n)
    return jnp.asarray(a), jnp.asarray(x), jnp.asarray(a @ x)


def test_fgmres_solves_dense(rng):
    a, x_true, b = _random_system(rng)
    res = fgmres(lambda v: a @ v, b, rtol=1e-12, maxiter=60)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true), rtol=1e-8)


def test_fgmres_early_exit_iterations(rng):
    a, x_true, b = _random_system(rng)
    res_tight = fgmres(lambda v: a @ v, b, rtol=1e-12, maxiter=60)
    res_loose = fgmres(lambda v: a @ v, b, rtol=1e-2, maxiter=60)
    assert int(res_loose.iters) < int(res_tight.iters)
    # loose solve still meets its own tolerance
    r = np.asarray(b - a @ res_loose.x)
    assert np.linalg.norm(r) <= 1e-2 * np.linalg.norm(np.asarray(b)) * 1.01


def test_fgmres_preconditioned_converges_faster(rng):
    a, x_true, b = _random_system(rng, cond_shift=0.0)
    # make an ill-conditioned SPD-ish system
    a = a @ a.T + 0.05 * jnp.eye(a.shape[0])
    b = a @ x_true
    dinv = 1.0 / jnp.diag(a)
    plain = fgmres(lambda v: a @ v, b, rtol=1e-10, maxiter=40)
    # exact inverse as the (flexible) preconditioner: converges immediately
    a_inv = jnp.asarray(np.linalg.inv(np.asarray(a)))
    pc = fgmres(lambda v: a @ v, b, precond=lambda r: a_inv @ r, rtol=1e-10, maxiter=40)
    assert int(pc.iters) <= 3
    assert int(pc.iters) < int(plain.iters)
    jac = fgmres(lambda v: a @ v, b, precond=lambda r: dinv * r, rtol=1e-10, maxiter=40)
    np.testing.assert_allclose(
        np.asarray(jac.x), np.asarray(x_true), rtol=1e-5, atol=1e-6
    )


def test_fgmres_zero_rhs():
    b = jnp.zeros((2, 8, 8))
    res = fgmres(lambda v: 2.0 * v, b, rtol=1e-8)
    assert bool(res.converged)
    assert int(res.iters) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_fgmres_state_shaped_vectors(rng):
    # operates on (nc, nx, ny) arrays without flattening
    n = 2 * 6 * 5
    a = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n) + 3.0 * np.eye(n))
    x_true = rng.standard_normal((2, 6, 5))
    mv = lambda v: (a @ v.reshape(n)).reshape(2, 6, 5)
    b = mv(jnp.asarray(x_true))
    res = fgmres(mv, b, rtol=1e-12, maxiter=70)
    assert res.x.shape == (2, 6, 5)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-9)

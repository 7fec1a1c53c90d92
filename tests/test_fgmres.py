"""FGMRES unit tests against dense direct solves."""

import jax.numpy as jnp
import numpy as np

from thermalporous_tpu.solve import fgmres
import pytest


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


@pytest.mark.slow
def test_f32_with_f64_reductions_iteration_parity(rng):
    """Mixed precision (SURVEY.md §5.8 / §7 plan B): an f32 solve whose
    dots/norms accumulate in f64 reaches the same iteration count as the
    full-f64 solve on a realistically-sized ill-conditioned system, and its
    Krylov basis stays orthogonal to f32 rounding (CGS2)."""
    import jax

    assert jax.config.x64_enabled  # conftest enables x64; reductions need it
    n = 4096
    a = rng.standard_normal((n, n)) / np.sqrt(n)
    a = a @ a.T / 4.0 + 0.02 * np.eye(n)  # SPD-ish, moderately conditioned
    x_true = rng.standard_normal(n)
    b64 = jnp.asarray(a @ x_true)

    res64 = fgmres(lambda v: jnp.asarray(a) @ v, b64, rtol=1e-4, maxiter=80)

    a32 = jnp.asarray(a, jnp.float32)
    b32 = b64.astype(jnp.float32)
    res32 = fgmres(lambda v: a32 @ v, b32, rtol=1e-4, maxiter=80)

    assert bool(res64.converged) and bool(res32.converged)
    assert abs(int(res32.iters) - int(res64.iters)) <= 1

    # orthogonality drift of the f32 Arnoldi basis: rebuild V via a second
    # run's recurrence is internal, so check the solution instead — the f32
    # solve meets the same relative residual its f64 twin does
    r32 = np.asarray(b32 - a32 @ res32.x, np.float64)
    assert np.linalg.norm(r32) <= 1.2e-4 * np.linalg.norm(np.asarray(b64))


def test_fgmres_restarted_matches_single_cycle(rng):
    """FGMRES(r) restart cycles reach the same tolerance as one long cycle
    (more iterations allowed, same answer quality), and converge on a
    system that needs more than one cycle."""
    import numpy as np

    n = 80
    a = np.asarray(rng.standard_normal((n, n))) * 0.3 + np.eye(n) * 4.0
    x_true = np.asarray(rng.standard_normal(n))
    b = jnp.asarray(a @ x_true)
    A = jnp.asarray(a)
    mv = lambda v: A @ v

    full = fgmres(mv, b, rtol=1e-10, maxiter=80)
    rest = fgmres(mv, b, rtol=1e-10, maxiter=80, restart=12)
    assert bool(full.converged) and bool(rest.converged)
    for out in (full, rest):
        r = np.linalg.norm(a @ np.asarray(out.x) - np.asarray(b))
        assert r <= 1e-9 * np.linalg.norm(np.asarray(b)), r
    # restarts may take more total iterations, never fewer than the subspace
    assert int(rest.iters) >= int(full.iters)

    # restart must also work with a (nonlinear-capable) preconditioner
    d = jnp.asarray(1.0 / np.diag(a))
    pc = lambda r: d * r
    rest_pc = fgmres(mv, b, precond=pc, rtol=1e-10, maxiter=80, restart=12)
    assert bool(rest_pc.converged)
    r = np.linalg.norm(a @ np.asarray(rest_pc.x) - np.asarray(b))
    assert r <= 1e-9 * np.linalg.norm(np.asarray(b)), r

def test_fgmres_restarted_respects_maxiter_budget(rng):
    """Total restarted iterations never exceed maxiter (PETSc max_it
    semantics): the final partial cycle is capped dynamically."""
    import numpy as np

    n = 120
    # hard unpreconditioned system: needs far more than the budget
    a = np.asarray(rng.standard_normal((n, n))) * 0.8 + np.eye(n) * 1.5
    b = jnp.asarray(np.asarray(rng.standard_normal(n)))
    A = jnp.asarray(a)
    mv = lambda v: A @ v

    # 40-budget with r=16 previously allowed ceil(40/16)*16 = 48
    out = fgmres(mv, b, rtol=1e-14, maxiter=40, restart=16)
    assert int(out.iters) <= 40, int(out.iters)
    # ... and an exactly-divisible budget still runs all cycles
    out2 = fgmres(mv, b, rtol=1e-14, maxiter=32, restart=16)
    assert int(out2.iters) <= 32
    # plain budget exhaustion is NOT an Arnoldi breakdown — the flag must
    # match the single-cycle path's diagnosis (advisor r3)
    assert not bool(out.breakdown)
    assert not bool(out.converged)


def test_fgmres_iter_cap_with_restart_rejected(rng):
    """iter_cap is internal to the restart driver; silently dropping a
    caller's cap would uncap the solve, so the combination errors."""
    import pytest

    a, _, b = _random_system(rng)
    with pytest.raises(ValueError, match="iter_cap"):
        fgmres(lambda v: a @ v, b, maxiter=40, restart=16,
               iter_cap=jnp.asarray(8))

def test_fgmres_bf16_basis_solves_to_its_floor(rng):
    """bf16 Arnoldi-basis storage (the bandwidth lever): the achievable
    TRUE relative residual is floored at O(eps_bf16) — the Arnoldi
    relation holds only to the basis rounding — so the feature is only
    honest at loose tolerances (the production ksp_rtol=1e-3 regime,
    where the outer Newton absorbs linear-solve inexactness).  At such a
    tolerance the solve converges in (near-)identical iterations and the
    true residual lands within a small factor of the request."""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    an = np.asarray(a)
    d = jnp.asarray(1.0 / np.diag(an))
    pc = lambda r: d * r
    mv = lambda v: a @ v

    full = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60)
    bf16 = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60,
                  basis_dtype=jnp.bfloat16)
    assert bool(full.converged) and bool(bf16.converged)
    # a coarser basis may cost an extra iteration or two, never many
    assert int(bf16.iters) <= int(full.iters) + 3
    bn = np.linalg.norm(np.asarray(b))
    r_full = np.linalg.norm(an @ np.asarray(full.x, np.float64) - np.asarray(b))
    r_bf16 = np.linalg.norm(an @ np.asarray(bf16.x, np.float64) - np.asarray(b))
    assert r_full <= 1.1e-3 * bn, r_full
    # true residual within a small multiple of the request (basis floor)
    assert r_bf16 <= 2e-2 * bn, r_bf16
    # the solution itself is full precision (not bf16-rounded)
    assert bf16.x.dtype == b.dtype


def test_fgmres_cgs1_converges_at_loose_tolerance(rng):
    """Single-pass classical Gram–Schmidt (orth_passes=1, PETSc's
    KSPGMRES default): halves the dominant basis-streaming traffic; the
    orthogonality drift may cost a few extra iterations but the TRUE
    residual still reaches a loose (inexact-Newton-regime) tolerance,
    with and without the bf16 basis."""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    an = np.asarray(a)
    d = jnp.asarray(1.0 / np.diag(an))
    pc = lambda r: d * r
    mv = lambda v: a @ v
    bn = np.linalg.norm(np.asarray(b))

    ref = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60)
    for bd in (None, jnp.bfloat16):
        got = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60,
                     basis_dtype=bd, orth_passes=1)
        assert bool(got.converged)
        assert int(got.iters) <= int(ref.iters) + 5
        r = np.linalg.norm(an @ np.asarray(got.x, np.float64)
                           - np.asarray(b))
        assert r <= 2e-2 * bn, (bd, r)


def test_fgmres_selective_reorth_matches_cgs2(rng):
    """Selective reorthogonalization (orth_selective=True, Rutishauser's
    cancellation criterion): converges wherever CGS2 does — the second
    pass is skipped only on iterations whose first pass kept most of the
    vector — and the TRUE residual still meets the tolerance, with f32
    and bf16 bases, on a TIGHT tolerance (where cgs1 is not honest)."""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    an = np.asarray(a)
    d = jnp.asarray(1.0 / np.diag(an))
    pc = lambda r: d * r
    mv = lambda v: a @ v
    bn = np.linalg.norm(np.asarray(b))

    ref = fgmres(mv, b, precond=pc, rtol=1e-10, maxiter=60)
    got = fgmres(mv, b, precond=pc, rtol=1e-10, maxiter=60,
                 orth_selective=True)
    assert bool(got.converged)
    assert int(got.iters) <= int(ref.iters) + 3
    r = np.linalg.norm(an @ np.asarray(got.x, np.float64) - np.asarray(b))
    assert r <= 1e-8 * bn, r

    # bf16 basis at its honest (loose) tolerance
    got16 = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60,
                   basis_dtype=jnp.bfloat16, orth_selective=True)
    assert bool(got16.converged)
    r16 = np.linalg.norm(an @ np.asarray(got16.x, np.float64)
                         - np.asarray(b))
    assert r16 <= 2e-2 * bn, r16


def test_fgmres_selective_reorth_restarted(rng):
    """orth_selective threads through the FGMRES(r) restart driver."""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    got = fgmres(lambda v: a @ v, b, rtol=1e-10, maxiter=60, restart=16,
                 orth_selective=True)
    assert bool(got.converged)
    r = np.linalg.norm(np.asarray(a) @ np.asarray(got.x, np.float64)
                       - np.asarray(b))
    assert r <= 1e-8 * np.linalg.norm(np.asarray(b))


def test_fgmres_gram_lowsync_matches_cgs2(rng):
    """Low-synchronization CGS2 via the carried Gram matrix (orth_gram):
    the second projection's coefficients are algebraic (c2 = c1 - G c1),
    cutting the 4 basis reads per iteration to 3 (orth_gram=3, real-dots
    Gram column) or 2 (orth_gram=2, algebraic column).  On a TIGHT
    tolerance both variants must converge wherever CGS2 does, in
    (near-)identical iterations, to the same true residual."""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    an = np.asarray(a)
    d = jnp.asarray(1.0 / np.diag(an))
    pc = lambda r: d * r
    mv = lambda v: a @ v
    bn = np.linalg.norm(np.asarray(b))

    ref = fgmres(mv, b, precond=pc, rtol=1e-10, maxiter=60)
    for gp in (3, 2):
        got = fgmres(mv, b, precond=pc, rtol=1e-10, maxiter=60,
                     orth_gram=gp)
        assert bool(got.converged), gp
        assert abs(int(got.iters) - int(ref.iters)) <= 2, gp
        r = np.linalg.norm(an @ np.asarray(got.x, np.float64) - np.asarray(b))
        assert r <= 1e-8 * bn, (gp, r)


def test_fgmres_gram3_bf16_matches_cgs2_floor(rng):
    """orth_gram=3 keeps an exact-of-stored Gram matrix (real dots against
    the bf16-stored basis), so with ksp_basis=bf16 it must match classic
    CGS2's behavior at the loose inexact-Newton tolerance.  (orth_gram=2's
    algebraic column misses the storage rounding and degrades toward CGS1
    under bf16 — measured in-session — so it is NOT gated here; its
    supported regime is full-precision basis storage.)"""
    import numpy as np

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    an = np.asarray(a)
    d = jnp.asarray(1.0 / np.diag(an))
    pc = lambda r: d * r
    mv = lambda v: a @ v
    bn = np.linalg.norm(np.asarray(b))

    ref = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60,
                 basis_dtype=jnp.bfloat16)
    got = fgmres(mv, b, precond=pc, rtol=1e-3, maxiter=60,
                 basis_dtype=jnp.bfloat16, orth_gram=3)
    assert bool(got.converged)
    assert abs(int(got.iters) - int(ref.iters)) <= 2
    r = np.linalg.norm(an @ np.asarray(got.x, np.float64) - np.asarray(b))
    assert r <= 2e-2 * bn, r


def test_fgmres_gram_restarted_and_validation(rng):
    """orth_gram threads through the FGMRES(r) restart driver; invalid
    values fail loudly."""
    import numpy as np
    import pytest

    a, x_true, b = _random_system(rng, n=60, cond_shift=4.0)
    got = fgmres(lambda v: a @ v, b, rtol=1e-10, maxiter=60, restart=16,
                 orth_gram=3)
    assert bool(got.converged)
    r = np.linalg.norm(np.asarray(a) @ np.asarray(got.x, np.float64)
                       - np.asarray(b))
    assert r <= 1e-8 * np.linalg.norm(np.asarray(b))

    with pytest.raises(ValueError, match="orth_gram"):
        fgmres(lambda v: a @ v, b, maxiter=20, orth_gram=1)

"""Decompose per-Newton-iteration cost: slope/intercept in ksp_maxiter.

Runs ONE Newton iteration (max_iters=1) with forced FGMRES budgets k and a
tolerance it cannot reach, so the solve performs exactly k iterations.
wall(k) is then linear: slope = cost of one FGMRES iteration (matvec +
CPTR apply + CGS2 sweeps), intercept = fixed per-Newton cost (assembly +
preconditioner setup + line search + dispatch).  Whole-step timing synced
through one device_get per call — the only measurement shape that means
anything under axon (CLAUDE.md).

Usage: python tools/profile_slope.py [n] [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    dtype = jnp.float32
    pp = PhysicalParams()
    grid = Grid(shape=(n, n), spacing=(5.0, 5.0), thickness=10.0)
    rng = np.random.default_rng(11)
    kx = 2e-13 * np.exp(0.5 * rng.standard_normal(grid.shape))
    wells = [
        Well(cells=((0, 0),), control="bhp", p_bh=4.0e7, T_inj=420.0),
        Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7),
    ]
    data = make_problem_data(grid, pp, kx=kx, phi=0.2, wells=wells, dtype=dtype)
    model = TwoPhaseModel(grid, pp, s_init=0.2)

    # warm the state into the adaptive regime (a few ramped steps)
    pc = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                 degree=4))
    warm = jax.jit(make_step_fn(model, "cptr", NewtonConfig(
        rtol=1e-4, atol=2e-5, ksp_rtol=1e-3, ksp_maxiter=40, max_iters=14,
        pc_lag="every"), pc))
    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    for _ in range(6):
        u_new, stats = warm(u, jnp.asarray(dt, dtype), data)
        stats = jax.device_get(stats)
        assert bool(stats.converged)
        u = u_new
        dt *= 2.0
    dt_j = jnp.asarray(dt, dtype)

    print(f"# {n}x{n} f32, state after 6-step ramp, dt={dt:.0f}s, "
          f"{reps} reps per k")
    results = []
    for k in (1, 5, 9, 17, 33):
        cfg = NewtonConfig(rtol=1e-30, atol=0.0, ksp_rtol=1e-30,
                           ksp_maxiter=k, max_iters=1, pc_lag="every",
                           max_backtracks=1)
        step = jax.jit(make_step_fn(model, "cptr", cfg, pc))
        _, st = step(u, dt_j, data)     # compile
        st = jax.device_get(st)
        assert int(st.ksp_iters) == k, (k, int(st.ksp_iters))
        t0 = time.perf_counter()
        for _ in range(reps):
            _, st = step(u, dt_j, data)
            st = jax.device_get(st)
        w = (time.perf_counter() - t0) / reps
        results.append((k, w))
        print(f"  k={k:3d}  wall={w*1e3:8.2f} ms")

    ks = np.array([r[0] for r in results], dtype=float)
    ws = np.array([r[1] for r in results])
    slope, intercept = np.polyfit(ks, ws, 1)
    print(f"# slope = {slope*1e3:.3f} ms per FGMRES iteration")
    print(f"# intercept = {intercept*1e3:.2f} ms per Newton iteration "
          f"(assembly + 2x GMG setup + line search + dispatch)")


if __name__ == "__main__":
    main()

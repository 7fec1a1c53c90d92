"""Per-component costs of one Newton iteration at bench scale.

Each part is its own jitted program returning ONE tiny scalar derived from
the full computation (so nothing is dead-code-eliminated), timed over reps
with one device_get per call.  Dispatch overhead (~1.4 ms relay) is
reported via a null program and NOT subtracted — read components as
"dispatched cost".  Complements tools/profile_slope.py (slope/intercept).

Usage: python tools/profile_parts.py [n] [reps]
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
    from thermalporous_tpu.precond.cpr import cpr_apply, cpr_setup
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

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

    s = lambda a: jnp.sum(a[0] if isinstance(a, tuple) else a)

    def t_state(st):  # scalar from a BlockStencil / CPRState
        return jnp.sum(st.diag[0, 0]) if hasattr(st, "diag") else jnp.sum(
            st.gmg_p.coarse_inv)

    parts = {
        "null (dispatch floor)": lambda u, dt, data: jnp.sum(u[0, :2, :2]),
        "residual": lambda u, dt, data: s(model.residual(u, u, dt, data)),
        "residual+scaled norm": lambda u, dt, data: jnp.sum(
            (model.residual(u, u, dt, data)
             / model.residual_scales(u, dt, data)) ** 2),
        "assemble_stencil": lambda u, dt, data: t_state(
            model.assemble_stencil(u, u, dt, data)),
        "assemble+cpr_setup": lambda u, dt, data: t_state(
            cpr_setup(model.assemble_stencil(u, u, dt, data), pc)),
        "assemble+setup+1 apply": lambda u, dt, data: jnp.sum(
            cpr_apply(cpr_setup(model.assemble_stencil(u, u, dt, data), pc),
                      model.residual(u, u, dt, data), pc)),
        "assemble+1 matvec": lambda u, dt, data: jnp.sum(
            model.assemble_stencil(u, u, dt, data).matvec(u)),
    }

    print(f"# {n}x{n} f32, dt={dt:.0f}s after ramp, {reps} reps (dispatched)")
    for name, fn in parts.items():
        f = jax.jit(fn)
        float(f(u, dt_j, data))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            float(f(u, dt_j, data))
        w = (time.perf_counter() - t0) / reps
        print(f"  {name:28s} {w*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

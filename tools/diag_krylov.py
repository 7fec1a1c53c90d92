"""Diagnose CPTR-FGMRES convergence on the bench workload.

Isolates one linear solve: advance the bench case a few steps, assemble J,
build CPTR, run FGMRES on J dx = -F, and print the iteration count and
residual history under variations (x64 reductions, decoupling, cycles,
inner iterations).

Usage: python tools/diag_krylov.py [n] [--x64]
"""

from __future__ import annotations

import sys

import jax

if "--x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
    sys.argv.remove("--x64")

import jax.numpy as jnp
import numpy as np


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.precond.cpr import cpr_apply, cpr_setup
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn
    from thermalporous_tpu.solve.fgmres import fgmres

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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

    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-3, ksp_maxiter=40,
                       max_iters=14, pc_lag="step")
    pc_base = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024))
    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_base))

    # advance into the ramped regime (the hard linear systems)
    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    for _ in range(4):
        u, stats = step(u, jnp.asarray(dt, dtype), data)
        assert bool(stats.converged)
        dt *= 1.5
    print(f"# at dt={dt:.0f}s after 4 steps; linear solve J dx = -F at u")

    dt_j = jnp.asarray(dt, dtype)

    @jax.jit
    def get_system(u, dt, data):
        f = model.residual(u, u, dt, data)  # fresh step from u: u_old = u
        st = model.assemble_stencil(u, u, dt, data)
        return f, st

    f, st = get_system(u, dt_j, data)

    def solve(tag, pc_cfg, maxiter=60, rtol=1e-3):
        state = jax.jit(lambda s: cpr_setup(s, pc_cfg))(st)

        @jax.jit
        def run(state, f, st):
            res = fgmres(st.matvec, -f,
                         precond=lambda r: cpr_apply(state, r, pc_cfg),
                         rtol=rtol, maxiter=maxiter)
            return res.iters, res.res_norm, res.converged, res.breakdown

        it, rn, conv, brk = run(state, f, st)
        print(f"{tag:44s} iters={int(it):3d} res={float(rn):9.2e} "
              f"conv={bool(conv)} breakdown={bool(brk)}")

    solve("cptr k-cycle qimpes (bench default)", pc_base)
    solve("cptr v-cycle qimpes", CPRConfig(gmg=GMGConfig(cycle_type="v",
                                                         max_coarse_cells=1024)))
    solve("cptr k deg4 smoothing", CPRConfig(gmg=GMGConfig(cycle_type="k",
                                                           max_coarse_cells=1024,
                                                           degree=4)))
    solve("cptr k 2 cycles", CPRConfig(gmg=GMGConfig(cycle_type="k",
                                                     max_coarse_cells=1024,
                                                     cycles=2)))
    solve("cptr k abf", CPRConfig(decoupling="abf",
                                  gmg=GMGConfig(cycle_type="k",
                                                max_coarse_cells=1024)))
    solve("cptr k timpes", CPRConfig(decoupling="timpes",
                                     gmg=GMGConfig(cycle_type="k",
                                                   max_coarse_cells=1024)))
    solve("cptr k inner3", CPRConfig(inner_iters=3,
                                     gmg=GMGConfig(cycle_type="k",
                                                   max_coarse_cells=1024)))
    solve("cpr k (pressure only)", CPRConfig(variant="cpr",
                                             gmg=GMGConfig(cycle_type="k",
                                                           max_coarse_cells=1024)))
    solve("cptr k block-diag (no triangular)",
          CPRConfig(triangular=False,
                    gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024)))
    solve("cptr k rbgs smoother",
          CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                  smoother="rbgs")))


if __name__ == "__main__":
    main()

"""Benchmark: cell-updates/s per chip on the flagship Newton–FGMRES–CPTR step.

Metric (BASELINE.json): cell-updates per second per chip, where one "cell
update" is one cell advanced through one Newton iteration (each Newton
iteration assembles the exact block-stencil Jacobian, rebuilds the CPTR
multigrid hierarchy, and runs an FGMRES solve over every cell).

Workload: 1024×1024 two-phase thermal flood (3.1M dof, f32), heterogeneous
permeability, BHP injector/producer, Δt doubling per step from the initial
transient up into the hard multi-day regime — the sustained envelope of a
real adaptive run, with the controller's cutback handling steps that
exceed Newton's ball of convergence.

Solver configuration (measured in tools/ab_step.py A/Bs, BASELINE.md):
pc_lag="every" (the reference's behavior — rebuilding the preconditioner
each Newton iteration is ~3.6x faster in wall time here than the frozen
per-step variant, whose stalls cost 40 FGMRES iterations per Newton) and
krylov_op="stencil" (the TPFA Jacobian IS the assembled block stencil, so
matvecs are transcendental-free and share the assembly with the CPTR
setup).  f64 reductions are enabled (x64 on, state stays f32).

``vs_baseline`` is the ratio against a PETSc-CPU-class reference
throughput of 1.0e6 cell-updates/s: the upstream repo publishes no
benchmark numbers (BASELINE.md — ``published: {}``), so this proxy is the
order of magnitude a multicore PETSc CPR/ILU run achieves on problems of
this size.  A measured single-host CPU floor for THIS code on THIS
workload is recorded in BASELINE.md for context; the honest tracked
quantity is ``value`` itself, recorded per round in BENCH_r{N}.json.

Runs on whatever platform is default (the real TPU chip under axon).
"""

from __future__ import annotations

import json
import time
import warnings

warnings.filterwarnings("ignore", message=".*truncated to dtype float32.*")

import jax

# f64 accumulation in FGMRES/Newton reductions (state stays f32); must be
# set before the backend is touched
try:
    jax.config.update("jax_enable_x64", True)
except RuntimeError:
    pass

import jax.numpy as jnp
import numpy as np

PETSC_CPU_CLASS_BASELINE = 1.0e6  # cell-updates/s, documented proxy (see above)


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = 1024
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
    ncells = grid.ncells

    # ksp_maxiter is regime- AND tolerance-dependent (BASELINE.md A/Bs):
    # at ksp_rtol 1e-3 a 16-cap CRATERED this ×2 doubling workload (5.7M
    # vs 13.2M cu/s — hard solves genuinely needed the 40-space), but the
    # round-3 forcing term changed that calculus: at rtol 1e-2 the typical
    # solve needs ~4-15 directions while CGS2 still streams the full
    # STATIC cap's basis slots every iteration, so cap 24 cuts the #1
    # roofline term and is a confirmed +15-17% cu/s at an identical
    # accepted trajectory (interleaved repeat runs, tools/ab_step.py).
    # Round-3 forcing-term + basis-precision levers (tools/ab_step.py,
    # identical accepted trajectory, Newton counts unchanged): ksp_rtol
    # 1e-2 — the classic inexact-Newton forcing term; Newton convergence
    # still gates on the TRUE residual (rtol/atol below) — is +24%
    # time-to-solution on this workload, bf16 Arnoldi-basis storage
    # (honest at this tolerance: its true-residual floor is ~4e-3) adds
    # +15% more by halving the dominant CGS2 streaming traffic, and the
    # 24-cap stacks +15% on top: 13.4M -> 18.7M -> 21.5M cell-updates/s.
    # ksp_orth="cgs2g" (low-synch CGS2, real-dots Gram column — the
    # bf16-safe form): 3 basis reads/iteration instead of 4; measured
    # +8% time-to-solution and +10% cu/s over bf16+cgs2 on the 40-step
    # doubling ramp, reproducible interleaved (BASELINE.md round-3
    # ledger; cap 32 under g3 re-measured and still loses to 24).
    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-2, ksp_maxiter=24,
                       max_iters=14, pc_lag="every", krylov_op="stencil",
                       ksp_basis="bf16", ksp_orth="cgs2g")
    # degree-4 Chebyshev smoothing: measured 47% better time-to-solution on
    # the hard end of the ramp (fewer Δt cutbacks AND less wall; see
    # BASELINE.md round-2 A/B table) at no cost in the easy regime.
    # Asymmetric cheap-T stage 1 (round-3, tools/ab_step.py g3-deg4-tv,
    # interleaved ×2 on chip): the decoupled temperature hierarchy gets a
    # V-cycle/deg-2 instead of the pressure block's K-cycle/deg-4 —
    # IDENTICAL accepted trajectory (41 Newton both runs), slightly fewer
    # FGMRES iterations (358 vs 369), and +14% cu/s AND t_sim/wall
    # (25.9–26.1M vs 22.6–22.9M cu/s).  The 2D pressure-side
    # kcycle_min_cells floor measured WORSE than cheap-T alone here
    # (+20 ksp, 25.5M) — 2D hierarchies are shallow — so only the
    # flagship 3D preset carries it.
    # stage2_cols (round-5): the stage-2 residual streams only block
    # columns 0:2 of A — bit-exact (see CPRConfig.stage2_cols; 30 of 45
    # coefficient fields at this 2D 5-point stencil).  In-step qualified
    # at this 1024² shape on axon (tools/diag_s2.py --bench: counts and
    # norms match CPU) and A/B'd on this exact workload (BASELINE.md
    # round-5: same accepted trajectory, value within the round band).
    pc_cfg = CPRConfig(stage2_cols=True,
                       gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                     degree=4),
                       gmg_t=GMGConfig(cycle_type="v", max_coarse_cells=1024,
                                       degree=2))
    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))

    def do_step(u, dt):
        u_new, stats = step(u, jnp.asarray(dt, dtype), data)
        # ONE bulk stats transfer: under axon every scalar fetch is a ~30 ms
        # round trip, so field-by-field reads would dominate the wall time
        return u_new, jax.device_get(stats)

    # compile + consume the sharp initial transient
    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    u, stats = do_step(u, dt)
    assert bool(stats.converged)

    # sustained adaptive-style workload: Δt doubling into the multi-day
    # regime (with the controller's cutback so a hard step degrades the
    # number instead of killing the artifact)
    nsteps = 10
    total_newton = 0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        dt *= 2.0
        u_new, stats = do_step(u, dt)
        retries = 0
        while not bool(stats.converged) and retries < 6:
            dt *= 0.5
            retries += 1
            u_new, stats = do_step(u, dt)
        assert bool(stats.converged), "benchmark step did not converge after cutbacks"
        u = u_new
        total_newton += int(stats.iters)
    wall = time.perf_counter() - t0

    value = ncells * total_newton / wall
    print(
        json.dumps(
            {
                "metric": "cell-updates/s per chip (Newton-FGMRES-CPTR, 2-phase 1024x1024, f32)",
                "value": round(value, 1),
                "unit": "cell-updates/s",
                "vs_baseline": round(value / PETSC_CPU_CLASS_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

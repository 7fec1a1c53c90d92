"""Replicate one hard bench step's Newton trajectory with per-iteration
FGMRES telemetry (host-loop replica of solve/newton.py).

Usage: python tools/diag_newton.py [n] [--x64] [--pc-every]
"""

from __future__ import annotations

import sys

import jax

if "--x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
    sys.argv.remove("--x64")
PC_EVERY = "--pc-every" in sys.argv
if PC_EVERY:
    sys.argv.remove("--pc-every")

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
    pc_cfg = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024))
    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))

    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    for k in range(5):
        u, stats = step(u, jnp.asarray(dt, dtype), data)
        print(f"step {k}: dt={dt:8.0f} newton={int(stats.iters)} "
              f"ksp={int(stats.ksp_iters)} conv={bool(stats.converged)}")
        dt *= 1.5

    # replicate the NEXT step on the host with per-iteration telemetry
    u_old = u
    dt_j = jnp.asarray(dt, dtype)
    scale = jax.jit(lambda uo, d, dat: model.residual_scales(uo, d, dat))(
        u_old, dt_j, data)

    @jax.jit
    def nrm(f):
        q = (f / scale).astype(jnp.float64 if jax.config.x64_enabled else f.dtype)
        return jnp.sqrt(jnp.sum(q * q) / q.size).astype(f.dtype)

    res_fn = jax.jit(lambda x, uo, d, dat: model.residual(x, uo, d, dat))
    asm_fn = jax.jit(lambda x, uo, d, dat: model.assemble_stencil(x, uo, d, dat))
    setup_fn = jax.jit(lambda s: cpr_setup(s, pc_cfg))

    @jax.jit
    def solve(st, state, f):
        r = fgmres(st.matvec, -f,
                   precond=lambda q: cpr_apply(state, q, pc_cfg),
                   rtol=cfg.ksp_rtol, maxiter=cfg.ksp_maxiter)
        return r.x, r.iters, r.res_norm, r.converged, r.breakdown

    f = res_fn(u_old, u_old, dt_j, data)
    n0 = float(nrm(f))
    tol = max(cfg.rtol * n0, 2e-5, 50 * float(jnp.finfo(dtype).eps))
    print(f"hard step: dt={dt:.0f}, |F0|={n0:.3e}, tol={tol:.3e}")
    u_k = u_old
    st0 = asm_fn(u_k, u_old, dt_j, data)
    frozen = setup_fn(st0)
    for it in range(10):
        st = asm_fn(u_k, u_old, dt_j, data)
        state = setup_fn(st) if PC_EVERY else frozen
        dx, kit, krn, kconv, kbrk = solve(st, state, f)
        # backtracking
        alpha = 1.0
        nrm_old = float(nrm(f))
        for bt in range(6):
            u_try = u_k + alpha * dx
            f_try = res_fn(u_try, u_old, dt_j, data)
            n_try = float(nrm(f_try))
            if np.isfinite(n_try) and n_try <= (1 - 1e-4 * alpha) * nrm_old:
                break
            alpha *= 0.5
        print(f"  newton {it}: ksp={int(kit):3d} kres={float(krn):9.2e} "
              f"kconv={bool(kconv)} brk={bool(kbrk)} alpha={alpha:.3f} "
              f"|F| {nrm_old:.3e} -> {n_try:.3e}")
        u_k, f = u_try, f_try
        if n_try <= tol:
            print(f"  converged in {it+1} Newton iters")
            break


if __name__ == "__main__":
    main()

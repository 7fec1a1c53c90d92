"""A/B: bench.py's host retry loop vs the in-device blocked loop.

The bench workload (1024² two-phase CPTR, Δt doubling ×10 steps) pays one
~40 ms axon dispatch + one ~30 ms stats fetch per host-loop attempt.  The
round-2 verdict ("blocked ~10% slower here") predates the round-3 levers
(bf16 basis + ksp_rtol 1e-2) that cut per-step compute — so the relay
fraction grew and the verdict needs re-measuring.

The doubling schedule maps exactly onto the block controller: growth=2.0
applied after every accepted step (grow_below > max_iters), cutback=0.5
retries on failure — the host bench's `dt *= 2; attempt; halve-retry`
sequence produces the identical Δt trajectory.  The harness asserts the
per-step (dt, newton) pairs match before trusting the wall numbers.

Usage: python tools/bench_blocked.py [n] [nsteps]
"""

from __future__ import annotations

import sys
import time
import warnings

warnings.filterwarnings("ignore", message=".*truncated to dtype float32.*")

import jax

try:
    jax.config.update("jax_enable_x64", True)
except RuntimeError:
    pass

import jax.numpy as jnp
import numpy as np


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.solve import (
        NewtonConfig,
        TimeConfig,
        make_block_step_fn,
        make_step_fn,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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

    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-2, ksp_maxiter=24,
                       max_iters=14, pc_lag="every", krylov_op="stencil",
                       ksp_basis="bf16")
    pc_cfg = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                     degree=4))

    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))

    def do_step(u, dt):
        u_new, stats = step(u, jnp.asarray(dt, dtype), data)
        return u_new, jax.device_get(stats)

    # shared warmup (compile + consume the sharp initial transient)
    u0 = model.initial_state(data, dtype=dtype)
    u1, stats = do_step(u0, 600.0)
    assert bool(stats.converged)

    # ---- path A: bench.py's host retry loop -------------------------------
    u, dt = u1, 600.0
    host_traj = []
    total_newton_a = 0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        dt *= 2.0
        u_new, stats = do_step(u, dt)
        retries = 0
        while not bool(stats.converged) and retries < 6:
            dt *= 0.5
            retries += 1
            u_new, stats = do_step(u, dt)
        assert bool(stats.converged)
        u = u_new
        host_traj.append((dt, int(stats.iters)))
        total_newton_a += int(stats.iters)
    wall_a = time.perf_counter() - t0
    cu_a = ncells * total_newton_a / wall_a
    print(f"host    wall={wall_a:7.2f}s newton={total_newton_a:3d} "
          f"cu/s={cu_a:,.0f}")

    # ---- path B: one in-device block with the equivalent controller -------
    tc = TimeConfig(dt_min=1.0, dt_max=1e9, growth=2.0, cutback=0.5,
                    grow_below=cfg.max_iters + 1, shrink_above=10_000,
                    max_retries=6, block_steps=nsteps)
    block = jax.jit(make_block_step_fn(model, "cptr", cfg, pc_cfg, tc,
                                       n_steps=nsteps))

    def run_block():
        t0 = time.perf_counter()
        out = block(u1, 1200.0, 0.0, 1e30, data)
        u_b, dt_b, t_b, dead, cap, bs = jax.device_get(out)
        return time.perf_counter() - t0, bs, bool(dead)

    wall_compile, bs, dead = run_block()      # compile + first run
    assert not dead
    wall_b, bs, dead = run_block()            # measured run
    assert not dead
    blk_traj = [(float(d), int(nw))
                for d, nw, ok in zip(bs.dt_used, bs.newton, bs.ok) if ok]
    total_newton_b = sum(nw for _, nw in blk_traj)
    cu_b = ncells * total_newton_b / wall_b
    print(f"blocked wall={wall_b:7.2f}s newton={total_newton_b:3d} "
          f"cu/s={cu_b:,.0f} (first-call incl. compile: {wall_compile:.2f}s)")

    same = len(blk_traj) == len(host_traj) and all(
        abs(da - db) <= 1e-9 * da and na == nb
        for (da, na), (db, nb) in zip(host_traj, blk_traj)
    )
    print(f"trajectory match: {same}")
    if not same:
        print(f"  host:    {host_traj}")
        print(f"  blocked: {blk_traj}")
    print(f"blocked/host speedup: {cu_b / cu_a:.3f}x")


if __name__ == "__main__":
    main()

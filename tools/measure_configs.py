"""Measure the five BASELINE configs: the per-config table BASELINE.md
promises (cells, dof, steps, Newton/step, FGMRES/Newton, wall/step,
cell-updates/s per chip, dtype).

Runs each preset through its own Simulator (production solver settings,
f32 + f64 reductions) for a fixed number of adaptive steps and prints a
markdown table.  Whole-step timing with one stats transfer per step; the
first (compile) step is excluded from wall statistics.

Usage: python tools/measure_configs.py [steps] [case ...]
"""

from __future__ import annotations

import sys
import time

import jax

try:
    jax.config.update("jax_enable_x64", True)
except RuntimeError:
    pass

import jax.numpy as jnp


def main():
    from thermalporous_tpu.presets import PRESETS, get_case
    from thermalporous_tpu.solve import Simulator

    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or sorted(PRESETS)

    rows = []
    for name in names:
        case = get_case(name)
        model, data = case.model, case.data
        data = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            data,
        )
        sim = Simulator(model, data, precond=case.precond,
                        pc_cfg=case.pc_cfg, newton_cfg=case.newton_cfg,
                        time_cfg=case.time_cfg)
        u = model.initial_state(data, dtype=jnp.float32)
        dt = case.time_cfg.dt_init
        grid = model.grid
        ncells = grid.ncells
        newton_tot = ksp_tot = 0
        wall_tot = 0.0
        steps_done = 0
        for k in range(nsteps):
            t0 = time.perf_counter()
            u_new, stats = sim.step(u, dt)
            stats = jax.device_get(stats)
            w = time.perf_counter() - t0
            if bool(stats.converged):
                u = u_new
                if k > 0:  # exclude the compile step
                    newton_tot += int(stats.iters)
                    ksp_tot += int(stats.ksp_iters)
                    wall_tot += w
                    steps_done += 1
                dt = min(dt * case.time_cfg.growth, case.time_cfg.dt_max)
            else:
                dt = max(dt * case.time_cfg.cutback, case.time_cfg.dt_min)
        cu = ncells * newton_tot / wall_tot if wall_tot > 0 else 0.0
        rows.append((
            name,
            "×".join(str(n) for n in grid.shape),
            ncells * model.nc,
            steps_done,
            newton_tot / max(steps_done, 1),
            ksp_tot / max(newton_tot, 1),
            wall_tot / max(steps_done, 1),
            cu,
        ))
        print(f"# {name}: done", file=sys.stderr)

    print("| config | grid | dof | steps | Newton/step | FGMRES/Newton "
          "| wall/step [s] | cell-updates/s | chips | dtype |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]:,} | {r[3]} | {r[4]:.1f} "
              f"| {r[5]:.1f} | {r[6]:.3f} | {r[7]:,.0f} | 1 | f32+f64red |")


if __name__ == "__main__":
    main()

"""Benchmark: cell-updates/s per chip on the flagship Newton–FGMRES–CPTR step.

Metric (BASELINE.json): cell-updates per second per chip, where one "cell
update" is one cell advanced through one Newton iteration (each Newton
iteration evaluates the residual, assembles the stencil, builds the CPTR
hierarchy and runs an FGMRES solve over every cell).

``vs_baseline`` is the ratio against a self-declared PETSc-CPU-class
reference throughput of 1.0e6 cell-updates/s: the upstream repo publishes
no benchmark numbers (BASELINE.md — ``published: {}``), so this proxy is the
order of magnitude a multicore PETSc CPR/ILU run achieves on problems of
this size; the honest tracked quantity is ``value`` itself, recorded per
round in BENCH_r{N}.json.

Runs on whatever platform is default (the real TPU chip under axon).
"""

from __future__ import annotations

import json
import time
import warnings

warnings.filterwarnings("ignore", message=".*truncated to dtype float32.*")

import jax
import jax.numpy as jnp

PETSC_CPU_CLASS_BASELINE = 1.0e6  # cell-updates/s, documented proxy (see above)


def main():
    from thermalporous_tpu.presets import tp_thermal_2d
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = 256
    dtype = jnp.float32
    case = tp_thermal_2d(n=n)
    model, data = case.model, case.data
    ncells = model.grid.ncells

    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-3, ksp_maxiter=30,
                       max_iters=12)
    step_fn = make_step_fn(model, "cptr", cfg)

    def advance(u_old, dt, data):
        u, stats = step_fn(u_old, dt, data)
        return u, stats.iters, stats.converged

    data = jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a, data
    )
    u = model.initial_state(data, dtype=dtype)
    step = jax.jit(advance)

    # warmup / compile + first transient step
    dt = jnp.asarray(1200.0, dtype=dtype)
    u, _, _ = step(u, dt, data)
    jax.block_until_ready(u)

    nsteps = 6
    total_newton = 0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        u, iters, converged = step(u, dt, data)
        jax.block_until_ready(u)
        assert bool(converged), "benchmark step did not converge — number would be meaningless"
        total_newton += int(iters)
    wall = time.perf_counter() - t0

    value = ncells * total_newton / wall
    print(
        json.dumps(
            {
                "metric": "cell-updates/s per chip (Newton-FGMRES-CPTR, 2-phase 256x256, f32)",
                "value": round(value, 1),
                "unit": "cell-updates/s",
                "vs_baseline": round(value / PETSC_CPU_CLASS_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

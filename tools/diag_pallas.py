"""In-step probe: Pallas block matvec vs jnp block-stencil matvec.

Round 2 left ``krylov_op="stencil_pallas"`` unlandable: exact standalone
and 13% faster at deg-2 smoothing, but trajectory-degraded at deg-4 and a
convergence collapse on the bench (deg-4 + Δt-doubling) workload
(BASELINE.md).  The suspect is the axon lowering of the assembled
coefficients INSIDE the Newton/FGMRES while_loops at ~1M-cell scale —
the same family as the fixed BlockStencil.block slice-view miscompile.

This tool measures the deviation directly.  Inside ONE jitted while_loop
that mimics the production program shape (fresh assembly + CPTR setup +
apply per iteration, pc_lag="every"), it computes BOTH matvecs on
identical vectors each iteration and accumulates the max relative
deviation — any value far above f32 roundoff (~1e-6) is a miscompile,
not arithmetic.

Probes, from bare to production-shaped:
  bare       while_loop{ assemble; y_pal vs y_ref on evolving v }
  pc         same + CPTR setup/apply in the loop body (deg from CLI)
  step       full newton_solve stencil vs stencil_pallas at the hard dt:
             iteration counts + final norms (end-to-end symptom check)

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/diag_pallas.py [n] [ramp_steps] [degree] [probe ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.kernels import block_matvec
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.precond.cpr import make_preconditioner
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ramp_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    degree = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    probes = sys.argv[4:] or ["bare", "pc", "step"]

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

    pc_cfg = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                     degree=degree))
    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-3, ksp_maxiter=40,
                       max_iters=14, pc_lag="every", krylov_op="stencil")
    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))

    # ---- reach the hard regime on the trusted jnp path (Δt doubling)
    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    u, st0 = step(u, jnp.asarray(dt, dtype), data)
    assert bool(jax.device_get(st0).converged)
    for k in range(ramp_steps):
        dt *= 2.0
        u_new, s = step(u, jnp.asarray(dt, dtype), data)
        s = jax.device_get(s)
        while not bool(s.converged):
            dt *= 0.5
            u_new, s = step(u, jnp.asarray(dt, dtype), data)
            s = jax.device_get(s)
        u = u_new
        print(f"ramp step {k}: dt={dt:.0f}s newton={int(s.iters)} "
              f"ksp={int(s.ksp_iters)}")
    print(f"# probing at dt={2 * dt:.0f}s (the next, hard, step), "
          f"deg={degree}, n={n}")
    dt_hard = jnp.asarray(2.0 * dt, dtype)

    pc_setup, pc_apply = make_preconditioner("cptr", pc_cfg)
    n_iters = 12

    def deviation(y_pal, y_ref):
        num = jnp.max(jnp.abs((y_pal - y_ref).astype(jnp.float64)))
        den = jnp.max(jnp.abs(y_ref.astype(jnp.float64))) + 1e-300
        return num / den

    def probe_bare(u, dtv, data):
        f = model.residual(u, u, dtv, data)

        def body(c):
            j, v, dev = c
            st = model.assemble_stencil(u, u, dtv, data)
            y_ref = st.matvec(v)
            y_pal = block_matvec(st, v)
            dev = jnp.maximum(dev, deviation(y_pal, y_ref))
            nv = jnp.sqrt(jnp.sum(jnp.square(y_ref.astype(jnp.float64))))
            v = (y_ref.astype(jnp.float64) / (nv + 1e-300)).astype(v.dtype)
            return (j + 1, v, dev)

        init = (jnp.asarray(0), f, jnp.asarray(0.0, jnp.float64))
        _, _, dev = jax.lax.while_loop(lambda c: c[0] < n_iters, body, init)
        return dev

    def probe_pc(u, dtv, data):
        f = model.residual(u, u, dtv, data)

        def body(c):
            j, v, dev = c
            st = model.assemble_stencil(u, u, dtv, data)
            pcs = pc_setup(st)
            z = pc_apply(pcs, v)
            y_ref = st.matvec(z)
            y_pal = block_matvec(st, z)
            dev = jnp.maximum(dev, deviation(y_pal, y_ref))
            nv = jnp.sqrt(jnp.sum(jnp.square(y_ref.astype(jnp.float64))))
            v = (y_ref.astype(jnp.float64) / (nv + 1e-300)).astype(v.dtype)
            return (j + 1, v, dev)

        init = (jnp.asarray(0), f, jnp.asarray(0.0, jnp.float64))
        _, _, dev = jax.lax.while_loop(lambda c: c[0] < n_iters, body, init)
        return dev

    for name in probes:
        if name == "step":
            for op in ("stencil", "stencil_pallas"):
                cfg_v = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-3,
                                     ksp_maxiter=40, max_iters=14,
                                     pc_lag="every", krylov_op=op)
                stepv = jax.jit(make_step_fn(model, "cptr", cfg_v, pc_cfg))
                t0 = time.perf_counter()
                _, s = stepv(u, dt_hard, data)
                s = jax.device_get(s)
                print(f"step[{op:15s}]: newton={int(s.iters):2d} "
                      f"ksp={int(s.ksp_iters):3d} conv={bool(s.converged)} "
                      f"norm {float(s.norm0):.3e} -> {float(s.norm):.3e} "
                      f"wall={time.perf_counter() - t0:.1f}s")
            continue
        fn = {"bare": probe_bare, "pc": probe_pc}[name]
        t0 = time.perf_counter()
        dev = float(jax.device_get(jax.jit(fn)(u, dt_hard, data)))
        flag = "OK" if dev < 1e-5 else "** MISCOMPUTE **"
        print(f"probe[{name:4s}]: max rel deviation over {n_iters} "
              f"in-loop iters = {dev:.3e}  {flag} "
              f"(wall {time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()

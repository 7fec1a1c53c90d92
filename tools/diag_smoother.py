"""In-step probe: fused Pallas Chebyshev smoother vs the jnp reference.

The ab_step A/B of ``use_pallas=True`` under the full production config
(deg-4 + bf16 basis + rtol 1e-2 + cap 24) lands at a DIFFERENT trajectory
(+10 Newton over 40 steps) — which is either benign f32 reassociation in
the fused kernel or another member of the axon in-step-at-scale miscompile
family (CLAUDE.md ledger).  This tool distinguishes them the same way
``diag_pallas.py`` did for the block matvec: compute BOTH smoothers on
identical (stencil, b, x) inside one jitted while_loop that mimics the
production shape (fresh assembly + decoupling per iteration), and report
the max relative deviation.  f32 reassociation is ~1e-6; a miscompile is
orders above.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/diag_smoother.py [n] [ramp_steps] [degree] [probe ...]
Probes: bare (out-of-loop), loop (in-loop), step (end-to-end hard step
with use_pallas on/off).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.kernels import chebyshev_smooth
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.precond.chebyshev import chebyshev, gershgorin_lambda_max
    from thermalporous_tpu.precond.cpr import _decoupling_weights
    from thermalporous_tpu.solve import NewtonConfig, make_step_fn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ramp_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    degree = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    probes = sys.argv[4:] or ["bare", "loop", "step"]

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
    cfg = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-2, ksp_maxiter=24,
                       max_iters=14, pc_lag="every", krylov_op="stencil",
                       ksp_basis="bf16")
    step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))

    # reach the hard regime on the trusted jnp path (Δt doubling)
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
    n_iters = 12

    def pressure_system(u, dtv, data):
        st = model.assemble_stencil(u, u, dtv, data)
        w = _decoupling_weights(st, pc_cfg, dinv=st.diag_inverse())
        return st.scale_rows(w).scalar(0, 0)

    def deviation(a, b_):
        num = jnp.max(jnp.abs((a - b_).astype(jnp.float64)))
        den = jnp.max(jnp.abs(b_.astype(jnp.float64))) + 1e-300
        return num / den

    def both(app, bvec, xvec, lam):
        y_ref = chebyshev(app, bvec, xvec, degree=degree, lam_max=lam)
        y_pal = chebyshev_smooth(app, bvec, xvec, lam, degree=degree)
        return y_ref, y_pal

    def probe_bare(u, dtv, data):
        app = pressure_system(u, dtv, data)
        lam = gershgorin_lambda_max(app)
        bvec = model.residual(u, u, dtv, data)[0]
        y_ref, y_pal = both(app, bvec, None, lam)
        return deviation(y_pal, y_ref)

    def probe_loop(u, dtv, data):
        bvec0 = model.residual(u, u, dtv, data)[0]

        def body(c):
            j, v, dev = c
            app = pressure_system(u, dtv, data)
            lam = gershgorin_lambda_max(app)
            y_ref, y_pal = both(app, v, None, lam)
            dev = jnp.maximum(dev, deviation(y_pal, y_ref))
            nv = jnp.sqrt(jnp.sum(jnp.square(y_ref.astype(jnp.float64))))
            v = (y_ref.astype(jnp.float64) / (nv + 1e-300)).astype(v.dtype)
            return (j + 1, v, dev)

        init = (jnp.asarray(0), bvec0, jnp.asarray(0.0, jnp.float64))
        _, _, dev = jax.lax.while_loop(lambda c: c[0] < n_iters, body, init)
        return dev

    for name in probes:
        if name == "step":
            for pal in (False, True):
                pcv = CPRConfig(gmg=GMGConfig(cycle_type="k",
                                              max_coarse_cells=1024,
                                              degree=degree, use_pallas=pal))
                stepv = jax.jit(make_step_fn(model, "cptr", cfg, pcv))
                t0 = time.perf_counter()
                _, s = stepv(u, dt_hard, data)
                s = jax.device_get(s)
                print(f"step[use_pallas={pal!s:5s}]: newton={int(s.iters):2d} "
                      f"ksp={int(s.ksp_iters):3d} conv={bool(s.converged)} "
                      f"norm {float(s.norm0):.3e} -> {float(s.norm):.3e} "
                      f"wall={time.perf_counter() - t0:.1f}s")
            continue
        fn = {"bare": probe_bare, "loop": probe_loop}[name]
        t0 = time.perf_counter()
        dev = float(jax.device_get(jax.jit(fn)(u, dt_hard, data)))
        flag = "OK" if dev < 1e-5 else "** MISCOMPUTE **"
        print(f"probe[{name:4s}]: max rel deviation = {dev:.3e}  {flag} "
              f"(wall {time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()

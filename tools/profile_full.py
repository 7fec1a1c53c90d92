"""Per-component cost decomposition at the FLAGSHIP point (tp_spe10_full).

The v4 preset (EW forcing, cap 16) runs ~3.3 FGMRES/Newton, so the
per-Newton FIXED cost — residual, stencil assembly, CPTR setup (2x GMG
hierarchies rebuilt every Newton under pc_lag="every"), chop/acceptance —
now rivals the whole Krylov loop.  The bandwidth bounds of those parts sum
to a few ms while the measured fixed cost is ~30 ms/Newton (BASELINE.md
per-config v4 row: 55 ms/Newton at 3.3 ksp/N, ~21 ms of it Krylov), so
the question is WHERE the rest goes (small-kernel latency in the deep 3D
hierarchy setup is the suspect).

Method (the only one that means anything under axon — CLAUDE.md): each
part is ONE jitted program over the full-scale state returning one tiny
scalar; timed over reps with a single device_get per call; the ~40 ms
relay floor is reported via a null program and NOT subtracted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_full.py [reps] [--mid]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

MID = "--mid" in sys.argv
if MID:
    sys.argv.remove("--mid")


def timeit(fn, *args, reps):
    out = fn(*args)
    jax.device_get(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    import dataclasses

    from thermalporous_tpu.precond.cpr import cpr_apply, cpr_setup
    from thermalporous_tpu.presets import tp_spe10_3d, tp_spe10_full
    from thermalporous_tpu.solve import Simulator, make_step_fn

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    case = tp_spe10_3d() if MID else tp_spe10_full()
    model, data = case.model, case.data
    data = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, data)
    pc_cfg = case.pc_cfg
    ncfg = case.newton_cfg

    # warm into the adaptive regime on the PRODUCT path so the state (and
    # the adaptive coarsening schedule baked into sim.pc_cfg) is honest
    sim = Simulator(model, data, precond="cptr", newton_cfg=ncfg,
                    pc_cfg=pc_cfg, time_cfg=case.time_cfg)
    u = model.initial_state(data, dtype=jnp.float32)
    res = sim.run(t_end=2 * 3600.0, u0=u, dt0=600.0)
    u = res.u
    dt_w = res.records[-1].next_dt or res.records[-1].dt
    pc_cfg = sim.pc_cfg  # adaptive schedule resolved host-side
    dt = jnp.asarray(dt_w, jnp.float32)
    print(f"# warmed {res.steps} steps; profiling at dt={float(dt):.0f}s")

    print(f"# {model.grid.shape} two-phase, production pc_cfg, {reps} reps")

    null = jax.jit(lambda u: jnp.float32(0.0) * u[0, 0, 0, 0])
    w = timeit(null, u, reps=reps)
    print(f"  null program (relay floor)      {w*1e3:8.2f} ms")

    res = jax.jit(lambda u: model.residual(u, u, dt, data).ravel()[7])
    w = timeit(res, u, reps=reps)
    print(f"  residual                        {w*1e3:8.2f} ms")

    asm = jax.jit(
        lambda u: model.assemble_stencil(u, u, dt, data).diag.ravel()[7])
    w = timeit(asm, u, reps=reps)
    print(f"  assemble stencil                {w*1e3:8.2f} ms")

    def setup(u):
        st = model.assemble_stencil(u, u, dt, data)
        pcs = cpr_setup(st, pc_cfg)
        return jax.tree.leaves(pcs)[0].ravel()[0]
    w = timeit(jax.jit(setup), u, reps=reps)
    print(f"  assemble + cpr_setup            {w*1e3:8.2f} ms")

    def setup_apply(u, k):
        st = model.assemble_stencil(u, u, dt, data)
        pcs = cpr_setup(st, pc_cfg)
        r = model.residual(u, u, dt, data)
        def body(i, r):
            return cpr_apply(pcs, r, pc_cfg) * (1.0 + 1e-30 * i)
        out = jax.lax.fori_loop(0, k, body, r)
        return out.ravel()[7]
    for k in (1, 4):
        w = timeit(jax.jit(lambda u, k=k: setup_apply(u, k)), u, reps=reps)
        print(f"  assemble + setup + {k} applies    {w*1e3:8.2f} ms")

    # one full production Newton iteration at forced ksp budgets: the
    # slope in k is the Krylov per-iteration cost at this scale, the
    # intercept (minus the parts above) is line search + chop + misc
    for k in (1, 3, 6):
        cfg = dataclasses.replace(
            ncfg, rtol=1e-30, atol=0.0, ksp_rtol=1e-30, ksp_ew=False,
            ksp_maxiter=k, max_iters=1, max_backtracks=1)
        step = jax.jit(make_step_fn(model, "cptr", cfg, pc_cfg))
        def one(u, step=step):
            _, st = step(u, dt, data)
            return st.ksp_iters
        w = timeit(one, u, reps=reps)
        print(f"  1 Newton iter, ksp={k}            {w*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

"""Fused stage-2 RBGS kernel: at-scale exactness + wall on axon.

Ledger discipline (BASELINE.md): any new Pallas program shape must be
verified at ~1M-cell scale standalone AND inside a while_loop with
in-loop-assembled coefficients before production use.  This probe runs
the full-SPE10 production CPTR apply with ``stage2_pallas`` on/off:

  (a) standalone jit: max|Δ| of the two cpr_apply results;
  (b) in-loop (3 evolving iterations, stencil reassembled per iteration);
  (c) fori_loop slope of ms/apply for both (the wall A/B).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_s2fused.py [reps=5]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")


def main():
    from thermalporous_tpu.precond.cpr import cpr_apply, cpr_setup
    from thermalporous_tpu.presets import tp_spe10_full
    from thermalporous_tpu.solve import Simulator

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    case = tp_spe10_full()
    model, data = case.model, case.data
    dtype = jnp.float32
    data = jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a, data)
    sim = Simulator(model, data, precond="cptr", newton_cfg=case.newton_cfg,
                    pc_cfg=case.pc_cfg)
    u = model.initial_state(data, dtype=dtype)
    dt = 600.0
    for _ in range(3):
        u_new, stats = sim.step(u, dt)
        assert bool(jax.device_get(stats).converged)
        u, dt = u_new, dt * 2.0
    dt_j = jnp.asarray(38400.0, dtype)
    pc_ref = sim.pc_cfg
    pc_fus = dataclasses.replace(pc_ref, stage2_pallas=True)

    @jax.jit
    def build(u):
        return (model.residual(u, u, dt_j, data),
                model.assemble_stencil(u, u, dt_j, data))

    f, st = build(u)

    # (a) standalone
    @jax.jit
    def standalone(st, f):
        pr = cpr_setup(st, pc_ref)
        pf = cpr_setup(st, pc_fus)
        zr = cpr_apply(pr, f, pc_ref)
        zf = cpr_apply(pf, f, pc_fus)
        return jnp.max(jnp.abs(zr - zf)), jnp.max(jnp.abs(zr))
    d, r = jax.device_get(standalone(st, f))
    print(f"standalone: max|Δ|={d:.3e} max|ref|={r:.3e} "
          f"rel={d / max(r, 1e-30):.3e}", flush=True)

    # (b) in-loop with evolving state
    @jax.jit
    def inloop(u):
        def body(c):
            i, u, acc = c
            stl = model.assemble_stencil(u, u, dt_j, data)
            rl = model.residual(u, u, dt_j, data)
            pr = cpr_setup(stl, pc_ref)
            pf = cpr_setup(stl, pc_fus)
            zr = cpr_apply(pr, rl, pc_ref)
            zf = cpr_apply(pf, rl, pc_fus)
            u = u + 1e-6 * zr.astype(u.dtype)
            return (i + 1, u, jnp.maximum(acc, jnp.max(jnp.abs(zr - zf))
                                          / jnp.maximum(jnp.max(jnp.abs(zr)),
                                                        1e-30)))
        def cond(c):
            return c[0] < 3
        _, _, rel = jax.lax.while_loop(cond, body,
                                       (0, u, jnp.zeros((), dtype)))
        return rel
    rel = float(jax.device_get(inloop(u)))
    print(f"in-loop rel (3 evolving iters): {rel:.3e}", flush=True)

    # (c) wall slope
    def timeit(fn, *a):
        out = fn(*a)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.device_get(fn(*a))
        return (time.perf_counter() - t0) / reps

    for tag, pc in (("jnp-rbgs", pc_ref), ("fused-rbgs", pc_fus)):
        def k_applies(st, f, k, pc=pc):
            pcs = cpr_setup(st, pc)
            def body(i, r):
                return cpr_apply(pcs, r, pc) * (1.0 + 1e-30 * i)
            return jax.lax.fori_loop(0, k, body, f).ravel()[7]
        w2 = timeit(jax.jit(lambda st, f: k_applies(st, f, 2)), st, f)
        w10 = timeit(jax.jit(lambda st, f: k_applies(st, f, 10)), st, f)
        print(f"{tag:12s} {1e3 * (w10 - w2) / 8.0:6.2f} ms/apply",
              flush=True)


if __name__ == "__main__":
    main()

"""Decompose the CPTR apply at flagship scale: where do ~5.5 ms/apply go?

After the fused deep-cycle kernel removed the coarse-subtree launch storm
(-0.5 ms of ~6), the residual cost must live in the fine/upper levels or
stage 2.  This probe times, by fori_loop slope on the warmed full-SPE10
system (one jit + one device_get per variant, CLAUDE.md measurement
discipline):

  - full cpr_apply (control),
  - stage-1 pressure hierarchy alone (gmg_apply on the decoupled p block),
  - stage-1 temperature hierarchy alone,
  - stage-2 RBGS correction alone (incl. its residual block matvec),
  - the W decouple + block matvec bookkeeping (by subtraction),
  - fine-level deg-4 Chebyshev smooth alone (the L0 unit cost),

each under the production preset ± fuse_below.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_apply.py [reps=5] [fuse=40000]
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
    from thermalporous_tpu.precond.cpr import (
        _decoupling_weights,
        cpr_apply,
        cpr_setup,
    )
    from thermalporous_tpu.precond.gmg import gmg_apply, gmg_setup
    from thermalporous_tpu.precond.chebyshev import (
        block_red_black_gauss_seidel,
        chebyshev,
    )
    from thermalporous_tpu.presets import tp_spe10_full
    from thermalporous_tpu.solve import Simulator

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    fuse = int(sys.argv[2]) if len(sys.argv) > 2 else 40000

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
    base = sim.pc_cfg

    @jax.jit
    def build(u, dt, data):
        f = model.residual(u, u, dt, data)
        st = model.assemble_stencil(u, u, dt, data)
        return f, st

    f, st = build(u, dt_j, data)

    def timeit(fn, *a):
        out = fn(*a)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.device_get(fn(*a))
        return (time.perf_counter() - t0) / reps

    def slope(make_prog):
        w2 = timeit(jax.jit(lambda st, f: make_prog(st, f, 2)), st, f)
        w10 = timeit(jax.jit(lambda st, f: make_prog(st, f, 10)), st, f)
        return (w10 - w2) / 8.0

    def loop(k, fn, r0):
        def body(i, r):
            return fn(r) * (1.0 + 1e-30 * i)
        return jax.lax.fori_loop(0, k, body, r0).ravel()[7]

    for tag, pc in (
        ("prod", base),
        ("fuse", dataclasses.replace(
            base, gmg=dataclasses.replace(base.gmg, fuse_below=fuse),
            gmg_t=dataclasses.replace(base.gmg_t, fuse_below=fuse))),
    ):
        # full apply
        def p_full(st, f, k, pc=pc):
            pcs = cpr_setup(st, pc)
            return loop(k, lambda r: cpr_apply(pcs, r, pc), f)
        # pressure hierarchy alone
        def p_gp2(st, f, k, pc=pc):
            w = _decoupling_weights(st, pc)
            dec = st.scale_rows(w)
            g = gmg_setup(dec.scalar(0, 0), pc.gmg)
            return loop(k, lambda r: gmg_apply(g, r[0], pc.gmg)[None]
                        .repeat(3, 0), f)
        # temperature hierarchy alone
        def p_gt(st, f, k, pc=pc):
            w = _decoupling_weights(st, pc)
            dec = st.scale_rows(w)
            g = gmg_setup(dec.scalar(1, 1), pc.gmg_t)
            return loop(k, lambda r: gmg_apply(g, r[1], pc.gmg_t)[None]
                        .repeat(3, 0), f)
        # stage 2 alone (residual matvec + RBGS sweep)
        def p_s2(st, f, k, pc=pc):
            dinv = st.diag_inverse()
            def s2(r):
                r2 = r - st.matvec(r)
                return r + block_red_black_gauss_seidel(
                    st, dinv, r2, sweeps=pc.stage2_sweeps)
            return loop(k, s2, f)
        # stage 2 with the round-5 exact levers (cols-restricted residual
        # matvec + fused zero-start sweep with premasked D⁻¹ halves)
        def p_s2x(st, f, k, pc=pc):
            from thermalporous_tpu.precond.chebyshev import (
                _checkerboard,
                block_rbgs_fused_zero,
            )

            dinv = st.diag_inverse()
            red = _checkerboard(st.grid_shape, f.dtype)
            dr, db = red * dinv, (1.0 - red) * dinv
            def s2(r):
                r2 = r - st.matvec_cols(r[0:2], 2)
                return r + block_rbgs_fused_zero(st, dr, db, r2)
            return loop(k, s2, f)
        # fine-level deg-4 chebyshev smooth alone (p block, L0)
        def p_smooth(st, f, k, pc=pc):
            w = _decoupling_weights(st, pc)
            dec = st.scale_rows(w)
            app = dec.scalar(0, 0)
            from thermalporous_tpu.precond.chebyshev import (
                gershgorin_lambda_max,
            )
            lam = gershgorin_lambda_max(app)
            return loop(k, lambda r: chebyshev(
                app, r[0], None, degree=pc.gmg.degree, lam_max=lam)[None]
                .repeat(3, 0), f)

        print(f"# --- {tag}")
        for name, prog in (("full cpr_apply", p_full),
                           ("gmg_p alone", p_gp2),
                           ("gmg_t alone", p_gt),
                           ("stage2 rbgs", p_s2),
                           ("stage2 rbgs cols+fused", p_s2x),
                           ("L0 deg-4 smooth (p)", p_smooth)):
            s = slope(prog)
            print(f"  {name:24s} {s*1e3:7.2f} ms/apply", flush=True)


if __name__ == "__main__":
    main()

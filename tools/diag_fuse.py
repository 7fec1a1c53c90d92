"""Fused deep-cycle kernel exactness probe on the axon TPU at full scale.

The miscompile ledger (BASELINE.md round-3) demands that any new program
shape be verified at ~1M-cell scale BOTH out-of-loop and INSIDE a
while_loop (the Newton in-step shape) before production use — several
exact-elsewhere lowerings compute garbage only in that regime.  This
probe builds the production full-SPE10 CPTR hierarchy, then compares
`_coarse_correction` with ``fuse_below`` against the unfused recursion:

  (a) standalone jit, entry level and one level deeper;
  (b) inside a 3-iteration lax.while_loop with the stencil REASSEMBLED
      in-loop from an evolving state (the exact production pattern);
  (c) a full CPTR apply through cpr_apply with the fused config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_fuse.py \
          [fuse_below=40000] [--cpu]
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")


def main():
    from thermalporous_tpu.precond.cpr import (
        cpr_apply,
        cpr_setup,
        resolve_adaptive_coarsening,
    )
    from thermalporous_tpu.precond.gmg import _coarse_correction, gmg_setup
    from thermalporous_tpu.presets import tp_spe10_full
    from thermalporous_tpu.solve import Simulator

    fuse_below = int(sys.argv[1]) if len(sys.argv) > 1 else 40000

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
    gmg_f = dataclasses.replace(base.gmg, fuse_below=fuse_below)
    print(f"# fuse_below={fuse_below}; schedule {base.gmg.level_factors}")

    # ---- (a) standalone: correction at the first fusable level
    @jax.jit
    def probe_levels(u):
        st = model.assemble_stencil(u, u, dt_j, data)
        app = st.scalar(0, 0)  # pressure block (undecoupled: same shapes)
        state = gmg_setup(app, base.gmg)
        outs = []
        import math as _m
        for lev in range(1, len(state.stencils) - 1):
            if _m.prod(state.stencils[lev].grid_shape) > fuse_below:
                continue
            rc = state.stencils[lev].diag * 1e-7  # deterministic rhs
            ref = _coarse_correction(state, lev, rc, base.gmg)
            fused = _coarse_correction(state, lev, rc, gmg_f)
            outs.append((jnp.max(jnp.abs(ref - fused)),
                         jnp.max(jnp.abs(ref))))
        return outs

    for i, (d, r) in enumerate(jax.device_get(probe_levels(u))):
        print(f"  standalone fusable level {i}: max|Δ|={d:.3e} "
              f"max|ref|={r:.3e}  rel={d / max(r, 1e-30):.3e}")

    # ---- (b) in-loop: evolving state, stencil assembled inside the loop
    pc_ref = base
    pc_fused = dataclasses.replace(
        base, gmg=gmg_f,
        gmg_t=None if base.gmg_t is None else dataclasses.replace(
            base.gmg_t, fuse_below=fuse_below))

    @jax.jit
    def inloop(u):
        def body(c):
            i, u, acc_ref, acc_fus = c
            st = model.assemble_stencil(u, u, dt_j, data)
            r = model.residual(u, u, dt_j, data)
            pr = cpr_setup(st, pc_ref)
            pf = cpr_setup(st, pc_fused)
            zr = cpr_apply(pr, r, pc_ref)
            zf = cpr_apply(pf, r, pc_fused)
            u = u + 1e-6 * zr.astype(u.dtype)
            return (i + 1, u,
                    jnp.maximum(acc_ref, jnp.max(jnp.abs(zr - zf))),
                    jnp.maximum(acc_fus, jnp.max(jnp.abs(zr))))

        def cond(c):
            return c[0] < 3

        _, _, dmax, rmax = jax.lax.while_loop(
            cond, body, (0, u, jnp.zeros((), dtype), jnp.zeros((), dtype)))
        return dmax, rmax

    d, r = jax.device_get(inloop(u))
    print(f"  in-loop CPTR apply (3 evolving iters): max|Δ|={d:.3e} "
          f"max|ref|={r:.3e}  rel={d / max(r, 1e-30):.3e}")


if __name__ == "__main__":
    main()

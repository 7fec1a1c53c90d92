"""Bisect the axon in-step weighted-transfer miscompute.

Symptom (round 3): `transfer="weighted"` CPTR runs perfectly on CPU
in-step and (to be confirmed) standalone on the chip, but IN-STEP on
axon at full-SPE10 scale FGMRES exits after one iteration from the very
first Newton step — the shape of a zeroed/garbage preconditioner output.

This tool compares, at the initial state (the failure needs no warmup):
  1. the CPTR-weighted apply z = M⁻¹r computed OUTSIDE any loop,
  2. the same computation INSIDE a 1-iteration lax.while_loop,
and when they differ, drills into the hierarchy: per-level coefficient
checksums (sum, absmax — device-side reductions, ONE device_get) of the
probed wide stencils, the transfer weights, and the coarse inverse,
in-loop vs out-of-loop.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_wp.py [case]
"""

from __future__ import annotations

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp


def main():
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.precond.cpr import (
        cpr_apply,
        cpr_setup,
        resolve_adaptive_coarsening,
    )
    from thermalporous_tpu.presets import get_case

    transfer = "weighted"
    if "--constant" in sys.argv:   # control: is the failure weighted-specific?
        transfer = "constant"
        sys.argv.remove("--constant")
    case_name = sys.argv[1] if len(sys.argv) > 1 else "tp_spe10_full"
    case = get_case(case_name)
    model, data = case.model, case.data
    dtype = jnp.float32
    data = jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        data,
    )
    u = model.initial_state(data, dtype=dtype)
    dt = jnp.asarray(600.0, dtype)

    pc_cfg = CPRConfig(
        stage2="rbgs",
        gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                      coarsen="adaptive", degree=4, transfer=transfer),
    )
    st0 = model.assemble_stencil(u, u, dt, data)
    pc_cfg = resolve_adaptive_coarsening(st0, pc_cfg)
    print("schedule:", pc_cfg.gmg.level_factors)

    r = model.residual(u, u, dt, data)

    def checks(u, dt, data, r):
        st = model.assemble_stencil(u, u, dt, data)
        pcs = cpr_setup(st, pc_cfg)
        z = cpr_apply(pcs, r, pc_cfg)
        out = {
            "z_absmax": jnp.max(jnp.abs(z)).astype(jnp.float64),
            "z_sum": jnp.sum(z.astype(jnp.float64)),
            "cinv_absmax": jnp.max(jnp.abs(pcs.gmg_p.coarse_inv)).astype(
                jnp.float64
            ),
        }
        for l, s in enumerate(pcs.gmg_p.stencils):
            arr = s.coef if hasattr(s, "coef") else s.diag
            out[f"L{l}_absmax"] = jnp.max(jnp.abs(arr)).astype(jnp.float64)
            out[f"L{l}_sum"] = jnp.sum(arr.astype(jnp.float64))
            out[f"L{l}_lam"] = (
                pcs.gmg_p.lam_max[l].astype(jnp.float64)
                if l < len(pcs.gmg_p.lam_max) else jnp.asarray(0.0)
            )
        return out

    @jax.jit
    def outside(u, dt, data, r):
        return checks(u, dt, data, r)

    @jax.jit
    def inside(u, dt, data, r):
        def body(c):
            i, _ = c
            return (i + 1, checks(u, dt, data, r))

        zero = jax.tree.map(
            lambda a: jnp.zeros_like(a), jax.eval_shape(
                lambda: checks(u, dt, data, r))
        )
        _, out = jax.lax.while_loop(lambda c: c[0] < 1, body,
                                    (jnp.asarray(0), zero))
        return out

    ref = jax.device_get(outside(u, dt, data, r))
    loop = jax.device_get(inside(u, dt, data, r))
    print(f"{'key':16s} {'outside':>16s} {'in-loop':>16s}  flag")
    for k in sorted(ref):
        a, b = float(ref[k]), float(loop[k])
        rel = abs(a - b) / (abs(a) + 1e-300)
        flag = "" if rel < 1e-4 else "  ** DIFFERS **"
        print(f"{k:16s} {a:16.6e} {b:16.6e}{flag}")


if __name__ == "__main__":
    main()

"""In-step bisection probe for the round-5 stage-2 levers.

ab_cycle measured stage2_cols/stage2_fused EXACT standalone at full-SPE10
scale (59/65 iterations identical to control) — but the first fm-s2x
horizon step at dt=300 s failed in-step on axon.  The ledgered miscompile
families live INSIDE the Newton while_loop, so this probe runs ONE
production step from u0 at dt=300 s for each lever combination and prints
Newton/ksp/convergence — run it on TPU and on CPU and compare.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_s2.py \
          [--cpu] [variants: ctrl cols fused both z yz]
"""

from __future__ import annotations

import dataclasses
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp


def main():
    from thermalporous_tpu.presets import tp_spe10_full
    from thermalporous_tpu.solve import Simulator

    args = list(sys.argv[1:])
    bench = "--bench" in args
    if bench:
        args.remove("--bench")
    names = args or ["ctrl", "cols", "fused", "both"]
    if bench:
        # the bench.py workload (1024² two-phase, block_jacobi stage 2) —
        # a DIFFERENT shape family from the verified 3D flagship, so the
        # cols lever needs its own in-step qualification here
        import dataclasses as dc

        import numpy as np

        from thermalporous_tpu.core import Grid
        from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
        from thermalporous_tpu.physics import PhysicalParams, Well
        from thermalporous_tpu.precond import CPRConfig, GMGConfig
        from thermalporous_tpu.solve import NewtonConfig

        n = 1024
        pp = PhysicalParams()
        grid = Grid(shape=(n, n), spacing=(5.0, 5.0), thickness=10.0)
        rngb = np.random.default_rng(11)
        kxb = 2e-13 * np.exp(0.5 * rngb.standard_normal(grid.shape))
        wellsb = [
            Well(cells=((0, 0),), control="bhp", p_bh=4.0e7, T_inj=420.0),
            Well(cells=((n - 1, n - 1),), control="bhp", p_bh=1.0e7),
        ]
        datab = make_problem_data(grid, pp, kx=kxb, phi=0.2, wells=wellsb,
                                  dtype=jnp.float32)
        ncfgb = NewtonConfig(rtol=1e-4, atol=2e-5, ksp_rtol=1e-2,
                             ksp_maxiter=24, max_iters=14, pc_lag="every",
                             krylov_op="stencil", ksp_basis="bf16",
                             ksp_orth="cgs2g")
        pcb = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                      degree=4),
                        gmg_t=GMGConfig(cycle_type="v",
                                        max_coarse_cells=1024, degree=2))
        case = type("C", (), dict(
            model=TwoPhaseModel(grid, pp, s_init=0.2), data=datab,
            newton_cfg=ncfgb, pc_cfg=pcb))
        model, data = case.model, case.data
        u0 = model.initial_state(data, dtype=jnp.float32)
    else:
        case = tp_spe10_full()
        model = case.model
        data = jax.tree.map(
            lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a,
            case.data)
        u0 = model.initial_state(data, dtype=jnp.float32)

    variants = {
        "ctrl": {},
        "cols": dict(stage2_cols=True),
        "fused": dict(stage2_fused=True),
        "both": dict(stage2_cols=True, stage2_fused=True),
        "z": dict(stage2_cols=True, stage2_axes=(2,)),       # looped form
        "yz": dict(stage2_cols=True, stage2_axes=(1, 2)),
        "j2": dict(stage2="jacobi2", stage2_cols=True),
        "bj": dict(stage2="block_jacobi", stage2_cols=True),
        # half-fused bisect arms (2026-08-20: "fused" miscompiles in-step
        # on axon — FGMRES dead from iteration 1 — while standalone AND
        # CPU in-step are exact; these isolate which half poisons):
        # fusedA = red half in the looped form (mask multiply + full
        # matvec of zeros), black half fused (premasked D⁻¹ + offdiag)
        "fusedA": dict(stage2_fused=True, _patch="A"),
        # fusedB = red half fused (premasked D⁻¹, elided matvec), black
        # half in the looped form (mask multiply + full matvec)
        "fusedB": dict(stage2_fused=True, _patch="B"),
    }
    # This probe's entire job is bisecting the MEASURED-UNSAFE configs the
    # ledger guard refuses (stage2_fused at scale) — disable the guard for
    # the probe process, loudly.
    import thermalporous_tpu.precond.cpr as cprmod
    cprmod._backend = lambda: f"probe[{jax.default_backend()}]"
    print(f"# ledger guards DISABLED for this probe "
          f"(real backend: {jax.default_backend()})", flush=True)

    import importlib

    # the precond package re-exports a FUNCTION named `chebyshev`, which
    # shadows the submodule on attribute-style imports
    chb = importlib.import_module("thermalporous_tpu.precond.chebyshev")
    from thermalporous_tpu.core.stencil import apply_blocks
    orig_fused = chb.block_rbgs_fused_zero

    def fused_a(st, dr, db, b, axes=None):
        red = chb._checkerboard(st.grid_shape, b.dtype)
        dinv = dr + db              # disjoint masks: exact reconstruction
        x_red = red * apply_blocks(dinv, b - st.matvec(jnp.zeros_like(b)))
        return x_red + apply_blocks(db, b - st.matvec_offdiag(x_red))

    def fused_b(st, dr, db, b, axes=None):
        black = 1.0 - chb._checkerboard(st.grid_shape, b.dtype)
        dinv = dr + db
        x_red = apply_blocks(dr, b)
        return x_red + black * apply_blocks(dinv, b - st.matvec(x_red))

    for name in names:
        over = dict(variants[name])
        patch = over.pop("_patch", None)
        chb.block_rbgs_fused_zero = (
            fused_a if patch == "A" else fused_b if patch == "B"
            else orig_fused)
        pc = dataclasses.replace(case.pc_cfg, **over)
        sim = Simulator(model, data, precond="cptr",
                        newton_cfg=case.newton_cfg, pc_cfg=pc)
        u, dt = u0, 300.0
        for k in range(2):
            u_new, st = sim.step(u, dt)
            s = jax.device_get(st)
            print(f"{name:6s} step{k} dt={dt:6.0f}  newton={int(s.iters):3d} "
                  f"ksp={int(s.ksp_iters):4d}  converged={bool(s.converged)} "
                  f"norm={float(s.norm):.3e}", flush=True)
            if not bool(s.converged):
                break
            u, dt = u_new, dt * 2.0


if __name__ == "__main__":
    main()

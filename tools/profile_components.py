"""Per-component TPU timings: jnp vs fused-Pallas paths on the bench workload.

Measures the hot components of one Newton-FGMRES-CPTR iteration at the
benchmark configuration (1024x1024 two-phase, f32) on whatever backend is
default (the real TPU chip under axon).  Every jitted call pays ~1.4 ms
axon relay dispatch, so each component is iterated CHAIN times inside one
jit with a carry-dependency that defeats loop-invariant hoisting; reported
numbers are per-application.

Usage: python tools/profile_components.py [n] [chain]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return name, best, out


def chain(fn, k):
    """x -> iterate x = g(fn(x), x) k times; forces k dependent applications."""

    def run(u, *args):
        def body(_, x):
            y = fn(x, *args)
            return x + 1e-30 * y
        return jax.lax.fori_loop(0, k, body, u)

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from thermalporous_tpu.core import Grid
    from thermalporous_tpu.models import TwoPhaseModel, make_problem_data
    from thermalporous_tpu.physics import PhysicalParams, Well
    from thermalporous_tpu.precond import CPRConfig, GMGConfig
    from thermalporous_tpu.precond.cpr import cpr_apply, cpr_setup
    from thermalporous_tpu.precond.gmg import gmg_setup, gmg_apply
    from thermalporous_tpu.kernels.residual_pallas import (
        fused_jvp,
        fused_residual,
        supported,
    )
    from thermalporous_tpu.kernels import stencil_pallas as sp
    from thermalporous_tpu.precond.chebyshev import chebyshev

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

    u0 = model.initial_state(data, dtype=dtype)
    u = u0 + jnp.asarray(
        1e4 * rng.standard_normal(u0.shape), dtype
    ) * jnp.asarray([1.0, 1e-3, 1e-9], dtype).reshape(3, 1, 1)
    dt = jnp.asarray(600.0, dtype)
    v = jnp.asarray(rng.standard_normal(u0.shape), dtype)

    print(f"# backend={jax.default_backend()} grid={n}x{n} dtype={dtype.__name__} chain={k}")
    rows = []

    def report(name, fn, *args):
        nm, t, _ = timed(name, chain(fn, k), *args)
        rows.append((nm, t / k * 1e3))
        print(f"{nm:40s} {t / k * 1e3:8.3f} ms")

    # --- residual ---
    report("residual jnp", lambda x: model.residual(x, u0, dt, data), u)
    if supported(model, dtype):
        report("residual pallas", lambda x: fused_residual(model, x, u0, dt, data), u)

    # --- jvp ---
    report("jvp jnp", lambda x: model.jvp(u, u0, dt, data)(x), v)
    if supported(model, dtype):
        report("jvp pallas", lambda x: fused_jvp(model, u, x, u0, dt, data), v)

    # --- stencil assembly ---
    def asm(x):
        st = model.assemble_stencil(x, u0, dt, data)
        return st.diag[0]  # dependency carrier

    report("assemble_stencil", asm, u)

    # --- CPTR setup/apply ---
    st = jax.jit(lambda x: model.assemble_stencil(x, u0, dt, data))(u)
    st = jax.block_until_ready(st)
    for gmg_pallas in (False, True):
        cfg = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                      use_pallas=gmg_pallas))
        tag = "pallas" if gmg_pallas else "jnp"

        # NOTE: big operands are passed as traced ARGUMENTS, never closure
        # constants — captured concrete arrays overflow the axon compile
        # relay (HTTP 413; CLAUDE.md environment traps).
        def setup_dep(x, s):
            s2 = jax.tree.map(lambda a: a, s)
            s2.diag = s2.diag + 0.0 * x[0]  # carry dependency
            state = cpr_setup(s2, cfg)
            return state.gmg_p.coarse_inv[0, 0] + jnp.zeros_like(x[0])

        report(f"cptr setup ({tag})", setup_dep, u[0:1], st)

        state = jax.jit(lambda s: cpr_setup(s, cfg))(st)
        state = jax.block_until_ready(state)
        report(f"cptr apply ({tag})", lambda r, s: cpr_apply(s, r, cfg), v, state)

    # --- GMG components on the decoupled pressure stencil ---
    cfg0 = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024))
    state = jax.block_until_ready(jax.jit(lambda s: cpr_setup(s, cfg0))(st))
    app = state.gmg_p.stencils[0]
    lam = state.gmg_p.lam_max[0]
    r = v[0]
    report("gmg matvec L0 jnp", lambda x, a: a.matvec(x), r, app)
    report("gmg matvec L0 pallas", lambda x, a: sp.matvec(a, x), r, app)
    report("cheb smooth L0 jnp",
           lambda x, a: chebyshev(a, x, None, degree=2, lam_max=lam), r, app)
    report("cheb smooth L0 pallas",
           lambda x, a: sp.chebyshev_smooth(a, x, None, lam, degree=2), r, app)
    report("gmg kcycle (p) jnp",
           lambda x, g: gmg_apply(g, x, cfg0.gmg), r, state.gmg_p)
    cfgp = CPRConfig(gmg=GMGConfig(cycle_type="k", max_coarse_cells=1024,
                                   use_pallas=True))
    report("gmg kcycle (p) pallas",
           lambda x, g: gmg_apply(g, x, cfgp.gmg), r, state.gmg_p)

    print("\n# summary (per-application ms)")
    for nm, ms in rows:
        print(f"{nm:40s} {ms:8.3f}")


if __name__ == "__main__":
    main()

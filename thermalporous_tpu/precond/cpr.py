"""CPR / CPTR two-stage preconditioners — the scientific core.

TPU-native rebuild of the reference's ``thermalporous/preconditioners.py``
(upstream, unverified — SURVEY.md §2.8), the custom PCBase classes behind
papers arXiv:1812.11566 (CPR) and arXiv:1907.04229 (CPTR):

  M⁻¹ r = x₁ + M₂⁻¹ (r − A x₁),   x₁ = P · stage1(R · W · r)

- **decoupling** W: per-cell block scaling of the equations.  Default is
  the full diagonal-block inverse (alternate-block-factorization form; the
  reference's Quasi-IMPES/True-IMPES row weightings are cheaper specials of
  the same idea — variants kept as config for iteration-count ablations).
- **stage 1 (CPR)**: one geometric-multigrid V-cycle on the decoupled
  pressure stencil (the BoomerAMG role).
- **stage 1 (CPTR)**: block-triangular solve of the (p,T) 2×2 subsystem —
  V-cycle on p, correct the T residual through the T←p coupling, V-cycle on
  T.  This is the [P2] contribution: temperature is parabolic/advective and
  needs its own multigrid treatment.
- **stage 2**: per-cell block-Jacobi with exact nc×nc inverses (the
  TPU-parallel stand-in for ILU(0), which is inherently sequential).

Everything here is stencil algebra on dense per-cell blocks: setup is a few
VPU passes per Newton iteration, apply is a handful of stencil matvecs.
"""

from __future__ import annotations

import dataclasses
import math
import warnings

import jax
import jax.numpy as jnp

from thermalporous_tpu.core.stencil import BlockStencil, ScalarStencil, apply_blocks
from thermalporous_tpu.precond.gmg import (
    GMGConfig,
    GMGState,
    gmg_apply,
    gmg_setup,
    plan_coarsening,
)


@dataclasses.dataclass(frozen=True)
class CPRConfig:
    """Static configuration of the two-stage preconditioner."""

    variant: str = "cptr"            # "cpr" | "cptr"
    # stage-2 smoother on the full system (the reference's ILU(0)/bjacobi
    # role): "block_jacobi" (per-cell exact block solve), "jacobi2"
    # (TWO-step block-Jacobi Richardson: x = D⁻¹r₂; x += ω·D⁻¹(r₂ − A·x)
    # — round 5: matches one RBGS sweep's correction quality class at
    # 81 coefficient fields instead of 189+ (no masks, no zero-start
    # matvec), and lives in the long-verified matvec+block-apply program
    # family where EVERY rbgs variation miscompiles in-step on axon at
    # scale — BASELINE.md round-5 ledger), "rbgs"
    # (red-black block Gauss-Seidel — propagates transport corrections a
    # cell per color pass, the closer ILU analog), "zebra" (red-black
    # BLOCK line solves along stage2_axis — the dt=76.8 ks full-SPE10
    # wall is the (p,T,S) COUPLING needing O(100)-cell propagation along
    # channels, which point smoothers carry one cell per sweep and exact
    # line solves carry across the whole line; tools/diag_hard.py,
    # BASELINE.md round-3 ledger), "bgmg" (coupled block geometric
    # multigrid on the FULL system — Galerkin block coarsening + block
    # RBGS smoothing + dense coupled coarse solve, precond/block_gmg.py:
    # the coarse-grid correction that carries the long-range coupling
    # modes point/line smoothers cannot), "none"
    stage2: str = "block_jacobi"
    stage2_sweeps: int = 1           # rbgs/zebra sweeps
    # stage2="rbgs" only: run the one-sweep RBGS correction through the
    # fused banded Pallas kernel (kernels.fused_block_rbgs) — ONE stream
    # of the 63-field coefficient array instead of two (the in-loop
    # matvec of each half-sweep; the first is algebraically removable but
    # its unrolled jnp form miscompiles on axon — BASELINE.md round-4
    # ledger).  3D + sweeps=1 only; transparent jnp fallback elsewhere.
    stage2_pallas: bool = False
    # Exact stage-2 traffic levers (VERDICT r4 next-#1, round 5).  Both are
    # BIT-exact reformulations (proofs in core/stencil.py matvec_cols /
    # precond/chebyshev.py block_rbgs_fused_zero):
    # stage2_cols — the stage-2 residual r − A·x₁ streams only the block
    #   COLUMNS x₁ is supported on (0:2 for CPTR, 0:1 for CPR) when
    #   s_stage == "none" leaves the trailing components of x₁ at zero;
    #   cuts 1/3 of that matvec's coefficient bytes.  DEFAULT ON since
    #   round 5: bit-exact everywhere by construction (it lives in the
    #   residual matvec's verified apply_blocks idiom, NOT the
    #   miscompile-prone masked-smoother neighborhood), in-step verified
    #   on axon at the 3D flagship AND the 2D 1024² bench shapes
    #   (tools/diag_s2.py; BASELINE.md round-5), +3.4% on the 8-day
    #   horizon / +1.7% on bench.  Disable only to reproduce historical
    #   pre-round-5 measurements (tp_spe10_inner does).
    stage2_cols: bool = True
    # stage2_fused — stage2="rbgs", first sweep only: zero-start sweep via
    #   setup-premasked D⁻¹ halves (the looped body's A·0 matvec and the
    #   black half's diag stream are elided; extra sweeps continue in the
    #   looped form).  Deliberately a different HLO shape from the
    #   family-5 ledger entry; qualify any new scale on axon first.
    stage2_fused: bool = False
    # stage2_axes — SPARSIFIED smoother operator (VERDICT r4 next-#1b,
    #   NOT exact): restrict the rbgs sweep's neighbour coupling to these
    #   grid axes (e.g. (2,) = z only, the SPE10 strong axis at ~30x
    #   horizontal transmissibility).  Works with the looped form (both
    #   half-sweeps' matvecs reduced) and the fused form (black half).
    #   Each omitted axis drops two 9-field coefficient streams per
    #   matvec; gate adoption on unchanged iteration counts (hard-system
    #   probe AND horizon).  None = full coupling.
    stage2_axes: tuple[int, ...] | None = None
    stage2_axis: int = 1             # zebra line axis (1 = SPE10 channel y)
    stage2_omega: float = 1.0        # zebra under-relaxation (stability at
                                     # extreme contrast; measured ledger in
                                     # BASELINE.md round-3)
    bgmg_coarse_cells: int = 256     # stage2="bgmg": coarsest-level size
    bgmg_cycles: int = 1             # stage2="bgmg": V-cycles per apply
    triangular: bool = True          # CPTR stage-1: triangular vs block-diagonal
    # Batch the p and T hierarchies through ONE vmapped GMG traversal
    # (requires triangular=False: the triangular form's T residual
    # correction depends on e_p, so the two K-cycles are inherently
    # sequential).  The adaptive schedule is planned once from the
    # pressure block, so both hierarchies are pytree-congruent and stack
    # leaf-wise; a batched traversal halves stage-1's op COUNT — the
    # fine-level ops are bandwidth-bound (no byte savings) but the
    # K-cycle's many coarse-level ops are latency-bound, where op count
    # is the cost.  When set, ``CPRState.gmg_p`` holds the stacked (2,·)
    # hierarchy and ``gmg_t`` is None.
    # MEASURED NEGATIVE (BASELINE.md round-3 (d)): slower per FGMRES
    # iteration than the sequential diag form at 1024² (the leading batch
    # axis pessimizes stencil layouts), and on the axon TPU at ~1M cells
    # the in-step trajectory COLLAPSES (same miscompile family as the
    # slice-view block() bug) while CPU at the same size and TPU at 512²
    # bit-match diag.  Keep off production paths at scale.
    batch_pt: bool = False
    # decoupling operator W ([P1] §4, [P2] §3):
    #   "qimpes" — Quasi-IMPES: eliminate only the last-unknown coupling of
    #              the other rows using the cell's diagonal block (DEFAULT,
    #              as in the reference; measured ~2x fewer FGMRES iterations
    #              than ABF on SPE10-class problems — full-block scaling
    #              spoils the pressure block's near-ellipticity)
    #   "timpes" — True-IMPES: same elimination with column sums over the
    #              whole stencil row (the reference's other variant)
    #   "abf"    — full diagonal-block inverse (alternate block factorization)
    decoupling: str = "qimpes"
    # [P2] §5 option: run a few inner iterations on the decoupled (p,T)
    # subsystem in stage 1 (preconditioned by the block-triangular GMG
    # combination) instead of a single application.  0 = single pass (the
    # default two-stage CPTR); k>0 = k inner iterations.
    inner_iters: int = 0
    inner_rtol: float = 1e-2
    # "fgmres" is [P2]'s literal variant; "richardson" iterates
    # z ← z + M(r − A·z) — same subspace idea without a nested Krylov
    # solver, which matters on axon: the triple-nested fgmres
    # (inner-fgmres inside the preconditioner inside the outer fgmres's
    # while_loop) miscomputes at full-SPE10 size (docs/parity.md caveat),
    # while the stationary form avoids that pattern.
    inner_method: str = "fgmres"
    # SATURATION stage (round-3 extension, "CPTRS"): a third leg of the
    # block-triangular stage 1 — after the (p,T) solves, the S residual
    # is corrected through the S←(p,T) couplings and the decoupled scalar
    # S-S operator is smoothed directly.  Round-3 verdict on the dt=76.8
    # ks full-SPE10 wall it was built for (tools/diag_hard.py): every
    # DECOUPLED row is easy standalone (p 6, T 8, S 1–3 FGMRES
    # iterations) while the full system needs ~97 — the wall is the
    # (p,T,S) COUPLING, so this leg is measured iteration-neutral there
    # (96 vs 97; CPU == TPU decomposition) and stays off by default.  The
    # coupling-targeted lever is stage2="zebra" above.  "rbgs" | "jacobi"
    # | "zebra"/"line" (batched-Thomas line solves along s_axis) | "none".
    s_stage: str = "none"
    s_sweeps: int = 2
    s_axis: int = 0
    # Storage dtype of the PC-internal coefficient arrays ("f32" | "bf16").
    # The roofline (BASELINE.md round 3) puts the CPTR apply at 716 MiB per
    # FGMRES iteration — the #2 traffic term after CGS2 basis streaming —
    # and almost all of it is streaming stencil coefficients (GMG level
    # stencils under deg-4 Chebyshev, the stage-2 block stencil, W, D⁻¹).
    # "bf16" computes the SETUP in full precision and then casts only the
    # stored coefficients; every apply still runs f32 vector arithmetic
    # (bf16 coef × f32 vec promotes to f32), so this halves the PC's HBM
    # traffic at a ~0.4% coefficient rounding that FGMRES absorbs (the PC
    # is flexible-preconditioning territory; the Krylov operator and true
    # residual stay full-precision in solve/newton.py).  Exceptions kept
    # full precision: the coarsest-level dense inverse (latency- not
    # bandwidth-bound), Chebyshev λ estimates (scalars), the zebra
    # block-Thomas factorization (a sequential recurrence that compounds
    # rounding), and weighted-transfer weights.
    pc_dtype: str = "f32"
    gmg: GMGConfig = GMGConfig()
    # Separate GMG configuration for the TEMPERATURE hierarchy (CPTR
    # stage 1 only; None = use ``gmg`` for both).  Motivation (round-3
    # flagship decomposition, BASELINE.md): the CPTR apply is ~6 ms at
    # full-SPE10 scale — 6× its traffic bound — because the K-cycle's
    # 2-recursive coarse solves visit deep (latency-bound) levels
    # 2^(L−1) times, for BOTH hierarchies.  But the decoupled T system
    # is diffusion-dominated and measured EASY standalone (8 FGMRES
    # iterations where the full system needs ~97 — tools/diag_hard.py),
    # so it does not need the pressure hierarchy's K-cycle robustness: a
    # V-cycle / lower degree here removes about half the deep-level
    # kernel storm.  Incompatible with ``batch_pt`` (stacked traversal
    # requires congruent hierarchies).
    gmg_t: GMGConfig | None = None


# ------------------------------------------------- axon miscompile guards
#
# Four program shapes are MEASURED to silently compute wrong answers on the
# axon TPU backend at ~1M-cell scale (BASELINE.md round-3 "axon miscompile
# ledger"; each verified exact on CPU at the same size and on TPU at 512²).
# Documentation alone proved one preset edit away from a silent
# wrong-answer path (VERDICT r3 weak-#1), so the statically-decidable
# combinations are refused here at step-construction/setup time.

#: cell count at/above which the ledgered miscompiles were observed
#: (collapse measured at 1024² = 1.05M cells; 512² = 262k verified exact)
LEDGER_SCALE_CELLS = 500_000

#: grid shapes MEASURED to compute wrong numerics in-step on axon (the
#: sixth, grid-shape-dependent family): the inert-padded flagship stalls
#: Newton at these nz (16 N at the KSP cap; CPU same scale/dtype
#: converges in 4 N/5 ksp) while nz=85/96/112 are exact — round-5
#: bisection, BASELINE.md.  Qualify any NEW shape at scale with
#: tools/qualify_shape.py before trusting it (the qualify protocol
#: bypasses this guard — its job is measuring suspect shapes).
KNOWN_BAD_SHAPES = {(60, 220, 120), (60, 220, 128)}


def _backend() -> str:
    """Current default backend (separated for tests to monkeypatch)."""
    return jax.default_backend()


def _tpu_at_scale(n_cells: int) -> bool:
    # the ledger entries were measured via the axon tunnel; the failures
    # are XLA:TPU/Mosaic lowering artifacts, so a native "tpu" backend is
    # conservatively included.  CPU (tests, oracles) is unaffected.
    # ASSUMPTION (ADVICE r4): the guard keys off the DEFAULT backend — a
    # process whose default is CPU but which explicitly places the jitted
    # step on a TPU device (jit(..., device=...) / jax.default_device)
    # bypasses it.  Probing non-default backends here is not safe (it can
    # hang on the axon tunnel when it is down), so that corner stays the
    # user's responsibility; every shipped entry point (bench, run_case,
    # horizon tools) runs with the TPU as the default backend.
    return n_cells >= LEDGER_SCALE_CELLS and _backend() in ("axon", "tpu")


def check_axon_ledger(
    n_cells: int,
    pc_lag: str = "every",
    krylov_op: str = "stencil",
    pc_cfg: "CPRConfig | None" = None,
    grid_shape: tuple[int, ...] | None = None,
) -> None:
    """Refuse (or warn on) measured-unsafe config combinations on axon/TPU.

    Called from ``solve.timeloop.make_step_fn`` once per step-function
    construction — every argument is static, so this is free under jit.
    Each branch cites its BASELINE.md ledger entry.
    """
    if not _tpu_at_scale(n_cells):
        return
    if grid_shape is not None and tuple(grid_shape) in KNOWN_BAD_SHAPES:
        raise ValueError(
            f"grid shape {tuple(grid_shape)} on the axon/TPU backend is a "
            "MEASURED member of the grid-shape-dependent miscompile family "
            "(in-step Newton stalls at the KSP cap while CPU converges — "
            "BASELINE.md round-4/-5 sixth-family bisection).  Use the "
            "unpadded (60, 220, 85) flagship or a QUALIFIED padded shape "
            "(96/112 measured exact); qualify new shapes with "
            "tools/qualify_shape.py."
        )
    if pc_cfg is not None:
        transfers = {pc_cfg.gmg.transfer} | (
            {pc_cfg.gmg_t.transfer} if pc_cfg.gmg_t is not None else set()
        )
        if pc_lag == "step" and "weighted" in transfers:
            raise ValueError(
                "pc_lag='step' with transfer='weighted' on the axon/TPU "
                "backend at >=0.5M cells assembles the weighted-transfer "
                "GMG setup OUTSIDE the Newton while_loop, which is "
                "measured to return an all-NaN hierarchy at full-SPE10 "
                "scale (BASELINE.md round-3 axon miscompile ledger; "
                "tools/diag_wp.py).  Use pc_lag='every' (in-loop setup is "
                "exact) or transfer='constant'/'variational'."
            )
        if pc_lag == "step" and "variational" in transfers:
            # shares the out-of-loop probing/setup program shape with the
            # measured-NaN weighted pair; unmeasured at scale, so refuse
            # conservatively rather than risk a silent wrong answer
            raise ValueError(
                "pc_lag='step' with transfer='variational' on the "
                "axon/TPU backend at >=0.5M cells shares the "
                "out-of-while_loop setup program shape with the "
                "measured-NaN weighted transfer (BASELINE.md round-3 "
                "ledger) and is conservatively refused.  Use "
                "pc_lag='every'."
            )
    if pc_cfg is not None and pc_cfg.stage2_fused:
        # SEVENTH ledger entry (round 5, 2026-08-20; an extension of
        # family 5): the fused zero-start RBGS sweep
        # (chebyshev.block_rbgs_fused_zero — premasked D⁻¹ halves, elided
        # A·0 matvec and black-half diag stream) measures EXACT standalone
        # on axon at full-SPE10 scale (ab_cycle: identical 59/65 iteration
        # counts, −4.8% wall) AND exact in-step on CPU — but IN-STEP on
        # axon the first flagship Newton step dies immediately (1 Newton /
        # 1 ksp, line search fails at norm ~1e-2; tools/diag_s2.py).  The
        # family-5 "masked half-sweep zero-start" poison is therefore NOT
        # specific to the unrolled mask-multiply form — the premasked-
        # coefficient formulation miscompiles identically.  Refuse at
        # scale; BASELINE.md round-5 ledger.
        raise ValueError(
            "stage2_fused=True on the axon/TPU backend at >=0.5M cells: "
            "the fused zero-start RBGS sweep computes WRONG numerics "
            "inside the Newton while_loop at full-SPE10 scale (exact "
            "standalone and on CPU — BASELINE.md round-5 ledger, "
            "tools/diag_s2.py).  Use stage2_cols (in-step verified) and "
            "the looped rbgs form."
        )
    if pc_cfg is not None and pc_cfg.stage2_axes is not None:
        # measured in the same round-5 probe session (tools/diag_s2.py
        # 'z' arm): even the LOOPED rbgs with a reduced-axes body matvec
        # — program-shape-wise a strict subset of the verified control —
        # dies identically in-step at flagship scale on axon (1 N/1 ksp).
        # The backend tolerates NO variation of the in-loop masked
        # stage-2 smoother at this scale; BASELINE.md round-5 ledger.
        raise ValueError(
            "stage2_axes on the axon/TPU backend at >=0.5M cells: the "
            "sparsified rbgs body matvec computes WRONG numerics inside "
            "the Newton while_loop at full-SPE10 scale (exact on CPU and "
            "standalone — BASELINE.md round-5 ledger, tools/diag_s2.py "
            "'z' arm).  Use the full-coupling looped form."
        )
    if pc_cfg is not None and pc_cfg.stage2_pallas:
        # parity of treatment with krylov_op='stencil_pallas' below
        # (ADVICE r4): the fused RBGS kernel is measured EXACT at
        # full-SPE10 scale in-loop, but it relies on a z-padded-to-128
        # lane layout on a backend with a grid-shape-dependent miscompile
        # family (BASELINE.md round-4 stage-2 saga + sixth family), and
        # it is wall-negative (7.84 vs 5.67 ms/apply) — flag its use
        # at scale loudly.
        warnings.warn(
            "stage2_pallas=True on the axon/TPU backend at >=0.5M cells: "
            "measured exact in-loop at full-SPE10 scale but wall-negative "
            "(BASELINE.md round-4 stage-2 ledger), and its padded lane "
            "layout is in the sixth (grid-shape-dependent) miscompile "
            "family's neighborhood — verify trajectories against the jnp "
            "form.",
            stacklevel=3,
        )
    if krylov_op == "stencil_pallas":
        # NOT an error: round-3 re-measurement found the production Newton
        # step exact under this operator (BASELINE.md "stencil_pallas
        # resolution") — but one combined-program probe shape still
        # miscomputes on axon and the config is wall-negative on the
        # doubling ramp, so its use at scale deserves a loud flag.
        warnings.warn(
            "krylov_op='stencil_pallas' on the axon/TPU backend at "
            ">=0.5M cells: measured exact under the round-3 production "
            "config but a combined matvec+CPTR probe shape miscomputes "
            "on axon and wall time is neutral-to-worse (BASELINE.md "
            "'stencil_pallas resolution').  Verify trajectories against "
            "krylov_op='stencil'.",
            stacklevel=3,
        )


def _cast_floats(dtype):
    """Tree-cast every floating leaf of a (possibly None) pytree."""

    def go(tree):
        if tree is None:
            return None
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree,
        )

    return go


def _impes_weights(d: jax.Array) -> jax.Array:
    """W eliminating the last-unknown column from all other equations.

    d: per-cell (nc, nc, *shape) blocks (the diagonal for Quasi-IMPES, the
    stencil column sums for True-IMPES).  For nc=2 the "last unknown" is T
    (single-phase CPR decoupling); for nc=3 it is S_w.
    """
    nc = d.shape[0]
    last = nc - 1
    dtype = d.dtype
    shape = d.shape[2:]
    eye = jnp.eye(nc, dtype=dtype).reshape((nc, nc) + (1,) * len(shape))
    w = jnp.broadcast_to(eye, d.shape)
    denom = d[last, last]
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    rows = []
    for i in range(nc):
        row = w[i]
        if i != last:
            row = row.at[last].set(-d[i, last] / safe)
        rows.append(row)
    return jnp.stack(rows)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CPRState:
    """Per-Newton-iteration preconditioner state (a pytree)."""

    stencil: BlockStencil            # original Jacobian stencil A
    dinv: jax.Array                  # per-cell inverse diagonal blocks (stage 2)
    w: jax.Array                     # per-cell decoupling blocks W (stage 1)
    gmg_p: GMGState                  # hierarchy on decoupled pressure block
    gmg_t: GMGState | None           # hierarchy on decoupled temperature block
    a_tp: ScalarStencil | None       # decoupled T-equation ← p-unknown coupling
    pt: BlockStencil | None          # decoupled (p,T) 2×2 stencil (inner GMRES)
    a_sp: ScalarStencil | None = None  # S-equation ← p coupling (s_stage)
    a_st: ScalarStencil | None = None  # S-equation ← T coupling (s_stage)
    a_ss: ScalarStencil | None = None  # S-S transport operator (s_stage)
    # block-Thomas factorization for stage2="zebra" (computed once per
    # setup; each apply reuses it for every color half-sweep)
    zebra_fac: tuple | None = None
    # coupled block hierarchy for stage2="bgmg" (precond/block_gmg.py)
    bgmg: object | None = None
    # setup-premasked D⁻¹ color halves for stage2_fused (red·D⁻¹, black·D⁻¹)
    dinv_red: jax.Array | None = None
    dinv_black: jax.Array | None = None


def _decoupling_weights(
    stencil: BlockStencil, cfg: CPRConfig, dinv: jax.Array | None = None
) -> jax.Array:
    if cfg.decoupling == "abf":
        return stencil.diag_inverse() if dinv is None else dinv
    if cfg.decoupling == "qimpes":
        return _impes_weights(stencil.diag)
    if cfg.decoupling == "timpes":
        colsum = stencil.diag
        for up, lo in zip(stencil.upper, stencil.lower):
            colsum = colsum + up + lo
        return _impes_weights(colsum)
    raise ValueError(f"unknown decoupling {cfg.decoupling!r}")


def resolve_adaptive_coarsening(
    stencil: BlockStencil, cfg: CPRConfig, theta: float = 0.25
) -> CPRConfig:
    """Bake the matrix-dependent coarsening schedule into ``cfg`` (host-side).

    When ``cfg.gmg.coarsen == "adaptive"`` and no ``level_factors`` schedule
    is set yet, decouple a CONCRETE Jacobian stencil (any representative
    state/Δt — the coupling ratios are geometry/permeability-driven), run
    :func:`plan_coarsening` on its pressure block, and return a config with
    the static schedule baked in.  Call once before jitting; no-op otherwise.
    """
    gmg_todo = (cfg.gmg.coarsen == "adaptive"
                and cfg.gmg.level_factors is None)
    gmg_t_todo = (cfg.gmg_t is not None
                  and cfg.gmg_t.coarsen == "adaptive"
                  and cfg.gmg_t.level_factors is None)
    if not (gmg_todo or gmg_t_todo):
        return cfg
    dec = stencil.scale_rows(_decoupling_weights(stencil, cfg))
    if gmg_todo:
        schedule = plan_coarsening(dec.scalar(0, 0), cfg.gmg, theta=theta)
        cfg = dataclasses.replace(
            cfg, gmg=dataclasses.replace(cfg.gmg, level_factors=schedule))
    if gmg_t_todo:
        # the T hierarchy plans from ITS OWN decoupled operator (conduction
        # anisotropy need not match the pressure block's)
        schedule_t = plan_coarsening(dec.scalar(1, 1), cfg.gmg_t, theta=theta)
        cfg = dataclasses.replace(
            cfg,
            gmg_t=dataclasses.replace(cfg.gmg_t, level_factors=schedule_t))
    return cfg


def cpr_setup(stencil: BlockStencil, cfg: CPRConfig = CPRConfig()) -> CPRState:
    if cfg.batch_pt and _tpu_at_scale(math.prod(stencil.grid_shape)):
        raise ValueError(
            "batch_pt=True on the axon/TPU backend at >=0.5M cells: the "
            "vmapped stacked-hierarchy traversal is measured to silently "
            "COLLAPSE the in-step trajectory at 1024^2 (CPU same-size and "
            "TPU 512^2 bit-match the sequential form) and is slower per "
            "iteration where sane — BASELINE.md round-3 axon miscompile "
            "ledger (d).  Use the default sequential p/T traversal."
        )
    dinv = stencil.diag_inverse()
    w = _decoupling_weights(stencil, cfg, dinv=dinv)
    dec = stencil.scale_rows(w)         # W·A
    app = dec.scalar(0, 0)
    gmg_p = gmg_setup(app, cfg.gmg)
    pt = None
    a_sp = a_st = a_ss = None
    if cfg.variant == "cptr":
        att = dec.scalar(1, 1)
        gmg_t = gmg_setup(att, cfg.gmg_t or cfg.gmg)
        a_tp = dec.scalar(1, 0)
        if cfg.batch_pt:
            if cfg.triangular:
                raise ValueError(
                    "batch_pt requires triangular=False: the triangular "
                    "T-residual correction depends on e_p, so the two "
                    "hierarchies cannot be traversed together")
            if cfg.gmg_t is not None:
                raise ValueError(
                    "batch_pt requires gmg_t=None: the stacked traversal "
                    "needs pytree-congruent p/T hierarchies")
            gmg_p = jax.tree.map(lambda *xs: jnp.stack(xs), gmg_p, gmg_t)
            gmg_t = None
        if cfg.inner_iters > 0:
            pt = dec.block(slice(0, 2), slice(0, 2))
        if cfg.s_stage != "none" and stencil.nc >= 3:
            a_sp = dec.scalar(2, 0)
            a_st = dec.scalar(2, 1)
            a_ss = dec.scalar(2, 2)
    else:
        gmg_t = None
        a_tp = None
    zebra_fac = None
    if cfg.stage2 == "zebra":
        from thermalporous_tpu.precond.chebyshev import block_tridiag_factor

        a = cfg.stage2_axis % len(stencil.grid_shape)
        zebra_fac = block_tridiag_factor(
            a, stencil.lower[a], stencil.diag, stencil.upper[a])
    bgmg = None
    if cfg.stage2 == "bgmg":
        from thermalporous_tpu.precond.block_gmg import block_gmg_setup

        bgmg = block_gmg_setup(
            stencil, cfg.gmg, max_coarse_cells=cfg.bgmg_coarse_cells)
    dinv_red = dinv_black = None
    if cfg.stage2 == "rbgs" and cfg.stage2_fused:
        from thermalporous_tpu.precond.chebyshev import _checkerboard

        red = _checkerboard(stencil.grid_shape, dinv.dtype)
        dinv_red, dinv_black = red * dinv, (1.0 - red) * dinv
    if cfg.pc_dtype != "f32":
        # Cast ONLY the stored coefficients (see CPRConfig.pc_dtype): setup
        # ran in full precision above, applies still do f32 vector math.
        # The selective groups exist to bisect quality loss: "bf16_gmg"
        # casts the stage-1 hierarchies only, "bf16_s2" the full-system
        # stage-2 stencil/D⁻¹ only, "bf16" everything.
        if cfg.pc_dtype not in ("bf16", "bf16_gmg", "bf16_s2"):
            raise ValueError(f"unknown pc_dtype {cfg.pc_dtype!r}")
        cast = _cast_floats(jnp.bfloat16)
        if cfg.pc_dtype in ("bf16", "bf16_s2"):
            stencil, dinv = cast(stencil), cast(dinv)
            dinv_red, dinv_black = cast(dinv_red), cast(dinv_black)
            if bgmg is not None:
                bgmg = dataclasses.replace(
                    bgmg, stencils=cast(bgmg.stencils),
                    dinvs=cast(bgmg.dinvs))
        if cfg.pc_dtype in ("bf16", "bf16_gmg"):
            a_tp = cast(a_tp)
            gmg_p = dataclasses.replace(gmg_p, stencils=cast(gmg_p.stencils))
            if gmg_t is not None:
                gmg_t = dataclasses.replace(
                    gmg_t, stencils=cast(gmg_t.stencils))
        if cfg.pc_dtype == "bf16":
            w, pt = cast(w), cast(pt)
            a_sp, a_st, a_ss = cast(a_sp), cast(a_st), cast(a_ss)
    return CPRState(
        stencil=stencil, dinv=dinv, w=w, gmg_p=gmg_p, gmg_t=gmg_t, a_tp=a_tp,
        pt=pt, a_sp=a_sp, a_st=a_st, a_ss=a_ss, zebra_fac=zebra_fac,
        bgmg=bgmg, dinv_red=dinv_red, dinv_black=dinv_black,
    )


def _s_smooth(a_ss: ScalarStencil, r_s: jax.Array, cfg: CPRConfig) -> jax.Array:
    """Approximate A_ss⁻¹ r_s with cfg.s_sweeps scalar smoother sweeps."""
    from thermalporous_tpu.precond.chebyshev import (
        line_jacobi,
        red_black_gauss_seidel,
        weighted_jacobi,
        zebra_line_gs,
    )

    if cfg.s_stage == "rbgs":
        return red_black_gauss_seidel(a_ss, r_s, None, sweeps=cfg.s_sweeps)
    if cfg.s_stage == "zebra":
        return zebra_line_gs(a_ss, r_s, None, axis=cfg.s_axis,
                             sweeps=cfg.s_sweeps)
    if cfg.s_stage == "line":
        return line_jacobi(a_ss, r_s, None, axis=cfg.s_axis,
                           sweeps=cfg.s_sweeps)
    if cfg.s_stage == "jacobi":
        return weighted_jacobi(a_ss, r_s, None, sweeps=cfg.s_sweeps)
    raise ValueError(f"unknown s_stage {cfg.s_stage!r}")


def _stage1_pt(state: CPRState, r_pt: jax.Array, cfg: CPRConfig) -> jax.Array:
    """Block-triangular (or -diagonal) GMG application on the (p,T) system."""
    if cfg.batch_pt:
        # gmg_p holds the stacked (2,·) hierarchy (see CPRConfig.batch_pt);
        # one vmapped traversal runs both block-diagonal K-cycles at once
        return jax.vmap(lambda s, b: gmg_apply(s, b, cfg.gmg))(
            state.gmg_p, r_pt)
    e_p = gmg_apply(state.gmg_p, r_pt[0], cfg.gmg)
    r_t = r_pt[1]
    if cfg.triangular:
        r_t = r_t - state.a_tp.matvec(e_p)
    e_t = gmg_apply(state.gmg_t, r_t, cfg.gmg_t or cfg.gmg)
    return jnp.stack([e_p, e_t])


def cpr_apply(state: CPRState, r: jax.Array, cfg: CPRConfig = CPRConfig()) -> jax.Array:
    """Apply M⁻¹ to a state-shaped residual r (nc, *grid)."""
    w = apply_blocks(state.w, r)        # decoupled residual W·r

    # stage 1 on the elliptic block(s)
    if cfg.variant == "cptr":
        r_pt = w[0:2]
        if cfg.inner_iters > 0 and cfg.inner_method == "richardson":
            # preconditioned Richardson on the (p,T) subsystem: one block
            # application + (k−1) defect corrections
            e_pt = _stage1_pt(state, r_pt, cfg)
            for _ in range(cfg.inner_iters - 1):
                d = r_pt - state.pt.matvec(e_pt)
                e_pt = e_pt + _stage1_pt(state, d, cfg)
        elif cfg.inner_iters > 0:
            # [P2]'s inner-iteration option: a few FGMRES steps on the
            # decoupled (p,T) subsystem, preconditioned by the single-pass
            # block combination (lazy import: solve ← precond at call time)
            from thermalporous_tpu.solve.fgmres import fgmres

            e_pt = fgmres(
                state.pt.matvec,
                r_pt,
                precond=lambda q: _stage1_pt(state, q, cfg),
                rtol=cfg.inner_rtol,
                maxiter=cfg.inner_iters,
            ).x
        else:
            e_pt = _stage1_pt(state, r_pt, cfg)
        x1 = jnp.zeros_like(r).at[0:2].set(e_pt)
        x1_active, k_active = e_pt, 2
        if state.a_ss is not None:
            # saturation leg of the triangular stage 1 (CPTRS): correct
            # the S residual through the S←(p,T) couplings, then smooth
            # the decoupled scalar transport operator directly
            r_s = (w[2] - state.a_sp.matvec(e_pt[0])
                   - state.a_st.matvec(e_pt[1]))
            e_s = _s_smooth(state.a_ss, r_s, cfg)
            x1 = x1.at[2].set(e_s)
            x1_active, k_active = None, None   # x₁ now has full support
    else:
        e_p = gmg_apply(state.gmg_p, w[0], cfg.gmg)
        x1 = jnp.zeros_like(r).at[0].set(e_p)
        x1_active, k_active = e_p[None], 1

    # stage 2: multiplicative smoother correction on the full system
    if cfg.stage2 == "none":
        return x1
    if cfg.stage2 not in ("block_jacobi", "jacobi2", "rbgs", "zebra",
                          "bgmg"):
        raise ValueError(f"unknown stage2 {cfg.stage2!r}")
    # stage-2 residual r − A·x₁: when x₁'s trailing components are zero
    # (s_stage == "none"), stream only the block columns it is supported
    # on — bit-exact (stencil.matvec_cols docstring; VERDICT r4 next-#1a)
    if (cfg.stage2_cols and k_active is not None
            and k_active < state.stencil.nc):
        r2 = r - state.stencil.matvec_cols(x1_active, k_active)
    else:
        r2 = r - state.stencil.matvec(x1)
    if cfg.stage2 == "block_jacobi":
        return x1 + apply_blocks(state.dinv, r2)
    if cfg.stage2 == "jacobi2":
        x2 = apply_blocks(state.dinv, r2)
        x2 = x2 + cfg.stage2_omega * apply_blocks(
            state.dinv, r2 - state.stencil.matvec(x2))
        return x1 + x2
    if cfg.stage2 == "rbgs":
        from thermalporous_tpu.precond.chebyshev import (
            block_red_black_gauss_seidel,
            block_rbgs_fused_zero,
        )

        if (cfg.stage2_pallas and cfg.stage2_sweeps == 1
                and len(state.stencil.grid_shape) == 3):
            from thermalporous_tpu.kernels import fused_block_rbgs

            return x1 + fused_block_rbgs(state.stencil, state.dinv, r2)
        if cfg.stage2_fused:
            x2 = block_rbgs_fused_zero(
                state.stencil, state.dinv_red, state.dinv_black, r2,
                axes=cfg.stage2_axes)
            if cfg.stage2_sweeps > 1:
                x2 = block_red_black_gauss_seidel(
                    state.stencil, state.dinv, r2, x=x2,
                    sweeps=cfg.stage2_sweeps - 1)
            return x1 + x2
        return x1 + block_red_black_gauss_seidel(
            state.stencil, state.dinv, r2, sweeps=cfg.stage2_sweeps,
            axes=cfg.stage2_axes,
        )
    if cfg.stage2 == "zebra":
        from thermalporous_tpu.precond.chebyshev import block_zebra_line_gs

        return x1 + block_zebra_line_gs(
            state.stencil, r2, axis=cfg.stage2_axis,
            sweeps=cfg.stage2_sweeps, omega=cfg.stage2_omega,
            factor=state.zebra_fac,
        )
    from thermalporous_tpu.precond.block_gmg import block_gmg_apply

    return x1 + block_gmg_apply(
        state.bgmg, r2, cfg.gmg,
        sweeps=cfg.stage2_sweeps, cycles=cfg.bgmg_cycles,
    )


# ---------------------------------------------------------------- registry

def make_preconditioner(name: str, cfg: CPRConfig | None = None):
    """Return (setup, apply) closures for a named preconditioner.

    Names mirror the reference's solver-parameter presets (SURVEY.md §2.1):
    "none", "jacobi" (per-cell block-Jacobi), "rbgs" (one-stage red-black
    block Gauss–Seidel, the TPU-parallel ILU-analog), "lu" (exact dense
    inverse — the reference's direct-LU preset; tiny grids only), "cpr",
    "cptr".
    """
    name = name.lower()
    if name == "none":
        return (lambda st: None, lambda state, r: r)
    if name == "lu":
        # the reference's `pc_type: lu` debugging preset: exact solve as the
        # preconditioner (FGMRES converges in 1 iteration).  Dense inverse,
        # not LU factors: triangular solves are sequential on TPU, inv·r is
        # one matmul.  O((nc·N)²) memory — guard against production misuse.
        def lu_setup(st):
            import math as _math

            n = st.nc * _math.prod(st.grid_shape)
            if n > 20000:
                raise ValueError(
                    f"'lu' preconditioner is dense ({n}² entries); use it "
                    "only on tiny grids (debugging/ablation, SURVEY.md §2.1)"
                )
            from thermalporous_tpu.precond.gmg import dense_inv

            return dense_inv(st.to_dense())

        def lu_apply(inv, r):
            return (inv @ r.reshape(-1)).reshape(r.shape)

        return (lu_setup, lu_apply)
    if name == "jacobi":
        return (
            lambda st: st.diag_inverse(),
            lambda dinv, r: apply_blocks(dinv, r),
        )
    if name == "rbgs":
        from thermalporous_tpu.precond.chebyshev import (
            block_red_black_gauss_seidel,
        )

        return (
            lambda st: (st, st.diag_inverse()),
            lambda state, r: block_red_black_gauss_seidel(
                state[0], state[1], r, sweeps=2
            ),
        )
    if name in ("cpr", "cptr"):
        cfg = cfg or CPRConfig()
        cfg = dataclasses.replace(cfg, variant=name)
        return (
            lambda st: cpr_setup(st, cfg),
            lambda state, r: cpr_apply(state, r, cfg),
        )
    raise ValueError(f"unknown preconditioner {name!r}")

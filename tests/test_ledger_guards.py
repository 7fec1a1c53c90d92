"""Guards derived from the measured axon miscompile ledger.

BASELINE.md's round-3 ledger documents config combinations that silently
compute wrong answers on the axon TPU backend at ~1M-cell scale.  These
tests assert the statically-decidable combinations are REFUSED at
step-construction/setup time (VERDICT r3 weak-#1 / next-round #2), that
the production presets are unaffected, and that CPU runs never trip them.

The suite runs on CPU, so the backend probe is monkeypatched to "axon".
"""

import dataclasses

import pytest

from thermalporous_tpu.precond import cpr
from thermalporous_tpu.precond.cpr import CPRConfig, check_axon_ledger
from thermalporous_tpu.precond.gmg import GMGConfig


@pytest.fixture
def axon_backend(monkeypatch):
    monkeypatch.setattr(cpr, "_backend", lambda: "axon")


FLAGSHIP_CELLS = 60 * 220 * 85  # full SPE10


def test_step_weighted_refused_at_scale(axon_backend):
    cfg = CPRConfig(gmg=GMGConfig(transfer="weighted"))
    with pytest.raises(ValueError, match="all-NaN"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_lag="step", pc_cfg=cfg)


def test_step_weighted_gmg_t_refused_at_scale(axon_backend):
    # the T hierarchy alone composing the unsafe pair must also be caught
    cfg = CPRConfig(gmg_t=GMGConfig(transfer="weighted"))
    with pytest.raises(ValueError, match="all-NaN"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_lag="step", pc_cfg=cfg)


def test_step_variational_refused_conservatively(axon_backend):
    cfg = CPRConfig(gmg=GMGConfig(transfer="variational"))
    with pytest.raises(ValueError, match="conservatively"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_lag="step", pc_cfg=cfg)


def test_every_weighted_allowed(axon_backend):
    # pc_lag="every" builds the hierarchy in-loop, which is measured exact
    cfg = CPRConfig(gmg=GMGConfig(transfer="weighted"))
    check_axon_ledger(FLAGSHIP_CELLS, pc_lag="every", pc_cfg=cfg)


def test_step_weighted_allowed_below_scale(axon_backend):
    cfg = CPRConfig(gmg=GMGConfig(transfer="weighted"))
    check_axon_ledger(262_144, pc_lag="step", pc_cfg=cfg)  # 512^2: exact


def test_step_weighted_allowed_on_cpu():
    cfg = CPRConfig(gmg=GMGConfig(transfer="weighted"))
    check_axon_ledger(FLAGSHIP_CELLS, pc_lag="step", pc_cfg=cfg)


def test_stencil_pallas_warns_at_scale(axon_backend):
    with pytest.warns(UserWarning, match="stencil_pallas"):
        check_axon_ledger(FLAGSHIP_CELLS, krylov_op="stencil_pallas")


def test_stage2_fused_refused_at_scale(axon_backend):
    # round-5 seventh ledger entry: the fused zero-start RBGS sweep is
    # exact standalone and on CPU but miscompiles in-step on axon at
    # full-SPE10 scale (tools/diag_s2.py; BASELINE.md round-5)
    cfg = CPRConfig(stage2="rbgs", stage2_fused=True)
    with pytest.raises(ValueError, match="stage2_fused"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_cfg=cfg)


def test_stage2_fused_allowed_below_scale_and_on_cpu(axon_backend):
    cfg = CPRConfig(stage2="rbgs", stage2_fused=True)
    check_axon_ledger(262_144, pc_cfg=cfg)          # below scale


def test_stage2_cols_allowed_at_scale(axon_backend):
    # the ADOPTED exact lever (in-step verified): must pass the guard
    from thermalporous_tpu.presets import tp_spe10_full

    cfg = CPRConfig(stage2="rbgs", stage2_cols=True)
    check_axon_ledger(FLAGSHIP_CELLS, pc_cfg=cfg)
    # and the production preset (which now carries it) stays guard-clean
    check_axon_ledger(FLAGSHIP_CELLS, pc_lag="every",
                      pc_cfg=tp_spe10_full().pc_cfg)


def test_stage2_pallas_warns_at_scale(axon_backend):
    # ADVICE r4: parity of treatment with krylov_op='stencil_pallas' —
    # the fused RBGS kernel's padded lane layout at scale gets a loud flag
    cfg = CPRConfig(stage2="rbgs", stage2_pallas=True)
    with pytest.warns(UserWarning, match="stage2_pallas"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_cfg=cfg)


def test_stage2_pallas_silent_below_scale_and_on_cpu():
    import warnings as _w

    cfg = CPRConfig(stage2="rbgs", stage2_pallas=True)
    with _w.catch_warnings():
        _w.simplefilter("error")
        check_axon_ledger(262_144, pc_cfg=cfg)   # below scale (CPU backend)
        check_axon_ledger(FLAGSHIP_CELLS, pc_cfg=cfg)  # CPU backend


def test_batch_pt_setup_refused_at_scale(axon_backend, rng):
    import jax.numpy as jnp

    from thermalporous_tpu.core.stencil import BlockStencil

    shape = (1024, 1024)  # the measured collapse size (static shapes only;
    # cpr_setup raises before touching array values, so zeros suffice)
    nc = 2
    z = jnp.zeros((nc, nc) + shape)
    st = BlockStencil(
        diag=z, upper=(z, z), lower=(z, z)
    )
    cfg = CPRConfig(batch_pt=True, triangular=False)
    with pytest.raises(ValueError, match="COLLAPSE"):
        cpr.cpr_setup(st, cfg)


def test_production_presets_pass_the_guard(axon_backend):
    # every named preset must construct its step guard-clean on axon —
    # EXCEPT the diagnostic padded preset, whose default nz=128 is the
    # canonical sixth-family repro and must now be REFUSED by shape
    from thermalporous_tpu.presets import PRESETS

    for name, factory in PRESETS.items():
        case = factory()
        import math

        args = dict(
            pc_lag=case.newton_cfg.pc_lag,
            krylov_op=case.newton_cfg.krylov_op,
            pc_cfg=case.pc_cfg,
            grid_shape=case.model.grid.shape,
        )
        n = math.prod(case.model.grid.shape)
        if name == "tp_spe10_padded":
            with pytest.raises(ValueError, match="miscompile family"):
                check_axon_ledger(n, **args)
        else:
            check_axon_ledger(n, **args)


def test_known_bad_shapes_refused(axon_backend):
    # round-5: the measured sixth-family shapes are refused statically...
    for shape in ((60, 220, 120), (60, 220, 128)):
        with pytest.raises(ValueError, match="miscompile family"):
            check_axon_ledger(60 * 220 * shape[2], grid_shape=shape)
    # ...while the qualified padded shapes and the flagship pass
    for shape in ((60, 220, 85), (60, 220, 96), (60, 220, 112)):
        check_axon_ledger(60 * 220 * shape[2], grid_shape=shape)


@pytest.mark.slow
def test_qualify_protocol_bypasses_shape_guard(axon_backend):
    # the qualify protocol must be able to MEASURE refused shapes (its
    # purpose); it patches the backend probe around step construction.
    # Build the tiny-case equivalent: Simulator on a bad shape via
    # qualify_steps must not raise at construction (run 0 steps).
    from thermalporous_tpu.presets import get_case
    from thermalporous_tpu.qualify import qualify_steps

    case = get_case("tp_spe10_padded", nz_pad=128)
    # steps=0: construction (where the guard fires) happens, no solves —
    # keeps the test cheap at the 1.7M-cell shape
    recs = qualify_steps(case, steps=0)
    assert recs == []


def test_make_step_fn_trips_the_guard(axon_backend):
    # the guard is wired into the step factory itself
    from thermalporous_tpu.presets import get_case
    from thermalporous_tpu.solve.timeloop import make_step_fn

    case = get_case("tp_spe10_full")
    bad_newton = dataclasses.replace(case.newton_cfg, pc_lag="step")
    bad_pc = dataclasses.replace(
        case.pc_cfg, gmg=dataclasses.replace(case.pc_cfg.gmg,
                                             transfer="weighted"))
    with pytest.raises(ValueError, match="all-NaN"):
        make_step_fn(case.model, case.precond, bad_newton, bad_pc)


def test_stage2_axes_refused_at_scale(axon_backend):
    # round-5: the looped sparsified smoother dies in-step at scale too
    # (diag_s2 'z' arm) — same refusal treatment
    cfg = CPRConfig(stage2="rbgs", stage2_axes=(2,))
    with pytest.raises(ValueError, match="stage2_axes"):
        check_axon_ledger(FLAGSHIP_CELLS, pc_cfg=cfg)


def test_stage2_axes_allowed_below_scale(axon_backend):
    cfg = CPRConfig(stage2="rbgs", stage2_axes=(2,))
    check_axon_ledger(262_144, pc_cfg=cfg)

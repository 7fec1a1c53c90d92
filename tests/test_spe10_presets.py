"""SPE10 data machinery + the five BASELINE case presets."""

import numpy as np
import pytest

from thermalporous_tpu.data import (
    MD_TO_M2,
    SPE10_SHAPE,
    load_spe10,
    synthetic_spe10,
)
from thermalporous_tpu.presets import PRESETS, get_case


def test_synthetic_spe10_statistics():
    f = synthetic_spe10(shape=(30, 60, 20), seed=1)
    assert f.kx.shape == (30, 60, 20)
    # SPE10-class contrast: many orders of magnitude
    contrast = f.kx.max() / f.kx.min()
    assert contrast > 1e5, f"contrast only {contrast:.1e}"
    # channelized lower section is more skewed than the smooth upper section
    upper = np.log10(f.kx[:, :, :10])
    lower = np.log10(f.kx[:, :, 10:])
    assert lower.std() > upper.std()
    assert (f.phi >= 0.01).all() and (f.phi <= 0.35).all()
    # deterministic
    f2 = synthetic_spe10(shape=(30, 60, 20), seed=1)
    np.testing.assert_array_equal(f.kx, f2.kx)


def test_layer_and_subbox():
    f = synthetic_spe10(shape=(12, 20, 8), seed=2)
    lay = f.layer(3)
    assert lay.kx.shape == (12, 20)
    np.testing.assert_array_equal(lay.kx, f.kx[:, :, 3])
    sub = f.subbox(slice(0, 6), slice(5, 15), slice(2, 6))
    assert sub.phi.shape == (6, 10, 4)


def test_spe10_parser_roundtrip(tmp_path):
    # write a tiny file in the official layout (Fortran order, mD) and parse
    import thermalporous_tpu.data.spe10 as spe10_mod

    nx, ny, nz = 3, 4, 2
    n = nx * ny * nz
    rng = np.random.default_rng(0)
    kx = rng.uniform(1.0, 100.0, (nx, ny, nz))
    ky = rng.uniform(1.0, 100.0, (nx, ny, nz))
    kz = rng.uniform(0.1, 10.0, (nx, ny, nz))
    phi = rng.uniform(0.05, 0.3, (nx, ny, nz))

    def flatten(a):  # x fastest
        return a.transpose(2, 1, 0).reshape(n)

    perm = tmp_path / "perm.dat"
    perm.write_text(
        "\n".join(
            " ".join(f"{v:.6e}" for v in flatten(a)[i : i + 6])
            for a in (kx, ky, kz)
            for i in range(0, n, 6)
        )
    )
    phif = tmp_path / "phi.dat"
    phif.write_text(" ".join(f"{v:.6e}" for v in flatten(phi)))

    orig_shape = spe10_mod.SPE10_SHAPE
    spe10_mod.SPE10_SHAPE = (nx, ny, nz)
    try:
        f = load_spe10(str(perm), str(phif))
    finally:
        spe10_mod.SPE10_SHAPE = orig_shape

    np.testing.assert_allclose(f.kx, kx * MD_TO_M2, rtol=1e-6)
    np.testing.assert_allclose(f.kz, kz * MD_TO_M2, rtol=1e-6)
    np.testing.assert_allclose(f.phi, phi, rtol=1e-6)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_presets_construct_and_evaluate(name):
    # small variants where supported, to keep construction cheap
    kwargs = {}
    if name == "sp_geothermal_3d":
        kwargs = dict(nx=8, ny=8, nz=4)
    elif name == "tp_spe10_3d":
        kwargs = dict(nx=8, ny=12, nz=4)
    elif name in ("sp_hot_injection_2d", "tp_thermal_2d"):
        kwargs = dict(n=8)
    case = get_case(name, **kwargs)
    u = case.model.initial_state(case.data)
    res = case.model.residual(u, u, 100.0, case.data)
    assert np.isfinite(np.asarray(res)).all()
    assert res.shape == (case.model.nc,) + case.model.grid.shape

"""Unit tests: grid geometry, transmissibilities, stencil helpers.

The reference never had these isolated unit tests (SURVEY.md §4); the
rebuild adds them so the TPFA building blocks are pinned to hand
calculations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import (
    Grid,
    divergence_add,
    harmonic_face_transmissibility,
    shift_minus,
    shift_plus,
)


def test_grid_basic_2d():
    g = Grid(shape=(4, 6), spacing=(2.0, 3.0), thickness=5.0)
    assert g.dim == 2
    assert g.ncells == 24
    assert g.cell_volume == pytest.approx(2.0 * 3.0 * 5.0)
    assert g.face_area(0) == pytest.approx(3.0 * 5.0)  # normal to x: dy*dz
    assert g.face_area(1) == pytest.approx(2.0 * 5.0)
    assert g.cell_depths() is None


def test_grid_basic_3d():
    g = Grid(shape=(4, 5, 6), spacing=(1.0, 2.0, 3.0), gravity=9.81, depth_top=100.0)
    assert g.cell_volume == pytest.approx(6.0)
    assert g.face_area(2) == pytest.approx(1.0 * 2.0)
    d = g.cell_depths()
    assert d.shape == (4, 5, 6)
    np.testing.assert_allclose(np.asarray(d)[0, 0], 100.0 + (np.arange(6) + 0.5) * 3.0)


def test_harmonic_transmissibility_hand_calc():
    # two cells along x: T = A * 2 k1 k2 / ((k1+k2) dx); full-shape layout
    # stores the face (i, i+1) value at index i and zero at the boundary.
    g = Grid(shape=(2, 1), spacing=(10.0, 20.0), thickness=4.0)
    k = jnp.array([[1.0e-13], [3.0e-13]])
    (tx, ty) = harmonic_face_transmissibility(g, [k, k])
    area_x = 20.0 * 4.0
    expected = area_x * 2 * 1e-13 * 3e-13 / ((1e-13 + 3e-13) * 10.0)
    assert tx.shape == (2, 1)
    assert float(tx[0, 0]) == pytest.approx(expected, rel=1e-14)
    assert float(tx[1, 0]) == 0.0  # no-flow boundary face
    assert ty.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(ty), 0.0)  # single cell along y


def test_homogeneous_transmissibility():
    g = Grid(shape=(3, 3), spacing=(1.0, 1.0))
    k = jnp.full((3, 3), 2.0)
    tx, ty = harmonic_face_transmissibility(g, [k, k])
    np.testing.assert_allclose(np.asarray(tx[:2, :]), 2.0)
    np.testing.assert_allclose(np.asarray(tx[2, :]), 0.0)
    np.testing.assert_allclose(np.asarray(ty[:, :2]), 2.0)
    np.testing.assert_allclose(np.asarray(ty[:, 2]), 0.0)


def test_shift_and_divergence():
    v = jnp.arange(1.0, 5.0).reshape(1, 4)  # (nc=1, n=4)
    sm = shift_minus(v, 0, lead=1)  # v[i+1]
    sp = shift_plus(v, 0, lead=1)   # v[i-1]
    np.testing.assert_allclose(np.asarray(sm)[0], [2, 3, 4, 0])
    np.testing.assert_allclose(np.asarray(sp)[0], [0, 1, 2, 3])

    # conservation: divergence of any interior face flux sums to zero
    # (full-shape flux layout: last entry is the boundary face = 0)
    res = jnp.zeros((1, 4))
    flux = jnp.array([[1.0, -2.0, 3.0, 0.0]])
    out = divergence_add(res, flux, 0, lead=1)
    np.testing.assert_allclose(np.asarray(out).sum(), 0.0, atol=1e-15)
    # F on face (0,1)=1: +1 to cell0, -1 to cell1
    np.testing.assert_allclose(np.asarray(out)[0], [1.0, -3.0, 5.0, -3.0])

"""Pallas stencil kernels match the jnp reference implementations.

Run in interpreter mode on CPU (the tests' platform); the same kernels
compile to Mosaic on the TPU path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.kernels import chebyshev_smooth, matvec
from thermalporous_tpu.precond import chebyshev, gershgorin_lambda_max

from tests.test_gmg import poisson_stencil


@pytest.mark.parametrize("shape", [(16, 16), (13, 7), (8, 16, 8)])
def test_pallas_matvec_matches(shape, rng):
    k = jnp.asarray(np.exp(rng.standard_normal(shape)))
    st = poisson_stencil(shape, k=k, shift=0.5)
    v = jnp.asarray(rng.standard_normal(shape))
    ref = st.matvec(v)
    out = matvec(st, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("degree", [1, 2, 4])
def test_pallas_chebyshev_matches(degree, rng):
    shape = (16, 16)
    st = poisson_stencil(shape, shift=0.1)
    b = jnp.asarray(rng.standard_normal(shape))
    x0 = jnp.asarray(rng.standard_normal(shape))
    lam = gershgorin_lambda_max(st)
    ref = chebyshev(st, b, x0, degree=degree, lam_max=lam)
    out = chebyshev_smooth(st, b, x0, lam, degree=degree, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10, atol=1e-12)


def test_pallas_fallback_large(rng):
    # exceeds the VMEM budget → falls back to the jnp path transparently
    shape = (2048, 2048)
    st = poisson_stencil(shape, shift=0.1)
    v = jnp.ones(shape)
    out = matvec(st, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(st.matvec(v)), rtol=1e-12)

"""Coupled block multigrid (precond/block_gmg.py): Galerkin identity,
cycle convergence, and oracle parity of the stage2="bgmg" preconditioner."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from thermalporous_tpu.core import BlockStencil
from thermalporous_tpu.precond import (
    CPRConfig,
    GMGConfig,
    block_galerkin_coarsen,
    block_gmg_apply,
    block_gmg_setup,
)
from thermalporous_tpu.solve import Simulator, oracle_run

from tests.test_gmg import _dense_restriction, poisson_stencil
from tests.test_newton_cptr import TIGHT, _compare_states, _tp_case


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _boundary_masks(shape):
    """Full-shape face convention: upper zero on the last slice along its
    axis, lower zero on the first."""
    ups, los = [], []
    for a, n in enumerate(shape):
        idx = np.arange(n).reshape(
            [1] * a + [n] + [1] * (len(shape) - a - 1))
        ups.append(jnp.asarray((idx < n - 1).astype(np.float64)))
        los.append(jnp.asarray((idx > 0).astype(np.float64)))
    return ups, los


def random_block_stencil(shape, nc, rng, dominance=4.0):
    """Random block stencil respecting the boundary-zero convention, with
    diagonally dominant diagonal blocks (so smoothing is well-posed)."""
    ups, los = _boundary_masks(shape)
    bshape = (nc, nc) + tuple(shape)
    eye = jnp.eye(nc).reshape((nc, nc) + (1,) * len(shape))
    diag = jnp.asarray(rng.standard_normal(bshape)) + dominance * (
        2 * len(shape) + 1) * eye
    upper = tuple(
        jnp.asarray(rng.standard_normal(bshape)) * ups[a]
        for a in range(len(shape)))
    lower = tuple(
        jnp.asarray(rng.standard_normal(bshape)) * los[a]
        for a in range(len(shape)))
    return BlockStencil(diag=diag, upper=upper, lower=lower)


@pytest.mark.parametrize("shape,nc", [((8, 8), 2), ((5, 3), 3),
                                      ((6, 7), 3), ((4, 5, 3), 3)])
def test_block_galerkin_coarsening_is_rap(shape, nc, rng):
    st = random_block_stencil(shape, nc, rng)
    coarse = block_galerkin_coarsen(st)
    a = np.asarray(st.to_dense())
    r = _dense_restriction(shape)
    # BlockStencil.to_dense flattens component-major, so the block
    # restriction is I_nc ⊗ R_cells
    rb = np.kron(np.eye(nc), r)
    rap = rb @ a @ rb.T
    np.testing.assert_allclose(np.asarray(coarse.to_dense()), rap,
                               atol=1e-11)


def _block_diffusion(shape, rng, nc=2, coupling=0.2):
    """nc coupled diffusion operators: block-diagonal Poisson rows plus a
    weak constant inter-field coupling (keeps the system nonsingular and
    smoothing-friendly while exercising the off-diagonal block paths)."""
    sts = [
        poisson_stencil(shape,
                        k=jnp.asarray(np.exp(rng.standard_normal(shape))),
                        shift=0.3)
        for _ in range(nc)
    ]
    zeros = jnp.zeros(shape)

    def blockify(entries):  # entries[i][j] arrays -> (nc, nc, *shape)
        return jnp.stack([jnp.stack(row) for row in entries])

    diag = blockify([
        [sts[i].diag if i == j else coupling * jnp.ones(shape)
         for j in range(nc)]
        for i in range(nc)
    ])
    upper, lower = [], []
    for a in range(len(shape)):
        upper.append(blockify([
            [sts[i].upper[a] if i == j else zeros for j in range(nc)]
            for i in range(nc)
        ]))
        lower.append(blockify([
            [sts[i].lower[a] if i == j else zeros for j in range(nc)]
            for i in range(nc)
        ]))
    return BlockStencil(diag=diag, upper=tuple(upper), lower=tuple(lower))


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(32, 32), (16, 16, 8)])
def test_block_vcycle_converges(shape, rng):
    st = _block_diffusion(shape, rng)
    state = block_gmg_setup(st, GMGConfig(), max_coarse_cells=64)
    x_true = jnp.asarray(rng.standard_normal((2,) + shape))
    b = st.matvec(x_true)
    x = jnp.zeros_like(b)
    n0 = float(jnp.linalg.norm(b.ravel()))
    for _ in range(30):
        r = b - st.matvec(x)
        x = x + block_gmg_apply(state, r, GMGConfig())
        if float(jnp.linalg.norm((b - st.matvec(x)).ravel())) < 1e-9 * n0:
            break
    assert float(jnp.linalg.norm((b - st.matvec(x)).ravel())) < 1e-7 * n0


def test_block_coarse_solve_exact_when_one_level(rng):
    """With max_coarse_cells >= ncells the 'cycle' is the dense solve."""
    shape = (4, 3)
    st = random_block_stencil(shape, 3, rng, dominance=6.0)
    state = block_gmg_setup(st, GMGConfig(), max_coarse_cells=128)
    assert len(state.stencils) == 1
    x_true = jnp.asarray(rng.standard_normal((3,) + shape))
    b = st.matvec(x_true)
    x = block_gmg_apply(state, b, GMGConfig())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=1e-9)


@pytest.mark.slow
def test_stage2_bgmg_matches_oracle():
    """stage2='bgmg' is preconditioning only — same converged states."""
    model, data = _tp_case(n=6)
    dts = [3600.0]
    oracle_states = oracle_run(model, data, dts)
    pc = CPRConfig(stage2="bgmg", bgmg_coarse_cells=16)
    sim = Simulator(model, data, precond="cptr", pc_cfg=pc, newton_cfg=TIGHT)
    u = model.initial_state(data)
    u, stats = sim.step(u, dts[0])
    assert bool(stats.converged)
    _compare_states(u, oracle_states[0])

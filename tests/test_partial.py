"""Partial-assembly hot path: transposed kernels, lattice gather/scatter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d, make_cartesian_mesh_2d
from cmfem_tpu.ops import SpaceOps, BilinearForm
from cmfem_tpu.ops.partial import (
    PAOperator, StructuredGrid3D, StructuredPAOperator, pack_qp_blocks_T,
)


def _setup(n=3, order=2):
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()
    return mesh, fes, ops, form, data


def test_pa_operator_matches_bilinear_apply():
    mesh, fes, ops, form, data = _setup()
    op = PAOperator(ops, data, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.nscalar))
    y_ref = form.apply(data, u)
    y_pa = op(u)
    np.testing.assert_allclose(np.asarray(y_pa), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_structured_operator_matches_unstructured(order):
    n = 3
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()
    grid = StructuredGrid3D(n, n, n, order)
    assert grid.ndofs == fes.nscalar

    # map entity numbering -> lattice numbering by node position
    pos = np.asarray(fes.node_positions)
    pi = np.round(pos * (grid.NX - 1) / 1.0).astype(np.int64)
    lat = (pi[:, 2] * grid.NY + pi[:, 1]) * grid.NX + pi[:, 0]
    assert len(np.unique(lat)) == grid.ndofs

    rng = np.random.default_rng(1)
    u_ent = rng.standard_normal(fes.nscalar)
    u_lat = np.zeros(grid.ndofs)
    u_lat[lat] = u_ent

    y_ref = np.asarray(form.apply(data, jnp.asarray(u_ent)))
    sop = StructuredPAOperator(ops, data, grid, dtype=jnp.float64,
                               use_pallas=False)
    y_lat = np.asarray(sop(jnp.asarray(u_lat)))
    np.testing.assert_allclose(y_lat[lat], y_ref, rtol=1e-11, atol=1e-11)


def test_structured_boundary_mask():
    grid = StructuredGrid3D(3, 3, 3, 2)
    mask = grid.boundary_mask()
    assert mask.sum() == grid.ndofs - (grid.NX - 2) ** 3


def test_pack_blocks_layout():
    mesh, fes, ops, form, data = _setup(n=2, order=1)
    Dflat, BG = pack_qp_blocks_T(ops, data, dtype=jnp.float64)
    ne, nq = ops.gf.wdetJ.shape
    assert Dflat.shape == (16, nq, ne)
    assert BG.shape == (4 * nq, 8)
    # row 0..nq-1 of BG are shape values: partition of unity
    np.testing.assert_allclose(np.asarray(BG[:nq]).sum(axis=1), 1.0,
                               atol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_sumfact_matches_reference_apply(order):
    """Global sum-factorized apply is exact vs the generic path."""
    import jax.numpy as jnp
    from cmfem_tpu.ops.sumfact import SumFactoredOperator

    n = 3
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()
    grid = StructuredGrid3D(n, n, n, order)
    sfop = SumFactoredOperator(ops, data, n, n, n, order, dtype=jnp.float64)

    pos = np.asarray(fes.node_positions)
    pi = np.round(pos * (grid.NX - 1)).astype(np.int64)
    lat = (pi[:, 2] * grid.NY + pi[:, 1]) * grid.NX + pi[:, 0]
    rng = np.random.default_rng(0)
    u_ent = rng.standard_normal(fes.nscalar)
    u_lat = np.zeros(grid.ndofs)
    u_lat[lat] = u_ent
    y_ref = np.asarray(form.apply(data, jnp.asarray(u_ent)))
    y_lat = np.asarray(sfop(jnp.asarray(u_lat)))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_lat[lat] / scale, y_ref / scale, atol=1e-13)


def test_sumfact_pallas_fused_matches_xla():
    """The VMEM-fused pallas z-chain (interpret mode on CPU) is exact vs
    the plain XLA sum-factorized path."""
    from cmfem_tpu.ops.sumfact import SumFactoredOperator

    n, order = 4, 2
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()
    sfop = SumFactoredOperator(ops, data, n, n, n, order, dtype=jnp.float64)
    assert sfop.compressed

    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(sfop.ndofs))
    fn, D = sfop.bind()
    y_ref = np.asarray(fn(u, D))
    # Ky*Kx = 144 here; tile must divide it
    fnp, Dp = sfop.bind(use_pallas=True, tile=72, interpret=True)
    y_pl = np.asarray(fnp(u, Dp))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pl / scale, y_ref / scale, atol=1e-13)


def test_sumfact_periodic_paths_match_generic():
    """z-periodic D compression (XLA and pallas-interpret variants) is
    exact vs the generic lattice-D apply on a uniform grid, and the
    periodicity detector rejects variable-coefficient operators."""
    import jax.numpy as jnp

    from cmfem_tpu.ops.sumfact import SumFactoredOperator

    nx, ny, nz = 3, 4, 5
    mesh = make_cartesian_mesh_3d(nx, ny, nz)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_convection(np.array([1.0, -2.0, 0.5]))
            .add_mass(1.0))
    data = form.assemble()
    sfop = SumFactoredOperator(ops, data, nx, ny, nz, 2, dtype=jnp.float64)
    assert sfop.periodic and sfop.z_periodic

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(sfop.ndofs))
    fn, D = sfop.bind()
    y_ref = np.asarray(fn(u, D))
    scale = np.abs(y_ref).max()

    fnp, Dp = sfop.bind(use_periodic=True)
    np.testing.assert_allclose(np.asarray(fnp(u, Dp)) / scale,
                               y_ref / scale, atol=1e-13)
    # Ky*Kx = 12*9 = 108; tile must divide it
    fnpp, Dpp = sfop.bind(use_pallas=True, tile=54, interpret=True,
                          use_periodic=True)
    np.testing.assert_allclose(np.asarray(fnpp(u, Dpp)) / scale,
                               y_ref / scale, atol=1e-13)

    # variable coefficient -> not periodic, and the periodic bind refuses
    import jax

    xq = np.asarray(ops.gf.xq)
    kappa_q = jnp.asarray(0.1 + xq[..., 2] ** 2)   # z-varying
    form_v = BilinearForm(ops).add_diffusion(kappa_q).add_mass(1.0)
    sfop_v = SumFactoredOperator(ops, form_v.assemble(), nx, ny, nz, 2,
                                 dtype=jnp.float64)
    assert not sfop_v.z_periodic
    try:
        sfop_v.bind(use_periodic=True)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sumfact_fused_slab_matches_xla():
    """The whole-operator y-slab fusion (interpret mode on CPU) is exact
    vs the plain XLA sum-factorized path at orders 1-3, with and without
    the z-periodic D compression, on an anisotropic element grid."""
    from cmfem_tpu.ops.sumfact import SumFactoredOperator

    for nxyz, order in (((3, 4, 5), 1), ((3, 4, 5), 2), ((2, 3, 4), 3)):
        nx, ny, nz = nxyz
        mesh = make_cartesian_mesh_3d(nx, ny, nz)
        fes = FESpace(mesh, order)
        ops = SpaceOps(fes, quad_order=2 * order)
        form = (BilinearForm(ops)
                .add_diffusion(0.3)
                .add_convection(np.array([1.0, -2.0, 0.5]))
                .add_mass(1.0))
        data = form.assemble()
        sfop = SumFactoredOperator(ops, data, nx, ny, nz, order,
                                   dtype=jnp.float64)
        assert sfop.compressed

        rng = np.random.default_rng(4)
        u = jnp.asarray(rng.standard_normal(sfop.ndofs))
        fn, D = sfop.bind()
        y_ref = np.asarray(fn(u, D))
        scale = np.abs(y_ref).max()
        for z_fma in (False, True):
            fnf, Df = sfop.bind(use_fused=True, interpret=True, z_fma=z_fma)
            np.testing.assert_allclose(np.asarray(fnf(u, Df)) / scale,
                                       y_ref / scale, atol=1e-13)
            # multi-element slabs (wider matmul N per grid step)
            if ny % 2 == 0:
                fnf2, Df2 = sfop.bind(use_fused=True, interpret=True,
                                      slab=2, z_fma=z_fma)
                np.testing.assert_allclose(np.asarray(fnf2(u, Df2)) / scale,
                                           y_ref / scale, atol=1e-13)
            if sfop.z_periodic:
                fnfp, Dfp = sfop.bind(use_fused=True, use_periodic=True,
                                      interpret=True, z_fma=z_fma)
                np.testing.assert_allclose(np.asarray(fnfp(u, Dfp)) / scale,
                                           y_ref / scale, atol=1e-13)
                if ny % 2 == 0:
                    fnf2p, Df2p = sfop.bind(use_fused=True,
                                            use_periodic=True,
                                            interpret=True, slab=2,
                                            z_fma=z_fma)
                    np.testing.assert_allclose(
                        np.asarray(fnf2p(u, Df2p)) / scale,
                        y_ref / scale, atol=1e-13)
        # x-chunked D streaming: the fused kernel with the D slab split
        # over a second (sequential, accumulating) grid dimension
        for Cx in (2, 3):
            if sfop.Kx % Cx:
                continue
            for zf in (False, True):
                fnc, Dc = sfop.bind(use_fused=True, interpret=True,
                                    x_chunks=Cx, z_fma=zf)
                np.testing.assert_allclose(np.asarray(fnc(u, Dc)) / scale,
                                           y_ref / scale, atol=1e-13)
                if sfop.z_periodic:
                    fncp, Dcp = sfop.bind(use_fused=True,
                                          use_periodic=True,
                                          interpret=True, x_chunks=Cx,
                                          z_fma=zf)
                    np.testing.assert_allclose(
                        np.asarray(fncp(u, Dcp)) / scale,
                        y_ref / scale, atol=1e-13)

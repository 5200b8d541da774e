"""Multi-chip element sharding on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
from cmfem_tpu.ops import SpaceOps, BilinearForm
from cmfem_tpu.parallel import ShardedPoissonApply, make_device_mesh


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_apply_matches_single_device():
    mesh = make_cartesian_mesh_3d(3, 3, 3)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = (BilinearForm(ops)
            .add_diffusion(0.3)
            .add_mass(1.0)
            .add_convection(np.array([1.0, -2.0, 0.5])))
    data = form.assemble()
    dev_mesh = make_device_mesh(len(jax.devices()))
    A = ShardedPoissonApply(ops, data, dev_mesh)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.nscalar))
    y_sh = A(u)
    y_ref = form.apply(data, u)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_cg_solve_matches_single_device():
    """Full Krylov solve over the sharded operator: the SAME jittable cg()
    runs under shard_map-backed applies, with dot products lowering to
    psums (the PETSc-KSP-over-MPI analog, SURVEY §2.4)."""
    from cmfem_tpu.solvers import cg, jacobi_preconditioner
    from cmfem_tpu.ops import EssentialBC

    mesh = make_cartesian_mesh_3d(3, 3, 3)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = BilinearForm(ops).add_diffusion(1.0).add_mass(0.5)
    data = form.assemble()
    bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
    dev_mesh = make_device_mesh(len(jax.devices()))
    A = ShardedPoissonApply(ops, data, dev_mesh)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(fes.nscalar))
    b = jnp.where(bc.mask, 0.0, b)
    diag = jnp.where(bc.mask, 1.0, form.assemble_diagonal(data))
    M = jacobi_preconditioner(diag)

    def solve(apply_fn):
        op = bc.constrain_operator(apply_fn)
        return cg(op, b, M=M, rtol=1e-12, maxiter=500)

    r_sh = solve(lambda v: A(v))
    r_ref = solve(lambda v: form.apply(data, v))
    assert int(r_sh.iters) == int(r_ref.iters)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=0, atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(__file__), "..",
                               "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft2", os.path.join(os.path.dirname(__file__), "..",
                                "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()

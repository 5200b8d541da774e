"""Geometric multigrid on the structured sum-factorized hierarchy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmfem_tpu.ops import BilinearForm
from cmfem_tpu.solvers import cg, jacobi_preconditioner, StructuredMG


def _solve(n, order=2):
    mg = StructuredMG.build(
        n, order, lambda ops: BilinearForm(ops).add_diffusion(1.0),
        dtype=jnp.float64)
    M, arrs = mg.bind()
    fn, D = mg.levels[0]["op"].bind()
    mask = mg.levels[0]["mask"]
    diag = mg.levels[0]["diag"]
    ndofs = mg.levels[0]["op"].ndofs
    rng = np.random.default_rng(0)
    b = jnp.asarray(np.where(np.asarray(mask), 0.0,
                             rng.standard_normal(ndofs)))

    def A(v):
        av = fn(jnp.where(mask, 0.0, v), D)
        return jnp.where(mask, v, av)

    r_j = cg(A, b, M=jacobi_preconditioner(diag), rtol=1e-8, maxiter=2000)
    r_m = cg(A, b, M=lambda r: M(r, arrs), rtol=1e-8, maxiter=200)
    return r_j, r_m, mg


def test_mg_p_chain_higher_orders():
    """The p-coarsening chain (p -> p//2 -> ... -> 1 -> h-levels) keeps
    iteration counts O(10) at orders 3 and 4 as well."""
    for order, n, jmin in ((3, 8, 60), (4, 6, 60)):
        r_j, r_m, mg = _solve(n, order)
        assert int(r_m.iters) <= 15
        assert int(r_j.iters) > jmin
        np.testing.assert_allclose(
            np.asarray(r_m.x), np.asarray(r_j.x), rtol=0,
            atol=1e-6 * float(jnp.abs(r_j.x).max()))


def test_mg_poisson_mesh_independent_iterations():
    """V(3,3)-preconditioned CG converges in O(10) iterations independent
    of the mesh, while Jacobi-CG grows ~2x per refinement; both give the
    same solution."""
    r_j8, r_m8, mg8 = _solve(8)
    assert len(mg8.levels) == 4  # (8,p2) (8,p1) (4,p1) (2,p1)
    assert int(r_m8.iters) <= 15
    np.testing.assert_allclose(np.asarray(r_m8.x), np.asarray(r_j8.x),
                               rtol=0, atol=1e-6 * float(
                                   jnp.abs(r_j8.x).max()))

    r_j16, r_m16, _ = _solve(16)
    assert int(r_m16.iters) <= int(r_m8.iters) + 3  # mesh-independent
    assert int(r_j16.iters) > 1.5 * int(r_j8.iters)  # Jacobi degrades


def test_mg_preconditions_gmres_on_nonsymmetric_cdr():
    """GMRES on the nonsymmetric CDR operator, preconditioned with the MG
    hierarchy built on its SYMMETRIC part (diffusion + mass) — the standard
    construction: the Chebyshev smoother needs a real positive spectrum, so
    preconditioning with the symmetric-part V-cycle is the robust choice."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.ops.sumfact import SumFactoredOperator
    from cmfem_tpu.solvers import gmres

    n = 8
    beta = np.array([1.0, -2.0, 0.5])
    mg = StructuredMG.build(
        n, 2, lambda ops: BilinearForm(ops).add_diffusion(0.1).add_mass(1.0),
        dtype=jnp.float64)
    M, arrs = mg.bind()
    mask = mg.levels[0]["mask"]
    diag = mg.levels[0]["diag"]
    nd = mg.levels[0]["op"].ndofs

    # the actual (nonsymmetric) operator on the same lattice
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = (BilinearForm(ops).add_diffusion(0.1)
            .add_convection(beta).add_mass(1.0))
    cdr = SumFactoredOperator(ops, form.assemble(), n, n, n, 2,
                              dtype=jnp.float64)
    fnc, Dc = cdr.bind()

    rng = np.random.default_rng(2)
    b = jnp.asarray(np.where(np.asarray(mask), 0.0,
                             rng.standard_normal(nd)))

    def A(v):
        return jnp.where(mask, v, fnc(jnp.where(mask, 0.0, v), Dc))

    # fixed Krylov budget of 30 vectors: measured MG reaches 2.7e-8 vs
    # Jacobi 7.1e-5 (and 2.9e-4 vs 1.4e-2 at 15 vectors)
    r_m = gmres(A, b, M=lambda r: M(r, arrs), rtol=1e-10, restart=30,
                maxiter=1)
    r_j = gmres(A, b, M=jacobi_preconditioner(diag), rtol=1e-10, restart=30,
                maxiter=1)
    res_m = float(jnp.linalg.norm(b - A(r_m.x)) / jnp.linalg.norm(b))
    res_j = float(jnp.linalg.norm(b - A(r_j.x)) / jnp.linalg.norm(b))
    assert res_m < 1e-6
    assert res_j > 50 * res_m  # far ahead of Jacobi in the same budget


def test_mg_vcycle_is_jittable():
    """The whole V-cycle compiles as one jit with arrays as arguments."""
    mg = StructuredMG.build(
        4, 2, lambda ops: BilinearForm(ops).add_diffusion(1.0),
        dtype=jnp.float64)
    M, arrs = mg.bind()
    r = jnp.ones(mg.levels[0]["op"].ndofs)

    z = jax.jit(M)(r, arrs)
    assert np.isfinite(np.asarray(z)).all()
    # preconditioner must be linear and SPD-ish: z(2r) == 2 z(r)
    z2 = jax.jit(M)(2.0 * r, arrs)
    np.testing.assert_allclose(np.asarray(z2), 2 * np.asarray(z),
                               rtol=1e-12, atol=0)


def test_geometric_mg_unstructured_driver(tmp_path):
    """GeometricMG in its production role: the diffusion_mms driver with
    linear_solver: mg on the reference's triangle mesh — iteration counts
    stay low and roughly mesh-independent across refinement, and the
    solution matches the Jacobi-CG run (reference analog: the petsc*.opts
    AMG configurations, SURVEY.md §2.3)."""
    from cmfem_tpu.apps.diffusion_mms import run

    REF = "/root/reference/myapps/convection_diffusion"
    base = {
        "mesh_file": f"{REF}/Mesh/unit_square.msh",
        "order": 1,
        "dt": 0.02,
        "t_final": 0.06,
        "alpha": 1.0,
        "save_paraview": False,
        "solver_rtol": 1e-10,
    }
    iters_by_ref = {}
    for nref in (1, 2):
        out_mg = run({**base, "serial_ref_levels": nref,
                      "linear_solver": "mg",
                      "output_path": str(tmp_path / f"mg{nref}")})
        out_j = run({**base, "serial_ref_levels": nref,
                     "output_path": str(tmp_path / f"j{nref}")})
        assert np.abs(out_mg["u"] - out_j["u"]).max() \
            / np.abs(out_j["u"]).max() < 1e-7
        iters_by_ref[nref] = (max(out_mg["solve_iters"]),
                              max(out_j["solve_iters"]))
    # MG beats Jacobi and stays (roughly) mesh-independent
    for nref, (mg_it, j_it) in iters_by_ref.items():
        assert mg_it < j_it / 2, iters_by_ref
    assert iters_by_ref[2][0] <= iters_by_ref[1][0] + 3, iters_by_ref

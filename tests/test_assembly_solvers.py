"""Assembly + solver tests, culminating in the M0 steady MMS solve
(parity target of linear_convection_diffusion_2D, SURVEY.md §7.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import (
    FESpace,
    load_gmsh,
    make_cartesian_mesh_2d,
    make_cartesian_mesh_3d,
)
from cmfem_tpu.ops import (
    SpaceOps,
    BilinearForm,
    EssentialBC,
    domain_lf,
    l2_error,
    l2_norm_fn,
)
from cmfem_tpu.solvers import cg, gmres, dense_solve, jacobi_preconditioner

MESH_DIR = "/root/reference/myapps/convection_diffusion/Mesh"


def test_mass_matrix_integrates_volume():
    m = make_cartesian_mesh_2d(5, 5)
    fes = FESpace(m, 2)
    ops = SpaceOps(fes)
    a = BilinearForm(ops).add_mass(1.0)
    data = a.assemble()
    ones = jnp.ones(fes.nscalar)
    # 1^T M 1 = area
    np.testing.assert_allclose(float(ones @ a.apply(data, ones)), 1.0,
                               rtol=1e-12)


def test_element_matrices_match_apply():
    m = make_cartesian_mesh_2d(3, 3)
    fes = FESpace(m, 3)
    ops = SpaceOps(fes)
    a = (BilinearForm(ops)
         .add_mass(2.0)
         .add_diffusion(0.3)
         .add_convection(np.array([1.0, -2.0])))
    data = a.assemble()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.nscalar))
    y1 = a.apply(data, u)
    A = a.dense_matrix(data)
    y2 = A @ u
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-10)
    # diagonal extraction
    d = a.assemble_diagonal(data)
    np.testing.assert_allclose(np.asarray(d), np.asarray(jnp.diag(A)),
                               atol=1e-10)


def test_poisson_cg_vs_exact_quadratic():
    """-Lap(u) = -2 with u = x^2 on [0,1]^2: exact for order>=2."""
    m = make_cartesian_mesh_2d(4, 4)
    fes = FESpace(m, 2)
    ops = SpaceOps(fes)
    a = BilinearForm(ops).add_diffusion(1.0)
    data = a.assemble()
    b = domain_lf(ops, lambda x: -2.0 * np.ones(len(x)))

    exact = lambda x: x[:, 0] ** 2
    ess = fes.boundary_dofs()
    bc = EssentialBC(fes.nscalar, ess)
    u_bc = jnp.asarray(fes.interpolate(exact))
    Afun = bc.constrain_operator(lambda v: a.apply(data, v))
    B = bc.constrained_rhs(lambda v: a.apply(data, v), b, u_bc)
    diag = bc.constrain_dense(jnp.diag(a.assemble_diagonal(data)))
    M = jacobi_preconditioner(jnp.diag(diag))
    res = cg(Afun, B, M=M, rtol=1e-14, maxiter=500)
    u = res.x
    err = np.abs(np.asarray(u) - fes.interpolate(exact)).max()
    assert err < 1e-9, err


@pytest.mark.parametrize("solver", ["gmres", "dense"])
def test_steady_cdr_mms_unit_square(solver):
    """M0: the reference's steady MMS problem on its own mesh asset.

    -kappa Lap(u) + div(c u) + s u = f,  u = sin(3 pi x) sin(3 pi y),
    kappa=0.1, c=(1,-2), s=1  (linear_convection_diffusion_2D.cpp:1-13).
    Order-3 on unit_square.msh gives rel-L2 ~3.4e-5 (discretization
    error; GMRES and dense-LU paths agree to 1e-13)."""
    kappa, s = 0.1, 1.0
    cx, cy = 1.0, -2.0
    nm, mm = 3, 3

    def exact(x):
        return np.sin(nm * np.pi * x[:, 0]) * np.sin(mm * np.pi * x[:, 1])

    def forcing(x):
        nx = nm * np.pi * x[:, 0]
        my = mm * np.pi * x[:, 1]
        sin_nx, cos_nx = np.sin(nx), np.cos(nx)
        sin_my, cos_my = np.sin(my), np.cos(my)
        diff = kappa * (nm**2 + mm**2) * np.pi**2 * sin_nx * sin_my
        conv = cx * nm * np.pi * cos_nx * sin_my + cy * mm * np.pi * sin_nx * cos_my
        reac = s * sin_nx * sin_my
        return diff + conv + reac

    m = load_gmsh(f"{MESH_DIR}/unit_square.msh")
    fes = FESpace(m, 3)
    ops = SpaceOps(fes)
    a = (BilinearForm(ops)
         .add_diffusion(kappa)
         .add_convection(np.array([cx, cy]))
         .add_mass(s))
    data = a.assemble()
    b = domain_lf(ops, forcing)

    bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
    u_bc = jnp.asarray(fes.project_bdr(np.zeros(fes.nscalar), exact))
    apply_A = lambda v: a.apply(data, v)
    Afun = bc.constrain_operator(apply_A)
    B = bc.constrained_rhs(apply_A, b, u_bc)

    if solver == "gmres":
        diag = a.assemble_diagonal(data)
        diag = jnp.where(bc.mask, 1.0, diag)
        M = jacobi_preconditioner(diag)
        res = gmres(Afun, B, M=M, rtol=1e-12, restart=80, maxiter=40)
        assert bool(res.converged)
        u = res.x
    else:
        A = bc.constrain_dense(a.dense_matrix(data))
        u = dense_solve(A, B)

    abs_l2 = float(l2_error(ops, u, exact))
    rel_l2 = abs_l2 / float(l2_norm_fn(ops, exact))
    assert rel_l2 < 5e-5, rel_l2


def test_convergence_order_quadratic():
    """Diffusion MMS convergence: order-2 elements -> O(h^3) L2 error."""
    errs = []
    for n in (4, 8):
        m = make_cartesian_mesh_2d(n, n)
        fes = FESpace(m, 2)
        ops = SpaceOps(fes)
        a = BilinearForm(ops).add_diffusion(1.0)
        data = a.assemble()
        exact = lambda x: np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        f = lambda x: 2 * np.pi**2 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        b = domain_lf(ops, f)
        bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
        apply_A = lambda v: a.apply(data, v)
        B = bc.constrained_rhs(apply_A, b, jnp.zeros(fes.nscalar))
        res = cg(bc.constrain_operator(apply_A), B, rtol=1e-14, maxiter=2000)
        errs.append(float(l2_error(ops, res.x, exact)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.7, (errs, rate)


def test_3d_hex_poisson():
    """Order-2 hexes in 3D (the BASELINE benchmark element)."""
    m = make_cartesian_mesh_3d(4, 4, 4)
    fes = FESpace(m, 2)
    ops = SpaceOps(fes)
    a = BilinearForm(ops).add_diffusion(1.0)
    data = a.assemble()
    exact = lambda x: x[:, 0] ** 2 + 2 * x[:, 1] ** 2 - 3 * x[:, 2] ** 2
    b = domain_lf(ops, lambda x: 0.0 * x[:, 0])  # Laplacian = 2+4-6 = 0
    bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
    u_bc = jnp.asarray(fes.interpolate(exact))
    apply_A = lambda v: a.apply(data, v)
    B = bc.constrained_rhs(apply_A, b, u_bc)
    diag = jnp.where(bc.mask, 1.0, a.assemble_diagonal(data))
    res = cg(bc.constrain_operator(apply_A), B,
             M=jacobi_preconditioner(diag), rtol=1e-14, maxiter=1000)
    err = np.abs(np.asarray(res.x) - fes.interpolate(exact)).max()
    assert err < 1e-8, err


def test_chebyshev_preconditioner_beats_jacobi():
    """Chebyshev(4) preconditioned CG needs fewer iterations than Jacobi
    on a Poisson operator (matmul-only smoother, solvers/precond.py)."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps, BilinearForm, EssentialBC
    from cmfem_tpu.solvers import (
        cg, jacobi_preconditioner, chebyshev_preconditioner,
        power_iteration_lmax,
    )

    mesh = make_cartesian_mesh_2d(16, 16)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = BilinearForm(ops).add_diffusion(1.0)
    data = form.assemble()
    bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
    A = bc.constrain_operator(lambda v: form.apply(data, v))
    diag = jnp.where(bc.mask, 1.0, form.assemble_diagonal(data))
    rng = np.random.default_rng(0)
    b = jnp.asarray(np.where(np.asarray(bc.mask), 0.0,
                             rng.standard_normal(fes.nscalar)))
    lmax = power_iteration_lmax(
        lambda v: A(v) / diag, fes.nscalar, iters=30) * 1.05
    M_cheb = chebyshev_preconditioner(A, lmax, degree=4, diag=diag)
    r_c = cg(A, b, M=M_cheb, rtol=1e-10, maxiter=2000)
    r_j = cg(A, b, M=jacobi_preconditioner(diag), rtol=1e-10, maxiter=2000)
    assert bool(r_c.converged) and bool(r_j.converged)
    assert int(r_c.iters) < 0.6 * int(r_j.iters)
    np.testing.assert_allclose(np.asarray(r_c.x), np.asarray(r_j.x),
                               atol=1e-7 * float(jnp.abs(r_j.x).max()))


@pytest.mark.parametrize("make_mesh,order,expected", [
    ("quad2d", 2, 8.0),   # O(h^3) in L2 for p=2
    ("hex3d", 2, 8.0),
    ("tri2d", 1, 4.0),    # O(h^2) for p=1
])
def test_poisson_h_convergence_rates(make_mesh, order, expected):
    """L2 convergence under uniform refinement hits the O(h^{p+1}) rate on
    quads, hexes, and tris (the reference's MMS-convergence pattern,
    SURVEY.md §4.1)."""
    import jax.numpy as jnp

    from cmfem_tpu.core import (
        FESpace, make_cartesian_mesh_2d, make_cartesian_mesh_3d,
    )
    from cmfem_tpu.ops import (
        SpaceOps, BilinearForm, EssentialBC, domain_lf, l2_error,
    )
    from cmfem_tpu.solvers import cg, jacobi_preconditioner

    if make_mesh == "quad2d":
        m0 = make_cartesian_mesh_2d(4, 4)
        exact = lambda x: np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
        f = lambda x: 2 * np.pi**2 * exact(x)
    elif make_mesh == "tri2d":
        from cmfem_tpu.core.reference_elements import TRIANGLE

        m0 = make_cartesian_mesh_2d(4, 4, geom=TRIANGLE)
        exact = lambda x: np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
        f = lambda x: 2 * np.pi**2 * exact(x)
    else:
        m0 = make_cartesian_mesh_3d(3, 3, 3)
        exact = lambda x: (np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
                           * np.sin(np.pi * x[..., 2]))
        f = lambda x: 3 * np.pi**2 * exact(x)

    errs = []
    for lvl in (0, 1):
        mesh = m0.uniform_refine(lvl) if lvl else m0
        fes = FESpace(mesh, order)
        ops = SpaceOps(fes, quad_order=2 * order + 2)
        form = BilinearForm(ops).add_diffusion(1.0)
        data = form.assemble()
        bc = EssentialBC(fes.nscalar, fes.boundary_dofs())
        A = bc.constrain_operator(lambda v: form.apply(data, v))
        rhs = bc.constrained_rhs(lambda v: form.apply(data, v),
                                 domain_lf(ops, f), jnp.zeros(fes.nscalar))
        diag = jnp.where(bc.mask, 1.0, form.assemble_diagonal(data))
        res = cg(A, rhs, M=jacobi_preconditioner(diag), rtol=1e-12,
                 maxiter=3000)
        errs.append(float(l2_error(ops, res.x, exact)))
    rate = errs[0] / errs[1]
    assert rate > 0.7 * expected, (errs, rate)

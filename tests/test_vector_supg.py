"""Vector-H1 elasticity and SUPG-stabilized convection (BASELINE #3, #5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
from cmfem_tpu.ops import SpaceOps, BilinearForm, EssentialBC, domain_lf
from cmfem_tpu.ops.assembly import supg_lf
from cmfem_tpu.solvers import cg, gmres, jacobi_preconditioner


def test_vector_diffusion_matches_componentwise_scalar():
    from cmfem_tpu.ops.vector import VectorBilinearForm

    m = make_cartesian_mesh_2d(3, 3)
    fes = FESpace(m, 2, vdim=2)
    ops = SpaceOps(fes)
    vf = VectorBilinearForm(ops).add_vector_diffusion(0.7)
    C = vf.assemble()
    sf = BilinearForm(ops).add_diffusion(0.7)
    sd = sf.assemble()
    rng = np.random.default_rng(0)
    n = fes.nscalar
    u = rng.standard_normal(2 * n)
    y = np.asarray(vf.apply(C, jnp.asarray(u)))
    y0 = np.asarray(sf.apply(sd, jnp.asarray(u[:n])))
    y1 = np.asarray(sf.apply(sd, jnp.asarray(u[n:])))
    np.testing.assert_allclose(y, np.concatenate([y0, y1]), atol=1e-11)


def test_elasticity_rigid_modes_and_symmetry():
    from cmfem_tpu.ops.vector import VectorBilinearForm

    m = make_cartesian_mesh_2d(3, 3)
    fes = FESpace(m, 1, vdim=2)
    ops = SpaceOps(fes)
    vf = VectorBilinearForm(ops).add_elasticity(lam=2.0, mu=1.0)
    C = vf.assemble()
    n = fes.nscalar
    pts = fes.node_positions
    # translations
    for c in range(2):
        u = np.zeros(2 * n)
        u[c * n:(c + 1) * n] = 1.0
        assert np.abs(np.asarray(vf.apply(C, jnp.asarray(u)))).max() < 1e-10
    # infinitesimal rotation u = (-y, x)
    u = np.concatenate([-pts[:, 1], pts[:, 0]])
    assert np.abs(np.asarray(vf.apply(C, jnp.asarray(u)))).max() < 1e-10
    # symmetry: u^T A v == v^T A u
    rng = np.random.default_rng(1)
    a = rng.standard_normal(2 * n)
    b = rng.standard_normal(2 * n)
    Aa = np.asarray(vf.apply(C, jnp.asarray(a)))
    Ab = np.asarray(vf.apply(C, jnp.asarray(b)))
    np.testing.assert_allclose(b @ Aa, a @ Ab, rtol=1e-10)


def test_cantilever_tip_deflection_vs_beam_theory():
    """End-loaded cantilever: tip deflection ~ PL^3/(3EI) (Euler-Bernoulli,
    plane-strain correction E' = E/(1-nu^2))."""
    from cmfem_tpu.apps.elasticity import run

    E, nu = 1.0e6, 0.3
    L, H = 1.0, 0.1
    P = -10.0  # total tip load per unit thickness (traction * H)
    out = run({
        "dim": 2, "order": 2, "length": L, "height": H,
        "nx": 40, "ny": 4, "youngs_modulus": E, "poisson_ratio": nu,
        "tip_traction": P / H, "save_paraview": False,
        "output_path": "/tmp/elast_test",
    })
    E_eff = E / (1 - nu**2)
    I = H**3 / 12.0
    delta_beam = P * L**3 / (3 * E_eff * I)
    # beam theory neglects shear: expect agreement to ~a few percent
    assert out["tip_deflection"] == pytest.approx(delta_beam, rel=0.08)


def test_supg_suppresses_oscillations_high_peclet():
    """1D-like advection with outflow layer at Pe_h >> 1: the Galerkin
    solution oscillates, SUPG keeps the overshoot near zero
    (BASELINE config #3)."""
    kappa = 1e-4
    beta = np.array([1.0, 0.0])
    m = make_cartesian_mesh_2d(20, 3)
    fes = FESpace(m, 1)
    ops = SpaceOps(fes)

    def solve(with_supg):
        a = (BilinearForm(ops)
             .add_diffusion(kappa)
             .add_convection(beta))
        if with_supg:
            a.add_supg(beta, kappa)
        data = a.assemble()
        b = domain_lf(ops, lambda x: np.ones(len(x)))
        if with_supg:
            b = b + supg_lf(ops, lambda x: np.ones(len(x)), beta, kappa)
        # Dirichlet u=0 on left/right (attrs 4, 2)
        ess = fes.boundary_dofs([2, 4])
        bc = EssentialBC(fes.nscalar, ess)
        apply_A = lambda v: a.apply(data, v)
        B = bc.constrained_rhs(apply_A, b, jnp.zeros(fes.nscalar))
        diag = jnp.where(bc.mask, 1.0, a.assemble_diagonal(data))
        res = gmres(bc.constrain_operator(apply_A), B,
                    M=jacobi_preconditioner(diag), rtol=1e-12,
                    restart=100, maxiter=60)
        assert bool(res.converged)
        return np.asarray(res.x)

    u_gal = solve(False)
    u_supg = solve(True)
    # interior solution ~ x; overshoot = max(u) - 1
    over_gal = u_gal.max() - 1.0
    over_supg = u_supg.max() - 1.0
    assert over_gal > 0.2          # Galerkin oscillates badly
    assert over_supg < 0.02        # SUPG suppresses it
    # SUPG still reproduces the smooth interior u ~ x
    pts = fes.node_positions
    interior = (pts[:, 0] > 0.1) & (pts[:, 0] < 0.7)
    np.testing.assert_allclose(u_supg[interior], pts[interior, 0], atol=0.05)

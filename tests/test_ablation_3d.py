"""3D ablation: the coupled (T,p) + SEB machinery on a hex slab.

The reference suite is strictly 2D; with dim-agnostic residuals and the
3D boundary traces the same AblationSystem runs on 3D meshes unchanged —
a capability test, not a reference-parity test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference/myapps/convection_diffusion"


def test_point_location_3d():
    """FindPoints-equivalent in 3D: hex trilinear Newton + tet affine."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.core.pointlocate import sample_h1, locate_points

    m = make_cartesian_mesh_3d(3, 3, 3)
    fes = FESpace(m, 2)
    f = lambda x: x[..., 0]**2 + 2 * x[..., 1] - x[..., 2]**2
    u = fes.interpolate(f)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, (20, 3))
    np.testing.assert_allclose(sample_h1(fes, u, pts), f(pts), atol=1e-12)
    e, _ = locate_points(m, np.array([[1.5, 0.5, 0.5]]))
    assert e[0] == -1  # outside -> not found


def test_recession_handler_3d_slab():
    """Moving-mesh recession on a 3D hex slab: uniform downward top (z=1)
    velocity gives a linear-in-z velocity field and exact bookkeeping."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.motion.recession import MeshRecessionHandler

    m = make_cartesian_mesh_3d(2, 2, 6)
    fes = FESpace(m, 1)
    # 3D attrs: 1=z0 (bottom), 2=z1 (top)
    h = MeshRecessionHandler(m, fes, bdr_attr_top=2, bdr_attr_bottom=1)
    assert h.axis == 2
    v_top = np.zeros(fes.nscalar)
    v_top[np.asarray(fes.boundary_dofs([2]))] = 1.0e-3
    h.prepare_advance(v_top, 0.1)
    pts = fes.node_positions
    np.testing.assert_allclose(h.mesh_velocity[:, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(h.mesh_velocity[:, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(h.mesh_velocity[:, 2], -1e-3 * pts[:, 2],
                               atol=1e-8)
    out = h.commit_advance()
    assert abs(out["delta_recession"] - 1e-4) < 1e-12
    top = np.asarray(fes.boundary_dofs([2]))
    np.testing.assert_allclose(h.vertices[top, 2], 1.0 - 1e-4, atol=1e-10)
    assert out["min_quality"] > 0.99


@pytest.mark.slow
def test_ablation_3d_slab_with_seb():
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.bprime import BPrimeTable
    from cmfem_tpu.physics.surface_bc import BoundaryState
    from cmfem_tpu.physics.seb import SurfaceFluxModel, classify_branch
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState

    # thin slab, heated top at z=1 (attr 2 in make_cartesian_mesh_3d)
    mesh = make_cartesian_mesh_3d(2, 2, 4, sx=0.01, sy=0.01, sz=0.05)
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case2_1.yaml")
    bprime = BPrimeTable.synthetic_tacot()
    model = SurfaceFluxModel()
    sys_ = AblationSystem(ops, mat, gravity=(0.0, 0.0, 0.0), top_attr=2)
    ne, nq = sys_.ne, sys_.nq
    state = AblationState.initial(ne, nq, mat)

    bc = BoundaryState(101325.0, 0.3, 1.5e6, chemistryOn=1)
    branch = classify_branch(bc, model)

    top = np.asarray(fes.boundary_dofs([2]))
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[top + n] = True  # pressure Dirichlet at the heated surface
    mask2_j = jnp.asarray(mask2)

    T = jnp.full(n, 300.0)
    p = jnp.full(n, 101325.0)
    dt = 0.05

    def residual_vec(x, T_old_q, p_old_q, X_old):
        Tv, pv = x[:n], x[n:]
        RT, Rp = sys_.residual(Tv, pv, T_old_q, p_old_q, X_old, dt)
        RT = RT + sys_.seb_face_residual(Tv, pv, X_old, bc, branch, model,
                                         bprime)
        return jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp]))

    jac = jax.jit(jax.jacfwd(residual_vec))
    resf = jax.jit(residual_vec)

    for step in range(2):
        T_old_q = ops.values_at_qp(T)
        p_old_q = ops.values_at_qp(p)
        X_old = state.extent
        x = jnp.concatenate([T, p])
        converged = False
        for it in range(12):
            R = resf(x, T_old_q, p_old_q, X_old)
            rn = float(jnp.linalg.norm(R))
            if rn < 1e-6:
                converged = True
                break
            J = jac(x, T_old_q, p_old_q, X_old)
            J = jnp.where(mask2_j[:, None], jnp.eye(2 * n), J)
            dx = jnp.linalg.solve(J, -R)
            x = x + dx
            x = x.at[jnp.asarray(top) + n].set(bc.p_w)
        assert converged, f"3D ablation Newton stalled at |R|={rn}"
        T, p = x[:n], x[n:]
        state = sys_.advance_state(state, T, p, dt)

    # the SEB heats the top surface above ambient
    assert float(T[jnp.asarray(top)].min()) > 310.0
    # interior stays bounded and finite
    assert np.isfinite(np.asarray(T)).all()
    assert float(T.max()) < 4000.0
    assert np.isfinite(np.asarray(p)).all() and (np.asarray(p) > 0).all()
    # outgassing at the surface
    diag = sys_.top_boundary_diagnostics(T, p, state, bc, branch, model,
                                         bprime)
    assert np.isfinite(diag["q_conv_surf"]) and diag["q_conv_surf"] > 0
    assert diag["BprimeG_surf"] >= 0

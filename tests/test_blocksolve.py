"""On-device block Newton-Krylov solves (solvers/blocksolve.py): the
SURVEY.md §7.3 direct-solver replacement for the MUMPS-backed ablation
Newton systems (Input/petsc_ablation*.opts)."""

import numpy as np
import pytest

REF = "/root/reference/myapps/convection_diffusion"


def _dense_from_blocks(eldofs, n, blocks, mask2):
    """Assemble the BC-eliminated dense 2n x 2n system (test oracle)."""
    JTT, JTp, JpT, Jpp = [np.asarray(b) for b in blocks]
    A = np.zeros((2 * n, 2 * n))
    for e, dofs in enumerate(np.asarray(eldofs)):
        ix = np.ix_(dofs, dofs)
        A[:n, :n][ix] += JTT[e]
        A[:n, n:][np.ix_(dofs, dofs)] += JTp[e]
        A[n:, :n][np.ix_(dofs, dofs)] += JpT[e]
        A[n:, n:][np.ix_(dofs, dofs)] += Jpp[e]
    keep = ~mask2
    A = A * keep[:, None] * keep[None, :]
    A[mask2, mask2] = 1.0
    return A


def test_block_gmres_small_synthetic():
    """Random well-posed block system on a tiny cartesian mesh: the
    equilibrated point-block GMRES must match the dense solve."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers import BlockNewtonKrylov

    mesh = make_cartesian_mesh_2d(4, 4)
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(0)
    # diagonally dominant element blocks with a large T/p scale split
    # (mimicking the ablation system's ~1e9 diag disparity)
    eyed = np.eye(nd) * nd * 4.0
    JTT = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e2
    Jpp = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e-6
    JTp = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    JpT = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    ess = np.asarray(fes.boundary_dofs())
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    A = _dense_from_blocks(ed, n, (JTT, JTp, JpT, Jpp), mask2)
    b = np.where(mask2, 0.0, rng.standard_normal(2 * n))
    x_ref = np.linalg.solve(A, b)

    bks = BlockNewtonKrylov(ed, n, ess, ess, restart=80, maxiter=10)
    fac = bks.prepare((jnp.asarray(JTT), jnp.asarray(JTp),
                       jnp.asarray(JpT), jnp.asarray(Jpp)))
    res = bks.solve(fac, jnp.asarray(b), rtol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8
    # essential dofs pass through identically
    assert np.abs(x[mask2]).max() == 0.0


def test_block_gmres_with_face_blocks():
    """SEB-style face contributions folded into the element blocks."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers import BlockNewtonKrylov

    mesh = make_cartesian_mesh_2d(3, 3)
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(1)
    eyed = np.eye(nd) * nd * 4.0
    JTT = rng.standard_normal((ne, nd, nd)) + eyed
    Jpp = rng.standard_normal((ne, nd, nd)) + eyed
    JTp = rng.standard_normal((ne, nd, nd)) * 0.1
    JpT = rng.standard_normal((ne, nd, nd)) * 0.1
    # fake face blocks on two elements (T rows only, like the SEB terms)
    face_elem = np.array([0, 2])
    FJT = rng.standard_normal((2, nd, nd)) * 0.5
    FJp = rng.standard_normal((2, nd, nd)) * 0.5
    ess = np.asarray(fes.boundary_dofs())
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess + n] = True  # p-only essential (the case-2.2 pattern)
    JTT_f = JTT.copy()
    JTp_f = JTp.copy()
    for k, e in enumerate(face_elem):
        JTT_f[e] += FJT[k]
        JTp_f[e] += FJp[k]
    A = _dense_from_blocks(ed, n, (JTT_f, JTp_f, JpT, Jpp), mask2)
    b = np.where(mask2, 0.0, rng.standard_normal(2 * n))
    x_ref = np.linalg.solve(A, b)

    bks = BlockNewtonKrylov(ed, n, np.zeros(0, dtype=np.int64), ess,
                            restart=80, maxiter=10)
    fac = bks.prepare((jnp.asarray(JTT), jnp.asarray(JTp),
                       jnp.asarray(JpT), jnp.asarray(Jpp)),
                      face=(jnp.asarray(FJT), jnp.asarray(FJp)),
                      face_elem=face_elem)
    res = bks.solve(fac, jnp.asarray(b), rtol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


@pytest.mark.slow
def test_block_gmres_matches_splu_on_case1_system():
    """First-step case-1 Jacobian on the real strip mesh/material: the
    on-device solve must agree with the host sparse-LU oracle."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from cmfem_tpu.core import FESpace
    from cmfem_tpu.core.mesh import load_gmsh
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState
    from cmfem_tpu.solvers import BlockNewtonKrylov

    mesh = load_gmsh(f"{REF}/Mesh/ablation_strip.msh")
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([1]))
    T = jnp.full(n, 300.0).at[jnp.asarray(ess)].set(1644.0)
    p = jnp.full(n, 101325.0)
    dt = 0.05
    T_old_q = ops.values_at_qp(jnp.full(n, 300.0))
    p_old_q = ops.values_at_qp(p)
    RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, state.extent, dt)
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    R = np.where(mask2, 0.0,
                 np.concatenate([np.asarray(RT), np.asarray(Rp)]))
    blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, state.extent, dt)

    # host sparse-LU oracle (the driver's default path)
    ed = np.asarray(fes.element_dofs, np.int64)
    nd = ed.shape[1]
    rb = np.repeat(ed, nd, axis=1).reshape(-1)
    cb = np.tile(ed, (1, nd)).reshape(-1)
    rows = np.concatenate([rb, rb, rb + n, rb + n])
    cols = np.concatenate([cb, cb + n, cb, cb + n])
    vals = np.concatenate([np.asarray(b).reshape(-1) for b in blocks])
    J = sp.coo_matrix((vals, (rows, cols)), shape=(2 * n, 2 * n)).tocsr()
    d = sp.diags((~mask2).astype(float))
    Jbc = (d @ J @ d + sp.diags(mask2.astype(float))).tocsc()
    dx_ref = spla.splu(Jbc).solve(-R)

    bks = BlockNewtonKrylov(fes.element_dofs, n, ess, ess)
    fac = bks.prepare(blocks)
    res = bks.solve(fac, -jnp.asarray(R), rtol=1e-11)
    assert bool(res.converged)
    dx = np.asarray(jax.block_until_ready(res.x))
    rel = np.linalg.norm(dx - dx_ref) / np.linalg.norm(dx_ref)
    # the system's conditioning bounds attainable agreement (~1e-8 floor
    # measured for ILU/no-PC/dense alike)
    assert rel < 1e-5, rel


@pytest.mark.slow
def test_case1_driver_gmres_matches_lu():
    """Three case-1 steps with linear_solver: gmres reproduce the LU run."""
    import tempfile

    from cmfem_tpu.apps.ablation_case1 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case1.yaml",
        "order": 1, "dt": 0.05, "t_final": 0.1,
        "newton_print_level": 0, "save_paraview": False,
        "output_every": 100,
    }
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        out_lu = run({**base, "output_path": d1})
        out_gm = run({**base, "output_path": d2, "linear_solver": "gmres"})
    relT = (np.abs(out_lu["T"] - out_gm["T"]).max()
            / np.abs(out_lu["T"]).max())
    relp = (np.abs(out_lu["p"] - out_gm["p"]).max()
            / np.abs(out_lu["p"]).max())
    assert relT < 1e-6
    assert relp < 1e-8


def test_block_gmres_lattice_mode_matches_default():
    """Stencil (DIA) lattice mode: identical system, gather-free matvec —
    must match both the dense oracle and the default-mode solve."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers import BlockNewtonKrylov
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice

    mesh = make_cartesian_mesh_2d(5, 7, sx=0.0025, sy=0.05)
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(2)
    eyed = np.eye(nd) * nd * 4.0
    JTT = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e2
    Jpp = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e-6
    JTp = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    JpT = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    ess = np.asarray(fes.boundary_dofs())
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    A = _dense_from_blocks(ed, n, (JTT, JTp, JpT, Jpp), mask2)
    b = np.where(mask2, 0.0, rng.standard_normal(2 * n))
    x_ref = np.linalg.solve(A, b)
    blocks = (jnp.asarray(JTT), jnp.asarray(JTp),
              jnp.asarray(JpT), jnp.asarray(Jpp))

    lat = strip_dof_lattice(fes.node_positions)
    assert sorted(lat.reshape(-1)) == list(range(n))
    bks_lat = BlockNewtonKrylov(ed, n, ess, ess, restart=80, maxiter=10,
                                dof_lattice=lat)
    res = bks_lat.solve(bks_lat.prepare(blocks), jnp.asarray(b),
                        rtol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8
    assert np.abs(x[mask2]).max() == 0.0

    bks = BlockNewtonKrylov(ed, n, ess, ess, restart=80, maxiter=10)
    x_def = np.asarray(bks.solve(bks.prepare(blocks), jnp.asarray(b),
                                 rtol=1e-12).x)
    assert np.linalg.norm(x - x_def) / np.linalg.norm(x_def) < 1e-8


def test_block_gmres_lattice_mode_order2():
    """Order-2 dof lattice (25-point stencil) with face blocks folded in."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers import BlockNewtonKrylov
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice

    mesh = make_cartesian_mesh_2d(3, 4, sx=0.0025, sy=0.05)
    fes = FESpace(mesh, 2)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(3)
    eyed = np.eye(nd) * nd * 6.0
    JTT = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e2
    Jpp = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e-6
    JTp = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    JpT = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    ess = np.asarray(fes.boundary_dofs())
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    A = _dense_from_blocks(ed, n, (JTT, JTp, JpT, Jpp), mask2)
    b = np.where(mask2, 0.0, rng.standard_normal(2 * n))
    x_ref = np.linalg.solve(A, b)

    lat = strip_dof_lattice(fes.node_positions)
    bks = BlockNewtonKrylov(ed, n, ess, ess, restart=120, maxiter=10,
                            dof_lattice=lat)
    assert bks.lattice["KO"] == 25
    res = bks.solve(bks.prepare((jnp.asarray(JTT), jnp.asarray(JTp),
                                 jnp.asarray(JpT), jnp.asarray(Jpp))),
                    jnp.asarray(b), rtol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_gmres_singular_operator_flags_nonconvergence():
    """Exact Arnoldi breakdown (h = hj1 = 0: the Krylov space hit the
    operator's nullspace) must yield a finite iterate and
    converged=False, not an inf/NaN x from a ~zero triangular pivot."""
    import jax.numpy as jnp

    from cmfem_tpu.solvers import gmres

    b = jnp.asarray(np.ones(8))
    res = gmres(lambda x: 0.0 * x, b, rtol=1e-10, restart=4, maxiter=3)
    assert bool(jnp.isfinite(res.x).all())
    assert not bool(res.converged)
    # x stays at the initial guess: no usable Krylov direction exists
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_windowed_stencil_assembly_matches_segment_sum():
    """The row-major windowed stencil assembly (nd^2 overlap-adds) must
    reproduce the segment_sum assembly exactly."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers import BlockNewtonKrylov
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice

    mesh = make_cartesian_mesh_2d(4, 6, sx=0.0025, sy=0.05)
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(5)
    eyed = np.eye(nd) * nd * 4.0
    blocks = tuple(
        jnp.asarray((rng.standard_normal((ne, nd, nd)) + eyed) * sc)
        for sc in (1e2, 1e-3, 1e-3, 1e-6))
    ess = np.asarray(fes.boundary_dofs())
    bks = BlockNewtonKrylov(ed, n, ess, ess,
                            dof_lattice=strip_dof_lattice(
                                fes.node_positions))
    assert bks.wlat is not None
    S_win, pb_w, s_w = bks._prepare_impl(*blocks)
    bks.wlat = None                     # force the segment_sum fallback
    S_seg, pb_s, s_s = bks._prepare_impl(*blocks)
    assert np.allclose(np.asarray(S_win), np.asarray(S_seg),
                       rtol=0, atol=1e-12 * float(jnp.abs(S_seg).max()))
    assert np.allclose(np.asarray(pb_w), np.asarray(pb_s))
    assert np.allclose(np.asarray(s_w), np.asarray(s_s))


def test_block_tridiag_direct_matches_dense():
    """BlockTridiagDirect (the lattice MUMPS analog) must reproduce the
    dense solve to near machine precision — it is a direct method."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.solvers.blocksolve import (BlockTridiagDirect,
                                              strip_dof_lattice)

    mesh = make_cartesian_mesh_2d(5, 9)   # NY=10 levels, NX=6 columns
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ed = np.asarray(fes.element_dofs)
    ne, nd = ed.shape
    rng = np.random.default_rng(7)
    eyed = np.eye(nd) * nd * 4.0
    JTT = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e2
    Jpp = (rng.standard_normal((ne, nd, nd)) + eyed) * 1.0e-6
    JTp = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    JpT = rng.standard_normal((ne, nd, nd)) * 1.0e-3
    ess = np.asarray(fes.boundary_dofs())
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    A = _dense_from_blocks(ed, n, (JTT, JTp, JpT, Jpp), mask2)
    b = np.where(mask2, 0.0, rng.standard_normal(2 * n))
    x_ref = np.linalg.solve(A, b)

    lat = strip_dof_lattice(fes.node_positions)
    btd = BlockTridiagDirect(ed, n, ess, ess, dof_lattice=lat)
    fac = btd.prepare((jnp.asarray(JTT), jnp.asarray(JTp),
                       jnp.asarray(JpT), jnp.asarray(Jpp)))
    res = btd.solve(fac, jnp.asarray(b))
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-11
    assert np.abs(x[mask2]).max() == 0.0


def test_block_tridiag_direct_case1_system():
    """On the real case-1 strip Jacobian at the actual step-1 Newton
    state: f64 is LU-grade (the factorization is exact arithmetic);
    f32 converges the PRECONDITIONED residual in very few Krylov
    iterations (the equilibrated system measures cond ~1e15, so f32
    SOLUTION error is meaningless for any method — GMRES's minimized
    residual is the Newton-relevant quantity, and the banded-QR M gets
    it to the floor at ~100x fewer iterations than the point-block PC)."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, load_gmsh
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.ablation import AblationState, AblationSystem
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.solvers.blocksolve import (BlockTridiagDirect,
                                              strip_dof_lattice)

    mesh = load_gmsh(f"{REF}/Mesh/ablation_strip.msh")
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=1)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([1]))
    essj = jnp.asarray(ess)
    T = jnp.full(n, 300.0).at[essj].set(1644.0)
    p = jnp.full(n, 101325.0)
    T_old_q = ops.values_at_qp(jnp.full(n, 300.0))
    p_old_q = ops.values_at_qp(p)
    X = jnp.asarray(state.extent)
    blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, X, 0.1)
    RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X, 0.1)

    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    A = _dense_from_blocks(np.asarray(fes.element_dofs), n, blocks, mask2)
    b = np.where(mask2, 0.0,
                 np.concatenate([np.asarray(RT), np.asarray(Rp)]))
    x_ref = np.linalg.solve(A, b)

    lat = strip_dof_lattice(fes.node_positions)
    btd = BlockTridiagDirect(np.asarray(fes.element_dofs), n, ess, ess,
                             dof_lattice=lat)
    # f64: direct-grade in ~1 Krylov iteration
    fac64 = btd.prepare(blocks)
    res64 = btd.solve(fac64, jnp.asarray(b), rtol=1e-12)
    rel64 = np.linalg.norm(np.asarray(res64.x) - x_ref) \
        / np.linalg.norm(x_ref)
    assert rel64 < 1e-9, rel64
    assert int(res64.inner_iters) <= 4

    # f32: converged-or-floored in << point-block-PC iterations, and the
    # direction is Newton-usable (it reduces the linearized residual)
    b32 = tuple(jnp.asarray(np.asarray(blk), jnp.float32)
                for blk in blocks)
    fac32 = btd.prepare(b32)
    res32 = btd.solve(fac32, jnp.asarray(b, jnp.float32), rtol=1e-10)
    assert bool(res32.converged) or bool(res32.stagnated)
    assert int(res32.inner_iters) <= btd.restart * btd.maxiter
    dx = np.asarray(res32.x, dtype=np.float64)
    lin_res = np.linalg.norm(b - A @ dx) / np.linalg.norm(b)
    # the unscaled linearized residual after the update must drop hard
    assert lin_res < 5e-3, lin_res

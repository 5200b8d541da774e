"""DOF-partitioned distributed operator (parallel/dofpart.py) on the
8-device virtual CPU mesh: the unstructured true-dof analog of the
reference's ParFiniteElementSpace (linear_convection_diffusion_2D.cpp:
312-322, SURVEY.md §2.4).  Unlike the replicated-vector path, per-device
memory scales ∝ 1/N."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def problem():
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.ops import SpaceOps, BilinearForm

    mesh = make_cartesian_mesh_3d(6, 6, 6)
    fes = FESpace(mesh, 2)
    ops = SpaceOps(fes, quad_order=4)
    form = (BilinearForm(ops).add_mass(1.0).add_diffusion(0.1)
            .add_convection(np.array([1.0, -2.0, 0.5])))
    data = form.assemble()
    spd_form = BilinearForm(ops).add_mass(1.0).add_diffusion(0.1)
    spd = spd_form.assemble()
    diag = np.asarray(spd_form.assemble_diagonal(spd))
    return fes, ops, data, spd, diag


def test_dofpart_apply_matches_replicated(problem):
    import jax
    import jax.numpy as jnp

    from cmfem_tpu.ops.partial import PAOperator
    from cmfem_tpu.parallel import DofPartitionedOperator, make_device_mesh

    fes, ops, data, _, _ = problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    op = DofPartitionedOperator(ops, data, dev_mesh)

    # memory scaling: owned slab + ghosts far below the global vector
    assert op.per_device_floats() < fes.nscalar / 2
    assert op.nown_max <= fes.nscalar // op.ndev + op.n_interface

    fn, Dflat, eldofs = PAOperator(ops, data, dtype=jnp.float64).bind()
    rng = np.random.default_rng(3)
    u = rng.standard_normal(fes.nscalar)
    y_ref = np.asarray(fn(jnp.asarray(u), Dflat, eldofs))
    y = op.from_dist(op(op.to_dist(u)))
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 1e-12


def test_dofpart_roundtrip_layout(problem):
    import jax

    from cmfem_tpu.parallel import DofPartitionedOperator, make_device_mesh

    fes, ops, data, _, _ = problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    op = DofPartitionedOperator(ops, data, dev_mesh)
    rng = np.random.default_rng(4)
    u = rng.standard_normal(fes.nscalar)
    assert np.array_equal(op.from_dist(op.to_dist(u)), u)


def test_dofpart_memory_weak_scaling(problem):
    """Per-device memory scales down with the device count: the owned slab
    is ~nglobal/N and the ghost layer is a surface term, so doubling N
    keeps shrinking the per-device footprint (the scaling evidence the
    replicated-vector path cannot give)."""
    import jax

    from cmfem_tpu.ops.partial import PAOperator
    from cmfem_tpu.parallel import DofPartitionedOperator, make_device_mesh

    fes, ops, data, _, _ = problem
    import jax.numpy as jnp

    fn, Dflat, eldofs = PAOperator(ops, data, dtype=jnp.float64).bind()
    rng = np.random.default_rng(7)
    u = rng.standard_normal(fes.nscalar)
    y_ref = np.asarray(fn(jnp.asarray(u), Dflat, eldofs))
    scale = np.abs(y_ref).max()

    floats = {}
    for ndev in (2, 4, 8):
        op = DofPartitionedOperator(ops, data, make_device_mesh(ndev))
        floats[ndev] = op.per_device_floats()
        # owned slab bounded by a balanced share plus the interface
        assert op.nown_max <= fes.nscalar // ndev + op.n_interface
        # correctness at every device count, not just N=8
        y = op.from_dist(op(op.to_dist(u)))
        assert np.abs(y - y_ref).max() / scale < 1e-12

    assert floats[2] > floats[4] > floats[8]
    # doubling devices keeps buying memory (surface term limits the gain)
    assert floats[4] < 0.75 * floats[2]
    assert floats[8] < 0.75 * floats[4]


def test_dofpart_cg_matches_replicated_solve(problem):
    """CG runs unchanged on the distributed vectors (padding slots stay
    zero; GSPMD inserts the collectives) and matches the single-device
    solve to 1e-12."""
    import jax
    import jax.numpy as jnp

    from cmfem_tpu.ops.partial import PAOperator
    from cmfem_tpu.parallel import DofPartitionedOperator, make_device_mesh
    from cmfem_tpu.solvers import cg

    fes, ops, _, spd, diag = problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    op = DofPartitionedOperator(ops, spd, dev_mesh)

    rng = np.random.default_rng(5)
    b = rng.standard_normal(fes.nscalar)

    fn, Dflat, eldofs = PAOperator(ops, spd, dtype=jnp.float64).bind()
    res_ref = cg(lambda v: fn(v, Dflat, eldofs), jnp.asarray(b),
                 M=lambda r: r / jnp.asarray(diag), rtol=1e-13,
                 maxiter=2000)
    assert bool(res_ref.converged)
    x_ref = np.asarray(res_ref.x)

    b_d = op.to_dist(b)
    dinv_d = op.to_dist(1.0 / diag)
    # padded preconditioner slots are 0 -> r stays 0 there
    res = cg(op, b_d, M=lambda r: dinv_d * r, rtol=1e-13, maxiter=2000)
    assert bool(res.converged)
    x = op.from_dist(res.x)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-10, rel


@pytest.fixture(scope="module")
def ablation_problem():
    """Small coupled (T,p)+SEB strip for the dof-partitioned flagship."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.bprime import BPrimeTable
    from cmfem_tpu.physics.seb import SurfaceFluxModel, classify_branch
    from cmfem_tpu.physics.surface_bc import BoundaryState
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState

    REF = "/root/reference/myapps/convection_diffusion"
    mesh = make_cartesian_mesh_2d(4, 16, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([3]))
    n = fes.nscalar
    bc = BoundaryState(101325.0, 0.3, 1.5e6, chemistryOn=1)
    model = SurfaceFluxModel()
    bprime = BPrimeTable.synthetic_tacot()
    branch = classify_branch(bc, model)
    rng = np.random.default_rng(11)
    T = jnp.asarray(300.0 + 900.0 * rng.random(n))
    p = jnp.asarray(101325.0 * (1.0 + 0.1 * rng.random(n)))
    p = p.at[jnp.asarray(ess)].set(bc.p_w)
    To_q = ops.values_at_qp(jnp.full(n, 300.0))
    po_q = ops.values_at_qp(jnp.full(n, 101325.0))
    return (sys_, fes, ess, T, p, To_q, po_q, state.extent, 0.05,
            (branch, model, bprime), bc)


def test_dofpart_ablation_residual_and_newton_match(ablation_problem):
    """The flagship coupled (T,p)+SEB Newton step with DOF-partitioned
    vectors matches the replicated single-device path: residual to 1e-12,
    the equilibrated block-GMRES direction to solver tolerance, and
    per-device memory shrinks with the device count."""
    import jax
    import jax.numpy as jnp

    from cmfem_tpu.parallel import (
        DofPartitionedAblationNewton, make_device_mesh,
    )
    from cmfem_tpu.solvers import BlockNewtonKrylov

    (sys_, fes, ess, T, p, To_q, po_q, X, dt, seb,
     bc) = ablation_problem
    branch, model, bprime = seb
    n = fes.nscalar
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess + n] = True
    mask2_j = jnp.asarray(mask2)

    # single-device reference
    RT, Rp = sys_.residual(T, p, To_q, po_q, X, dt)
    RT = RT + sys_.seb_face_residual(T, p, X, bc, branch, model, bprime)
    R_ref = np.asarray(jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp])))
    bks = BlockNewtonKrylov(fes.element_dofs, n,
                            np.zeros(0, dtype=np.int64), ess,
                            restart=400, maxiter=10)
    blocks = sys_.element_jacobians(T, p, To_q, po_q, X, dt)
    face = sys_.seb_face_jacobians(T, p, X, bc, branch, model, bprime)
    fac = bks.prepare(blocks, face=face, face_elem=sys_.trace.elem)
    res_ref = bks.solve(fac, -jnp.asarray(R_ref), rtol=1e-12)
    assert bool(res_ref.converged)
    dx_ref = np.asarray(res_ref.x)

    floats = {}
    for ndev in (2, 8):
        dn = DofPartitionedAblationNewton(
            sys_, make_device_mesh(ndev), np.zeros(0, dtype=np.int64),
            ess, seb=seb)
        floats[ndev] = dn.per_device_floats()
        y = dn.to_dist2(T, p)
        To = dn.pack_elem(np.asarray(To_q), "dup")
        po = dn.pack_elem(np.asarray(po_q), "dup")
        Xo = dn.pack_elem(np.asarray(X), "dup")
        R_d = dn.residual(y, To, po, Xo, dt, bc=bc)
        RT_d, Rp_d = dn.from_dist2(R_d)
        R_dist = np.concatenate([RT_d, Rp_d])
        scale = np.abs(R_ref).max()
        assert np.abs(R_dist - R_ref).max() / scale < 1e-12, ndev

        fac_d = dn.prepare(y, To, po, Xo, dt, bc=bc)
        res_d = dn.solve(fac_d, -R_d, rtol=1e-12)
        assert bool(res_d.converged), ndev
        dxT, dxp = dn.from_dist2(res_d.x)
        dx_dist = np.concatenate([dxT, dxp])
        # both Krylov paths solve the same equilibrated system to 1e-12;
        # compare per-field (T and p live on wildly different scales)
        for sl in (slice(0, n), slice(n, 2 * n)):
            num = np.linalg.norm(dx_dist[sl] - dx_ref[sl])
            den = np.linalg.norm(dx_ref[sl])
            assert num / den < 1e-7, (ndev, sl, num / den)

    # the distributed two-field vector shrinks with the device count
    assert floats[8] < 0.6 * floats[2]
    assert floats[8] < 2 * fes.nscalar / 2  # well below replicated 2n


@pytest.mark.slow
def test_case1_and_case21_drivers_dof_partitioned_match_lu():
    """dof_partition: 8 runs the case-1 and case-2.1 drivers' Newton
    steps with DOF-partitioned (T,p) vectors over the virtual device mesh
    (the ParFESpace true-dof analog of mpirun -np N) and reproduces the
    host-LU runs, including the per-flux-branch SEB instances."""
    import tempfile

    from cmfem_tpu.apps.ablation_case1 import run as run1
    from cmfem_tpu.apps.ablation_case2_1 import run as run21

    REF = "/root/reference/myapps/convection_diffusion"
    for runner, extra in (
            (run1, {"material_file":
                    f"{REF}/Input/material_tacot_case1.yaml"}),
            (run21, {"material_file":
                     f"{REF}/Input/material_tacot_case2_1.yaml",
                     "boundary_conditions_file":
                     f"{REF}/Input/"
                     "boundary_conditions_ablation_case2_1.dat"})):
        base = {
            "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
            "order": 1, "dt": 0.05, "t_final": 0.1,
            "newton_print_level": 0, "save_paraview": False,
            "output_every": 100, **extra,
        }
        with tempfile.TemporaryDirectory() as d1, \
                tempfile.TemporaryDirectory() as d2:
            out_lu = runner({**base, "output_path": d1})
            out_dp = runner({**base, "output_path": d2,
                             "dof_partition": 8})
        relT = (np.abs(out_lu["T"] - out_dp["T"]).max()
                / np.abs(out_lu["T"]).max())
        relp = (np.abs(out_lu["p"] - out_dp["p"]).max()
                / np.abs(out_lu["p"]).max())
        assert relT < 1e-6, runner.__module__
        assert relp < 1e-8, runner.__module__


@pytest.mark.slow
def test_case22_driver_dof_partitioned_matches_lu():
    """VERDICT r2 #7: dof_partition on the MOVING-MESH driver — geometry
    and SEB face factors re-packed after every mesh move
    (DofPartitionedAblationNewton.update_geometry), ALE advective terms
    through the partitioned residual/Jacobian — reproduces the host-LU
    run at 2 and 8 devices."""
    import tempfile

    from cmfem_tpu.apps.ablation_case2_2 import run as run22

    REF = "/root/reference/myapps/convection_diffusion"
    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file":
            f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1, "dt": 0.05, "t_final": 0.1,
        "newton_print_level": 0, "save_paraview": False,
        "output_every": 100,
        "recession_density_mode": "char_surface",
        "max_step_recession": 2.0e-4,
    }
    with tempfile.TemporaryDirectory() as d1:
        out_lu = run22({**base, "output_path": d1})
    for ndev in (2, 8):
        with tempfile.TemporaryDirectory() as d2:
            out_dp = run22({**base, "output_path": d2,
                            "dof_partition": ndev})
        relT = (np.abs(out_lu["T"] - out_dp["T"]).max()
                / np.abs(out_lu["T"]).max())
        relp = (np.abs(out_lu["p"] - out_dp["p"]).max()
                / np.abs(out_lu["p"]).max())
        assert relT < 1e-6, ndev
        assert relp < 1e-8, ndev
        assert np.abs(out_lu["vertices"] - out_dp["vertices"]).max() < 1e-9
        assert out_dp["recession_total"] == pytest.approx(
            out_lu["recession_total"], rel=1e-6)


def test_partition_more_parts_than_elements():
    """RCB must tolerate nparts >> ne (tiny smoke meshes on big virtual
    device meshes): empty recursion subsets may leave trailing parts
    empty but every element gets a valid id."""
    from cmfem_tpu.core import make_cartesian_mesh_2d
    from cmfem_tpu.parallel.partition import (
        partition_elements, partition_permutation,
    )

    mesh = make_cartesian_mesh_2d(2, 2)   # 4 elements
    parts = partition_elements(mesh, 16)
    assert parts.shape == (4,)
    assert parts.min() >= 0 and parts.max() < 16
    perm, counts = partition_permutation(parts, nparts=16)
    assert len(counts) == 16 and counts.sum() == 4
    perm0, counts0 = partition_permutation(np.array([0, 0, 1]))
    assert len(counts0) == 2 and list(counts0) == [2, 1]


def test_dofpart_rejects_out_of_range_parts(problem):
    from cmfem_tpu.parallel import DofPartitionedOperator, make_device_mesh

    fes, ops, data, _, _ = problem
    parts = np.zeros(fes.mesh.num_elements, dtype=np.int64)
    parts[0] = 7   # computed for a different device count
    with pytest.raises(ValueError, match="parts ids"):
        DofPartitionedOperator(ops, data, make_device_mesh(4), parts=parts)

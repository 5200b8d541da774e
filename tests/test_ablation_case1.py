"""Ablation case 1: coupled (T,p) pyrolysis driver (short smoke)."""

import numpy as np
import pytest

REF = "/root/reference/myapps/convection_diffusion"


@pytest.fixture(scope="module")
def case1_out(tmp_path_factory):
    from cmfem_tpu.apps.ablation_case1 import run

    out_dir = tmp_path_factory.mktemp("case1")
    cfg = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case1.yaml",
        "order": 1,
        "dt": 0.05,
        "t_final": 0.15,
        "newton_print_level": 0,
        "output_path": str(out_dir),
        "save_paraview": False,
        "output_every": 100,
    }
    return run(cfg), out_dir


@pytest.mark.slow
def test_case1_runs_and_heats(case1_out):
    out, out_dir = case1_out
    T = out["T"]
    # wall at 1644 K ramps by t=0.1; top boundary dofs should be heated
    assert T.max() > 1600.0
    # bottom stays cold
    assert abs(T.min() - 300.0) < 1.0
    assert np.isfinite(out["p"]).all()
    assert (out["p"] > 0).all()


@pytest.mark.slow
def test_case1_state_physical(case1_out):
    out, _ = case1_out
    st = out["state"]
    assert (st.tau_elem <= 1.0 + 1e-12).all()
    assert (st.tau_elem >= 0.0).all()
    # some charring near the hot wall
    assert st.tau_elem.min() < 0.999
    # density between char and virgin bounds
    assert st.rho_elem.min() >= 220.0 - 1e-9
    assert st.rho_elem.max() <= 280.0 + 1e-9


@pytest.mark.slow
def test_case1_csv_outputs(case1_out):
    _, out_dir = case1_out
    probes = (out_dir / "temperature_probes.csv").read_text().splitlines()
    assert probes[0] == "time,wall,TC1,TC2,TC3,TC4,TC5,TC6,TC7"
    assert len(probes) == 5  # header + t=0 + 3 steps
    mass = (out_dir / "mass_metrics.csv").read_text().splitlines()
    assert mass[0] == "time,m_dot_g_surf,m_dot_c,front_98_virgin,front_2_char,recession"
    last = [float(v) for v in mass[-1].split(",")]
    assert last[1] > 0.0  # outgassing at the heated wall
    tol = (out_dir / "fiat_error_tolerances.csv").read_text()
    assert "temperature_rmse_max,150" in tol


@pytest.mark.slow
def test_case1_scan_stepping_matches_eager(case1_out):
    """scan_stepping: true (the whole transient solve as one lax.scan
    program with in-scan Newton + on-device block GMRES) reproduces the
    eager host-loop driver."""
    import numpy as np

    from cmfem_tpu.apps.ablation_case1 import run

    out_e, out_dir = case1_out
    cfg = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case1.yaml",
        "order": 1,
        "dt": 0.05,
        "t_final": 0.15,
        "newton_print_level": 0,
        "output_path": str(out_dir) + "_scan",
        "save_paraview": False,
        "output_every": 100,
        "scan_stepping": True,
    }
    out_s = run(cfg)
    relT = np.abs(out_e["T"] - out_s["T"]).max() / np.abs(out_e["T"]).max()
    relp = np.abs(out_e["p"] - out_s["p"]).max() / np.abs(out_e["p"]).max()
    assert relT < 1e-6
    assert relp < 1e-8
    assert np.abs(out_e["state"].tau_elem
                  - out_s["state"].tau_elem).max() < 1e-8
    import pathlib
    probes = pathlib.Path(cfg["output_path"], "temperature_probes.csv") \
        .read_text().splitlines()
    assert probes[0] == "time,wall,TC1,TC2,TC3,TC4,TC5,TC6,TC7"
    assert len(probes) == 5
    newton = pathlib.Path(
        cfg["output_path"],
        "newton_history_ablation_case1_2D.csv").read_text().splitlines()
    # per-iteration rows with a converged=1 terminator per step
    assert newton[0].startswith("step,time,iter,residual")
    assert sum(1 for r in newton[1:] if r.endswith(",1")) == 3


@pytest.mark.slow
def test_case1_reference_smoke_yaml_verbatim(tmp_path):
    """The reference's own Input/input_ablation_case1_smoke.yaml drives the
    driver key-for-key (mesh/material paths, top_temperature_schedule,
    probes, acceptance echo; petsc_*/ksp_prefix/bdr_attr_sides/fiat_* are
    tolerated like the reference tolerates unknown keys).  Only the output
    location and horizon are overridden (3 steps for CI)."""
    from cmfem_tpu.apps.ablation_case1 import run
    from cmfem_tpu.utils.yamlcfg import load_yaml

    cfg = load_yaml(f"{REF}/Input/input_ablation_case1_smoke.yaml")
    cfg.update(output_path=str(tmp_path), save_paraview=False,
               t_final=0.15, newton_print_level=0)
    out = run(cfg)
    assert out["T"].max() > 1600.0 and np.isfinite(out["p"]).all()
    tol = (tmp_path / "fiat_error_tolerances.csv").read_text()
    assert "temperature_rmse_max,150" in tol
    probes = (tmp_path / "temperature_probes.csv").read_text().splitlines()
    assert probes[0] == "time,wall,TC1,TC2,TC3,TC4,TC5,TC6,TC7"


@pytest.mark.slow
def test_case1_order2_with_gmres_solver():
    """Beyond-reference: the coupled (T,p) solve runs at H1 order 2 (the
    reference's ablation drivers are order-1 only), including the
    on-device block-GMRES linear solver on the 18-dof element blocks."""
    import tempfile

    import numpy as np

    from cmfem_tpu.apps.ablation_case1 import run

    with tempfile.TemporaryDirectory() as d:
        out = run({
            "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
            "material_file": f"{REF}/Input/material_tacot_case1.yaml",
            "order": 2, "dt": 0.05, "t_final": 0.1,
            "newton_print_level": 0, "save_paraview": False,
            "output_every": 100, "output_path": d,
            "linear_solver": "gmres",
            # window-slicing residual on the renumbered GMSH strip
            "lattice_residual": True,
        })
    assert np.isfinite(out["T"]).all()
    assert out["T"].max() > 1600.0
    assert out["state"].tau_elem.min() < 0.99


@pytest.mark.parametrize("order", [1, 2])
def test_lattice_residual_matches_generic(order):
    """The window-slicing strip-lattice residual (ops/lattice2d.py,
    AblationSystem.set_dof_lattice) must reproduce the generic
    gather/segment_sum path bit-for-bit up to reassociation (f64)."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice

    mesh = make_cartesian_mesh_2d(3, 7, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, order)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=2 * order + 2)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    rng = np.random.default_rng(0)
    T = jnp.asarray(300.0 + 900.0 * rng.random(n))
    p = jnp.asarray(101325.0 * (1.0 + 0.3 * rng.random(n)))
    To = ops.values_at_qp(jnp.full(n, 300.0))
    po = ops.values_at_qp(jnp.full(n, 101325.0))
    Xo = state.extent
    dt = 0.05
    RT0, Rp0 = sys_.residual(T, p, To, po, Xo, dt)

    lat = strip_dof_lattice(fes.node_positions)
    lp = sys_.set_dof_lattice(lat)
    assert (lp.nyc, lp.nxc) == (7, 3)
    RT1, Rp1 = sys_.residual(T, p, To, po, Xo, dt)
    scale_T = float(jnp.abs(RT0).max())
    scale_p = float(jnp.abs(Rp0).max())
    assert float(jnp.abs(RT1 - RT0).max()) < 1e-12 * scale_T
    assert float(jnp.abs(Rp1 - Rp0).max()) < 1e-12 * scale_p

    # the lattice path must survive an enclosing jit trace (interp bakes
    # concrete numpy tabulations; device-array slices would be tracers)
    import jax
    RTj, Rpj = jax.jit(
        lambda T_, p_: sys_.residual(T_, p_, To, po, Xo, dt))(T, p)
    assert float(jnp.abs(RTj - RT0).max()) < 1e-9 * scale_T
    assert float(jnp.abs(Rpj - Rp0).max()) < 1e-9 * scale_p

    # gather/scatter primitives round-trip
    u = jnp.asarray(rng.random(n))
    ul = lp.to_lat(u)
    assert float(jnp.abs(lp.from_lat(ul) - u).max()) == 0.0
    ue = lp.gather_elem(ul)
    assert np.allclose(np.asarray(ue), np.asarray(u)[fes.element_dofs])
    ye = jnp.asarray(rng.random(ue.shape))
    ys = lp.scatter(ye)
    import jax
    yref = jax.ops.segment_sum(ye.reshape(-1),
                               jnp.asarray(np.asarray(fes.element_dofs,
                                                      np.int64).reshape(-1)),
                               num_segments=n)
    assert float(jnp.abs(ys - yref).max()) < 1e-13


def test_strip_element_reorder_enables_lattice():
    """GMSH transfinite strips enumerate elements in generator order;
    strip_element_order renumbers them row-major so the window-slicing
    residual qualifies on the reference meshes (driver opt-in
    ``lattice_residual: true`` -> maybe_reorder_strip_mesh)."""
    from cmfem_tpu.apps.common import load_mesh_from_cfg
    from cmfem_tpu.core import FESpace
    from cmfem_tpu.ops.lattice2d import (
        StripLatticeOps, reorder_mesh_elements, strip_element_order,
    )
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice

    mesh = load_mesh_from_cfg(
        {"mesh_file": f"{REF}/Mesh/ablation_strip.msh"})
    order = strip_element_order(mesh)
    assert not (order == np.arange(len(order))).all()
    mesh2 = reorder_mesh_elements(mesh, order)
    assert sorted(map(tuple, mesh2.elem_conn.tolist())) \
        == sorted(map(tuple, mesh.elem_conn.tolist()))
    fes = FESpace(mesh2, 1)
    lp = StripLatticeOps(fes.element_dofs, fes.nscalar,
                         strip_dof_lattice(fes.node_positions))
    assert (lp.nyc, lp.nxc) == (239, 11)


def test_element_jacobians_chunked_matches_unchunked(monkeypatch):
    """CMFEM_ELEMJAC_CHUNK splits the element axis of the AD Jacobian
    build through lax.map (the tangent-vmapped table one-hots OOM'd at
    refine-3 scale); blocks must match the single-vmap path."""
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState

    REF = "/root/reference/myapps/convection_diffusion"
    mesh = make_cartesian_mesh_2d(6, 11, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    T = jnp.full(n, 300.0).at[0].set(1000.0)
    p = jnp.full(n, 101325.0)
    To = ops.values_at_qp(jnp.full(n, 300.0))
    po = ops.values_at_qp(p)
    ref = sys_.element_jacobians(T, p, To, po, state.extent, 0.05)
    monkeypatch.setenv("CMFEM_ELEMJAC_CHUNK", "7")
    ch = sys_.element_jacobians(T, p, To, po, state.extent, 0.05)
    for a, b in zip(ref, ch):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 1e-12 * max(float(jnp.max(jnp.abs(a))), 1.0)

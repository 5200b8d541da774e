"""Case 2.1: B' table, surface schedule, SEB fluxes, driver + restart."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference/myapps/convection_diffusion"


def test_bprime_synthetic_lookup_shapes_and_derivs():
    from cmfem_tpu.physics.bprime import BPrimeTable

    bt = BPrimeTable.synthetic_tacot()
    T = jnp.asarray([500.0, 1500.0, 3000.0])
    p = jnp.full(3, 101325.0)
    bg = jnp.full(3, 0.1)
    out = bt.lookup(p, bg, T)
    assert out["bc"].shape == (3,)
    # B'c increases with T at fixed B'g
    v = np.asarray(out["bc"])
    assert v[2] > v[1] > v[0] - 1e-12
    # dbc_dT consistent with FD
    eps = 1e-3
    vp = np.asarray(bt.lookup(p, bg, T + eps)["bc"])
    vm = np.asarray(bt.lookup(p, bg, T - eps)["bc"])
    np.testing.assert_allclose(np.asarray(out["dbc_dT"]), (vp - vm) / (2 * eps),
                               rtol=1e-4, atol=1e-9)
    # clamped outside
    out2 = bt.lookup(jnp.asarray([1.0]), jnp.asarray([100.0]), jnp.asarray([5000.0]))
    assert bool(out2["clamped_p"][0]) and bool(out2["clamped_bg"][0])
    assert bool(out2["clamped_t"][0])


def test_bprime_ragged_table_per_level_splines():
    """Ragged B' tables — per-(p, B'g)-level T rows of different counts
    and positions, as real PATO decks commonly are — must load and
    evaluate with one cubic spline per level over that level's own rows
    (bprime_table.cpp:253-371; VERDICT r4 missing #4).  Cross-check
    values and dT-derivatives against scipy per-level natural splines
    combined with the same linear-B'g / log-linear-p mixing."""
    from scipy.interpolate import CubicSpline

    from cmfem_tpu.physics.bprime import BPrimeTable

    rng = np.random.default_rng(7)
    ps = [1013.25, 101325.0]
    bgs = [0.01, 0.1, 1.0]
    rows = []           # (p, bg, bc, T, hw)
    grids = {}
    for i, pv in enumerate(ps):
        for j, bgv in enumerate(bgs):
            nT = 5 + 3 * ((i + j) % 3)          # ragged: 5, 8, or 11 rows
            Tlo = 300.0 + 50.0 * i + 20.0 * j    # ragged: shifted ranges
            Tg = np.sort(Tlo + np.cumsum(150.0 + 50.0 * rng.random(nT)))
            bcv = 0.1 + 0.05 * j + 1e-4 * (Tg - Tg[0]) \
                + 2e-8 * (Tg - Tg[0]) ** 2
            hwv = 1e3 * (Tg - 298.0) - 1e5 * bgv
            grids[i, j] = (Tg, bcv, hwv)
            for k in range(nT):
                rows.append((pv, bgv, bcv[k], Tg[k], hwv[k]))
    arr = np.asarray(rows)
    bt = BPrimeTable.from_rows(arr[:, 0], arr[:, 1], arr[:, 2],
                               arr[:, 3], arr[:, 4])
    assert not bt.uniform

    Tq = np.asarray([450.0, 900.0, 1700.0, 2600.0])
    pq = np.full(4, 5000.0)
    bgq = np.full(4, 0.3)
    out = bt.lookup(jnp.asarray(pq), jnp.asarray(bgq), jnp.asarray(Tq))

    # oracle: per-level scipy natural splines (clamped to each level's
    # own range), then linear in B'g, log-linear in p
    def level_eval(i, j, T):
        Tg, bcv, _ = grids[i, j]
        cs = CubicSpline(Tg, bcv, bc_type="natural")
        return cs(np.clip(T, Tg[0], Tg[-1]))

    def expect(T):
        vals_p = []
        for i in range(len(ps)):
            v0 = level_eval(i, 1, T)   # bg=0.1
            v1 = level_eval(i, 2, T)   # bg=1.0
            w = (0.3 - 0.1) / (1.0 - 0.1)
            vals_p.append((1 - w) * v0 + w * v1)
        lw = (np.log(5000.0) - np.log(ps[0])) \
            / (np.log(ps[1]) - np.log(ps[0]))
        return (1 - lw) * vals_p[0] + lw * vals_p[1]

    np.testing.assert_allclose(np.asarray(out["bc"]), expect(Tq),
                               rtol=1e-10, atol=1e-12)
    # dT derivative via FD of the mixed oracle (all queries interior to
    # every level's range at 900/1700 K)
    eps = 1e-3
    fd = (expect(Tq[1:3] + eps) - expect(Tq[1:3] - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(out["dbc_dT"])[1:3], fd,
                               rtol=1e-6, atol=1e-10)
    # per-level clamping: 450 K is below the T range of the higher-p
    # levels (Tlo >= 350) but inside the low-p bg-mid level — the clamp
    # flag ORs over levels, value stays finite and continuous
    assert np.isfinite(np.asarray(out["bc"])).all()
    # a query beyond every level's top knot clamps with zero derivative
    hiq = bt.lookup(jnp.asarray([5000.0]), jnp.asarray([0.3]),
                    jnp.asarray([9000.0]))
    assert bool(hiq["clamped_t"][0])
    assert abs(float(hiq["dbc_dT"][0])) < 1e-14


def test_bprime_uniform_table_unchanged_by_ragged_support():
    """The synthetic (uniform-grid) table must load with uniform=True
    and keep the shared-grid semantics byte-for-byte."""
    from cmfem_tpu.physics.bprime import BPrimeTable

    bt = BPrimeTable.synthetic_tacot()
    assert bt.uniform
    assert bt.T_tab.shape[:2] == (3, 6)
    np.testing.assert_array_equal(bt.T_tab[0, 0], bt.T_tab[-1, -1])
    np.testing.assert_array_equal(bt.T_hi, bt.T_tab[..., -1])


def test_surface_schedule_parsing_and_chemistry_toggle():
    from cmfem_tpu.physics.surface_bc import SurfaceBCSchedule

    s = SurfaceBCSchedule.load_file(
        f"{REF}/Input/boundary_conditions_ablation_case2_1.dat")
    b0 = s.eval(0.05)
    assert b0.chemistryOn == 1
    assert abs(b0.rhoeUeCH - 0.15) < 1e-12  # linear between 0 and 0.3
    b1 = s.eval(30.0)
    assert abs(b1.rhoeUeCH - 0.3) < 1e-12 and abs(b1.h_r - 1.5e6) < 1e-6
    # chemistry toggles OFF (left-constant) after 60.1
    b2 = s.eval(60.05)
    assert b2.chemistryOn == 1  # row at 60.0 is still on
    b3 = s.eval(61.0)
    assert b3.chemistryOn == 0


def test_surface_schedule_exact_node_takes_pre_node_chemistry():
    """At a time landing EXACTLY on an interior schedule node, the
    left-constant chemistry toggle takes the PRE-node row — reference
    scan semantics (surface_bc_schedule.cpp:124-169: hi = first row with
    t_hi >= time, chemistryOn = rows[hi-1]).  A side='right' bisection
    flips the flux branch one full step early."""
    import tempfile

    from cmfem_tpu.physics.surface_bc import SurfaceBCSchedule

    with tempfile.NamedTemporaryFile("w", suffix=".dat",
                                     delete=False) as f:
        f.write("0.0   101325 0.0 1.0e6 0\n")
        f.write("60.0  101325 0.3 1.5e6 1\n")
        f.write("120.0 101325 0.3 1.5e6 1\n")
        path = f.name
    s = SurfaceBCSchedule.load_file(path)
    assert s.eval(59.9).chemistryOn == 0
    assert s.eval(60.0).chemistryOn == 0   # pre-node row governs
    assert s.eval(60.1).chemistryOn == 1
    # continuous columns are unaffected (node value either way)
    assert abs(s.eval(60.0).rhoeUeCH - 0.3) < 1e-12


def test_blowing_correction_properties():
    from cmfem_tpu.physics.seb import blowing_correction, solve_blowing

    Bg = jnp.asarray([0.0, 1e-12, 0.01, 0.1, 1.0, 10.0])
    phi = np.asarray(blowing_correction(Bg, 0.5))
    assert abs(phi[0] - 1.0) < 1e-12
    assert np.all(np.diff(phi) < 0)  # strictly decreasing
    # fixed point: Bg ~= mdot / (rhoeUeCH * phi(Bg)) after the reference's
    # 3 fixed iterations (:647)
    m = jnp.asarray([0.01])
    Bg_s, phi_s = solve_blowing(m, 0.3, 0.5, True)
    resid = float(Bg_s[0] - m[0] / (0.3 * phi_s[0]))
    assert abs(resid) < 1e-5


def test_seb_flux_branches():
    from cmfem_tpu.physics.seb import (
        SurfaceFluxModel, classify_branch, surface_flux,
        BRANCH_CHEMISTRY_BLOWING, BRANCH_COOLING_STANDARD,
        BRANCH_COOLING_EXACT,
    )
    from cmfem_tpu.physics.surface_bc import BoundaryState
    from cmfem_tpu.physics.bprime import BPrimeTable

    bt = BPrimeTable.synthetic_tacot()
    model = SurfaceFluxModel()
    bc_hot = BoundaryState(101325.0, 0.3, 1.5e6, chemistryOn=1)
    bc_cool = BoundaryState(101325.0, 0.0, 0.0, chemistryOn=0)
    assert classify_branch(bc_hot, model) == BRANCH_CHEMISTRY_BLOWING
    assert classify_branch(bc_cool, model) == BRANCH_COOLING_STANDARD
    model_ce = SurfaceFluxModel(pato_compat_mode="cooling_exact")
    assert classify_branch(bc_cool, model_ce) == BRANCH_COOLING_EXACT

    T = jnp.asarray([[1000.0]])
    z = jnp.zeros((1, 1))
    terms = surface_flux(z + 0.01, z + 1e6, T, z + 0.85, z + 0.85, z + 0.15,
                         bc_hot, BRANCH_CHEMISTRY_BLOWING, model, bt)
    # heating: q_conv dominates at 1000 K wall
    assert float(terms["q_conv"][0, 0]) > 1e5
    assert float(terms["q_rad_emit"][0, 0]) < 0
    # cooling-exact at same state: no chemistry terms
    terms2 = surface_flux(z + 0.01, z + 1e6, T, z + 0.85, z + 0.85, z + 0.15,
                          bc_cool, BRANCH_COOLING_EXACT, model_ce, bt)
    assert float(terms2["h_w"][0, 0]) == 0.0
    assert float(terms2["q_adv_pyro"][0, 0]) == pytest.approx(-0.01 * 1e6)


@pytest.fixture(scope="module")
def case21_out(tmp_path_factory):
    from cmfem_tpu.apps.ablation_case2_1 import run

    out_dir = tmp_path_factory.mktemp("case21")
    cfg = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_1.yaml",
        "boundary_conditions_file": f"{REF}/Input/boundary_conditions_ablation_case2_1.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.3,
        "newton_print_level": 0,
        "output_path": str(out_dir),
        "save_paraview": False,
        "restart_write_file": str(out_dir / "restart.chk"),
        "restart_write_at_time": 0.2,
        # keep the t=0.2 snapshot so the resume genuinely re-runs 0.2->0.3
        # (the default end-of-run rewrite would clobber it)
        "restart_write_at_end": False,
    }
    return run(cfg), out_dir, cfg


@pytest.mark.slow
def test_case21_reference_smoke_yaml_verbatim(tmp_path):
    """The reference's own Input/input_ablation_case2_1_smoke.yaml drives
    the driver key-for-key (SEB keys, jacobian_check knobs, CSV names; the
    author-local B' table path falls back to the synthetic table).  Only
    output location and horizon overridden."""
    from cmfem_tpu.apps.ablation_case2_1 import run
    from cmfem_tpu.utils.yamlcfg import load_yaml

    cfg = load_yaml(f"{REF}/Input/input_ablation_case2_1_smoke.yaml")
    cfg.update(output_path=str(tmp_path), save_paraview=False,
               t_final=0.2, newton_print_level=0)
    out = run(cfg)
    assert out["T"].max() > 320.0 and np.isfinite(out["p"]).all()
    bdr = (tmp_path / "boundary_diagnostics.csv").read_text().splitlines()
    assert bdr[0].startswith("time,m_dot_g_surf,BprimeG_surf")


@pytest.mark.slow
def test_case21_runs_with_seb(case21_out):
    out, out_dir, _ = case21_out
    # SEB heats the wall above ambient within 0.3 s
    assert out["T"].max() > 320.0
    assert np.isfinite(out["p"]).all()
    bdr = (out_dir / "boundary_diagnostics.csv").read_text().splitlines()
    assert bdr[0].startswith("time,m_dot_g_surf,BprimeG_surf")
    last = [float(v) for v in bdr[-1].split(",")]
    assert last[9] > 0  # q_conv heating
    assert last[11] < 0  # q_rad_emit cooling


@pytest.mark.slow
def test_case21_restart_roundtrip(case21_out):
    from cmfem_tpu.apps.ablation_case2_1 import run

    out, out_dir, cfg = case21_out
    # the checkpoint on disk really is the mid-run t=0.2 snapshot
    with np.load(out_dir / "restart.chk.npz") as d:
        assert abs(float(d["time"]) - 0.2) < 1e-10
    # restart from the t=0.2 checkpoint and continue to 0.3
    cfg2 = dict(cfg)
    cfg2["restart_read_file"] = str(out_dir / "restart.chk.npz")
    cfg2["restart_write_file"] = ""
    cfg2["output_path"] = str(out_dir / "resumed")
    out2 = run(cfg2)
    assert abs(out2["time"] - 0.3) < 1e-10
    # resumed solution matches the straight-through run closely
    np.testing.assert_allclose(out2["T"], out["T"], rtol=0, atol=2e-5)
    np.testing.assert_allclose(out2["p"], out["p"], rtol=1e-7)


@pytest.mark.slow
def test_case21_scan_matches_eager(tmp_path):
    """The fused scan path (device-resident SEB Newton + reaction-state
    advance, one XLA program per output frame) must match the eager
    per-step driver, and the restart write-at-time trigger must land on
    its exact step via chunk-boundary alignment."""
    from cmfem_tpu.apps.ablation_case2_1 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_1.yaml",
        "boundary_conditions_file":
            f"{REF}/Input/boundary_conditions_ablation_case2_1.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.3,
        "newton_print_level": 0,
        "save_paraview": False,
        # same on-device linear solver on both paths so the only delta
        # is scan arithmetic
        "linear_solver": "gmres",
        "linear_rtol": 1.0e-11,
    }
    out_e = run({**base, "output_path": str(tmp_path / "eager")})
    out_s = run({**base, "output_path": str(tmp_path / "scan"),
                 "scan_stepping": True, "output_every": 2,
                 "restart_write_file": str(tmp_path / "scan" / "r.chk"),
                 "restart_write_at_time": 0.2,
                 "restart_write_at_end": False})
    for k in ("T", "p"):
        num = np.abs(out_s[k] - out_e[k]).max()
        den = np.abs(out_e[k]).max()
        assert num / den < 1e-8, (k, num / den)
    # the checkpoint landed exactly at the t=0.2 trigger step
    with np.load(tmp_path / "scan" / "r.chk.npz") as d:
        assert abs(float(d["time"]) - 0.2) < 1e-10
        assert int(d["step"]) == 2
    # same CSV schemas + row counts on both paths
    for name in ("mass_metrics.csv", "temperature_probes.csv",
                 "boundary_diagnostics.csv"):
        he = (tmp_path / "eager" / name).read_text().splitlines()
        hs = (tmp_path / "scan" / name).read_text().splitlines()
        assert he[0] == hs[0], name
        assert len(he) == len(hs), name
    pe = np.loadtxt(tmp_path / "eager" / "temperature_probes.csv",
                    delimiter=",", skiprows=1)
    ps_ = np.loadtxt(tmp_path / "scan" / "temperature_probes.csv",
                     delimiter=",", skiprows=1)
    mask = np.isfinite(pe)
    assert np.array_equal(mask, np.isfinite(ps_))
    assert np.abs(pe[mask] - ps_[mask]).max() < 1e-5
    # scan-mode resume from the mid-run checkpoint reaches the same end
    out_r = run({**base, "output_path": str(tmp_path / "resumed"),
                 "scan_stepping": True,
                 "restart_read_file": str(tmp_path / "scan" / "r.chk.npz")})
    assert abs(out_r["time"] - 0.3) < 1e-10
    assert out_r["step"] == 3
    np.testing.assert_allclose(out_r["T"], out_s["T"], rtol=0, atol=2e-5)


@pytest.mark.slow
def test_case21_scan_matches_eager_across_chemistry_switch(tmp_path):
    """VERDICT r2 #3: the scan path segments the run at schedule
    chemistry/flux-branch changes (one compiled program per label) instead
    of refusing multi-branch windows — the production decks flip
    chemistryOn 1->0 at t=60.1 s
    (Input/boundary_conditions_ablation_case2_1.dat:5).  Here the toggle is
    at t=0.25: steps 1-2 run chemistry_blowing, steps 3-4 cooling_standard,
    and scan must match eager across the switch."""
    from cmfem_tpu.apps.ablation_case2_1 import run

    sched = tmp_path / "bc_toggle.dat"
    sched.write_text(
        "// time(s) p_w(Pa) rhoeUeCH(kg/m2/s) h_r(J/kg) chemistryOn\n"
        "0.0   101325.0  0.3  1.5e6  1\n"
        "0.2   101325.0  0.3  1.5e6  1\n"
        "0.25  101325.0  0.0  0.0    0\n"
        "0.4   101325.0  0.0  0.0    0\n")
    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_1.yaml",
        "boundary_conditions_file": str(sched),
        "order": 1,
        "dt": 0.1,
        "t_final": 0.4,
        "newton_print_level": 0,
        "save_paraview": False,
        "linear_solver": "gmres",
        "linear_rtol": 1.0e-11,
    }
    out_e = run({**base, "output_path": str(tmp_path / "eager")})
    out_s = run({**base, "output_path": str(tmp_path / "scan"),
                 "scan_stepping": True, "output_every": 4})
    for k in ("T", "p"):
        num = np.abs(out_s[k] - out_e[k]).max()
        den = np.abs(out_e[k]).max()
        assert num / den < 1e-8, (k, num / den)
    # the switch really happened: surface cooled after chemistry turned off
    bdr = np.loadtxt(tmp_path / "scan" / "boundary_diagnostics.csv",
                     delimiter=",", skiprows=1)
    q_conv = bdr[:, 9]
    assert q_conv[1] > 0 and q_conv[2] > 0       # heating while chem on
    assert abs(q_conv[-1]) < abs(q_conv[2])      # cooling branch after


@pytest.mark.slow
def test_case21_scan_dirichlet_matches_eager(tmp_path):
    """Dirichlet-top-temperature mode through the scan path (no SEB
    faces; _prepare_impl solver branch) matches the eager driver."""
    from cmfem_tpu.apps.ablation_case2_1 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_1.yaml",
        "boundary_conditions_file":
            f"{REF}/Input/boundary_conditions_ablation_case2_1.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.2,
        "newton_print_level": 0,
        "save_paraview": False,
        "top_thermal_bc": "temperature_dirichlet",
        "top_temperature_value": 1200.0,
        "linear_solver": "gmres",
        "linear_rtol": 1.0e-11,
    }
    out_e = run({**base, "output_path": str(tmp_path / "eager")})
    out_s = run({**base, "output_path": str(tmp_path / "scan"),
                 "scan_stepping": True, "output_every": 1})
    for k in ("T", "p"):
        num = np.abs(out_s[k] - out_e[k]).max()
        den = np.abs(out_e[k]).max()
        assert num / den < 1e-8, (k, num / den)


def test_case21_restart_validation(tmp_path):
    from cmfem_tpu.apps.ablation_case2_1 import save_restart, load_restart

    path = str(tmp_path / "c.npz")
    save_restart(path, 5, 1.25, np.zeros(10), np.ones(10), np.zeros((4, 3, 2)))
    step, t, T, p, X = load_restart(path, 10, 4, 3, 2)
    assert step == 5 and t == 1.25
    with pytest.raises(ValueError, match="size mismatch"):
        load_restart(path, 11, 4, 3, 2)
    with pytest.raises(ValueError, match="world size"):
        load_restart(path, 10, 4, 3, 2, world_size=2)


def test_jacobian_check_covers_seb_face_blocks_per_branch():
    """AD face Jacobian vs FD, once per surface-flux branch (the
    reference's per-branch face consistency check,
    ablation_test_case2_1_2D.cpp:1809-1832)."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState
    from cmfem_tpu.physics.bprime import BPrimeTable
    from cmfem_tpu.physics.seb import (
        SurfaceFluxModel, BRANCH_CHEMISTRY_BLOWING,
        BRANCH_CHEMISTRY_NO_BLOWING, BRANCH_COOLING_STANDARD,
        BRANCH_COOLING_EXACT,
    )
    from cmfem_tpu.physics.surface_bc import BoundaryState

    mesh = make_cartesian_mesh_2d(2, 5, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([3]))
    T = jnp.full(n, 600.0).at[jnp.asarray(ess)].set(1100.0)
    # vertical pressure gradient -> positive wall Darcy outflow so the
    # blowing fixed point lands B'g inside the table (no clamp skip)
    ypos = np.asarray(fes.node_positions)[:, 1]
    p = jnp.asarray(5.0e4 + 4.0e4 * (0.05 - ypos))
    dt = 0.05
    T_old_q = ops.values_at_qp(jnp.full(n, 600.0))
    p_old_q = ops.values_at_qp(p)

    bprime = BPrimeTable.synthetic_tacot()
    model = SurfaceFluxModel(lam=0.5, q_rad=0.0)
    bc_hot = BoundaryState(p_w=5.0e4, rhoeUeCH=0.01, h_r=2.0e6,
                           chemistryOn=1)
    bc_cool = BoundaryState(p_w=5.0e4, rhoeUeCH=0.0, h_r=0.0,
                            chemistryOn=0)
    cases = [
        (BRANCH_CHEMISTRY_BLOWING, model, bc_hot),
        (BRANCH_CHEMISTRY_NO_BLOWING, model, bc_hot),
        (BRANCH_COOLING_STANDARD, model, bc_cool),
        (BRANCH_COOLING_EXACT,
         SurfaceFluxModel(lam=0.5, q_rad=0.0,
                          pato_compat_mode="cooling_exact"), bc_cool),
    ]
    checked = 0
    for branch, mdl, bc in cases:
        rel = sys_.jacobian_check(T, p, T_old_q, p_old_q, state.extent, dt,
                                  abs_tol=1e-6, rel_tol=1e-4,
                                  seb=(branch, mdl, bprime), bc=bc)
        if rel is not None:   # None = non-smooth state skipped, like the ref
            checked += 1
    assert checked >= 2, "all branches hit non-smooth skip"


def test_jacobian_check_catches_wrong_face_jacobian(monkeypatch):
    """The face check must actually FAIL when the face Jacobian is wrong
    (guards against a vacuous check)."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState
    from cmfem_tpu.physics.bprime import BPrimeTable
    from cmfem_tpu.physics.seb import (SurfaceFluxModel,
                                       BRANCH_CHEMISTRY_BLOWING)
    from cmfem_tpu.physics.surface_bc import BoundaryState

    mesh = make_cartesian_mesh_2d(2, 5, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([3]))
    T = jnp.full(n, 600.0).at[jnp.asarray(ess)].set(1100.0)
    # smooth (in-table B') state: vertical pressure gradient, as in the
    # per-branch test above — otherwise the non-smooth skip fires and the
    # corruption is never checked
    ypos = np.asarray(fes.node_positions)[:, 1]
    p = jnp.asarray(5.0e4 + 4.0e4 * (0.05 - ypos))
    dt = 0.05
    T_old_q = ops.values_at_qp(jnp.full(n, 600.0))
    p_old_q = ops.values_at_qp(p)
    bprime = BPrimeTable.synthetic_tacot()
    model = SurfaceFluxModel(lam=0.5, q_rad=0.0)
    bc = BoundaryState(p_w=5.0e4, rhoeUeCH=0.01, h_r=2.0e6,
                       chemistryOn=1)

    # uncorrupted check must actually run (smooth state) and pass
    rel0 = sys_.jacobian_check(T, p, T_old_q, p_old_q, state.extent, dt,
                               seb=(BRANCH_CHEMISTRY_BLOWING, model,
                                    bprime), bc=bc)
    assert rel0 is not None

    orig = sys_.seb_face_jacobians

    def corrupted(*a, **k):
        JT, Jp = orig(*a, **k)
        return 1.5 * JT, Jp

    monkeypatch.setattr(sys_, "seb_face_jacobians", corrupted)
    with pytest.raises(RuntimeError, match="Jacobian check failed"):
        sys_.jacobian_check(T, p, T_old_q, p_old_q, state.extent, dt,
                            seb=(BRANCH_CHEMISTRY_BLOWING, model, bprime),
                            bc=bc)


def test_restart_elem_order_guard(tmp_path):
    """Checkpoints record the element ordering they were written under;
    resuming under a different ordering (lattice_residual toggled on a
    renumbered strip) must be rejected, and pre-tag checkpoints default
    to 'file'."""
    import numpy as np
    import pytest

    from cmfem_tpu.apps.ablation_case2_1 import (
        load_restart, save_restart,
    )

    n, ne, nq, nr = 6, 2, 4, 3
    T = np.arange(n, dtype=float)
    p = T + 10.0
    X = np.zeros((ne, nq, nr))
    f = str(tmp_path / "ck.npz")
    save_restart(f, 3, 0.3, T, p, X, elem_order="strip-row-major")
    out = load_restart(f, n, ne, nq, nr, elem_order="strip-row-major")
    assert out[0] == 3
    with pytest.raises(ValueError, match="element-order mismatch"):
        load_restart(f, n, ne, nq, nr)          # run without the reorder
    save_restart(f, 4, 0.4, T, p, X)            # default 'file' ordering
    with pytest.raises(ValueError, match="element-order mismatch"):
        load_restart(f, n, ne, nq, nr, elem_order="strip-row-major")

"""Case 2.2: recession handler, ALE remap, coupled blowing, moving-mesh driver."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d

REF = "/root/reference/myapps/convection_diffusion"


def test_moving_mesh_and_ale_toggle_composition():
    """Reference master-switch composition (ablation_test_case2_2_2D.cpp:3712,
    _test.cpp:4409-4416): ale_enabled gates everything, ale_energy_enabled
    gates both energy terms, per-term toggles compose multiplicatively;
    moving_mesh aliases recession_enabled; mesh_smoothing_model is
    validated."""
    from cmfem_tpu.apps.common import moving_mesh_and_ale_toggles as f

    assert f({}) == (True, (True, True, True))
    # explicit '&& moving_mesh' gate on every ALE term (_test.cpp:4409-4416)
    assert f({"moving_mesh": False}) == (False, (False, False, False))
    assert f({"recession_enabled": False})[0] is False
    assert f({"ale_enabled": False}) == (True, (False, False, False))
    assert f({"ale_energy_enabled": False}) == (True, (True, False, False))
    assert f({"ale_energy_enabled": False,
              "ale_mass_enabled": False}) == (True, (False, False, False))
    assert f({"ale_energy_solid_enabled": False}) == \
        (True, (True, False, True))
    assert f({"mesh_smoothing_model": "Laplacian"})[0] is True
    with pytest.raises(ValueError, match="laplacian"):
        f({"mesh_smoothing_model": "elastic"})


def test_recession_handler_uniform_top_velocity():
    """Uniform downward top velocity -> linear velocity profile in y
    (Laplace solution) and exact recession bookkeeping."""
    from cmfem_tpu.motion.recession import MeshRecessionHandler

    m = make_cartesian_mesh_2d(4, 8)
    fes = FESpace(m, 1)
    # top attr=3, bottom attr=1 in make_cartesian_mesh_2d
    h = MeshRecessionHandler(m, fes, bdr_attr_top=3, bdr_attr_bottom=1)
    v_top = np.zeros(fes.nscalar)
    v_top[np.asarray(fes.boundary_dofs([3]))] = 2.0e-3
    dt = 0.1
    h.prepare_advance(v_top, dt)
    # velocity: vy = -v * y (linear in y), vx = 0
    pts = fes.node_positions
    np.testing.assert_allclose(h.mesh_velocity[:, 0], 0.0, atol=1e-10)
    np.testing.assert_allclose(h.mesh_velocity[:, 1], -2.0e-3 * pts[:, 1],
                               atol=1e-8)
    out = h.commit_advance()
    assert abs(out["delta_recession"] - 2.0e-3 * dt) < 1e-12
    assert abs(h.total_recession - 2.0e-4) < 1e-12
    # top moved down by v*dt
    top = np.asarray(fes.boundary_dofs([3]))
    np.testing.assert_allclose(h.vertices[top, 1], 1.0 - 2.0e-4, atol=1e-10)
    assert out["min_quality"] > 0.99


def test_recession_handler_clamp_and_quality_guard():
    from cmfem_tpu.motion.recession import MeshRecessionHandler

    m = make_cartesian_mesh_2d(2, 4)
    fes = FESpace(m, 1)
    h = MeshRecessionHandler(m, fes, bdr_attr_top=3, bdr_attr_bottom=1,
                             max_step_recession=1e-4)
    v_top = np.zeros(fes.nscalar)
    v_top[np.asarray(fes.boundary_dofs([3]))] = 100.0  # huge
    h.prepare_advance(v_top, 0.1)
    # clamped to max_step/dt = 1e-3
    assert abs(h._pending_mean_v - 1e-3) < 1e-12
    h.commit_advance()
    # negative velocities are zeroed
    v_top[:] = -5.0
    h.prepare_advance(v_top, 0.1)
    assert h._pending_mean_v == 0.0

    # quality guard trips when the mesh collapses
    h2 = MeshRecessionHandler(m, fes, bdr_attr_top=3, bdr_attr_bottom=1,
                              min_quality_ratio=0.5)
    v_top2 = np.zeros(fes.nscalar)
    v_top2[np.asarray(fes.boundary_dofs([3]))] = 6.0  # 0.6 of the height
    h2.prepare_advance(v_top2, 0.1)
    with pytest.raises(RuntimeError, match="quality"):
        h2.commit_advance()


def test_remap_extents_identity_when_static():
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.motion.remap import remap_extents_ale

    m = make_cartesian_mesh_2d(3, 3)
    fes = FESpace(m, 1)
    ops = SpaceOps(fes, quad_order=4)
    ne, nq = np.asarray(ops.gf.wdetJ).shape
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (ne, nq, 2))
    w = np.zeros((ne, nq, 2))
    out = remap_extents_ale(m, ops, X, w, 0.1, m.vertices)
    np.testing.assert_allclose(out, X, atol=1e-14)


def test_remap_extents_advects_downward():
    """With the mesh moving down, QPs adopt extents from the material above
    them (larger y = more charred in this fixture)."""
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.motion.remap import remap_extents_ale

    m = make_cartesian_mesh_2d(2, 10)
    fes = FESpace(m, 1)
    ops = SpaceOps(fes, quad_order=4)
    gf = ops.gf
    yq = np.asarray(gf.xq)[..., 1]  # (ne, nq)
    X = np.repeat(yq[..., None], 2, axis=-1)  # extent == y coordinate
    w = np.zeros(X.shape[:2] + (2,))
    w[..., 1] = -0.05  # mesh moving down; target = y - 0.05*dt... use dt=1
    out = remap_extents_ale(m, ops, X, w, 1.0, m.vertices)
    # target y = yq - 0.05 -> donor extent ~ yq - 0.05 (within QP spacing)
    interior = (yq > 0.1) & (yq < 0.9)
    diff = out[..., 0] - (yq - 0.05)
    assert np.abs(diff[interior]).max() < 0.06  # nearest-QP resolution


def test_solve_blowing_22_couples_bc():
    from cmfem_tpu.physics.seb import solve_blowing_22, blowing_correction
    from cmfem_tpu.physics.bprime import BPrimeTable

    bt = BPrimeTable.synthetic_tacot()
    m = jnp.asarray([0.01])
    T = jnp.asarray([2500.0])
    Bg, Bc, phi = solve_blowing_22(m, 0.3, 101325.0, T, bt,
                                   chemistry_on=True, strict=False,
                                   lam=0.5, enable=True)
    assert float(Bc[0]) > 0.01  # char oxidation active at 2500 K
    # phi consistent with total B'
    np.testing.assert_allclose(
        float(phi[0]), float(blowing_correction(Bg + Bc, 0.5)[0]), rtol=1e-12)
    # strict mode: B'c forced to zero
    _, Bc0, _ = solve_blowing_22(m, 0.3, 101325.0, T, bt, True, True, 0.5, True)
    assert float(Bc0[0]) == 0.0


@pytest.mark.slow
def test_case22_smoke(tmp_path):
    from cmfem_tpu.apps.ablation_case2_2 import run

    cfg = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file": f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.3,
        "newton_print_level": 0,
        "output_path": str(tmp_path),
        "save_paraview": False,
        "recession_density_mode": "char_surface",
        "max_step_recession": 2.0e-4,
    }
    out = run(cfg)
    assert out["T"].max() > 350.0  # SEB heating
    assert np.isfinite(out["recession_total"])
    mass = (tmp_path / "mass_metrics.csv").read_text().splitlines()
    assert mass[0] == ("time,m_dot_g_surf,m_dot_c,front_98_virgin,"
                      "front_2_char,recession")
    bdr = (tmp_path / "boundary_diagnostics.csv").read_text().splitlines()
    assert "m_dot_c_surf" in bdr[0] and "rho_s_surf" in bdr[0]
    meq = (tmp_path / "mass_eq_probe_diagnostics.csv").read_text().splitlines()
    assert meq[0].startswith("time,pi_total_wall,tau_wall,epsrho_wall")
    last = dict(zip(meq[0].split(","), [float(v) for v in meq[-1].split(",")]))
    assert last["pi_total_wall"] > 0            # pyrolysis active at the wall
    assert 0 < last["tau_wall"] <= 1
    assert last["gradp_y_wall"] < 0             # gas driven toward the surface
    assert last["mflux_y_wall"] > 0             # outgassing (+y at the top)


@pytest.mark.slow
def test_case22_reference_smoke_yaml_verbatim(tmp_path):
    """The reference's own Input/input_ablation_case2_2_smoke.yaml drives
    the driver key-for-key (moving_mesh/ale_enabled/mesh_smoothing_model,
    SEB mode, recession keys; the author-local B' table path falls back to
    the synthetic table).  Only output location and horizon overridden."""
    from cmfem_tpu.apps.ablation_case2_2 import run
    from cmfem_tpu.utils.yamlcfg import load_yaml

    cfg = load_yaml(f"{REF}/Input/input_ablation_case2_2_smoke.yaml")
    cfg.update(output_path=str(tmp_path), save_paraview=False,
               t_final=0.2, newton_print_level=0)
    out = run(cfg)
    assert out["T"].max() > 350.0
    assert np.isfinite(out["recession_total"])
    assert out["recession_total"] > 0.0
    assert (tmp_path / "boundary_diagnostics.csv").exists()


@pytest.mark.slow
def test_case22_restart_roundtrip_with_mesh(tmp_path):
    """ALE restart checkpoints the RECEDED mesh (the reference's format
    omits mesh coordinates, SURVEY §5.4): resuming mid-recession continues
    from the moved vertices and matches the straight-through run."""
    from cmfem_tpu.apps.ablation_case2_2 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file": f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1, "dt": 0.1, "t_final": 0.4,
        "newton_print_level": 0, "save_paraview": False,
        "recession_density_mode": "constant",
        "recession_density_constant": 5.0,  # fast fake recession
        "max_step_recession": 2.0e-4,
    }
    out = run({**base, "output_path": str(tmp_path / "full"),
               "restart_write_file": str(tmp_path / "r.chk"),
               "restart_write_at_time": 0.2,
               # keep the t=0.2 snapshot (the end-of-run rewrite would
               # clobber it and make the resume a 0-step no-op)
               "restart_write_at_end": False})
    assert out["recession_total"] > 0.0  # mesh actually moved
    import numpy as _np
    with _np.load(tmp_path / "r.chk.npz") as d:
        assert abs(float(d["time"]) - 0.2) < 1e-10  # mid-run snapshot kept
        mid_recession = float(d["recession_total"])
    assert 0.0 < mid_recession < out["recession_total"]

    out2 = run({**base, "output_path": str(tmp_path / "resumed"),
                "restart_read_file": str(tmp_path / "r.chk.npz")})
    assert abs(out2["time"] - 0.4) < 1e-10
    np.testing.assert_allclose(out2["recession_total"],
                               out["recession_total"], rtol=1e-10)
    np.testing.assert_allclose(out2["vertices"], out["vertices"],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(out2["T"], out["T"], rtol=0, atol=2e-5)
    np.testing.assert_allclose(out2["p"], out["p"], rtol=1e-6)


def test_case22_restart_ale_validation(tmp_path):
    from cmfem_tpu.apps.ablation_case2_2 import (
        save_restart_ale, load_restart_ale)

    path = str(tmp_path / "c.npz")
    V = np.random.default_rng(0).uniform(size=(12, 2))
    save_restart_ale(path, 7, 2.5, np.zeros(10), np.ones(10),
                     np.zeros((4, 3, 2)), V, 1.5e-4, [(0.0, 0.0), (2.5, 1.5e-4)])
    step, t, T, p, X, V2, rtot, hist = load_restart_ale(path, 10, 4, 3, 2, 12, 2)
    assert step == 7 and t == 2.5 and rtot == 1.5e-4
    np.testing.assert_allclose(V2, V)
    assert hist == [(0.0, 0.0), (2.5, 0.00015)]
    with pytest.raises(ValueError, match="vertex shape"):
        load_restart_ale(path, 10, 4, 3, 2, 13, 2)
    # a 2.1 (version-1) checkpoint is refused by the ALE loader
    from cmfem_tpu.apps.ablation_case2_1 import save_restart
    path1 = str(tmp_path / "v1.npz")
    save_restart(path1, 1, 0.1, np.zeros(10), np.ones(10), np.zeros((4, 3, 2)))
    with pytest.raises(ValueError, match="version"):
        load_restart_ale(path1, 10, 4, 3, 2, 12, 2)


@pytest.mark.slow
def test_case22_test_variant_gcl_and_metrics(tmp_path):
    """The self-checking variant: GCL storage on, a synthetic Amaryllis mass
    history, in-driver recession metrics; and toggling all ALE terms off
    changes nothing when the mesh is static."""
    from cmfem_tpu.apps.ablation_case2_2_test import run

    # synthetic Amaryllis mass file: time mdot_g mdot_c f98 f2 recession
    am = tmp_path / "amaryllis_mass.txt"
    am.write_text("\n".join(
        f"{t} 0.001 0.0003 0 0 {2e-7*t}" for t in
        [0.0, 0.1, 0.2, 0.3, 0.5, 1.0]))

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file": f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1, "dt": 0.1, "t_final": 0.2,
        "newton_print_level": 0, "save_paraview": False,
        "amaryllis_mass_file": str(am),
    }
    out = run({**base, "output_path": str(tmp_path / "a")})
    assert out["recession_metrics"] is not None
    assert (tmp_path / "a" / "recession_error_metrics.csv").exists()
    assert np.isfinite(out["recession_metrics"]["rmse"])

    # ALE toggles off + static mesh (recession disabled): identical to the
    # production path with no ALE terms
    out2 = run({**base, "output_path": str(tmp_path / "b"),
                "recession_enabled": False,
                "ale_mass_enabled": False,
                "ale_energy_solid_enabled": False,
                "ale_energy_gas_enabled": False,
                "gcl_storage_enabled": False,
                "amaryllis_mass_file": ""})
    from cmfem_tpu.apps.ablation_case2_2 import run as run_prod
    out3 = run_prod({**base, "output_path": str(tmp_path / "c"),
                     "recession_enabled": False,
                     "amaryllis_mass_file": ""})
    np.testing.assert_allclose(out2["T"], out3["T"], rtol=0, atol=1e-8)


@pytest.mark.slow
def test_case22_scan_matches_eager(tmp_path):
    """VERDICT r1 #9: the fused scan path (device-resident recession +
    Laplacian smoothing + structured remap + SEB Newton) must match the
    eager per-step driver on a smoke config."""
    from cmfem_tpu.apps.ablation_case2_2 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file":
            f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.3,
        "newton_print_level": 0,
        "save_paraview": False,
        "recession_density_mode": "char_surface",
        "max_step_recession": 2.0e-4,
        # same on-device linear solver on both paths so the only deltas
        # are remap donor ties and scan arithmetic
        "linear_solver": "gmres",
        "linear_rtol": 1.0e-11,
    }
    out_e = run({**base, "output_path": str(tmp_path / "eager")})
    out_s = run({**base, "output_path": str(tmp_path / "scan"),
                 "scan_stepping": True, "output_every": 2})

    for k in ("T", "p"):
        num = np.abs(out_s[k] - out_e[k]).max()
        den = np.abs(out_e[k]).max()
        assert num / den < 1e-8, (k, num / den)
    assert np.abs(out_s["vertices"] - out_e["vertices"]).max() < 1e-12
    assert out_s["recession_total"] == pytest.approx(
        out_e["recession_total"], rel=1e-8)
    # same CSV schemas on both paths
    for name in ("mass_metrics.csv", "temperature_probes.csv",
                 "boundary_diagnostics.csv", "pressure_probes.csv",
                 "mesh_diagnostics.csv", "mass_eq_probe_diagnostics.csv"):
        he = (tmp_path / "eager" / name).read_text().splitlines()
        hs = (tmp_path / "scan" / name).read_text().splitlines()
        assert he[0] == hs[0], name
        assert len(he) == len(hs), name
    # probe histories match to solver tolerance
    pe = np.loadtxt(tmp_path / "eager" / "temperature_probes.csv",
                    delimiter=",", skiprows=1)
    ps = np.loadtxt(tmp_path / "scan" / "temperature_probes.csv",
                    delimiter=",", skiprows=1)
    mask = np.isfinite(pe)
    assert np.array_equal(mask, np.isfinite(ps))
    assert np.abs(pe[mask] - ps[mask]).max() < 1e-5


@pytest.mark.slow
def test_case22_scan_matches_eager_across_chemistry_switch(tmp_path):
    """VERDICT r2 #3 (moving-mesh variant): the 2.2 scan path segments at
    schedule chemistry/flux-branch changes, so the production deck's
    t=60.1 s chemistryOn flip
    (Input/boundary_conditions_ablation_case2_2.dat:5) runs
    device-resident.  Toggle at t=0.25 with recession on; scan must match
    eager across the switch, including the receded geometry."""
    from cmfem_tpu.apps.ablation_case2_2 import run

    sched = tmp_path / "bc_toggle.dat"
    sched.write_text(
        "// time(s) p_w(Pa) rhoeUeCH(kg/m2/s) h_r(J/kg) chemistryOn\n"
        "0.0   101325.0  0.3    1.5e6  1\n"
        "0.2   101325.0  0.3    1.5e6  1\n"
        "0.25  101325.0  0.003  0.0    0\n"
        "0.4   101325.0  0.003  0.0    0\n")
    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file": str(sched),
        "order": 1,
        "dt": 0.1,
        "t_final": 0.4,
        "newton_print_level": 0,
        "save_paraview": False,
        "recession_density_mode": "char_surface",
        "max_step_recession": 2.0e-4,
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
    assert np.abs(out_s["vertices"] - out_e["vertices"]).max() < 1e-12
    assert out_s["recession_total"] == pytest.approx(
        out_e["recession_total"], rel=1e-8)


@pytest.mark.slow
def test_case22_scan_matches_eager_tri_strip(tmp_path):
    """The production 2.2 deck runs on the TRIANGLE strip
    (ablation_strip_tri_uniform.msh); the scan path's remap there is the
    own-element TriStripRemap (per-step motion << QP edge margin, so the
    host path's own-element fast path hits 100% and donors agree
    bit-for-bit).  Scan must match eager on the tri mesh with recession
    enabled."""
    from cmfem_tpu.apps.ablation_case2_2 import run

    base = {
        "mesh_file": f"{REF}/Mesh/ablation_strip_tri_uniform.msh",
        "material_file": f"{REF}/Input/material_tacot_case2_2.yaml",
        "boundary_conditions_file":
            f"{REF}/Input/boundary_conditions_ablation_case2_2.dat",
        "order": 1,
        "dt": 0.1,
        "t_final": 0.3,
        "newton_print_level": 0,
        "save_paraview": False,
        "recession_density_mode": "char_surface",
        "max_step_recession": 2.0e-6,
        "linear_solver": "gmres",
        "linear_rtol": 1.0e-11,
    }
    out_e = run({**base, "output_path": str(tmp_path / "eager")})
    out_s = run({**base, "output_path": str(tmp_path / "scan"),
                 "scan_stepping": True, "output_every": 3})
    for k in ("T", "p"):
        num = np.abs(out_s[k] - out_e[k]).max()
        den = np.abs(out_e[k]).max()
        assert num / den < 1e-8, (k, num / den)
    assert np.abs(out_s["vertices"] - out_e["vertices"]).max() < 1e-12
    assert out_s["recession_total"] == pytest.approx(
        out_e["recession_total"], rel=1e-8)


def test_tri_strip_remap_margin_and_identity():
    """TriStripRemap: zero mesh velocity is an exact no-op (each QP's
    nearest donor is itself), and margin() reports a positive physical
    bound."""
    from cmfem_tpu.core import load_gmsh, FESpace
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.motion.remap import TriStripRemap

    mesh = load_gmsh(f"{REF}/Mesh/ablation_strip_tri_uniform.msh")
    fes = FESpace(mesh, 1)
    ops = SpaceOps(fes, quad_order=4)
    rm = TriStripRemap(mesh, ops)
    assert rm.margin() > 0
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.uniform(0, 1, (rm.ne, rm.nq, 3)))
    verts = jnp.asarray(mesh.vertices)
    xq = jnp.asarray(ops.gf.xq)
    wq = jnp.zeros((rm.ne, rm.nq, 2))
    Xn = rm(X, verts, xq, wq, 0.1)
    np.testing.assert_allclose(np.asarray(Xn), np.asarray(X), atol=1e-15)
    # sub-margin vertical motion keeps donors in-element (values remain
    # a permutation of the element's own QP rows)
    wq = wq.at[:, :, 1].set(-0.5 * rm.margin() / 0.1)
    Xn = rm(X, verts, xq, wq, 0.1)
    assert np.isfinite(np.asarray(Xn)).all()
    for e in (0, rm.ne // 2, rm.ne - 1):
        rows = {tuple(np.round(r, 12)) for r in np.asarray(X[e])}
        for r in np.asarray(Xn[e]):
            assert tuple(np.round(r, 12)) in rows


def test_structured_remap_degenerate_cell_f32_finite():
    """A fully-collapsed lattice cell (yhi == ylo) must not produce
    inf/nan donors: the inverse-map guard uses finfo tiny of the RUNTIME
    dtype (1e-300 underflows to 0 in f32 and was a no-op there)."""
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.motion.remap import StructuredStripRemap

    m = make_cartesian_mesh_2d(2, 6)
    fes = FESpace(m, 1)
    ops = SpaceOps(fes, quad_order=4)
    rm = StructuredStripRemap(m, ops)
    ne, nq = rm.ne, rm.nq
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(0, 1, (ne, nq, 3)), jnp.float32)
    verts = np.asarray(m.vertices).copy()
    # collapse the top row onto the one below it
    ytop = verts[:, 1].max()
    y2 = np.unique(verts[:, 1])[-2]
    verts[verts[:, 1] == ytop, 1] = y2
    xq = jnp.asarray(np.asarray(ops.gf.xq), jnp.float32)
    wq = jnp.zeros((ne, nq, 2), jnp.float32)
    out = rm(X, jnp.asarray(verts, jnp.float32), xq, wq,
             jnp.float32(0.1))
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_quality_guard_failure_leaves_handler_consistent():
    """A quality-guard failure must raise BEFORE committing: vertices,
    total_recession, and the pending state stay at their pre-step values
    so a driver can retry with a smaller dt."""
    from cmfem_tpu.motion.recession import MeshRecessionHandler

    m = make_cartesian_mesh_2d(2, 5, sy=0.01)
    fes = FESpace(m, 1)
    h = MeshRecessionHandler(m, fes, bdr_attr_top=3, bdr_attr_bottom=1,
                             min_quality_ratio=0.5)
    v_top = np.zeros(fes.nscalar)
    v_top[np.asarray(fes.boundary_dofs([3]))] = 0.06  # 60% of the height
    verts_before = h.vertices.copy()
    rec_before = h.total_recession
    h.prepare_advance(v_top, 0.1)
    with pytest.raises(RuntimeError, match="quality"):
        h.commit_advance()
    np.testing.assert_array_equal(h.vertices, verts_before)
    assert h.total_recession == rec_before
    assert h._pending_dt == 0.0 and h._pending_mean_v == 0.0

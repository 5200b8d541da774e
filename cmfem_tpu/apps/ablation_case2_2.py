"""Ablation test case 2.2: surface recession with a moving mesh.

Mirrors /root/reference/myapps/convection_diffusion/ablation_test_case2_2_2D.cpp:
case 2.1 plus char consumption m_dot_c = rho_e u_e C_H B'c phi_blow with
the coupled B'g+B'c blowing fixed point, recession velocity lumped to the
top boundary, PATO-like step ordering (recession BEFORE the solve):

  assemble v_rec -> PrepareAdvance (Laplacian mesh velocity) ->
  RemapExtentsALE -> CommitAdvance (move mesh + quality guard) -> Newton

and the ALE advective terms +(eps_g rho)(w . grad psi),
+(rho_s cp T + eps_g(rho h - p))(w . grad psi) in the residual weighted by
the committed mesh velocity.  Geometric factors are recomputed from the
moving vertices inside the jitted residual each step; mass CSV carries the
real m_dot_c and total recession.
"""

from __future__ import annotations

import os
import sys
import time as _time
from functools import partial

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .common import (
    check_linear_result, linear_usable, load_newton_config, scan_newton,
    replay_newton_history,
    parse_args, setup_cpu_if_requested, load_mesh_from_cfg, echo_config,
    ensure_outdir, make_block_linear_solver, run_tp_newton_loop, num_steps,
    maybe_enable_lattice_residual, maybe_reorder_strip_mesh,
    moving_mesh_and_ale_toggles, NewtonStallStats,
)
from ..utils.yamlcfg import load_yaml, resolve_path
from ..io import CsvWriter, VTUCollection
from .ablation_case2_1 import (
    RESTART_MAGIC, RESTART_TIME_TOL,
)

# ALE checkpoints carry the receded mesh; the reference's restart format
# does NOT (mesh coordinates are absent from SaveRestartCheckpoint,
# ablation_test_case2_1_2D.cpp:2666-2779, so a 2.2 resume would run on the
# initial mesh).  Version 2 fixes that: vertices, cumulative recession, and
# the recession history all round-trip.
RESTART_VERSION_ALE = 2


def save_restart_ale(path, step, time, T, p, extent, vertices,
                     recession_total, recession_history, world_size=1,
                     elem_order="file"):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, magic=np.uint64(RESTART_MAGIC),
             version=np.uint32(RESTART_VERSION_ALE),
             world_size=np.int32(world_size),
             elem_order=np.str_(elem_order),
             step=np.int64(step), time=np.float64(time),
             T=np.asarray(T), p=np.asarray(p), extent=np.asarray(extent),
             vertices=np.asarray(vertices, dtype=np.float64),
             recession_total=np.float64(recession_total),
             recession_history=np.asarray(recession_history,
                                          dtype=np.float64).reshape(-1, 2))


def load_restart_ale(path, n, ne, nq, nr, nverts, dim, world_size=1,
                     elem_order="file"):
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as d:
        if int(d["magic"]) != RESTART_MAGIC:
            raise ValueError(f"Invalid restart checkpoint magic in: {path}")
        if int(d["version"]) != RESTART_VERSION_ALE:
            raise ValueError(
                f"Unsupported ALE restart checkpoint version in: {path} "
                f"(file={int(d['version'])}, expected {RESTART_VERSION_ALE}).")
        if int(d["world_size"]) != world_size:
            raise ValueError(
                f"Restart checkpoint world size mismatch for {path} "
                f"(file={int(d['world_size'])}, run={world_size}).")
        file_order = str(d["elem_order"]) if "elem_order" in d else "file"
        if file_order != elem_order:
            raise ValueError(
                f"Restart element-order mismatch for {path}: checkpoint "
                f"was written with elem_order={file_order!r} but this run "
                f"uses {elem_order!r} (toggle 'lattice_residual' to match).")
        T = d["T"]; p = d["p"]; X = d["extent"]; V = d["vertices"]
        if len(T) != n or len(p) != n:
            raise ValueError(f"Restart true-dof size mismatch in: {path}")
        if X.shape != (ne, nq, nr):
            raise ValueError(f"Restart reaction-state shape mismatch in: {path}")
        if V.shape != (nverts, dim):
            raise ValueError(f"Restart mesh vertex shape mismatch in: {path}")
        return (int(d["step"]), float(d["time"]), T, p, X, V,
                float(d["recession_total"]),
                [(float(a), float(b)) for a, b in d["recession_history"]])


def _make_case22_csvs(cfg, output_path, probe_y):
    """The driver's eight CSV streams (shared by the eager and scan paths)."""
    probes_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("probes_csv", "temperature_probes.csv")),
        ["time", "wall"] + [f"TC{i}" for i in range(1, len(probe_y))])
    mass_csv = CsvWriter(
        os.path.join(output_path, cfg.get("mass_csv", "mass_metrics.csv")),
        ["time", "m_dot_g_surf", "m_dot_c", "front_98_virgin",
         "front_2_char", "recession"])
    boundary_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("boundary_csv", "boundary_diagnostics.csv")),
        ["time", "m_dot_g_surf", "m_dot_c_surf", "rho_s_surf",
         "BprimeG_surf", "BprimeC_surf", "h_w_surf", "emissivity_surf",
         "absorptivity_surf", "reflectivity_surf",
         "blowing_correction_surf", "q_conv_surf", "q_adv_pyro_surf",
         "q_rad_emit_surf", "q_rad_abs_surf", "q_surf"])
    newton_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("newton_csv",
                             "newton_history_ablation_case2_2_2D.csv")),
        ["step", "time", "iter", "residual", "residual0", "rel_residual",
         "update_norm", "update0", "rel_update", "converged"])
    # extra study CSVs (the _test variant's pressure-probe and
    # mesh-diagnostics streams)
    pressure_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("pressure_csv", "pressure_probes.csv")),
        ["time", "wall"] + [f"PC{i}" for i in range(1, len(probe_y))])
    meshdiag_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("mesh_csv", "mesh_diagnostics.csv")),
        ["time", "y_top", "min_quality_ratio", "max_node_disp",
         "total_recession"])
    # per-point mass-equation diagnostics (the _test variant's
    # mass_eq_probe_diagnostics stream, ablation_test_case2_2_2D_test.cpp
    # :4577-4601: 9 fields per probe tag)
    meq_tags = ["wall"] + [f"TC{i}" for i in range(1, len(probe_y))]
    masseq_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("mass_eq_probe_csv",
                             "mass_eq_probe_diagnostics.csv")),
        ["time"] + [f"{f}_{tag}" for tag in meq_tags
                    for f in _MEQ_FIELDS])
    # per-step phase timing (same 10-column schema as case 1/2.1,
    # ablation_test_case2_2_2D.cpp:3857-3860; the pre-solve recession +
    # remap phase is folded into bc_sec)
    timing_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("timing_step_csv",
                             "driver_timing_per_step.csv")),
        ["step", "bc_sec", "newton_sec", "newton_residual_eval_sec",
         "newton_jacobian_sec", "newton_linear_sec", "newton_update_sec",
         "state_advance_sec", "output_sec", "step_total_sec"])
    return {"probes": probes_csv, "mass": mass_csv, "boundary": boundary_csv,
            "newton": newton_csv, "pressure": pressure_csv,
            "meshdiag": meshdiag_csv, "masseq": masseq_csv,
            "timing": timing_csv}


_MEQ_FIELDS = ("pi_total", "tau", "epsrho", "gradp_y", "rho_g",
               "mu_g", "K", "mobility", "mflux_y")


def _write_case22_step_outputs(csvs, sys_, fes, mesh, schedule, model,
                               bprime, probe_x, probe_y, probe_pts, tnow,
                               T, p, state, v, recession_total,
                               last_max_disp, min_quality_ratio):
    """One step's CSV rows (all streams except Newton/timing) — the single
    implementation behind both the eager per-step writer and the scan
    path's post-chunk replay.  Returns the boundary-diagnostics dict."""
    import jax.numpy as jnp

    from ..core.pointlocate import front_depth, sample_h1_fields
    from ..physics.seb import classify_branch

    v = np.asarray(v)
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    xmid = 0.5 * (lo[0] + hi[0])
    bc = schedule.eval(tnow)
    branch = classify_branch(bc, model)
    # receding-wall-aware: the wall probe tracks the LOCAL surface at
    # probe_x (interpolated from the bracketing top-edge nodes; a
    # global max-y clamp loses the point once recession is nonuniform
    # by >1e-9).  One location pass covers wall+probe points for T and p.
    top_dofs_w = np.unique(np.asarray(sys_.trace.fes.bdr.dofs)
                           [sys_.trace.face_ids])
    tx = v[top_dofs_w, 0]
    srt = np.argsort(tx)
    j = int(np.clip(np.searchsorted(tx[srt], probe_x), 1, len(srt) - 1))
    den = tx[srt[j]] - tx[srt[j - 1]]
    w_ = float((probe_x - tx[srt[j - 1]]) / den) if den > 0 else 0.0
    wall_y = ((1.0 - w_) * v[top_dofs_w[srt[j - 1]], 1]
              + w_ * v[top_dofs_w[srt[j]], 1])
    wall_pt = np.array([[probe_x, min(probe_y[0], wall_y - 1e-9)]])
    pts_all = np.vstack([wall_pt, probe_pts])
    Ts, ps = sample_h1_fields(fes, [np.asarray(T), np.asarray(p)],
                              pts_all, vertices=v)
    wallT = float(Ts[0])
    probe_vals = Ts[1:]
    bdiag = sys_.top_boundary_diagnostics(T, p, state, bc, branch, model,
                                          bprime, vertices=jnp.asarray(v))
    f98 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.98,
                      vertices=v)
    f2 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.02,
                     vertices=v)
    csvs["probes"].writerow([tnow, wallT]
                            + [float(x) for x in probe_vals])
    csvs["pressure"].writerow([tnow, float(ps[0])]
                              + [float(x) for x in ps[1:]])
    csvs["meshdiag"].writerow([tnow, float(hi[1]), min_quality_ratio,
                               last_max_disp, recession_total])
    meq = sys_.mass_eq_probe(T, p, state, pts_all, vertices=v)
    csvs["masseq"].writerow([tnow] + [float(x) for x in meq.reshape(-1)])
    csvs["mass"].writerow([tnow, bdiag["m_dot_g_surf"],
                           bdiag["m_dot_c_surf"], f98, f2,
                           recession_total])
    csvs["boundary"].writerow([tnow] + [bdiag[k] for k in (
        "m_dot_g_surf", "m_dot_c_surf", "rho_s_surf", "BprimeG_surf",
        "BprimeC_surf", "h_w_surf", "emissivity_surf", "absorptivity_surf",
        "reflectivity_surf", "blowing_correction_surf", "q_conv_surf",
        "q_adv_pyro_surf", "q_rad_emit_surf", "q_rad_abs_surf", "q_surf")])
    return bdiag


def _finalize_case22_outputs(cfg, output_path, amaryllis_mass_file,
                             recession_history):
    """In-driver recession comparison vs the Amaryllis mass history
    (AmaryllisRecessionHistory + recession error metrics,
    ablation_test_case2_2_2D_test.cpp:302-460) plus the acceptance
    tolerance echo — shared by the eager and scan paths."""
    recession_metrics = None
    am_path = resolve_path(cfg, amaryllis_mass_file) if amaryllis_mass_file \
        else ""
    if am_path and os.path.isfile(am_path):
        am = np.loadtxt(am_path, comments="//", ndmin=2)
        if am.shape[1] >= 6 and len(am):
            th = np.array([r[0] for r in recession_history])
            rh = np.array([r[1] for r in recession_history])
            ref_r = np.maximum(0.0, np.interp(th, am[:, 0], am[:, 5]))
            err = rh - ref_r
            recession_metrics = {
                "rmse": float(np.sqrt(np.mean(err ** 2))),
                "max_abs": float(np.abs(err).max()),
                "final_abs": float(abs(err[-1])),
                "final_rel": float(abs(err[-1])
                                   / max(abs(ref_r[-1]), 1e-12)),
            }
            with CsvWriter(os.path.join(output_path,
                                        "recession_error_metrics.csv"),
                           ["metric", "value"]) as w:
                for k, v in recession_metrics.items():
                    w.writerow([k, v])
            print(f"Recession vs Amaryllis: rmse={recession_metrics['rmse']:.4e}"
                  f" final_rel={recession_metrics['final_rel']:.4e}")

    acc = cfg.get("acceptance", {})
    with CsvWriter(os.path.join(output_path, "amaryllis_error_tolerances.csv"),
                   ["signal", "tolerance"]) as w:
        for key, default in (
                ("temperature_rmse_max", 300.0), ("temperature_max_abs_max", 650.0),
                ("m_dot_g_rmse_max", 0.025), ("m_dot_g_max_abs_max", 0.08),
                ("m_dot_c_rmse_max", 0.01), ("m_dot_c_peak_rel_error_max", 0.35),
                ("recession_rmse_max", 0.0015),
                ("recession_final_rel_error_max", 0.12)):
            w.writerow([key, float(acc.get(key, default))])
    return recession_metrics


def _profile_scan_phases(jnp, _time, step_labels, make_bc_at, t_edges,
                         T0, p0, state0, verts0, sys_, ops, bks, remap,
                         smooth_mesh_velocity, min_quality, face_elem_j,
                         mask2_j, lin_rtol, ale_toggles, model, bprime,
                         vmax_rec, mesh, n, recession_density_mode,
                         recession_density_constant, recession_enabled,
                         gcl_enabled, make_step_fn, carry, write_outputs):
    """Per-phase device timing of one production case-2.2 step
    (CMFEM_SCAN_PROFILE=1).  Mirrors step_fn's phases exactly; median of
    repeated jitted calls so tunnel dispatch latency shows up as the
    'noop' baseline, not inside each phase."""
    import jax

    branch, chem = step_labels[0]
    bc_at = make_bc_at(chem)
    t1 = float(t_edges[1])
    dtv = float(t_edges[1] - t_edges[0])
    T, p = T0, p0
    X = jnp.asarray(state0.extent)
    verts = jnp.asarray(verts0)
    bc = bc_at(t1)
    REPS = 10
    lat = getattr(bks, "lattice", None)
    print(f"[profile] solver={type(bks).__name__} "
          f"lattice={'%dx%d' % (lat['NY'], lat['NX']) if lat else None} "
          f"ne={sys_.ne} nq={sys_.nq} n={n}")

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        r = jax.block_until_ready(f(*args))
        tt0 = _time.perf_counter()
        for _ in range(REPS):
            r = jax.block_until_ready(f(*args))
        ms = 1e3 * (_time.perf_counter() - tt0) / REPS
        print(f"[profile] {name:28s} {ms:9.2f} ms", flush=True)
        return r

    warm = int(os.environ.get("CMFEM_SCAN_PROFILE_WARM", "0"))
    carry0 = carry
    if warm and os.environ.get("CMFEM_SCAN_PROFILE_STEPS", "0") == "1":
        # per-step walk with a compiled len-1 program: exposes the
        # state-dependent cost spread that averages hide
        step_fn_w = make_step_fn(branch, chem)
        sfn = jax.jit(lambda c, t, d: jax.lax.scan(
            step_fn_w, c, (jnp.reshape(t, (1,)), jnp.reshape(d, (1,)))))
        c = carry0
        w0 = _time.perf_counter()
        c, o = sfn(c, float(t_edges[1]), float(t_edges[1] - t_edges[0]))
        jax.block_until_ready(c[0])
        print(f"[profile] len-1 compile+step1: "
              f"{_time.perf_counter() - w0:.1f}s", flush=True)
        for k in range(1, warm):
            tk = float(t_edges[k + 1])
            dk = float(t_edges[k + 1] - t_edges[k])
            w0 = _time.perf_counter()
            c, o = sfn(c, tk, dk)
            jax.block_until_ready(c[0])
            ms = 1e3 * (_time.perf_counter() - w0)
            nit = int(o[4][0])
            print(f"[profile] step {k + 1:3d} t={tk:7.4f} {ms:8.1f} ms "
                  f"newton_iters={nit}", flush=True)
        return
    if warm:
        step_fn_w = make_step_fn(branch, chem)
        tsw = jnp.asarray(t_edges[1:warm + 1])
        dtsw = jnp.asarray(t_edges[1:warm + 1]
                           - t_edges[0:warm])
        w0 = _time.perf_counter()
        carry, _ = jax.jit(lambda c: jax.lax.scan(step_fn_w, c,
                                                  (tsw, dtsw)))(carry)
        jax.block_until_ready(carry[0])
        print(f"[profile] warmup {warm} steps: "
              f"{_time.perf_counter() - w0:.1f}s (incl. compile)",
              flush=True)
        T, p, X, verts = carry[0], carry[1], carry[2], carry[3]
        t1 = float(t_edges[warm + 1])
        dtv = float(t_edges[warm + 1] - t_edges[warm])
        bc = bc_at(t1)

    timeit("noop (dispatch baseline)", lambda x: x + 1.0, T)
    Xrep = jnp.mean(X, axis=1)[jnp.asarray(sys_.trace.elem)]
    if recession_enabled:
        vrec = timeit(
            "recession velocity",
            lambda T, p: jnp.minimum(sys_._recession_velocity_terms(
                T, p, Xrep, bc, branch, model, bprime,
                recession_density_mode, recession_density_constant,
                verts), vmax_rec), T, p)
        wy = timeit("smoothing CG",
                    lambda v_r: smooth_mesh_velocity(verts, v_r), vrec)
        w_nodal = jnp.zeros((n, mesh.dim)).at[:, 1].set(wy)
        gf_pre = ops.geometric_factors(verts)
        wq = jnp.einsum("qn,end->eqd", ops.B, w_nodal[ops.eldofs])
        timeit("remap", lambda X: remap(X, verts, gf_pre.xq, wq, dtv), X)
    else:
        wq = jnp.zeros((sys_.ne, sys_.nq, mesh.dim))
    timeit("min_quality + geom factors",
           lambda v: (min_quality(v), ops.geometric_factors(v).detJ),
           verts)
    T_old_q = ops.values_at_qp(T)
    p_old_q = ops.values_at_qp(p)
    gf_now = ops.geometric_factors(verts)
    gcl = (gf_now.detJ, gf_now.detJ) if gcl_enabled else None

    def res_fn(T, p):
        RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X, dtv, gf=gf_now,
                               wq=wq, gcl=gcl, ale_toggles=ale_toggles)
        RT = RT + sys_.seb_face_residual(T, p, X, bc, branch, model,
                                         bprime, vertices=verts)
        return jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp]))

    R = timeit("residual", res_fn, T, p)
    blocks = timeit(
        "element jacobians",
        lambda T, p: sys_.element_jacobians(
            T, p, T_old_q, p_old_q, X, dtv, gf=gf_now, wq=wq, gcl=gcl,
            ale_toggles=ale_toggles), T, p)
    face = timeit(
        "face jacobians",
        lambda T, p: sys_.seb_face_jacobians(T, p, X, bc, branch, model,
                                             bprime, vertices=verts),
        T, p)
    fac = timeit("prepare (factorize)",
                 lambda blocks, face: bks._prepare_face(
                     *blocks, *face, face_elem_j), blocks, face)
    timeit("linear solve",
           lambda fac, R: bks._solve(*fac, -R, jnp.asarray(lin_rtol),
                                     jnp.asarray(0.0)).x, fac, R)
    timeit("advance_state",
           lambda X, T, p: sys_.advance_state_arrays(X, T, p, dtv),
           X, T, p)
    step_fn = make_step_fn(branch, chem)
    import numpy as _np
    ts1 = jnp.asarray(t_edges[1:2])
    dts1 = jnp.asarray(_np.diff(t_edges[0:2]))
    timeit("FULL STEP (scan len-1)",
           lambda c: jax.lax.scan(step_fn, c, (ts1, dts1))[0][0], carry)
    w0 = _time.perf_counter()
    write_outputs(t1, T0, p0, state0, verts0)
    print(f"[profile] {'host step outputs':28s} "
          f"{1e3 * (_time.perf_counter() - w0):9.2f} ms", flush=True)


def run(cfg: dict) -> dict:
    _t_run0 = _time.perf_counter()
    if cfg.get("scan_stepping", False):
        return run_scan(cfg)
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import SpaceOps
    from ..core.pointlocate import sample_h1, front_depth
    from ..physics.tacot import TacotMaterial
    from ..physics.bprime import BPrimeTable
    from ..physics.surface_bc import SurfaceBCSchedule
    from ..physics.seb import SurfaceFluxModel, classify_branch
    from ..physics.ablation import AblationSystem, AblationState
    from ..motion.recession import MeshRecessionHandler
    from ..motion.remap import remap_extents_ale

    material_file = resolve_path(cfg, cfg.get(
        "material_file", "Input/material_tacot_case2_2.yaml"))
    order = int(cfg.get("order", 1))
    dt_cfg = float(cfg.get("dt", 1.0e-2))
    t_final = float(cfg.get("t_final", 120.0))
    newton_cfg = load_newton_config(cfg)
    newton_print_level = int(cfg.get("newton_print_level", 1))
    jacobian_rebuild_freq = max(1, int(cfg.get("newton_jacobian_rebuild_freq", 1)))
    jacobian_check = bool(cfg.get("jacobian_check", False))
    jc_abs = float(cfg.get("jacobian_check_abs_tol", 1e-6))
    jc_rel = float(cfg.get("jacobian_check_rel_tol", 1e-4))
    output_every = int(cfg.get("output_every", 10))
    if output_every < 1:
        raise ValueError("output_every must be >= 1")
    output_path = cfg.get("output_path", "ParaView/ablation_case2_2")
    collection_name = cfg.get("collection_name", "ablation_test_case2_2_2D")
    save_paraview = bool(cfg.get("save_paraview", True))
    bdr_top = int(cfg.get("bdr_attr_top", 1))
    bdr_bottom = int(cfg.get("bdr_attr_bottom", 2))
    gravity = (float(cfg.get("gravity_x", 0.0)), float(cfg.get("gravity_y", 0.0)))
    probe_x = float(cfg.get("probe_x", 0.005))
    probe_y = [float(v) for v in cfg.get(
        "probe_y", [0.05, 0.049, 0.048, 0.046, 0.042, 0.038, 0.034, 0.026, 0.0])]
    recession_density_mode = cfg.get("recession_density_mode", "char_surface")
    recession_density_constant = float(cfg.get("recession_density_constant", 1200.0))
    max_step_recession = float(cfg.get("max_step_recession", float("inf")))
    min_quality_ratio = float(cfg.get("min_quality_ratio", 0.05))
    # moving_mesh / ale_enabled / ale_energy_enabled master switches plus
    # the _test variant's per-term toggles, composed exactly like the
    # reference (ablation_test_case2_2_2D.cpp:3712, _test.cpp:4409-4416)
    recession_enabled, ale_toggles = moving_mesh_and_ale_toggles(cfg)
    gcl_enabled = bool(cfg.get("gcl_storage_enabled", False))
    amaryllis_mass_file = cfg.get("amaryllis_mass_file", "")

    model = SurfaceFluxModel(
        lam=float(cfg.get("lambda", 0.5)),
        q_rad=float(cfg.get("q_rad", 0.0)),
        T_background=float(cfg.get("T_background", 300.0)),
        T_edge=float(cfg.get("T_edge", 300.0)),
        hconv=float(cfg.get("hconv", 0.0)),
        emissivity_override=float(cfg.get("emissivity", float("nan"))),
        absorptivity_override=float(cfg.get("absorptivity", float("nan"))),
        stefan_boltzmann=float(cfg.get("stefan_boltzmann", 5.670374419e-8)),
        strict_case2_2=bool(cfg.get("strict_case2_2", False)),
        pato_compat_mode=("off" if cfg.get("pato_compat_mode", "off") is False
                          else str(cfg.get("pato_compat_mode", "off")).lower()),
        case22=True,
    )

    mat = TacotMaterial.load_yaml(material_file)
    bprime_cfg = cfg.get("bprime_table_file", "")
    bprime_path = resolve_path(cfg, bprime_cfg) if bprime_cfg else ""
    if bprime_path and os.path.isfile(bprime_path):
        bprime = BPrimeTable.load_file(bprime_path)
    else:
        print(f"B' table not found ({bprime_path!r}); using synthetic "
              f"TACOT-shaped table (NOT validation data).")
        bprime = BPrimeTable.synthetic_tacot()
    schedule = SurfaceBCSchedule.load_file(resolve_path(cfg, cfg.get(
        "boundary_conditions_file",
        "Input/boundary_conditions_ablation_case2_2.dat")))

    mesh = maybe_reorder_strip_mesh(cfg, load_mesh_from_cfg(cfg))
    fes = FESpace(mesh, order)
    n = fes.nscalar
    print(f"Global true dofs (T+p): {2 * n}")
    quad_order = max(2, 2 * order + 2)
    ops = SpaceOps(fes, quad_order=quad_order)
    sys_ = AblationSystem(ops, mat, gravity=gravity, top_attr=bdr_top)
    maybe_enable_lattice_residual(cfg, sys_, fes)
    ne, nq = sys_.ne, sys_.nq
    nr = mat.num_reactions
    state = AblationState.initial(ne, nq, mat)

    rec = MeshRecessionHandler(mesh, fes, bdr_attr_top=bdr_top,
                               bdr_attr_bottom=bdr_bottom,
                               max_step_recession=max_step_recession,
                               min_quality_ratio=min_quality_ratio) \
        if recession_enabled else None

    ess = np.asarray(fes.boundary_dofs([bdr_top]))
    ess2 = ess + n  # pressure essential at top; T has SEB
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess2] = True
    mask2_j = jnp.asarray(mask2)

    ed = np.asarray(fes.element_dofs, dtype=np.int64)
    nd = ed.shape[1]
    rows_b = np.repeat(ed, nd, axis=1).reshape(-1)
    cols_b = np.tile(ed, (1, nd)).reshape(-1)
    rows_all = np.concatenate([rows_b, rows_b, rows_b + n, rows_b + n])
    cols_all = np.concatenate([cols_b, cols_b + n, cols_b, cols_b + n])
    fed = np.asarray(sys_.trace.eldofs, dtype=np.int64)
    frows = np.repeat(fed, nd, axis=1).reshape(-1)
    fcols = np.tile(fed, (1, nd)).reshape(-1)
    frows_all = np.concatenate([frows, frows])
    fcols_all = np.concatenate([fcols, fcols + n])

    bc0 = schedule.eval(0.0)
    T = jnp.full(n, 300.0)
    p = jnp.full(n, bc0.p_w)
    p = p.at[jnp.asarray(ess)].set(bc0.p_w)

    # sharding_devices: N element-shards every Newton step (one instance
    # per flux branch; sharded geometry refreshed after each mesh move).
    # dof_partition: N additionally DOF-partitions the (T,p) vectors
    # (owned slabs + ghost halos); update_geometry re-packs the factors
    # after each mesh move (VERDICT r2 #7).
    shard_n = int(cfg.get("sharding_devices", 0))
    dofp_n = int(cfg.get("dof_partition", 0))
    if shard_n and dofp_n:
        raise ValueError(
            "sharding_devices and dof_partition are mutually exclusive")
    sh_cache = {}
    shard_state = {}
    lin_rtol_sh = float(cfg.get("linear_rtol", 1.0e-10))

    def _get_sh(branch):
        if branch not in sh_cache:
            from ..parallel import (DofPartitionedAblationNewton,
                                    ShardedAblationNewton, make_device_mesh)

            cls, ndev = ((DofPartitionedAblationNewton, dofp_n) if dofp_n
                         else (ShardedAblationNewton, shard_n))
            kw = {"gcl_enabled": gcl_enabled} if dofp_n else {}
            sh_cache[branch] = cls(
                sys_, make_device_mesh(ndev), np.zeros(0, dtype=np.int64),
                ess, restart=int(cfg.get("gmres_restart", 400)),
                maxiter=int(cfg.get("gmres_maxiter", 10)),
                seb=(branch, model, bprime), ale_toggles=ale_toggles, **kw)
        return sh_cache[branch]

    @partial(jax.jit, static_argnames=("branch",))
    def residual_single(T, p, T_old_q, p_old_q, X_old, dt, bc, branch,
                        verts, wq, gcl):
        gf = ops.geometric_factors(verts)
        RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X_old, dt, gf=gf,
                               wq=wq, gcl=gcl, ale_toggles=ale_toggles)
        RT = RT + sys_.seb_face_residual(T, p, X_old, bc, branch, model,
                                         bprime, vertices=verts)
        R = jnp.concatenate([RT, Rp])
        return jnp.where(mask2_j, 0.0, R)

    def residual_fn(T, p, T_old_q, p_old_q, X_old, dt, bc, branch, verts,
                    wq, gcl):
        if shard_n:
            s = shard_state
            return _get_sh(branch).residual(
                T, p, s["To"], s["po"], s["Xo"], dt, bc=bc, wq=s["wq"],
                gcl=s["gcl"])
        if dofp_n:
            dn = _get_sh(branch)
            s = shard_state
            R_d = dn.residual(dn.to_dist2(np.asarray(T), np.asarray(p)),
                              s["To"], s["po"], s["Xo"], dt, bc=bc,
                              wq=s["wq"], gcl=s["gcl"])
            RT, Rp = dn.from_dist2(R_d)
            return jnp.asarray(np.concatenate([RT, Rp]))
        return residual_single(T, p, T_old_q, p_old_q, X_old, dt, bc,
                               branch, verts, wq, gcl)

    @partial(jax.jit, static_argnames=("branch",))
    def jacobian_fn(T, p, T_old_q, p_old_q, X_old, dt, bc, branch, verts, wq,
                    gcl):
        gf = ops.geometric_factors(verts)
        blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, X_old, dt,
                                        gf=gf, wq=wq, gcl=gcl,
                                        ale_toggles=ale_toggles)
        face = sys_.seb_face_jacobians(T, p, X_old, bc, branch, model,
                                       bprime, vertices=verts)
        return blocks, face

    iter_factory = make_block_linear_solver(
        cfg, fes.element_dofs, n, np.zeros(0, dtype=np.int64), ess,
        node_positions=fes.node_positions)

    class _ShardedPrepared:
        def __init__(self, sh, factors):
            self.sh = sh
            self.factors = factors

        def solve(self, rhs):
            res = self.sh.solve(self.factors, jnp.asarray(rhs),
                                rtol=lin_rtol_sh)
            check_linear_result(res, "block GMRES")
            return np.asarray(res.x)

    class _DofPartPrepared:
        def __init__(self, dn, factors):
            self.dn = dn
            self.factors = factors

        def solve(self, rhs):
            rhs = np.asarray(rhs)
            res = self.dn.solve(self.factors,
                                self.dn.to_dist2(rhs[:n], rhs[n:]),
                                rtol=lin_rtol_sh)
            check_linear_result(res, "distributed block GMRES")
            dxT, dxp = self.dn.from_dist2(res.x)
            return np.concatenate([dxT, dxp])

    def factorize(args):
        if shard_n:
            (T_, p_, _To, _po, _Xo, dt_, bc_, branch_, _v, _w, _g) = args
            sh = _get_sh(branch_)
            s = shard_state
            return _ShardedPrepared(sh, sh.prepare(
                T_, p_, s["To"], s["po"], s["Xo"], dt_, bc=bc_, wq=s["wq"],
                gcl=s["gcl"]))
        if dofp_n:
            (T_, p_, _To, _po, _Xo, dt_, bc_, branch_, _v, _w, _g) = args
            dn = _get_sh(branch_)
            s = shard_state
            return _DofPartPrepared(dn, dn.prepare(
                dn.to_dist2(np.asarray(T_), np.asarray(p_)),
                s["To"], s["po"], s["Xo"], dt_, bc=bc_, wq=s["wq"],
                gcl=s["gcl"]))
        (JTT, JTp, JpT, Jpp), (FJT, FJp) = jacobian_fn(*args)
        if iter_factory is not None:
            return iter_factory((JTT, JTp, JpT, Jpp), face=(FJT, FJp),
                                face_elem=sys_.trace.elem)
        vals = [np.asarray(b).reshape(-1)
                for b in (JTT, JTp, JpT, Jpp, FJT, FJp)]
        J = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate([rows_all, frows_all]),
              np.concatenate([cols_all, fcols_all]))),
            shape=(2 * n, 2 * n)).tocsr()
        keep = ~mask2
        d = sp.diags(keep.astype(np.float64))
        J = d @ J @ d + sp.diags(mask2.astype(np.float64))
        return spla.splu(J.tocsc())

    ensure_outdir(output_path)
    csvs = _make_case22_csvs(cfg, output_path, probe_y)
    (probes_csv, mass_csv, boundary_csv, newton_csv, pressure_csv,
     meshdiag_csv, masseq_csv, timing_csv) = (
        csvs["probes"], csvs["mass"], csvs["boundary"], csvs["newton"],
        csvs["pressure"], csvs["meshdiag"], csvs["masseq"], csvs["timing"])
    totals = {k: 0.0 for k in ("bc", "newton", "nres", "njac", "nlin",
                               "nupd", "state", "output", "step")}

    dc = VTUCollection(collection_name, fes, prefix_path=output_path) \
        if save_paraview else None
    probe_pts = np.array([[probe_x, y] for y in probe_y[1:]])

    verts = lambda: (rec.vertices if rec else np.asarray(mesh.vertices))
    recession_total = 0.0
    last_max_disp = 0.0
    last_quality_ratio = 1.0

    restart_read = cfg.get("restart_read_file", "")
    restart_write = cfg.get("restart_write_file", "")
    restart_write_every = int(cfg.get("restart_write_every", 0))
    restart_write_at = cfg.get("restart_write_at_time", None)
    restart_write_at = float(restart_write_at) if restart_write_at is not None \
        else float("nan")
    # end-of-run rewrite clobbers an at-time snapshot at the same path
    # (reference semantics); disable to keep a mid-run checkpoint
    restart_write_at_end = bool(cfg.get("restart_write_at_end", True))

    step = 0
    t = 0.0
    recession_history = [(0.0, 0.0)]
    if restart_read:
        (step, t, T_np, p_np, X_np, V_np, recession_total,
         recession_history) = load_restart_ale(
            resolve_path(cfg, restart_read), n, ne, nq, nr,
            mesh.vertices.shape[0], mesh.dim,
            elem_order=cfg.get("_elem_order", "file"))
        T = jnp.asarray(T_np)
        p = jnp.asarray(p_np)
        st0 = AblationState.initial(ne, nq, mat)
        state = AblationState(
            extent=jnp.asarray(X_np), tau_elem=st0.tau_elem,
            rho_elem=st0.rho_elem, pi_elem=st0.pi_elem,
            mdot_elem=st0.mdot_elem, extent_elem=st0.extent_elem,
            degree_char_elem=st0.degree_char_elem,
            char_density_fraction_elem=st0.char_density_fraction_elem)
        state = sys_.advance_state(state, T, p, 0.0)
        if rec is not None:
            rec.restore(V_np, recession_total)
        print(f"Loaded ALE restart from {restart_read} at step {step}, "
              f"time {t} s (recession {recession_total:.3e} m).")

    def write_checkpoint():
        save_restart_ale(restart_write, step, t, T, p, state.extent,
                         verts(), recession_total, recession_history,
                         elem_order=cfg.get("_elem_order", "file"))

    def write_outputs(stepno, tnow):
        v = verts()
        bdiag = _write_case22_step_outputs(
            csvs, sys_, fes, mesh, schedule, model, bprime, probe_x,
            probe_y, probe_pts, tnow, T, p, state, v,
            recession_total, last_max_disp,
            last_quality_ratio if rec else 1.0)
        if dc is not None and stepno % output_every == 0:
            fields = {
                "temperature": np.asarray(T), "pressure": np.asarray(p),
                "tau": state.tau_elem, "rho_s": state.rho_elem,
                "pi_total": state.pi_elem, "m_dot_g": state.mdot_elem,
                "degree_char": state.degree_char_elem,
                "char_density_fraction": state.char_density_fraction_elem,
            }
            for r in range(nr):
                fields[f"X{r + 1}"] = state.extent_elem[r]
            if rec is not None:
                fields["mesh_velocity"] = rec.mesh_velocity
                fields["recession"] = np.full(n, recession_total)
            dc.save(stepno, tnow, fields, vertices=v)
        return bdiag

    write_outputs(step, t)
    steps_executed = 0
    setup_sec = _time.perf_counter() - _t_run0
    restart_at_done = (not np.isfinite(restart_write_at)) or \
        (t >= restart_write_at - RESTART_TIME_TOL)
    jc_checked_branches = set()
    while t < t_final - RESTART_TIME_TOL:
        step += 1
        steps_executed += 1
        step_t0 = _time.perf_counter()
        t_prev = t
        t_next = min(t_final, t + dt_cfg)
        dt_step = t_next - t
        t = t_next

        bc_t0 = _time.perf_counter()
        bc = schedule.eval(t)
        branch = classify_branch(bc, model)

        # -- recession phase (PATO ordering: before the solve) --------------
        wq = jnp.zeros((ne, nq, mesh.dim))
        J_old_q = jnp.asarray(ops.geometric_factors(
            jnp.asarray(verts())).detJ) if gcl_enabled else None
        if rec is not None:
            v_top = np.asarray(sys_.top_boundary_recession_velocity(
                T, p, state, bc, branch, model, bprime,
                recession_density_mode=recession_density_mode,
                recession_density_constant=recession_density_constant,
                vertices=jnp.asarray(rec.vertices)))
            rec.prepare_advance(v_top, dt_step)
            new_extent = remap_extents_ale(
                mesh, ops, state.extent, rec.mesh_velocity_at_qp(ops),
                dt_step, rec.vertices)
            state = AblationState(
                extent=jnp.asarray(new_extent), tau_elem=state.tau_elem,
                rho_elem=state.rho_elem, pi_elem=state.pi_elem,
                mdot_elem=state.mdot_elem, extent_elem=state.extent_elem,
                degree_char_elem=state.degree_char_elem,
                char_density_fraction_elem=state.char_density_fraction_elem)
            out = rec.commit_advance()
            recession_total = out["total_recession"]
            last_max_disp = out["max_node_disp"]
            last_quality_ratio = out["min_quality"]
            wq = rec.mesh_velocity_at_qp(ops)

        v_now = jnp.asarray(verts())
        gf_now = ops.geometric_factors(v_now)
        gcl = (J_old_q, gf_now.detJ) if gcl_enabled else None
        T_old_q = jnp.einsum("qn,en->eq", ops.B, T[ops.eldofs])
        p_old_q = jnp.einsum("qn,en->eq", ops.B, p[ops.eldofs])
        X_old = state.extent
        if shard_n:
            sh0 = _get_sh(branch)
            sh0.update_geometry(v_now)
            shard_state["To"] = sh0.pad_elem(T_old_q)
            shard_state["po"] = sh0.pad_elem(p_old_q)
            shard_state["Xo"] = sh0.pad_elem(X_old)
            shard_state["wq"] = None if wq is None else sh0.pad_elem(wq)
            shard_state["gcl"] = None if gcl is None else (
                sh0.pad_elem(gcl[0]), sh0.pad_elem(gcl[1]))
        if dofp_n:
            # the current-branch instance is the only one used this step;
            # a just-constructed instance is refreshed here before use
            dn0 = _get_sh(branch)
            dn0.update_geometry(v_now)
            shard_state["To"] = dn0.pack_elem(np.asarray(T_old_q))
            shard_state["po"] = dn0.pack_elem(np.asarray(p_old_q))
            shard_state["Xo"] = dn0.pack_elem(np.asarray(X_old))
            shard_state["wq"] = None if wq is None else \
                dn0.pack_elem(np.asarray(wq), "zero")
            shard_state["gcl"] = None if gcl is None else (
                dn0.pack_elem(np.asarray(gcl[0]), "dup"),
                dn0.pack_elem(np.asarray(gcl[1]), "dup"))

        p = p.at[jnp.asarray(ess)].set(bc.p_w)

        bc_sec = _time.perf_counter() - bc_t0  # incl. recession + remap

        if jacobian_check and step == 1:
            rel = sys_.jacobian_check(
                T, p, T_old_q, p_old_q, X_old, dt_step, abs_tol=jc_abs,
                rel_tol=jc_rel, gf=gf_now, wq=wq, gcl=gcl,
                ale_toggles=ale_toggles)
            print(f"jacobian_check (domain blocks) passed "
                  f"(max rel err {rel:.3e})")
        if jacobian_check and branch not in jc_checked_branches:
            # once per surface-flux branch, skipping non-smooth states
            # (ablation_test_case2_1_2D.cpp:1809-1832)
            jc_checked_branches.add(branch)
            rel = sys_.jacobian_check(
                T, p, T_old_q, p_old_q, X_old, dt_step, abs_tol=jc_abs,
                rel_tol=jc_rel, gf=gf_now, wq=wq, gcl=gcl,
                ale_toggles=ale_toggles, seb=(branch, model, bprime),
                bc=bc, vertices=v_now)
            if rel is None:
                print(f"jacobian_check (domain+face, branch={branch}) "
                      f"skipped: non-smooth state (B' table clamp active)")
            else:
                print(f"jacobian_check (domain+face, branch={branch}) "
                      f"passed (max rel err {rel:.3e})")

        newton_t0 = _time.perf_counter()

        def _enforce_bc(T, p):
            return T, p.at[jnp.asarray(ess)].set(bc.p_w)

        T, p, iters, ntim = run_tp_newton_loop(
            T, p,
            residual=lambda T, p: residual_fn(T, p, T_old_q, p_old_q,
                                              X_old, dt_step, bc, branch,
                                              v_now, wq, gcl),
            factorize=lambda T, p: factorize((T, p, T_old_q, p_old_q,
                                              X_old, dt_step, bc, branch,
                                              v_now, wq, gcl)),
            enforce_bc=_enforce_bc, newton_cfg=newton_cfg,
            rebuild_freq=jacobian_rebuild_freq, newton_csv=newton_csv,
            step=step, t=t, n=n, print_level=newton_print_level,
            print_multiline=False)
        nres, njac, nlin = ntim["nres"], ntim["njac"], ntim["nlin"]

        newton_sec = _time.perf_counter() - newton_t0
        state_t0 = _time.perf_counter()
        state = sys_.advance_state(state, T, p, dt_step)
        state_sec = _time.perf_counter() - state_t0
        out_t0 = _time.perf_counter()
        write_outputs(step, t)
        recession_history.append((t, recession_total))
        if restart_write:
            write_now = restart_write_every > 0 and \
                step % restart_write_every == 0
            if (not restart_at_done and np.isfinite(restart_write_at)
                    and t_prev < restart_write_at - RESTART_TIME_TOL
                    and t >= restart_write_at - RESTART_TIME_TOL):
                write_now = True
                restart_at_done = True
            if write_now:
                write_checkpoint()
        out_sec = _time.perf_counter() - out_t0
        step_sec = _time.perf_counter() - step_t0
        timing_csv.writerow([step, bc_sec, newton_sec, nres, njac, nlin,
                             ntim["nupd"], state_sec, out_sec, step_sec])
        for k, v in zip(("bc", "newton", "nres", "njac", "nlin", "nupd",
                         "state", "output", "step"),
                        (bc_sec, newton_sec, nres, njac, nlin, ntim["nupd"],
                         state_sec, out_sec, step_sec)):
            totals[k] += v
        if step <= 5 or step % 50 == 0:
            print(f"step={step} t={t:g} [{branch}] newton_iters={iters} "
                  f"Tmax={float(jnp.max(T)):.1f} recession={recession_total:.3e}")

    if restart_write and restart_write_at_end:
        write_checkpoint()

    probes_csv.close()
    mass_csv.close()
    boundary_csv.close()
    newton_csv.close()
    pressure_csv.close()
    meshdiag_csv.close()
    masseq_csv.close()
    timing_csv.close()
    with CsvWriter(os.path.join(output_path,
                                cfg.get("timing_summary_csv",
                                        "driver_timing_summary.csv")),
                   ["metric", "seconds"]) as w:
        w.writerow(["setup_time_maxrank", setup_sec])
        w.writerow(["run_time_maxrank", _time.perf_counter() - _t_run0])
        w.writerow(["sum_step_time_maxrank", totals["step"]])
        w.writerow(["sum_bc_time_maxrank", totals["bc"]])
        w.writerow(["sum_newton_time_maxrank", totals["newton"]])
        w.writerow(["sum_newton_residual_eval_time_maxrank", totals["nres"]])
        w.writerow(["sum_newton_jacobian_time_maxrank", totals["njac"]])
        w.writerow(["sum_newton_linear_time_maxrank", totals["nlin"]])
        w.writerow(["sum_newton_update_time_maxrank", totals["nupd"]])
        w.writerow(["sum_state_advance_time_maxrank", totals["state"]])
        w.writerow(["sum_output_time_maxrank", totals["output"]])
        w.writerow(["avg_step_time_maxrank",
                    totals["step"] / max(1, steps_executed)])

    recession_metrics = _finalize_case22_outputs(cfg, output_path,
                                                 amaryllis_mass_file,
                                                 recession_history)
    return {"T": np.asarray(T), "p": np.asarray(p), "state": state,
            "fes": fes, "mesh": mesh, "recession_total": recession_total,
            "vertices": verts(), "time": t, "handler": rec,
            "recession_history": recession_history,
            "recession_metrics": recession_metrics}


def run_scan(cfg: dict) -> dict:
    """Whole-run fused stepping for the moving-mesh driver: chunks of
    ``output_every`` steps run as ONE jitted ``lax.scan`` program — the
    recession velocity, vector-Laplacian mesh smoothing, structured
    semi-Lagrangian extent remap (``make_scan_remap``: structured quad
    lattice or own-element tri strip), mesh move +
    quality metric, SEB Newton solve (equilibrated block GMRES), and state
    advance all stay on device; host round trips happen once per output
    frame instead of several times per step (VERDICT r1 weak #5 / next #9).

    Scope: order-1 structured quad strips (what every reference recession
    configuration uses), single device, no restart I/O, one surface-flux
    branch over the run (reference smoke schedules satisfy all of these);
    anything else raises so the eager path must be used instead.  The CSV
    streams are replayed post-chunk through the same
    ``_write_case22_step_outputs`` implementation as the eager driver.
    """
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import SpaceOps, BilinearForm
    from ..ops.bc import EssentialBC
    from ..physics.tacot import TacotMaterial
    from ..physics.bprime import BPrimeTable
    from ..physics.surface_bc import SurfaceBCSchedule, BoundaryState
    from ..physics.seb import SurfaceFluxModel, classify_branch
    from ..physics.ablation import AblationSystem, AblationState
    from ..motion.remap import make_scan_remap
    from ..core.geometry import compute_geometric_factors
    from ..core.quadrature import gauss_rule
    from ..core.reference_elements import get_reference_element
    from ..solvers import cg, jacobi_preconditioner

    if int(cfg.get("order", 1)) != 1:
        raise NotImplementedError("scan_stepping requires order 1")
    if int(cfg.get("sharding_devices", 0)):
        raise NotImplementedError(
            "scan_stepping and sharding_devices are mutually exclusive")
    if cfg.get("restart_read_file", "") or cfg.get("restart_write_file", ""):
        raise NotImplementedError(
            "scan_stepping does not support restart I/O; use the eager path")
    if bool(cfg.get("jacobian_check", False)):
        raise NotImplementedError(
            "jacobian_check is host-side; use the eager path")

    material_file = resolve_path(cfg, cfg.get(
        "material_file", "Input/material_tacot_case2_2.yaml"))
    dt_cfg = float(cfg.get("dt", 1.0e-2))
    t_final = float(cfg.get("t_final", 120.0))
    abs_tol = float(cfg.get("newton_abs_tol", 1e-8))
    rel_tol = float(cfg.get("newton_rel_tol", 1e-6))
    max_iter = int(cfg.get("newton_max_iter", 20))
    stall_kw = dict(
        stall_improve=float(cfg.get("newton_stall_improve", 1e-3)),
        stall_patience=int(cfg.get("newton_stall_patience", 2)),
        stall_accept_rel=float(cfg.get("newton_stall_accept_rel", 1e-3)),
        stall_dx_rtol=cfg.get("newton_stall_dx_rtol", None),
        stall_flat_factor=float(cfg.get("newton_stall_flat_factor", 1.15)))
    lin_rtol = float(cfg.get("linear_rtol", 1.0e-10))
    output_every = int(cfg.get("output_every", 10))
    if output_every < 1:
        raise ValueError("output_every must be >= 1")
    output_path = cfg.get("output_path", "ParaView/ablation_case2_2")
    collection_name = cfg.get("collection_name", "ablation_test_case2_2_2D")
    save_paraview = bool(cfg.get("save_paraview", True))
    bdr_top = int(cfg.get("bdr_attr_top", 1))
    bdr_bottom = int(cfg.get("bdr_attr_bottom", 2))
    gravity = (float(cfg.get("gravity_x", 0.0)),
               float(cfg.get("gravity_y", 0.0)))
    probe_x = float(cfg.get("probe_x", 0.005))
    probe_y = [float(v) for v in cfg.get(
        "probe_y", [0.05, 0.049, 0.048, 0.046, 0.042, 0.038, 0.034, 0.026,
                    0.0])]
    recession_density_mode = cfg.get("recession_density_mode", "char_surface")
    recession_density_constant = float(
        cfg.get("recession_density_constant", 1200.0))
    max_step_recession = float(cfg.get("max_step_recession", float("inf")))
    min_quality_ratio = float(cfg.get("min_quality_ratio", 0.05))
    recession_enabled, ale_toggles = moving_mesh_and_ale_toggles(cfg)
    gcl_enabled = bool(cfg.get("gcl_storage_enabled", False))
    amaryllis_mass_file = cfg.get("amaryllis_mass_file", "")
    if output_every < 1:
        raise ValueError("output_every must be >= 1")

    model = SurfaceFluxModel(
        lam=float(cfg.get("lambda", 0.5)),
        q_rad=float(cfg.get("q_rad", 0.0)),
        T_background=float(cfg.get("T_background", 300.0)),
        T_edge=float(cfg.get("T_edge", 300.0)),
        hconv=float(cfg.get("hconv", 0.0)),
        emissivity_override=float(cfg.get("emissivity", float("nan"))),
        absorptivity_override=float(cfg.get("absorptivity", float("nan"))),
        stefan_boltzmann=float(cfg.get("stefan_boltzmann", 5.670374419e-8)),
        strict_case2_2=bool(cfg.get("strict_case2_2", False)),
        pato_compat_mode=("off" if cfg.get("pato_compat_mode", "off") is False
                          else str(cfg.get("pato_compat_mode", "off")).lower()),
        case22=True,
    )
    mat = TacotMaterial.load_yaml(material_file)
    bprime_cfg = cfg.get("bprime_table_file", "")
    bprime_path = resolve_path(cfg, bprime_cfg) if bprime_cfg else ""
    if bprime_path and os.path.isfile(bprime_path):
        bprime = BPrimeTable.load_file(bprime_path)
    else:
        print(f"B' table not found ({bprime_path!r}); using synthetic "
              f"TACOT-shaped table (NOT validation data).")
        bprime = BPrimeTable.synthetic_tacot()
    schedule = SurfaceBCSchedule.load_file(resolve_path(cfg, cfg.get(
        "boundary_conditions_file",
        "Input/boundary_conditions_ablation_case2_2.dat")))

    _t_setup = _time.perf_counter()
    _mark = lambda what: print(
        f"[setup] {what}: {_time.perf_counter() - _t_setup:.1f}s",
        flush=True)
    mesh = maybe_reorder_strip_mesh(cfg, load_mesh_from_cfg(cfg))
    fes = FESpace(mesh, 1)
    _mark("mesh+fes")
    n = fes.nscalar
    print(f"Global true dofs (T+p): {2 * n}")
    ops = SpaceOps(fes, quad_order=4)
    _mark("spaceops")
    sys_ = AblationSystem(ops, mat, gravity=gravity, top_attr=bdr_top)
    _mark("ablation system")
    maybe_enable_lattice_residual(cfg, sys_, fes)
    _mark("lattice residual")
    ne, nq = sys_.ne, sys_.nq
    nr = mat.num_reactions
    state0 = AblationState.initial(ne, nq, mat)

    ess = np.asarray(fes.boundary_dofs([bdr_top]))
    essj = jnp.asarray(ess)
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess + n] = True
    mask2_j = jnp.asarray(mask2)
    # the dof lattice is pure connectivity (recovered from the REFERENCE
    # node positions), so it stays valid as the mesh recedes; it turns the
    # GMRES matvec into gather-free shifted-window stencil multiplies
    from ..solvers.blocksolve import make_scan_block_solver
    _mark("state + bdofs")
    bks = make_scan_block_solver(cfg, fes.element_dofs, n,
                                 np.zeros(0, dtype=np.int64), ess,
                                 fes.node_positions)
    _mark("block solver")
    face_elem_j = jnp.asarray(np.asarray(sys_.trace.elem, dtype=np.int64))
    _mark("mesh+fes+ops+system+solver")

    nsteps = num_steps(t_final, dt_cfg)
    t_edges = np.minimum(t_final, dt_cfg * np.arange(nsteps + 1))
    print(f"Time steps: {nsteps}, nominal final time: {t_edges[-1]}")

    # surface-flux branch + chemistry toggle are STATIC in each traced
    # program; the run is segmented wherever the per-step (branch, chem)
    # label changes (the production schedule flips chemistryOn 1->0 at
    # t=60.1 s, Input/boundary_conditions_ablation_case2_2.dat:5 /
    # surface_bc_schedule.cpp:94-169) and one compiled scan instance per
    # label is cached (per-state classification as in
    # ablation_test_case2_1_2D.cpp:532-555)
    bcs = [schedule.eval(float(tv)) for tv in t_edges[1:]] or \
        [schedule.eval(0.0)]
    _mark("schedule eval")
    step_labels = [(classify_branch(b, model), b.chemistryOn) for b in bcs]
    _mark("labels")
    seg_edges = {k for k in range(1, nsteps)
                 if step_labels[k] != step_labels[k - 1]}
    rows = np.asarray(schedule.rows)
    sched_t = jnp.asarray(rows[:, 0])
    sched_cols = jnp.asarray(rows[:, 1:6])  # p_w, rhoeUeCH, h_r, hconv, Tedge

    def make_bc_at(chem_static):
        def bc_at(t):
            mix = jax.vmap(lambda col: jnp.interp(t, sched_t, col),
                           in_axes=1)(sched_cols)
            return BoundaryState(
                p_w=mix[0], rhoeUeCH=mix[1], h_r=mix[2],
                hconv=mix[3] if schedule.has_hconv else 0.0,
                Tedge=mix[4] if schedule.has_hconv else 300.0,
                has_hconv=schedule.has_hconv, has_Tedge=schedule.has_hconv,
                chemistryOn=chem_static)
        return bc_at

    # mesh-motion machinery (device): Laplacian smoothing + quality rule
    verts0 = np.asarray(mesh.vertices, dtype=np.float64)
    top_dofs = np.asarray(fes.boundary_dofs([bdr_top]))
    bottom_dofs = np.asarray(fes.boundary_dofs([bdr_bottom]))
    lap_ops = SpaceOps(fes)
    lap_form = BilinearForm(lap_ops).add_diffusion(1.0)
    lap_bc = EssentialBC(n, np.unique(np.concatenate([top_dofs,
                                                      bottom_dofs])))
    topj = jnp.asarray(top_dofs)
    qual_rule = gauss_rule(mesh.geom, 2)
    qual_geo = get_reference_element(mesh.geom, 1)
    qBg, qGg = qual_geo.eval(qual_rule.points)
    qual_args = (jnp.asarray(qBg), jnp.asarray(qGg),
                 jnp.asarray(qual_rule.weights),
                 jnp.asarray(mesh.elem_conn))

    def min_quality(verts):
        gfq = compute_geometric_factors(verts[qual_args[3]], qual_args[0],
                                        qual_args[1], qual_args[2])
        return jnp.min(gfq.detJ)

    _mark("quality rule tabulation")
    init_minq = float(jax.jit(min_quality)(jnp.asarray(verts0)))
    _mark("init mesh quality")
    if not np.isfinite(init_minq) or init_minq <= 0:
        raise RuntimeError(
            "Invalid initial mesh quality for moving-mesh recession.")

    remap = make_scan_remap(mesh, ops) if recession_enabled else None
    _mark("remap init")
    vmax_rec = (max_step_recession / dt_cfg) \
        if (np.isfinite(max_step_recession) and max_step_recession > 0
            and dt_cfg > 0) else np.inf

    def smooth_mesh_velocity(verts, v_clamped, wy0=None):
        """Vector-Laplacian smoothing on the current geometry; only the
        recession axis carries -v on top / 0 on bottom (the tangential
        components solve to zero), mesh_recession_handler.cpp:219-279.
        ``wy0`` warm-starts the CG from the previous step's smoothed
        field (the velocity changes slowly step-to-step at production
        dt, so the warm-started solve converges in a few iterations
        instead of running toward the 500 cap every step)."""
        gf_l = lap_ops.geometric_factors(verts)
        data = lap_form.assemble(gf_l)
        apply_A = lambda u: lap_form.apply(data, u)
        diag = jnp.where(lap_bc.mask, 1.0, lap_form.assemble_diagonal(data))
        u_bc = jnp.zeros(n).at[topj].set(-v_clamped[topj])
        B = lap_bc.constrained_rhs(apply_A, jnp.zeros(n), u_bc)
        # rtol floored like MeshRecessionHandler.prepare_advance: 1e-12
        # is unreachable in f32 and would burn all 500 iterations inside
        # the fused scan every step
        rtol = max(1e-12, 50.0 * float(jnp.finfo(B.dtype).eps))
        x0 = None if wy0 is None else \
            jnp.asarray(wy0).at[topj].set(-v_clamped[topj])
        res = cg(lap_bc.constrain_operator(apply_A), B, x0=x0,
                 M=jacobi_preconditioner(diag), rtol=rtol, maxiter=500)
        return res.x

    # ---- in-scan diagnostics machinery ---------------------------------
    # All per-step CSV quantities (probes, pressure, mass/fronts,
    # boundary diagnostics, mass-eq probe, mesh diagnostics) are computed
    # INSIDE the compiled scan step via tracked-candidate sampling
    # (core.tracksample): the host post-chunk loop then only formats
    # arrays into CSV rows.  The previous per-step host sampling cost
    # ~1.5 s/step through the TPU tunnel — 7x the whole device step.
    from ..core.tracksample import (TrackedSampler, front_depth_from_samples,
                                    line_points)

    v0lo = verts0.min(axis=0)
    v0hi = verts0.max(axis=0)
    # Candidate-band slack for the tracked samplers must cover the TOTAL
    # mesh motion of the run (ADVICE r4 #1: the old 10%-of-height
    # heuristic gave 5.0 mm while the production run receded 5.06 mm —
    # the TrackedSampler contract was already exceeded and only survived
    # on element-bbox margin).  Derive it from the recession bound
    # max_step_recession * nsteps; that clamp bound is loose (production
    # deck: 2e-4 * 48000 = 9.6 m), so cap at the strip height —
    # recession beyond the full height consumes the domain anyway, and
    # a full-height band costs only a few extra candidate pairs per
    # point in the per-step barycentric test.
    height0 = float(v0hi[1] - v0lo[1])
    rec_bound = (max_step_recession * nsteps
                 if (np.isfinite(max_step_recession)
                     and max_step_recession > 0) else height0)
    diag_slack = float(min(height0, max(2.0e-3, 1.25 * rec_bound)))
    probe_pts = np.array([[probe_x, y] for y in probe_y[1:]])
    # row 0 is the wall probe: its y tracks the LOCAL receding surface
    # at probe_x (the global max-y clamp loses the point as soon as
    # recession is nonuniform by >1e-9 and the whole wall column goes
    # NaN).  x never changes under the y-only smoothing, so the
    # bracketing top-edge nodes are static and their current heights
    # interpolate the local wall height exactly (P1 top edge).
    pts_all0 = np.vstack([[[probe_x, min(probe_y[0], v0hi[1] - 1e-9)]],
                          probe_pts])
    _tx = verts0[top_dofs, 0]
    _ord = np.argsort(_tx)
    _j = int(np.clip(np.searchsorted(_tx[_ord], probe_x), 1,
                     len(_ord) - 1))
    wall_n0 = int(top_dofs[_ord[_j - 1]])
    wall_n1 = int(top_dofs[_ord[_j]])
    _den = _tx[_ord[_j]] - _tx[_ord[_j - 1]]
    wall_w = float((probe_x - _tx[_ord[_j - 1]]) / _den) if _den > 0         else 0.0
    diag_sampler = TrackedSampler(mesh, pts_all0, y_slack=diag_slack)
    pts_all0_j = jnp.asarray(pts_all0)
    xmid_s = 0.5 * (v0lo[0] + v0hi[0])
    line_pts = line_points(xmid_s, v0hi[1], v0lo[1])
    line_sampler = TrackedSampler(mesh, line_pts, y_slack=diag_slack)
    line_ys = jnp.asarray(line_pts[:, 1])
    _SURF_KEYS = type(sys_)._SURF_KEYS
    _mark("motion + diagnostics machinery")

    def step_diagnostics(T, p, X, pi_qp, tau_e, verts, bc, branch):
        """Jittable per-step diagnostics: returns the tuple consumed by
        the post-chunk CSV writer (wallT, probe_T (np,), wallp,
        probe_p (np,), meq (np+1, 9), diag (15,), clamps (3,), f98, f2,
        top_y)."""
        top_y = jnp.max(verts[topj, 1])
        wall_y = ((1.0 - wall_w) * verts[wall_n0, 1]
                  + wall_w * verts[wall_n1, 1])
        pts = pts_all0_j.at[0, 1].set(
            jnp.minimum(pts_all0_j[0, 1], wall_y - 1e-9))
        loc = diag_sampler.locate(verts, pts)
        Ts_all = diag_sampler.sample_h1(loc, T)
        ps_all = diag_sampler.sample_h1(loc, p)
        meq = sys_.mass_eq_probe_scan(T, p, X, pi_qp, diag_sampler, loc,
                                      verts)
        Xrep0 = X[jnp.asarray(sys_.trace.elem), 0]
        vals = sys_.top_boundary_terms(T, p, Xrep0, bc, branch, model,
                                       bprime, vertices=verts)
        diag = jnp.stack([vals["m_dot_g_surf"]]
                         + [vals[k] for k in _SURF_KEYS])
        clamps = jnp.stack([vals["clamps_p"], vals["clamps_bg"],
                            vals["clamps_t"]]).astype(jnp.float64 if
                                                      jax.config.jax_enable_x64
                                                      else jnp.float32)
        lloc = line_sampler.locate(verts)
        lvals = line_sampler.sample_l2(lloc, tau_e)
        f98 = front_depth_from_samples(lvals, line_ys, top_y, 0.98)
        f2 = front_depth_from_samples(lvals, line_ys, top_y, 0.02)
        return (Ts_all[0], Ts_all[1:], ps_all[0], ps_all[1:], meq, diag,
                clamps, f98, f2, top_y)

    def make_step_fn(branch, chem_static):
      bc_at = make_bc_at(chem_static)

      def step_fn(carry, inp):
        (T, p, X, verts, rec_total, wy_prev) = carry[:6]
        t, dt = inp
        bc = bc_at(t)

        # -- recession phase (PATO ordering: before the solve) ------------
        if recession_enabled:
            Xrep = jnp.mean(X, axis=1)[jnp.asarray(sys_.trace.elem)]
            v_rec = sys_._recession_velocity_terms(
                T, p, Xrep, bc, branch, model, bprime,
                recession_density_mode, recession_density_constant, verts)
            v_rec = jnp.minimum(v_rec, vmax_rec)
            mean_v = jnp.mean(v_rec[topj]) if len(top_dofs) else 0.0

            # skip the smoothing solve + remap + mesh move entirely while
            # the surface is not receding (pre-char heating and post-
            # cooldown phases of the production schedule): the whole
            # block is identity there and the smoothing CG dominates the
            # non-Newton step cost
            def _move(args):
                X, verts, rec_total, wy_prev = args
                wy = smooth_mesh_velocity(verts, v_rec, wy0=wy_prev)
                w_nodal = jnp.zeros((n, mesh.dim)).at[:, 1].set(wy)
                gf_pre = ops.geometric_factors(verts)
                wq = jnp.einsum("qn,end->eqd", ops.B, w_nodal[ops.eldofs])
                Xn = remap(X, verts, gf_pre.xq, wq, dt)
                # order-1 nodal mesh: scalar dofs == vertices
                verts_n = verts + dt * w_nodal
                rec_n = rec_total + mean_v * dt
                max_disp = jnp.abs(dt * w_nodal).max()
                return (Xn, verts_n, rec_n, wy, wq, max_disp,
                        gf_pre.detJ)

            def _still(args):
                X, verts, rec_total, wy_prev = args
                return (X, verts, rec_total, jnp.zeros_like(wy_prev),
                        jnp.zeros((ne, nq, mesh.dim)), 0.0,
                        ops.geometric_factors(verts).detJ)

            active = jnp.max(v_rec) * dt > 1e-16
            (X, verts, rec_total, wy_prev, wq, max_disp,
             J_pre) = jax.lax.cond(active, _move, _still,
                                   (X, verts, rec_total, wy_prev))
            J_old = J_pre if gcl_enabled else None
        else:
            wq = jnp.zeros((ne, nq, mesh.dim))
            mean_v = 0.0
            max_disp = 0.0
            J_old = ops.geometric_factors(verts).detJ if gcl_enabled \
                else None

        minq = min_quality(verts)
        gf_now = ops.geometric_factors(verts)
        gcl = (J_old, gf_now.detJ) if gcl_enabled else None
        T_old_q = ops.values_at_qp(T)
        p_old_q = ops.values_at_qp(p)
        p = p.at[essj].set(bc.p_w)

        def residual(T, p):
            RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X, dt, gf=gf_now,
                                   wq=wq, gcl=gcl, ale_toggles=ale_toggles)
            RT = RT + sys_.seb_face_residual(T, p, X, bc, branch, model,
                                             bprime, vertices=verts)
            return jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp]))

        def solve(T, p, R):
            blocks = sys_.element_jacobians(
                T, p, T_old_q, p_old_q, X, dt, gf=gf_now, wq=wq,
                gcl=gcl, ale_toggles=ale_toggles)
            face = sys_.seb_face_jacobians(T, p, X, bc, branch, model,
                                           bprime, vertices=verts)
            fac = bks._prepare_face(*blocks, *face, face_elem_j)
            sol = bks._solve(*fac, -R, jnp.asarray(lin_rtol),
                             jnp.asarray(0.0))
            dx = sol.x
            Tn = T + dx[:n]
            pn = (p + dx[n:]).at[essj].set(bc.p_w)
            return Tn, pn, jnp.linalg.norm(dx), linear_usable(sol)

        (T, p, it, r0, rn, done, res_h, upd_h, lin_ok,
            nw_stalled) = scan_newton(
            T, p, residual=residual, solve=solve, abs_tol=abs_tol,
            rel_tol=rel_tol, max_iter=max_iter, **stall_kw)

        (X, tau_e, rho_e, pi_e, mdot_e, extent_e,
         pi_qp) = sys_.advance_state_arrays(X, T, p, dt)
        (wallT, probe_T, wallp, probe_p, meq, diag, clamps, f98, f2,
         top_y) = step_diagnostics(T, p, X, pi_qp, tau_e, verts, bc,
                                   branch)
        carry = (T, p, X, verts, rec_total, wy_prev,
                 tau_e, rho_e, pi_e, mdot_e, extent_e, pi_qp)
        out = (rec_total, mean_v, max_disp, minq,
               it, r0, rn, done, res_h, upd_h, lin_ok, nw_stalled,
               wallT, probe_T, wallp, probe_p, meq, diag, clamps,
               f98, f2, top_y)
        return carry, out

      return step_fn

    # one compiled scan program per (branch, chemistry) label, cached —
    # the production deck crosses exactly one label change (t=60.1 s)
    _sim_cache = {}

    def simulate_chunk_for(label):
        if label not in _sim_cache:
            step_fn = make_step_fn(*label)

            @jax.jit
            def simulate_chunk(carry, ts, dts):
                return jax.lax.scan(step_fn, carry, (ts, dts))

            _sim_cache[label] = simulate_chunk
        return _sim_cache[label]

    # ---- outputs -------------------------------------------------------
    ensure_outdir(output_path)
    csvs = _make_case22_csvs(cfg, output_path, probe_y)
    newton_csv, timing_csv = csvs["newton"], csvs["timing"]
    dc = VTUCollection(collection_name, fes, prefix_path=output_path) \
        if save_paraview else None
    probe_pts = np.array([[probe_x, y] for y in probe_y[1:]])
    rho_v = mat.initial_solid_density()
    rho_c = mat.char_solid_density()
    den = rho_v - rho_c

    def build_state(X, tau_e, rho_e, pi_e, mdot_e, extent_e, pi_qp):
        tau_e = np.asarray(tau_e)
        rho_e = np.asarray(rho_e)
        cdf = np.clip((rho_v - rho_e) / den, 0.0, 1.0) \
            if abs(den) > 1e-14 else np.zeros_like(rho_e)
        return AblationState(
            extent=X, tau_elem=tau_e, rho_elem=rho_e,
            pi_elem=np.asarray(pi_e), mdot_elem=np.asarray(mdot_e),
            extent_elem=np.asarray(extent_e),
            degree_char_elem=np.clip(1.0 - tau_e, 0.0, 1.0),
            char_density_fraction_elem=cdf, pi_qp=np.asarray(pi_qp))

    def save_frame(stepno, tnow, T, p, st, v, rec_total, w_nodal=None):
        fields = {
            "temperature": np.asarray(T), "pressure": np.asarray(p),
            "tau": st.tau_elem, "rho_s": st.rho_elem,
            "pi_total": st.pi_elem, "m_dot_g": st.mdot_elem,
            "degree_char": st.degree_char_elem,
            "char_density_fraction": st.char_density_fraction_elem,
        }
        for r in range(nr):
            fields[f"X{r + 1}"] = st.extent_elem[r]
        if recession_enabled:
            fields["recession"] = np.full(n, rec_total)
        dc.save(stepno, tnow, fields, vertices=np.asarray(v))

    T0 = jnp.full(n, 300.0)
    bc0 = schedule.eval(0.0)
    p0 = jnp.full(n, bc0.p_w).at[essj].set(bc0.p_w)
    carry = (T0, p0, jnp.asarray(state0.extent), jnp.asarray(verts0), 0.0,
             jnp.zeros(n),
             jnp.asarray(state0.tau_elem), jnp.asarray(state0.rho_elem),
             jnp.asarray(state0.pi_elem), jnp.asarray(state0.mdot_elem),
             jnp.asarray(state0.extent_elem),
             jnp.asarray(state0.pi_qp if state0.pi_qp is not None
                         else np.zeros((ne, nq))))
    recession_history = [(0.0, 0.0)]

    if os.environ.get("CMFEM_SCAN_PROFILE", "0") == "1":
        # per-phase device timing of one production step (perf tool; not
        # a validation path).  CMFEM_SCAN_PROFILE=1 python -m ...
        _profile_scan_phases(
            jnp, _time, step_labels, make_bc_at, t_edges, T0, p0, state0,
            verts0, sys_, ops, bks, remap, smooth_mesh_velocity,
            min_quality, face_elem_j, mask2_j, lin_rtol, ale_toggles,
            model, bprime, vmax_rec, mesh, n, recession_density_mode,
            recession_density_constant, recession_enabled, gcl_enabled,
            make_step_fn, carry,
            lambda tnow, T, p, st, v: _write_case22_step_outputs(
                csvs, sys_, fes, mesh, schedule, model, bprime, probe_x,
                probe_y, probe_pts, tnow, T, p, st, v, 0.0, 0.0, 1.0))
        for c in csvs.values():
            c.close()
        return {"profiled": True}

    # step-0 rows via the same jitted diagnostics the scan uses (the
    # host writer would compile its own sampling/physics programs —
    # measured ~87 s one-time through the TPU tunnel)
    import functools
    branch0 = classify_branch(bc0, model)
    _t_d0 = _time.perf_counter()
    d0 = jax.jit(functools.partial(step_diagnostics, branch=branch0))(
        T0, p0, carry[2], carry[11], carry[6], jnp.asarray(verts0), bc0)
    jax.block_until_ready(d0[0])
    print(f"[setup] step-0 diagnostics (incl. jit): "
          f"{_time.perf_counter() - _t_d0:.1f}s", flush=True)
    (wallT0, probeT0, wallp0, probep0, meq0, diag0, clamps0, f98_0, f2_0,
     topy0) = [np.asarray(x) for x in d0]
    if bprime is not None:
        bprime.clamp_stats.p += int(clamps0[0])
        bprime.clamp_stats.bg += int(clamps0[1])
        bprime.clamp_stats.t += int(clamps0[2])
    csvs["probes"].writerow([0.0, float(wallT0)]
                            + [float(x) for x in probeT0])
    csvs["pressure"].writerow([0.0, float(wallp0)]
                              + [float(x) for x in probep0])
    csvs["meshdiag"].writerow([0.0, float(topy0), 1.0, 0.0, 0.0])
    csvs["masseq"].writerow([0.0] + [float(x) for x in meq0.reshape(-1)])
    csvs["mass"].writerow([0.0, float(diag0[0]), float(diag0[1]),
                           float(f98_0), float(f2_0), 0.0])
    csvs["boundary"].writerow([0.0] + [float(x) for x in diag0])
    if dc is not None:
        save_frame(0, 0.0, T0, p0, state0, verts0, 0.0)

    _mark("outputs + step-0 rows (ready to step)")
    wall = 0.0
    bounds = sorted(set(list(range(0, nsteps, output_every)) + [nsteps])
                    | seg_edges)
    stall_stats = NewtonStallStats()
    for b, e in zip(bounds[:-1], bounds[1:]):
        ts = jnp.asarray(t_edges[b + 1:e + 1])
        dts = jnp.asarray(np.diff(t_edges[b:e + 1]))
        # chunk boundaries include every label change, so the label is
        # constant within [b, e)
        simulate_chunk = simulate_chunk_for(step_labels[b])
        w0 = _time.perf_counter()
        carry, outs = simulate_chunk(carry, ts, dts)
        jax.block_until_ready(carry[0])
        wall += _time.perf_counter() - w0
        print(f"[scan] steps {e}/{nsteps} wall={wall:.1f}s "
              f"({1e3 * wall / max(1, e):.0f} ms/step avg)", flush=True)
        (rtots, mean_vs, max_disps, minqs, iters, r0s, rns, dones, res_hs,
         upd_hs, lin_oks, nw_stalls, wallTs, probeTs, wallps, probeps,
         meqs, diags, clampss, f98s, f2s,
         topys) = [np.asarray(o) for o in outs]
        stall_stats.update(nw_stalls, rns, r0s)
        if nw_stalls.any():
            print(f"WARNING: {int(nw_stalls.sum())}/{e - b} steps "
                  "accepted at the Newton working-precision stall floor "
                  "(not the abs/rel tolerance)", flush=True)
        if not lin_oks.all():
            bad = b + int(np.nonzero(~lin_oks)[0][0]) + 1
            raise RuntimeError(
                f"block GMRES did not converge at step {bad} "
                f"(raise gmres_restart/gmres_maxiter)")
        if not dones.all():
            k = int(np.nonzero(~dones)[0][0])
            raise RuntimeError(
                f"Newton did not converge at step {b + k + 1}, final "
                f"residual={rns[k]}")
        qratio = minqs / init_minq
        if (minqs <= 0).any() or (qratio < min_quality_ratio).any():
            bad = b + int(np.nonzero((minqs <= 0)
                                     | (qratio < min_quality_ratio))[0][0]) + 1
            raise RuntimeError(
                f"Mesh quality ratio below configured minimum threshold "
                f"at step {bad}.")
        amort = wall / e
        # clamp-count bookkeeping moved on-device with the diagnostics
        if bprime is not None:
            cs = clampss.sum(axis=0)
            bprime.clamp_stats.p += int(cs[0])
            bprime.clamp_stats.bg += int(cs[1])
            bprime.clamp_stats.t += int(cs[2])
        for k in range(e - b):
            gstep = b + k + 1
            tk = float(t_edges[gstep])
            recession_history.append((tk, float(rtots[k])))
            csvs["probes"].writerow([tk, float(wallTs[k])]
                                    + [float(x) for x in probeTs[k]])
            csvs["pressure"].writerow([tk, float(wallps[k])]
                                      + [float(x) for x in probeps[k]])
            csvs["meshdiag"].writerow([tk, float(topys[k]),
                                       float(qratio[k]),
                                       float(max_disps[k]),
                                       float(rtots[k])])
            csvs["masseq"].writerow([tk] + [float(x)
                                            for x in meqs[k].reshape(-1)])
            csvs["mass"].writerow([tk, float(diags[k][0]),
                                   float(diags[k][1]), float(f98s[k]),
                                   float(f2s[k]), float(rtots[k])])
            csvs["boundary"].writerow([tk] + [float(x) for x in diags[k]])
            replay_newton_history(newton_csv, gstep, tk, int(iters[k]),
                                  float(r0s[k]), res_hs[k], upd_hs[k])
            timing_csv.writerow([gstep, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                                 0.0, 0.0, amort])
        if dc is not None and e % output_every == 0:
            st = build_state(np.asarray(carry[2]),
                             *[np.asarray(a) for a in carry[6:12]])
            save_frame(e, float(t_edges[e]), np.asarray(carry[0]),
                       np.asarray(carry[1]), st, np.asarray(carry[3]),
                       float(rtots[-1]))

    (T, p, X, verts_f, rec_total) = carry[:5]
    state = build_state(np.asarray(X), *[np.asarray(a)
                                         for a in carry[6:12]]) \
        if nsteps else state0

    for key in ("probes", "mass", "boundary", "newton", "pressure",
                "meshdiag", "masseq", "timing"):
        csvs[key].close()
    amort = wall / max(1, nsteps)
    with CsvWriter(os.path.join(output_path,
                                cfg.get("timing_summary_csv",
                                        "driver_timing_summary.csv")),
                   ["metric", "seconds"]) as w:
        w.writerow(["setup_time_maxrank", 0.0])
        w.writerow(["run_time_maxrank", wall])
        w.writerow(["sum_step_time_maxrank", wall])
        w.writerow(["sum_bc_time_maxrank", 0.0])
        w.writerow(["sum_newton_time_maxrank", 0.0])
        w.writerow(["sum_newton_residual_eval_time_maxrank", 0.0])
        w.writerow(["sum_newton_jacobian_time_maxrank", 0.0])
        w.writerow(["sum_newton_linear_time_maxrank", 0.0])
        w.writerow(["sum_newton_update_time_maxrank", 0.0])
        w.writerow(["sum_state_advance_time_maxrank", 0.0])
        w.writerow(["sum_output_time_maxrank", 0.0])
        w.writerow(["avg_step_time_maxrank", amort])

    # tracked-sampler contract check (ADVICE r4 #1): the candidate band
    # must have covered the realized motion; if the run receded past it,
    # probe/front samples may have silently gone NaN mid-run — say so.
    if float(rec_total) >= diag_slack:
        print(f"WARNING: total recession {float(rec_total):.4e} m "
              f"reached the tracked-sampler slack band {diag_slack:.4e} "
              f"m; probe/front samples past that depth were NaN.",
              file=sys.stderr)

    recession_metrics = _finalize_case22_outputs(cfg, output_path,
                                                 amaryllis_mass_file,
                                                 recession_history)
    print(f"scan_stepping: {nsteps} steps in {wall:.2f}s "
          f"({amort * 1e3:.1f} ms/step; one fused XLA program per "
          f"{output_every}-step output frame)")
    return {"T": np.asarray(T), "p": np.asarray(p), "state": state,
            "fes": fes, "mesh": mesh,
            "recession_total": float(rec_total),
            "vertices": np.asarray(verts_f), "time": float(t_edges[-1]),
            "handler": None, "recession_history": recession_history,
            "recession_metrics": recession_metrics,
            "newton_stall_stats": stall_stats.summary()}


def main(argv=None):
    setup_cpu_if_requested()
    args = parse_args("Input/input_ablation_case2_2.yaml", argv)
    cfg = load_yaml(args.input)
    echo_config({k: v for k, v in cfg.items() if not k.startswith("_")})
    run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())

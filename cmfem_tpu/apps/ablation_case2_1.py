"""Ablation test case 2.1: surface-energy-balance top BC + restart.

Mirrors /root/reference/myapps/convection_diffusion/ablation_test_case2_1_2D.cpp:
case 1 plus the SEB boundary integrator (B' thermochemistry, blowing
correction, chemistry/cooling branches, pato_compat cooling_exact mode),
area-averaged boundary diagnostics CSV, B' clamp statistics CSV, and
binary restart checkpoint/resume (magic+version+world-size header, T/p dof
vectors, full per-QP reaction state; save/load :2666-2779).  Checkpoints
here are .npz with the same logical payload.

The reference's B' table is an author-local PATO file; when the configured
path is missing a clearly-labeled synthetic table with the right shape is
substituted so the driver stays runnable (validation against Amaryllis
requires the real deck either way).

``scan_stepping: true`` runs the whole transient as fused lax.scan chunks
(one XLA program per output/restart frame, ``run_scan``); restart write
triggers are honored by aligning chunk boundaries with the trigger steps.
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .common import (
    check_linear_result, linear_usable, load_newton_config, scan_newton,
    replay_newton_history,
    parse_args, setup_cpu_if_requested, load_mesh_from_cfg, echo_config,
    ensure_outdir, make_block_linear_solver, run_tp_newton_loop, num_steps,
    maybe_enable_lattice_residual, maybe_reorder_strip_mesh,
    NewtonStallStats,
)
from ..utils.yamlcfg import load_yaml, resolve_path
from ..io import CsvWriter, VTUCollection

RESTART_MAGIC = 0x41424C32525A5441
RESTART_VERSION = 1
RESTART_TIME_TOL = 1e-12


def save_restart(path, step, time, T, p, extent, world_size=1,
                 elem_order="file"):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, magic=np.uint64(RESTART_MAGIC),
             version=np.uint32(RESTART_VERSION),
             world_size=np.int32(world_size),
             elem_order=np.str_(elem_order),
             step=np.int64(step), time=np.float64(time),
             T=np.asarray(T), p=np.asarray(p), extent=np.asarray(extent))


def load_restart(path, n, ne, nq, nr, world_size=1, elem_order="file"):
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as d:
        if int(d["magic"]) != RESTART_MAGIC:
            raise ValueError(f"Invalid restart checkpoint magic in: {path}")
        if int(d["version"]) != RESTART_VERSION:
            raise ValueError(f"Unsupported restart checkpoint version in: {path}")
        if int(d["world_size"]) != world_size:
            raise ValueError(
                f"Restart checkpoint world size mismatch for {path} "
                f"(file={int(d['world_size'])}, run={world_size}).")
        # lattice_residual renumbers mesh elements (and, at order >= 2,
        # interior dofs), so state written under one ordering cannot be
        # resumed under the other (pre-tag checkpoints default to "file")
        file_order = str(d["elem_order"]) if "elem_order" in d else "file"
        if file_order != elem_order:
            raise ValueError(
                f"Restart element-order mismatch for {path}: checkpoint "
                f"was written with elem_order={file_order!r} but this run "
                f"uses {elem_order!r} (toggle 'lattice_residual' to match).")
        T = d["T"]; p = d["p"]; X = d["extent"]
        if len(T) != n or len(p) != n:
            raise ValueError(f"Restart true-dof size mismatch in: {path}")
        if X.shape != (ne, nq, nr):
            raise ValueError(f"Restart reaction-state shape mismatch in: {path}")
        return int(d["step"]), float(d["time"]), T, p, X


_BOUNDARY_DIAG_KEYS = (
    "m_dot_g_surf", "BprimeG_surf", "BprimeC_surf", "h_w_surf",
    "emissivity_surf", "absorptivity_surf", "reflectivity_surf",
    "blowing_correction_surf", "q_conv_surf", "q_adv_pyro_surf",
    "q_rad_emit_surf", "q_rad_abs_surf", "q_surf")


def _make_case21_csvs(cfg, output_path, probe_y):
    """The case-2.1 CSV streams (reference column schemas), shared by the
    eager loop and the scan path's post-chunk replay."""
    return {
        "probes": CsvWriter(
            os.path.join(output_path,
                         cfg.get("probes_csv", "temperature_probes.csv")),
            ["time", "wall"] + [f"TC{i}" for i in range(1, len(probe_y))]),
        "mass": CsvWriter(
            os.path.join(output_path, cfg.get("mass_csv", "mass_metrics.csv")),
            ["time", "m_dot_g_surf", "m_dot_c", "front_98_virgin",
             "front_2_char", "recession"]),
        "boundary": CsvWriter(
            os.path.join(output_path,
                         cfg.get("boundary_csv", "boundary_diagnostics.csv")),
            ["time"] + list(_BOUNDARY_DIAG_KEYS)),
        "newton": CsvWriter(
            os.path.join(output_path,
                         cfg.get("newton_csv",
                                 "newton_history_ablation_case2_1_2D.csv")),
            ["step", "time", "iter", "residual", "residual0", "rel_residual",
             "update_norm", "update0", "rel_update", "converged"]),
        "timing": CsvWriter(
            os.path.join(output_path,
                         cfg.get("timing_step_csv",
                                 "driver_timing_per_step.csv")),
            ["step", "bc_sec", "newton_sec", "newton_residual_eval_sec",
             "newton_jacobian_sec", "newton_linear_sec", "newton_update_sec",
             "state_advance_sec", "output_sec", "step_total_sec"]),
    }


def _write_case21_step_outputs(csvs, dc, sys_, fes, mesh, schedule, model,
                               bprime, probe_x, probe_y, probe_pts, xmid,
                               lo, hi, stepno, tnow, T, p, state,
                               use_dirichlet, output_every, nr):
    """One output step: probes / mass / boundary rows (+ a VTU frame every
    output_every steps).  Returns the boundary-diagnostics dict."""
    from ..core.pointlocate import sample_h1, front_depth
    from ..physics.seb import classify_branch

    bc = schedule.eval(tnow)
    branch = classify_branch(bc, model)
    pts_all = np.vstack([np.array([[probe_x, probe_y[0]]]), probe_pts])
    vals = sample_h1(fes, np.asarray(T), pts_all)
    bdiag = sys_.top_boundary_diagnostics(
        T, p, state, bc, branch, model, bprime,
        compute_surface_terms=not use_dirichlet)
    f98 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.98)
    f2 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.02)
    csvs["probes"].writerow([tnow] + [float(v) for v in vals])
    csvs["mass"].writerow([tnow, bdiag["m_dot_g_surf"], 0.0, f98, f2, 0.0])
    csvs["boundary"].writerow([tnow] + [bdiag[k] for k in
                                        _BOUNDARY_DIAG_KEYS])
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
        dc.save(stepno, tnow, fields)
    return bdiag


def _write_case21_final_csvs(cfg, output_path, bprime):
    """Acceptance-tolerance echo + B' clamp statistics (reference:
    ablation_test_case2_1_2D.cpp:3564-3569)."""
    acc = cfg.get("acceptance", {})
    with CsvWriter(os.path.join(output_path,
                                "amaryllis_error_tolerances.csv"),
                   ["signal", "tolerance"]) as w:
        for key, default in (
                ("temperature_rmse_max", 250.0),
                ("temperature_max_abs_max", 500.0),
                ("m_dot_g_rmse_max", 0.02), ("m_dot_g_max_abs_max", 0.06),
                ("m_dot_g_peak_rel_error_max", 0.5),
                ("m_dot_g_peak_time_error_max", 10.0),
                ("front98_max_abs_max", 0.01), ("front98_rmse_max", 0.01),
                ("front2_max_abs_max", 0.01), ("front2_rmse_max", 0.01),
                ("m_dot_c_max_abs_max", 1.0e-8),
                ("recession_max_abs_max", 1.0e-8)):
            w.writerow([key, float(acc.get(key, default))])
    with CsvWriter(os.path.join(output_path, "bprime_clamp_stats.csv"),
                   ["axis", "clamp_count"]) as w:
        w.writerow(["pressure", bprime.clamp_stats.p])
        w.writerow(["BprimeG", bprime.clamp_stats.bg])
        w.writerow(["temperature", bprime.clamp_stats.t])


def run(cfg: dict) -> dict:
    _t_run0 = _time.perf_counter()
    if cfg.get("scan_stepping", False):
        return run_scan(cfg)
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import SpaceOps
    from ..physics.tacot import TacotMaterial
    from ..physics.bprime import BPrimeTable
    from ..physics.surface_bc import SurfaceBCSchedule, TopTemperatureSchedule
    from ..physics.seb import SurfaceFluxModel, classify_branch
    from ..physics.ablation import AblationSystem, AblationState
    from .ablation_case1 import evaluate_schedule  # noqa: F401 (shared pattern)

    material_file = resolve_path(cfg, cfg.get(
        "material_file", "Input/material_tacot_case2_1.yaml"))
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
    output_path = cfg.get("output_path", "ParaView/ablation_case2_1")
    collection_name = cfg.get("collection_name", "ablation_test_case2_1_2D")
    save_paraview = bool(cfg.get("save_paraview", True))
    bdr_top = int(cfg.get("bdr_attr_top", 1))
    gravity = (float(cfg.get("gravity_x", 0.0)), float(cfg.get("gravity_y", 0.0)))
    probe_x = float(cfg.get("probe_x", 0.005))
    probe_y = [float(v) for v in cfg.get(
        "probe_y", [0.05, 0.049, 0.048, 0.046, 0.042, 0.038, 0.034, 0.026, 0.01])]

    top_thermal_bc = str(cfg.get("top_thermal_bc", "surface_energy_balance")).lower()
    if top_thermal_bc == "seb":
        top_thermal_bc = "surface_energy_balance"
    if top_thermal_bc in ("temp_dirichlet", "temperature"):
        top_thermal_bc = "temperature_dirichlet"
    use_dirichlet = top_thermal_bc == "temperature_dirichlet"

    model = SurfaceFluxModel(
        lam=float(cfg.get("lambda", 0.5)),
        q_rad=float(cfg.get("q_rad", 0.0)),
        T_background=float(cfg.get("T_background", 300.0)),
        T_edge=float(cfg.get("T_edge", 300.0)),
        hconv=float(cfg.get("hconv", 0.0)),
        emissivity_override=float(cfg.get("emissivity", float("nan"))),
        absorptivity_override=float(cfg.get("absorptivity", float("nan"))),
        stefan_boltzmann=float(cfg.get("stefan_boltzmann", 5.670374419e-8)),
        strict_case2_1=bool(cfg.get("strict_case2_1", True)),
        # YAML 1.1 parses a bare `off` as boolean False
        pato_compat_mode=("off" if cfg.get("pato_compat_mode", "off") is False
                          else str(cfg.get("pato_compat_mode", "off")).lower()),
    )
    if model.pato_compat_mode not in ("off", "cooling_exact"):
        raise ValueError('pato_compat_mode must be either "off" or "cooling_exact".')

    mat = TacotMaterial.load_yaml(material_file)

    bprime_cfg = cfg.get("bprime_table_file", "")
    bprime_path = resolve_path(cfg, bprime_cfg) if bprime_cfg else ""
    if bprime_path and os.path.isfile(bprime_path):
        bprime = BPrimeTable.load_file(bprime_path)
    else:
        print(f"B' table not found ({bprime_path!r}); using synthetic "
              f"TACOT-shaped table (NOT validation data).")
        bprime = BPrimeTable.synthetic_tacot()

    bc_file = resolve_path(cfg, cfg.get("boundary_conditions_file",
                                        "Input/boundary_conditions_ablation_case2_1.dat"))
    schedule = SurfaceBCSchedule.load_file(bc_file)
    top_T_value = float(cfg.get("top_temperature_value", 300.0))
    top_T_file = cfg.get("top_temperature_file", "")
    top_T_sched = None
    if use_dirichlet and top_T_file:
        top_T_sched = TopTemperatureSchedule.load_file(resolve_path(cfg, top_T_file))

    def top_temperature_at(t):
        return top_T_sched.eval(t) if top_T_sched else top_T_value

    mesh = maybe_reorder_strip_mesh(cfg, load_mesh_from_cfg(cfg))
    lo, hi = mesh.bounding_box()
    xmid = 0.5 * (lo[0] + hi[0])
    fes = FESpace(mesh, order)
    n = fes.nscalar
    print(f"Global true dofs (T): {n}\nGlobal true dofs (p): {n}\n"
          f"Global true dofs (T+p): {2 * n}")

    quad_order = max(2, 2 * order + 2)
    ops = SpaceOps(fes, quad_order=quad_order)
    sys_ = AblationSystem(ops, mat, gravity=gravity, top_attr=bdr_top)
    maybe_enable_lattice_residual(cfg, sys_, fes)
    ne, nq = sys_.ne, sys_.nq
    nr = mat.num_reactions
    state = AblationState.initial(ne, nq, mat)

    ess = np.asarray(fes.boundary_dofs([bdr_top]))
    ess_T = ess if use_dirichlet else np.zeros(0, dtype=ess.dtype)
    ess2 = np.concatenate([ess_T, ess + n])
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess2] = True
    mask2_j = jnp.asarray(mask2)

    ed = np.asarray(fes.element_dofs, dtype=np.int64)
    nd = ed.shape[1]
    rows_b = np.repeat(ed, nd, axis=1).reshape(-1)
    cols_b = np.tile(ed, (1, nd)).reshape(-1)
    rows_all = np.concatenate([rows_b, rows_b, rows_b + n, rows_b + n])
    cols_all = np.concatenate([cols_b, cols_b + n, cols_b, cols_b + n])
    # face blocks (T rows only)
    fed = np.asarray(sys_.trace.eldofs, dtype=np.int64)
    frows = np.repeat(fed, nd, axis=1).reshape(-1)
    fcols = np.tile(fed, (1, nd)).reshape(-1)
    frows_all = np.concatenate([frows, frows])
    fcols_all = np.concatenate([fcols, fcols + n])

    bc0 = schedule.eval(0.0)
    T = jnp.full(n, 300.0)
    p = jnp.full(n, bc0.p_w)
    if use_dirichlet:
        T = T.at[jnp.asarray(ess)].set(top_temperature_at(0.0))
    p = p.at[jnp.asarray(ess)].set(bc0.p_w)

    from functools import partial

    # sharding_devices: N element-shards every Newton step over a device
    # mesh (one ShardedAblationNewton per flux branch — the branch changes
    # the traced program); per-step old-state slabs live in shard_state.
    # dof_partition: N additionally DOF-partitions the (T,p) vectors
    # themselves (owned slabs + ghost halos; SEB faces ride the device
    # owning their adjacent element) so device memory scales ~1/N; the
    # host keeps one global copy for BCs/CSV/VTU, like rank-0 I/O.
    shard_n = int(cfg.get("sharding_devices", 0))
    dofp_n = int(cfg.get("dof_partition", 0))
    if shard_n and dofp_n:
        raise ValueError(
            "sharding_devices and dof_partition are mutually exclusive")
    sh_cache = {}
    shard_state = {}
    lin_rtol_sh = float(cfg.get("linear_rtol", 1.0e-10))

    def _get_sh(branch):
        key = "dirichlet" if use_dirichlet else branch
        if key not in sh_cache:
            from ..parallel import (DofPartitionedAblationNewton,
                                    ShardedAblationNewton, make_device_mesh)

            seb = None if use_dirichlet else (branch, model, bprime)
            cls, ndev = ((DofPartitionedAblationNewton, dofp_n) if dofp_n
                         else (ShardedAblationNewton, shard_n))
            sh_cache[key] = cls(
                sys_, make_device_mesh(ndev), ess_T, ess,
                restart=int(cfg.get("gmres_restart", 400)),
                maxiter=int(cfg.get("gmres_maxiter", 10)), seb=seb)
        return sh_cache[key]

    @partial(jax.jit, static_argnames=("branch",))
    def residual_single(T, p, T_old_q, p_old_q, X_old, dt, bc, branch):
        RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X_old, dt)
        if not use_dirichlet:
            RT = RT + sys_.seb_face_residual(T, p, X_old, bc, branch, model,
                                             bprime)
        R = jnp.concatenate([RT, Rp])
        return jnp.where(mask2_j, 0.0, R)

    def residual_fn(T, p, T_old_q, p_old_q, X_old, dt, bc, branch):
        if shard_n:
            return _get_sh(branch).residual(
                T, p, shard_state["To"], shard_state["po"],
                shard_state["Xo"], dt, bc=None if use_dirichlet else bc)
        if dofp_n:
            dn = _get_sh(branch)
            R_d = dn.residual(dn.to_dist2(np.asarray(T), np.asarray(p)),
                              shard_state["To"], shard_state["po"],
                              shard_state["Xo"], dt,
                              bc=None if use_dirichlet else bc)
            RT, Rp = dn.from_dist2(R_d)
            return jnp.asarray(np.concatenate([RT, Rp]))
        return residual_single(T, p, T_old_q, p_old_q, X_old, dt, bc,
                               branch)

    @partial(jax.jit, static_argnames=("branch",))
    def jacobian_fn(T, p, T_old_q, p_old_q, X_old, dt, bc, branch):
        blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, X_old, dt)
        if use_dirichlet:
            return blocks, None
        face = sys_.seb_face_jacobians(T, p, X_old, bc, branch, model, bprime)
        return blocks, face

    iter_factory = make_block_linear_solver(cfg, fes.element_dofs, n,
                                            ess_T, ess,
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

    def factorize(T, p, T_old_q, p_old_q, X_old, dt, bc, branch):
        if shard_n:
            sh = _get_sh(branch)
            return _ShardedPrepared(sh, sh.prepare(
                T, p, shard_state["To"], shard_state["po"],
                shard_state["Xo"], dt,
                bc=None if use_dirichlet else bc))
        if dofp_n:
            dn = _get_sh(branch)
            return _DofPartPrepared(dn, dn.prepare(
                dn.to_dist2(np.asarray(T), np.asarray(p)),
                shard_state["To"], shard_state["po"],
                shard_state["Xo"], dt,
                bc=None if use_dirichlet else bc))
        (JTT, JTp, JpT, Jpp), face = jacobian_fn(
            T, p, T_old_q, p_old_q, X_old, dt, bc, branch)
        if iter_factory is not None:
            return iter_factory((JTT, JTp, JpT, Jpp), face=face,
                                face_elem=sys_.trace.elem)
        vals = [np.asarray(b).reshape(-1) for b in (JTT, JTp, JpT, Jpp)]
        r_idx, c_idx = rows_all, cols_all
        if not use_dirichlet:
            FJT, FJp = face
            # face residual enters R_T with a minus handled inside
            vals += [np.asarray(FJT).reshape(-1), np.asarray(FJp).reshape(-1)]
            r_idx = np.concatenate([rows_all, frows_all])
            c_idx = np.concatenate([cols_all, fcols_all])
        J = sp.coo_matrix((np.concatenate(vals), (r_idx, c_idx)),
                          shape=(2 * n, 2 * n)).tocsr()
        keep = ~mask2
        d = sp.diags(keep.astype(np.float64))
        J = d @ J @ d + sp.diags(mask2.astype(np.float64))
        return spla.splu(J.tocsc())

    ensure_outdir(output_path)
    csvs = _make_case21_csvs(cfg, output_path, probe_y)
    newton_csv, timing_csv = csvs["newton"], csvs["timing"]

    dc = VTUCollection(collection_name, fes, prefix_path=output_path) \
        if save_paraview else None
    probe_pts = np.array([[probe_x, y] for y in probe_y[1:]])

    restart_read = cfg.get("restart_read_file", "")
    restart_write = cfg.get("restart_write_file", "")
    restart_write_every = int(cfg.get("restart_write_every", 0))
    restart_write_at = cfg.get("restart_write_at_time", None)
    restart_write_at = float(restart_write_at) if restart_write_at is not None \
        else float("nan")
    # the reference always rewrites the checkpoint at run end
    # (ablation_test_case2_1_2D.cpp:3531-3540), clobbering any at-time
    # snapshot at the same path; disable to keep a mid-run checkpoint
    restart_write_at_end = bool(cfg.get("restart_write_at_end", True))

    step = 0
    t = 0.0
    if restart_read:
        step, t, T_np, p_np, X_np = load_restart(
            resolve_path(cfg, restart_read), n, ne, nq, nr,
            elem_order=cfg.get("_elem_order", "file"))
        T = jnp.asarray(T_np)
        p = jnp.asarray(p_np)
        state = AblationState.initial(ne, nq, mat)
        state = AblationState(extent=jnp.asarray(X_np),
                              tau_elem=state.tau_elem, rho_elem=state.rho_elem,
                              pi_elem=state.pi_elem, mdot_elem=state.mdot_elem,
                              extent_elem=state.extent_elem,
                              degree_char_elem=state.degree_char_elem,
                              char_density_fraction_elem=state.char_density_fraction_elem)
        state = sys_.advance_state(state, T, p, 0.0)
        print(f"Loaded restart from {restart_read} at step {step}, time {t} s.")

    def write_outputs(stepno, tnow):
        return _write_case21_step_outputs(
            csvs, dc, sys_, fes, mesh, schedule, model, bprime, probe_x,
            probe_y, probe_pts, xmid, lo, hi, stepno, tnow, T, p, state,
            use_dirichlet, output_every, nr)

    write_outputs(step, t)
    jc_checked_branches = set()
    totals = {k: 0.0 for k in ("bc", "newton", "nres", "njac", "nlin", "nupd",
                               "state", "output", "step")}
    steps_executed = 0
    setup_sec = _time.perf_counter() - _t_run0
    restart_at_done = (not np.isfinite(restart_write_at)) or \
        (t >= restart_write_at - RESTART_TIME_TOL)

    while t < t_final - RESTART_TIME_TOL:
        step += 1
        steps_executed += 1
        step_t0 = _time.perf_counter()
        t_prev = t
        t_next = min(t_final, t + dt_cfg)
        dt_step = t_next - t
        t = t_next

        T_old_q = ops.values_at_qp(T)
        p_old_q = ops.values_at_qp(p)
        X_old = state.extent

        bc_t0 = _time.perf_counter()
        bc = schedule.eval(t)
        branch = classify_branch(bc, model)
        if shard_n:
            sh0 = _get_sh(branch)
            shard_state["To"] = sh0.pad_elem(T_old_q)
            shard_state["po"] = sh0.pad_elem(p_old_q)
            shard_state["Xo"] = sh0.pad_elem(X_old)
        elif dofp_n:
            dn0 = _get_sh(branch)
            shard_state["To"] = dn0.pack_elem(np.asarray(T_old_q))
            shard_state["po"] = dn0.pack_elem(np.asarray(p_old_q))
            shard_state["Xo"] = dn0.pack_elem(np.asarray(X_old))
        if use_dirichlet:
            T = T.at[jnp.asarray(ess)].set(top_temperature_at(t))
        p = p.at[jnp.asarray(ess)].set(bc.p_w)
        bc_sec = _time.perf_counter() - bc_t0

        if jacobian_check and step == 1:
            rel = sys_.jacobian_check(T, p, T_old_q, p_old_q, X_old, dt_step,
                                      abs_tol=jc_abs, rel_tol=jc_rel)
            print(f"jacobian_check (domain blocks) passed "
                  f"(max rel err {rel:.3e})")
        if jacobian_check and not use_dirichlet \
                and branch not in jc_checked_branches:
            # once per surface-flux branch, skipping non-smooth states
            # (ablation_test_case2_1_2D.cpp:1809-1832)
            jc_checked_branches.add(branch)
            rel = sys_.jacobian_check(T, p, T_old_q, p_old_q, X_old, dt_step,
                                      abs_tol=jc_abs, rel_tol=jc_rel,
                                      seb=(branch, model, bprime), bc=bc)
            if rel is None:
                print(f"jacobian_check (domain+face, branch={branch}) "
                      f"skipped: non-smooth state (B' table clamp active)")
            else:
                print(f"jacobian_check (domain+face, branch={branch}) "
                      f"passed (max rel err {rel:.3e})")

        newton_t0 = _time.perf_counter()

        def _enforce_bc(T, p):
            if use_dirichlet:
                T = T.at[jnp.asarray(ess)].set(top_temperature_at(t))
            return T, p.at[jnp.asarray(ess)].set(bc.p_w)

        T, p, iters, ntim = run_tp_newton_loop(
            T, p,
            residual=lambda T, p: residual_fn(T, p, T_old_q, p_old_q,
                                              X_old, dt_step, bc, branch),
            factorize=lambda T, p: factorize(T, p, T_old_q, p_old_q,
                                             X_old, dt_step, bc, branch),
            enforce_bc=_enforce_bc, newton_cfg=newton_cfg,
            rebuild_freq=jacobian_rebuild_freq, newton_csv=newton_csv,
            step=step, t=t, n=n, print_level=newton_print_level)
        nres, njac, nlin, nupd = (ntim["nres"], ntim["njac"], ntim["nlin"],
                                  ntim["nupd"])
        newton_sec = _time.perf_counter() - newton_t0

        st_t0 = _time.perf_counter()
        state = sys_.advance_state(state, T, p, dt_step)
        state_sec = _time.perf_counter() - st_t0

        out_t0 = _time.perf_counter()
        write_outputs(step, t)
        if restart_write:
            write_now = restart_write_every > 0 and step % restart_write_every == 0
            if (not restart_at_done and np.isfinite(restart_write_at)
                    and t_prev < restart_write_at - RESTART_TIME_TOL
                    and t >= restart_write_at - RESTART_TIME_TOL):
                write_now = True
                restart_at_done = True
            if write_now:
                save_restart(restart_write, step, t, T, p, state.extent,
                     elem_order=cfg.get("_elem_order", "file"))
        out_sec = _time.perf_counter() - out_t0
        step_sec = _time.perf_counter() - step_t0
        timing_csv.writerow([step, bc_sec, newton_sec, nres, njac, nlin,
                             nupd, state_sec, out_sec, step_sec])
        for k, v in zip(("bc", "newton", "nres", "njac", "nlin", "nupd",
                         "state", "output", "step"),
                        (bc_sec, newton_sec, nres, njac, nlin, nupd,
                         state_sec, out_sec, step_sec)):
            totals[k] += v
        if step <= 5 or step % 50 == 0:
            print(f"step={step} t={t:g} [{branch}] newton_iters={iters} "
                  f"Tmax={float(jnp.max(T)):.1f}")

    if restart_write and restart_write_at_end:
        save_restart(restart_write, step, t, T, p, state.extent,
                     elem_order=cfg.get("_elem_order", "file"))

    _write_case21_final_csvs(cfg, output_path, bprime)
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

    for key in ("probes", "mass", "boundary", "newton", "timing"):
        csvs[key].close()
    return {"T": np.asarray(T), "p": np.asarray(p), "state": state,
            "fes": fes, "mesh": mesh, "step": step, "time": t,
            "bprime": bprime}


def run_scan(cfg: dict) -> dict:
    """Whole-run device-resident stepping (``scan_stepping: true``): the
    SEB (or Dirichlet-top) coupled (T,p) Newton solve, reaction-state
    advance, and schedule interpolation fused into ONE XLA program per
    output frame via ``lax.scan`` — the static-mesh analog of the
    case-2.2 scan path (geometric factors are baked in at trace time, and
    the block GMRES uses the gather-free lattice stencil matvec on the
    reference's strip meshes).

    Restart semantics survive the fusion: write triggers (every-N /
    at-time / at-end, ablation_test_case2_1_2D.cpp:3449-3477) are honored
    by aligning scan chunk boundaries with the trigger steps, and
    ``restart_read_file`` seeds the initial carry."""
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import SpaceOps
    from ..physics.tacot import TacotMaterial
    from ..physics.bprime import BPrimeTable
    from ..physics.surface_bc import (SurfaceBCSchedule, BoundaryState,
                                      TopTemperatureSchedule)
    from ..physics.seb import SurfaceFluxModel, classify_branch
    from ..physics.ablation import AblationSystem, AblationState



    if int(cfg.get("order", 1)) != 1:
        raise NotImplementedError("scan_stepping requires order 1")
    if int(cfg.get("sharding_devices", 0)) or int(cfg.get("dof_partition", 0)):
        raise NotImplementedError(
            "scan_stepping is mutually exclusive with sharding_devices / "
            "dof_partition")
    if bool(cfg.get("jacobian_check", False)):
        raise NotImplementedError(
            "jacobian_check is host-side; use the eager path")

    material_file = resolve_path(cfg, cfg.get(
        "material_file", "Input/material_tacot_case2_1.yaml"))
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
    output_path = cfg.get("output_path", "ParaView/ablation_case2_1")
    collection_name = cfg.get("collection_name", "ablation_test_case2_1_2D")
    save_paraview = bool(cfg.get("save_paraview", True))
    bdr_top = int(cfg.get("bdr_attr_top", 1))
    gravity = (float(cfg.get("gravity_x", 0.0)),
               float(cfg.get("gravity_y", 0.0)))
    probe_x = float(cfg.get("probe_x", 0.005))
    probe_y = [float(v) for v in cfg.get(
        "probe_y", [0.05, 0.049, 0.048, 0.046, 0.042, 0.038, 0.034, 0.026,
                    0.01])]

    top_thermal_bc = str(cfg.get("top_thermal_bc",
                                 "surface_energy_balance")).lower()
    if top_thermal_bc == "seb":
        top_thermal_bc = "surface_energy_balance"
    if top_thermal_bc in ("temp_dirichlet", "temperature"):
        top_thermal_bc = "temperature_dirichlet"
    use_dirichlet = top_thermal_bc == "temperature_dirichlet"

    model = SurfaceFluxModel(
        lam=float(cfg.get("lambda", 0.5)),
        q_rad=float(cfg.get("q_rad", 0.0)),
        T_background=float(cfg.get("T_background", 300.0)),
        T_edge=float(cfg.get("T_edge", 300.0)),
        hconv=float(cfg.get("hconv", 0.0)),
        emissivity_override=float(cfg.get("emissivity", float("nan"))),
        absorptivity_override=float(cfg.get("absorptivity", float("nan"))),
        stefan_boltzmann=float(cfg.get("stefan_boltzmann", 5.670374419e-8)),
        strict_case2_1=bool(cfg.get("strict_case2_1", True)),
        pato_compat_mode=("off" if cfg.get("pato_compat_mode", "off") is False
                          else str(cfg.get("pato_compat_mode", "off")).lower()),
    )
    if model.pato_compat_mode not in ("off", "cooling_exact"):
        raise ValueError(
            'pato_compat_mode must be either "off" or "cooling_exact".')
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
        "Input/boundary_conditions_ablation_case2_1.dat")))
    top_T_value = float(cfg.get("top_temperature_value", 300.0))
    top_T_file = cfg.get("top_temperature_file", "")
    top_T_sched = None
    if use_dirichlet and top_T_file:
        top_T_sched = TopTemperatureSchedule.load_file(
            resolve_path(cfg, top_T_file))

    mesh = maybe_reorder_strip_mesh(cfg, load_mesh_from_cfg(cfg))
    lo, hi = mesh.bounding_box()
    xmid = 0.5 * (lo[0] + hi[0])
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    print(f"Global true dofs (T+p): {2 * n}")
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, gravity=gravity, top_attr=bdr_top)
    maybe_enable_lattice_residual(cfg, sys_, fes)
    ne, nq = sys_.ne, sys_.nq
    nr = mat.num_reactions
    state0 = AblationState.initial(ne, nq, mat)

    ess = np.asarray(fes.boundary_dofs([bdr_top]))
    ess_T = ess if use_dirichlet else np.zeros(0, dtype=ess.dtype)
    essj = jnp.asarray(ess)
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess_T] = True
    mask2[ess + n] = True
    mask2_j = jnp.asarray(mask2)
    from ..solvers.blocksolve import make_scan_block_solver
    bks = make_scan_block_solver(cfg, fes.element_dofs, n, ess_T, ess,
                                 fes.node_positions)
    face_elem_j = jnp.asarray(np.asarray(sys_.trace.elem, dtype=np.int64))

    # -- restart plumbing --------------------------------------------------
    restart_read = cfg.get("restart_read_file", "")
    restart_write = cfg.get("restart_write_file", "")
    restart_write_every = int(cfg.get("restart_write_every", 0))
    rw_at = cfg.get("restart_write_at_time", None)
    rw_at = float(rw_at) if rw_at is not None else float("nan")
    restart_write_at_end = bool(cfg.get("restart_write_at_end", True))

    step0 = 0
    t0 = 0.0
    bc0 = schedule.eval(0.0)
    T0 = jnp.full(n, 300.0)
    if use_dirichlet:
        T0 = T0.at[essj].set(top_T_sched.eval(0.0) if top_T_sched
                             else top_T_value)
    p0 = jnp.full(n, bc0.p_w)
    X0 = jnp.asarray(state0.extent)
    state_init = state0
    if restart_read:
        step0, t0, T_np, p_np, X_np = load_restart(
            resolve_path(cfg, restart_read), n, ne, nq, nr,
            elem_order=cfg.get("_elem_order", "file"))
        T0 = jnp.asarray(T_np)
        p0 = jnp.asarray(p_np)
        X0 = jnp.asarray(X_np)
        st = AblationState.initial(ne, nq, mat)
        state_init = AblationState(
            extent=X0, tau_elem=st.tau_elem, rho_elem=st.rho_elem,
            pi_elem=st.pi_elem, mdot_elem=st.mdot_elem,
            extent_elem=st.extent_elem, degree_char_elem=st.degree_char_elem,
            char_density_fraction_elem=st.char_density_fraction_elem)
        state_init = sys_.advance_state(state_init, T0, p0, 0.0)
        print(f"Loaded restart from {restart_read} at step {step0}, "
              f"time {t0} s.")

    nsteps = num_steps(t_final - t0, dt_cfg)
    t_edges = np.minimum(t_final, t0 + dt_cfg * np.arange(nsteps + 1))
    print(f"Time steps: {nsteps}, nominal final time: {t_edges[-1]}")

    # surface-flux branch + chemistry toggle are STATIC in each traced
    # program; the run is segmented wherever the per-step (branch, chem)
    # label changes (e.g. the production schedules' chemistryOn 1->0 flip
    # at t=60.1 s, Input/boundary_conditions_ablation_case2_1.dat:5 /
    # surface_bc_schedule.cpp:94-169) and one compiled scan instance per
    # label is cached, mirroring the reference's per-state branch
    # classification (ablation_test_case2_1_2D.cpp:532-555)
    bcs = [schedule.eval(float(tv)) for tv in t_edges[1:]] or \
        [schedule.eval(0.0)]
    if use_dirichlet:
        # the chemistry flag and flux branch never reach the device
        # program (bc only contributes p_w)
        step_labels = [("dirichlet", 0)] * max(1, nsteps)
    else:
        step_labels = [(classify_branch(b, model), b.chemistryOn)
                       for b in bcs]
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

    if top_T_sched is not None:
        topT_t = jnp.asarray(top_T_sched.times)
        topT_v = jnp.asarray(top_T_sched.values)

        def top_T_at(t):
            return jnp.interp(t, topT_t, topT_v)
    else:
        def top_T_at(t):
            return jnp.asarray(top_T_value)

    def make_step_fn(branch, chem_static):
      bc_at = make_bc_at(chem_static)

      def step_fn(carry, inp):
        T, p, X = carry
        t, dt = inp
        bc = bc_at(t)
        T_old_q = ops.values_at_qp(T)
        p_old_q = ops.values_at_qp(p)
        if use_dirichlet:
            T = T.at[essj].set(top_T_at(t))
        p = p.at[essj].set(bc.p_w)

        def residual(T, p):
            RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X, dt)
            if not use_dirichlet:
                RT = RT + sys_.seb_face_residual(T, p, X, bc, branch,
                                                 model, bprime)
            return jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp]))

        def solve(T, p, R):
            blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, X, dt)
            if use_dirichlet:
                fac = bks._prepare_impl(*blocks)
            else:
                face = sys_.seb_face_jacobians(T, p, X, bc, branch,
                                               model, bprime)
                fac = bks._prepare_face(*blocks, *face, face_elem_j)
            sol = bks._solve(*fac, -R, jnp.asarray(lin_rtol),
                             jnp.asarray(0.0))
            dx = sol.x
            Tn = T + dx[:n]
            if use_dirichlet:
                Tn = Tn.at[essj].set(top_T_at(t))
            pn = (p + dx[n:]).at[essj].set(bc.p_w)
            return Tn, pn, jnp.linalg.norm(dx), linear_usable(sol)

        (T, p, it, r0, rn, done, res_h, upd_h, lin_ok,
            nw_stalled) = scan_newton(
            T, p, residual=residual, solve=solve, abs_tol=abs_tol,
            rel_tol=rel_tol, max_iter=max_iter, **stall_kw)

        (X, tau_e, rho_e, pi_e, mdot_e, extent_e,
         pi_qp) = sys_.advance_state_arrays(X, T, p, dt)
        carry = (T, p, X)
        out = (T, p, X, tau_e, rho_e, pi_e, mdot_e, extent_e, pi_qp,
               it, r0, rn, done, res_h, upd_h, lin_ok, nw_stalled)
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

    # ---- outputs ---------------------------------------------------------
    ensure_outdir(output_path)
    csvs = _make_case21_csvs(cfg, output_path, probe_y)
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

    _write_case21_step_outputs(csvs, dc, sys_, fes, mesh, schedule, model,
                               bprime, probe_x, probe_y, probe_pts, xmid,
                               lo, hi, step0, float(t0), T0, p0, state_init,
                               use_dirichlet, output_every, nr)

    # ---- chunk-batched output machinery (static mesh) ------------------
    # The per-step host writer costs a point-location sweep, two
    # front_depth sweeps, and one tunneled device call PER STEP
    # (measured ~0.45 s/step on the production deck — more than the
    # device step itself).  The mesh never moves here, so probe sampling
    # and the front line are precomputed stencils, and the boundary
    # diagnostics run as ONE batched (vmapped) device call per chunk.
    from ..core.pointlocate import (front_depth_static, front_line_stencil,
                                    h1_sampling_stencil)

    pts_all_s = np.vstack([np.array([[probe_x, probe_y[0]]]), probe_pts])
    pdofs_all, pw_all = h1_sampling_stencil(fes, pts_all_s)
    fl_ids, fl_ys = front_line_stencil(mesh, xmid, hi[1], lo[1])
    trace_elem_np = np.asarray(sys_.trace.elem)
    _SURF_KEYS = type(sys_)._SURF_KEYS
    _diag_batch_cache = {}

    def diag_batch_for(label):
        branch_l, chem_l = label
        if label not in _diag_batch_cache:
            def one(T, p, Xrep, pw, rUCH, hr, hc, Te):
                bcc = BoundaryState(
                    p_w=pw, rhoeUeCH=rUCH, h_r=hr,
                    hconv=hc if schedule.has_hconv else 0.0,
                    Tedge=Te if schedule.has_hconv else 300.0,
                    has_hconv=schedule.has_hconv,
                    has_Tedge=schedule.has_hconv, chemistryOn=chem_l)
                vals = sys_.top_boundary_terms(T, p, Xrep, bcc, branch_l,
                                               model, bprime)
                return (jnp.stack([vals["m_dot_g_surf"]]
                                  + [vals[k] for k in _SURF_KEYS]),
                        jnp.stack([vals["clamps_p"], vals["clamps_bg"],
                                   vals["clamps_t"]]))
            _diag_batch_cache[label] = jax.jit(jax.vmap(one))
        return _diag_batch_cache[label]

    def chunk_diagnostics(label, b, e, Ts, ps, Xs):
        """(diag (S, 15), clamps summed) for steps b+1..e; inputs padded
        to output_every rows so every chunk reuses one compiled batch."""
        S = e - b
        pad = output_every - S

        def padit(a):
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0) \
                if pad > 0 else a

        bcr = bcs[b:e]
        pws = padit(np.array([x.p_w for x in bcr]))
        rs = padit(np.array([x.rhoeUeCH for x in bcr]))
        hrs = padit(np.array([x.h_r for x in bcr]))
        hcs = padit(np.array([x.hconv for x in bcr]))
        tes = padit(np.array([x.Tedge for x in bcr]))
        Xrep = padit(Xs[:, trace_elem_np, 0])
        diagv, clampv = diag_batch_for(label)(
            jnp.asarray(padit(Ts)), jnp.asarray(padit(ps)),
            jnp.asarray(Xrep), jnp.asarray(pws), jnp.asarray(rs),
            jnp.asarray(hrs), jnp.asarray(hcs), jnp.asarray(tes))
        diagv = np.asarray(diagv)[:S]
        if use_dirichlet:
            diagv[:, 1:] = np.nan
        clampv = np.asarray(clampv)[:S]
        if bprime is not None:
            cs = clampv.sum(axis=0)
            bprime.clamp_stats.p += int(cs[0])
            bprime.clamp_stats.bg += int(cs[1])
            bprime.clamp_stats.t += int(cs[2])
        return diagv

    # chunk boundaries: output frames ∪ restart write triggers (so a
    # checkpoint lands exactly at its trigger step, as in the eager loop)
    trig = set()
    if restart_write and restart_write_every > 0:
        trig |= {k for k in range(1, nsteps + 1)
                 if (step0 + k) % restart_write_every == 0}
    if restart_write and np.isfinite(rw_at):
        ks = np.nonzero((t_edges[:-1] < rw_at - RESTART_TIME_TOL)
                        & (t_edges[1:] >= rw_at - RESTART_TIME_TOL))[0]
        if len(ks):
            trig.add(int(ks[0]) + 1)
    bounds = sorted(set(list(range(0, nsteps, output_every)) + [nsteps])
                    | trig | seg_edges)

    carry = (T0, p0, X0)
    state = state_init
    wall = 0.0
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
        (Ts, ps, Xs, tau_es, rho_es, pi_es, mdot_es, extent_es, pi_qps,
         iters, r0s, rns, dones, res_hs, upd_hs, lin_oks, nw_stalls) = \
            [np.asarray(o) for o in outs]
        stall_stats.update(nw_stalls, rns, r0s)
        if nw_stalls.any():
            print(f"WARNING: {int(nw_stalls.sum())}/{e - b} steps "
                  "accepted at the Newton working-precision stall floor "
                  "(not the abs/rel tolerance)", flush=True)
        if not lin_oks.all():
            bad = step0 + b + int(np.nonzero(~lin_oks)[0][0]) + 1
            raise RuntimeError(
                f"block GMRES did not converge at step {bad} "
                f"(raise gmres_restart/gmres_maxiter)")
        if not dones.all():
            k = int(np.nonzero(~dones)[0][0])
            raise RuntimeError(
                f"Newton did not converge at step {step0 + b + k + 1}, "
                f"final residual={rns[k]}")
        amort = wall / e
        diagv = chunk_diagnostics(step_labels[b], b, e, Ts, ps, Xs)
        # probes: precomputed stencil, all steps at once
        pvals = np.einsum("spn,pn->sp", Ts[:, pdofs_all], pw_all)
        for k in range(e - b):
            gstep = step0 + b + k + 1
            tk = float(t_edges[b + k + 1])
            f98 = front_depth_static(fl_ids, fl_ys, tau_es[k], hi[1],
                                     0.98)
            f2 = front_depth_static(fl_ids, fl_ys, tau_es[k], hi[1], 0.02)
            csvs["probes"].writerow([tk] + [float(v) for v in pvals[k]])
            csvs["mass"].writerow([tk, float(diagv[k][0]), 0.0, f98, f2,
                                   0.0])
            # 2.1's boundary CSV omits m_dot_c/rho_s (_BOUNDARY_DIAG_KEYS)
            csvs["boundary"].writerow(
                [tk, float(diagv[k][0])]
                + [float(diagv[k][j]) for j in range(3, 15)])
            replay_newton_history(newton_csv, gstep, tk, int(iters[k]),
                                  float(r0s[k]), res_hs[k], upd_hs[k])
            timing_csv.writerow([gstep, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                                 0.0, 0.0, amort])
            if dc is not None and gstep % output_every == 0:
                state = build_state(Xs[k], tau_es[k], rho_es[k], pi_es[k],
                                    mdot_es[k], extent_es[k], pi_qps[k])
                fields = {
                    "temperature": Ts[k], "pressure": ps[k],
                    "tau": state.tau_elem, "rho_s": state.rho_elem,
                    "pi_total": state.pi_elem, "m_dot_g": state.mdot_elem,
                    "degree_char": state.degree_char_elem,
                    "char_density_fraction":
                        state.char_density_fraction_elem,
                }
                for r in range(nr):
                    fields[f"X{r + 1}"] = state.extent_elem[r]
                dc.save(gstep, tk, fields)
        state = build_state(Xs[-1], tau_es[-1], rho_es[-1], pi_es[-1],
                            mdot_es[-1], extent_es[-1], pi_qps[-1])
        if restart_write and e in trig:
            save_restart(restart_write, step0 + e, float(t_edges[e]),
                         carry[0], carry[1], carry[2],
                         elem_order=cfg.get("_elem_order", "file"))

    T, p, X = carry
    if restart_write and restart_write_at_end:
        save_restart(restart_write, step0 + nsteps, float(t_edges[-1]),
                     T, p, X, elem_order=cfg.get("_elem_order", "file"))

    for key in ("probes", "mass", "boundary", "newton", "timing"):
        csvs[key].close()
    _write_case21_final_csvs(cfg, output_path, bprime)
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

    print(f"scan_stepping: {nsteps} steps in {wall:.2f}s "
          f"({amort * 1e3:.1f} ms/step; one fused XLA program per "
          f"output/restart frame)")
    return {"T": np.asarray(T), "p": np.asarray(p), "state": state,
            "fes": fes, "mesh": mesh, "step": step0 + nsteps,
            "time": float(t_edges[-1]), "bprime": bprime,
            "newton_stall_stats": stall_stats.summary()}


def main(argv=None):
    setup_cpu_if_requested()
    args = parse_args("Input/input_ablation_case2_1.yaml", argv)
    cfg = load_yaml(args.input)
    echo_config({k: v for k, v in cfg.items() if not k.startswith("_")})
    run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())

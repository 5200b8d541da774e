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
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .common import (
    parse_args, setup_cpu_if_requested, load_mesh_from_cfg, echo_config,
    ensure_outdir, make_block_linear_solver, run_tp_newton_loop,
)
from ..utils.yamlcfg import load_yaml, resolve_path
from ..io import CsvWriter, VTUCollection

RESTART_MAGIC = 0x41424C32525A5441
RESTART_VERSION = 1
RESTART_TIME_TOL = 1e-12


def save_restart(path, step, time, T, p, extent, world_size=1):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, magic=np.uint64(RESTART_MAGIC),
             version=np.uint32(RESTART_VERSION),
             world_size=np.int32(world_size),
             step=np.int64(step), time=np.float64(time),
             T=np.asarray(T), p=np.asarray(p), extent=np.asarray(extent))


def load_restart(path, n, ne, nq, nr, world_size=1):
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
        T = d["T"]; p = d["p"]; X = d["extent"]
        if len(T) != n or len(p) != n:
            raise ValueError(f"Restart true-dof size mismatch in: {path}")
        if X.shape != (ne, nq, nr):
            raise ValueError(f"Restart reaction-state shape mismatch in: {path}")
        return int(d["step"]), float(d["time"]), T, p, X


def run(cfg: dict) -> dict:
    _t_run0 = _time.perf_counter()
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import SpaceOps
    from ..core.pointlocate import sample_h1, front_depth
    from ..physics.tacot import TacotMaterial
    from ..physics.bprime import BPrimeTable
    from ..physics.surface_bc import SurfaceBCSchedule, TopTemperatureSchedule
    from ..physics.seb import SurfaceFluxModel, classify_branch
    from ..physics.ablation import AblationSystem, AblationState
    from ..solvers import NewtonConfig
    from .ablation_case1 import evaluate_schedule  # noqa: F401 (shared pattern)

    material_file = resolve_path(cfg, cfg.get(
        "material_file", "Input/material_tacot_case2_1.yaml"))
    order = int(cfg.get("order", 1))
    dt_cfg = float(cfg.get("dt", 1.0e-2))
    t_final = float(cfg.get("t_final", 120.0))
    newton_cfg = NewtonConfig(
        abs_tol=float(cfg.get("newton_abs_tol", 1e-8)),
        rel_tol=float(cfg.get("newton_rel_tol", 1e-6)),
        max_iter=int(cfg.get("newton_max_iter", 20)),
    )
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

    mesh = load_mesh_from_cfg(cfg)
    lo, hi = mesh.bounding_box()
    xmid = 0.5 * (lo[0] + hi[0])
    fes = FESpace(mesh, order)
    n = fes.nscalar
    print(f"Global true dofs (T): {n}\nGlobal true dofs (p): {n}\n"
          f"Global true dofs (T+p): {2 * n}")

    quad_order = max(2, 2 * order + 2)
    ops = SpaceOps(fes, quad_order=quad_order)
    sys_ = AblationSystem(ops, mat, gravity=gravity, top_attr=bdr_top)
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
    shard_n = int(cfg.get("sharding_devices", 0))
    sh_cache = {}
    shard_state = {}
    lin_rtol_sh = float(cfg.get("linear_rtol", 1.0e-10))

    def _get_sh(branch):
        key = "dirichlet" if use_dirichlet else branch
        if key not in sh_cache:
            from ..parallel import ShardedAblationNewton, make_device_mesh

            ndev = shard_n
            seb = None if use_dirichlet else (branch, model, bprime)
            sh_cache[key] = ShardedAblationNewton(
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
            if not bool(res.converged):
                raise RuntimeError(
                    f"block GMRES did not converge: residual "
                    f"{float(res.residual):.3e} after {int(res.iters)} "
                    f"restart cycles (raise gmres_restart/gmres_maxiter)")
            return np.asarray(res.x)

    def factorize(T, p, T_old_q, p_old_q, X_old, dt, bc, branch):
        if shard_n:
            sh = _get_sh(branch)
            return _ShardedPrepared(sh, sh.prepare(
                T, p, shard_state["To"], shard_state["po"],
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
    probes_csv = CsvWriter(
        os.path.join(output_path, cfg.get("probes_csv", "temperature_probes.csv")),
        ["time", "wall"] + [f"TC{i}" for i in range(1, len(probe_y))])
    mass_csv = CsvWriter(
        os.path.join(output_path, cfg.get("mass_csv", "mass_metrics.csv")),
        ["time", "m_dot_g_surf", "m_dot_c", "front_98_virgin", "front_2_char",
         "recession"])
    boundary_csv = CsvWriter(
        os.path.join(output_path, cfg.get("boundary_csv", "boundary_diagnostics.csv")),
        ["time", "m_dot_g_surf", "BprimeG_surf", "BprimeC_surf", "h_w_surf",
         "emissivity_surf", "absorptivity_surf", "reflectivity_surf",
         "blowing_correction_surf", "q_conv_surf", "q_adv_pyro_surf",
         "q_rad_emit_surf", "q_rad_abs_surf", "q_surf"])
    newton_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("newton_csv", "newton_history_ablation_case2_1_2D.csv")),
        ["step", "time", "iter", "residual", "residual0", "rel_residual",
         "update_norm", "update0", "rel_update", "converged"])
    timing_csv = CsvWriter(
        os.path.join(output_path,
                     cfg.get("timing_step_csv", "driver_timing_per_step.csv")),
        ["step", "bc_sec", "newton_sec", "newton_residual_eval_sec",
         "newton_jacobian_sec", "newton_linear_sec", "newton_update_sec",
         "state_advance_sec", "output_sec", "step_total_sec"])

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
            resolve_path(cfg, restart_read), n, ne, nq, nr)
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
        bc = schedule.eval(tnow)
        branch = classify_branch(bc, model)
        wallT = float(sample_h1(fes, np.asarray(T),
                                np.array([[probe_x, probe_y[0]]]))[0])
        probe_vals = sample_h1(fes, np.asarray(T), probe_pts)
        bdiag = sys_.top_boundary_diagnostics(
            T, p, state, bc, branch, model, bprime,
            compute_surface_terms=not use_dirichlet)
        f98 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.98)
        f2 = front_depth(mesh, state.tau_elem, xmid, hi[1], lo[1], 0.02)
        probes_csv.writerow([tnow, wallT] + [float(v) for v in probe_vals])
        mass_csv.writerow([tnow, bdiag["m_dot_g_surf"], 0.0, f98, f2, 0.0])
        boundary_csv.writerow([tnow] + [bdiag[k] for k in (
            "m_dot_g_surf", "BprimeG_surf", "BprimeC_surf", "h_w_surf",
            "emissivity_surf", "absorptivity_surf", "reflectivity_surf",
            "blowing_correction_surf", "q_conv_surf", "q_adv_pyro_surf",
            "q_rad_emit_surf", "q_rad_abs_surf", "q_surf")])
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
                save_restart(restart_write, step, t, T, p, state.extent)
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
        save_restart(restart_write, step, t, T, p, state.extent)

    acc = cfg.get("acceptance", {})
    with CsvWriter(os.path.join(output_path, "amaryllis_error_tolerances.csv"),
                   ["signal", "tolerance"]) as w:
        for key, default in (
                ("temperature_rmse_max", 250.0), ("temperature_max_abs_max", 500.0),
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

    probes_csv.close()
    mass_csv.close()
    boundary_csv.close()
    newton_csv.close()
    timing_csv.close()
    return {"T": np.asarray(T), "p": np.asarray(p), "state": state,
            "fes": fes, "mesh": mesh, "step": step, "time": t,
            "bprime": bprime}


def main(argv=None):
    setup_cpu_if_requested()
    args = parse_args("Input/input_ablation_case2_1.yaml", argv)
    cfg = load_yaml(args.input)
    echo_config({k: v for k, v in cfg.items() if not k.startswith("_")})
    run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())

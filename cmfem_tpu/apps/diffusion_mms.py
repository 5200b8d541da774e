"""Static-mesh transient diffusion with manufactured solution (BE).

Mirrors /root/reference/myapps/convection_diffusion/diffusion_mms.cpp:
  du/dt - alpha Lap u = f,  u = sin(t) cos(q), q = 2(x-1/2)^2 + 2(y-1/2)^2,
Dirichlet everywhere from the exact solution; LHS M + alpha dt K assembled
once; per-step CSV (step,time,l2_error,linf_error) + u/u_exact/error fields.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .common import (
    parse_args, setup_cpu_if_requested, load_mesh_from_cfg, echo_config,
    ensure_outdir, num_steps,
)
from ..utils.yamlcfg import load_yaml
from ..io import CsvWriter, VTUCollection


def exact(x, t):
    dx = x[:, 0] - 0.5
    dy = x[:, 1] - 0.5
    q = 2.0 * dx * dx + 2.0 * dy * dy
    return np.sin(t) * np.cos(q)


def make_forcing(alpha):
    def forcing(x, t):
        dx = x[:, 0] - 0.5
        dy = x[:, 1] - 0.5
        r2 = dx * dx + dy * dy
        q = 2.0 * r2
        ut = np.cos(t) * np.cos(q)
        lap = np.sin(t) * (-16.0 * r2 * np.cos(q) - 8.0 * np.sin(q))
        return ut - alpha * lap

    return forcing


def run(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from ..core import FESpace
    from ..ops import (
        SpaceOps, BilinearForm, EssentialBC, domain_lf, l2_error, linf_error,
    )
    from ..solvers import cg, jacobi_preconditioner

    order = int(cfg.get("order", 1))
    alpha = float(cfg.get("alpha", 1.0))
    dt = float(cfg.get("dt", 1.0e-2))
    t_final = float(cfg.get("t_final", 1.0))
    output_path = cfg.get("output_path", "ParaView")
    save_paraview = bool(cfg.get("save_paraview", True))
    paraview_every = int(cfg.get("paraview_every", 10))
    if alpha <= 0 or dt <= 0 or t_final < 0:
        raise ValueError("alpha and dt must be > 0, t_final >= 0.")

    mesh = load_mesh_from_cfg(cfg)
    fes = FESpace(mesh, order)
    print(f"Global true dofs: {fes.nscalar}")

    ops = SpaceOps(fes)
    mass = BilinearForm(ops).add_mass(1.0)
    mdata = mass.assemble()
    lhs = BilinearForm(ops).add_mass(1.0).add_diffusion(alpha * dt)
    ldata = lhs.assemble()
    forcing = make_forcing(alpha)

    ess = fes.boundary_dofs()
    bc = EssentialBC(fes.nscalar, ess)
    diag = jnp.where(bc.mask, 1.0, lhs.assemble_diagonal(ldata))
    ess_pts = fes.node_positions[np.asarray(ess)]

    rtol = float(cfg.get("solver_rtol", 1e-12))
    maxiter = int(cfg.get("solver_maxiter", 2000))

    # linear_solver: jacobi (default) | mg — geometric multigrid over the
    # driver's own refinement chain + p-coarsening, the production PC
    # analog of the reference's petsc*.opts AMG configurations
    solver = str(cfg.get("linear_solver", "jacobi")).lower()
    if solver == "mg":
        from ..solvers import GeometricMG

        base = load_mesh_from_cfg(
            {**cfg, "serial_ref_levels": 0, "par_ref_levels": 0})
        nref = int(cfg.get("serial_ref_levels", 0)) \
            + int(cfg.get("par_ref_levels", 0))
        if nref < 1 and order < 2:
            raise ValueError(
                "linear_solver: mg needs a hierarchy — set "
                "serial_ref_levels >= 1 and/or order >= 2")
        chain = [base]
        for _ in range(nref):
            chain.insert(0, chain[0].uniform_refine(1))
        specs = [(chain[0], order)]
        if order > 1:
            specs.append((chain[0], 1))
        specs += [(m, 1) for m in chain[1:]]
        mg = GeometricMG.build(
            specs, lambda o: BilinearForm(o).add_mass(1.0)
            .add_diffusion(alpha * dt))
        Mmg, mg_arrays = mg.bind()
        M = lambda r: Mmg(r, mg_arrays)
        print(f"MG hierarchy: {len(specs)} levels "
              f"({[s[0].num_elements for s in specs]} elems at orders "
              f"{[s[1] for s in specs]})")
    elif solver in ("jacobi", "cg"):
        M = jacobi_preconditioner(diag)
    else:
        raise ValueError(f"linear_solver must be 'jacobi' or 'mg', "
                         f"got {solver!r}")

    apply_A = lambda v: lhs.apply(ldata, v)

    @jax.jit
    def step_fn(u, f_vec, bdr_vals):
        rhs = mass.apply(mdata, u) + dt * f_vec
        u_bc = jnp.zeros(fes.nscalar).at[bc.ess_dofs].set(bdr_vals)
        B = bc.constrained_rhs(apply_A, rhs, u_bc)
        res = cg(bc.constrain_operator(apply_A), B, x0=u, M=M,
                 rtol=rtol, maxiter=maxiter)
        return res.x, res.iters, res.residual

    u = jnp.asarray(fes.interpolate(lambda x: exact(x, 0.0)))

    ensure_outdir(output_path)
    csv = CsvWriter(os.path.join(output_path, "error_history.csv"),
                    ["step", "time", "l2_error", "linf_error"])
    dc = VTUCollection("diffusion_mms", fes, prefix_path=output_path) \
        if save_paraview else None

    nsteps = num_steps(t_final, dt)
    print(f"Time steps: {nsteps}, dt={dt}, t_final={nsteps * dt}")

    def compute_and_save(step, t):
        ex = lambda x: exact(x, t)
        l2 = float(l2_error(ops, u, ex))
        u_ex = fes.interpolate(ex)
        linf = float(np.max(np.abs(np.asarray(u) - u_ex)))
        csv.writerow([step, t, l2, linf])
        if step <= 5 or step % 50 == 0:
            print(f"step={step} t={t:g} L2_error={l2:.6e} Linf_error={linf:.6e}")
        if dc is not None and (step % paraview_every == 0 or step == nsteps):
            dc.save(step, t, {"u": np.asarray(u), "u_exact": u_ex,
                              "error": np.asarray(u) - u_ex})
        return l2, linf

    compute_and_save(0, 0.0)
    last = (0.0, 0.0)
    solve_iters = []
    for step in range(1, nsteps + 1):
        t = step * dt
        f_vec = domain_lf(ops, lambda x: forcing(x, t))
        bdr_vals = exact(ess_pts, t)
        u, iters, resid = step_fn(u, f_vec, jnp.asarray(bdr_vals))
        solve_iters.append(int(iters))
        last = compute_and_save(step, t)

    csv.close()
    print(f"\nFinal L2 error at t={nsteps * dt}: {last[0]}")
    return {"final_l2": last[0], "final_linf": last[1], "u": np.asarray(u),
            "fes": fes, "solve_iters": solve_iters}


def main(argv=None):
    setup_cpu_if_requested()
    args = parse_args("Input/input_diffusion_mms.yaml", argv)
    cfg = load_yaml(args.input)
    echo_config({k: v for k, v in cfg.items() if not k.startswith("_")})
    run(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())

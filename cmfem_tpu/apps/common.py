"""Shared app-driver scaffolding: CLI, mesh setup, config echo.

Each app mirrors one reference driver: parse `-i input.yaml`, echo config,
build mesh/space, run, write CSV + ParaView (SURVEY.md §1 L5)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..core import load_gmsh, Mesh
from ..utils.yamlcfg import resolve_path


def parse_args(default_input: str, argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", default=default_input, help="YAML input file.")
    return ap.parse_args(argv)


def setup_cpu_if_requested():
    """Apps run on whatever platform jax selects; CMFEM_FORCE_CPU=1 pins CPU
    (the axon sitecustomize would otherwise route eager ops to the TPU)."""
    if os.environ.get("CMFEM_FORCE_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")


def load_mesh_from_cfg(cfg: dict, expected_dim: int = 2) -> Mesh:
    mesh_file = cfg.get("mesh_file")
    if not mesh_file:
        raise KeyError("Missing required YAML key: mesh_file")
    mesh = load_gmsh(resolve_path(cfg, mesh_file))
    if mesh.dim != expected_dim:
        raise ValueError(f"The mesh must be {expected_dim}D.")
    levels = int(cfg.get("serial_ref_levels", 0)) + int(cfg.get("par_ref_levels", 0))
    if levels:
        mesh = mesh.uniform_refine(levels)
    return mesh


def echo_config(cfg_obj, title="Loaded configuration:"):
    print(title)
    for k, v in cfg_obj.items() if isinstance(cfg_obj, dict) else vars(cfg_obj).items():
        if k.startswith("_"):
            continue
        print(f"  {k}: {v}")


def ensure_outdir(path: str):
    os.makedirs(path, exist_ok=True)
    return path


def validate_unit_square(mesh: Mesh, tol=1e-8):
    lo, hi = mesh.bounding_box()
    if not (abs(lo[0]) <= tol and abs(hi[0] - 1) <= tol
            and abs(lo[1]) <= tol and abs(hi[1] - 1) <= tol):
        raise ValueError(
            f"Mesh coordinates must span approximately [0,1]x[0,1]. "
            f"Got x=[{lo[0]},{hi[0]}], y=[{lo[1]},{hi[1]}]."
        )


def validate_unit_circle(mesh: Mesh, tol=1e-6):
    r = np.linalg.norm(mesh.vertices, axis=1).max()
    if abs(r - 1.0) > tol:
        raise ValueError(f"Expected unit-circle mesh (max radius near 1). "
                         f"Found max radius {r}.")


def validate_square(mesh: Mesh, tol=1e-8):
    lo, hi = mesh.bounding_box()
    lx, ly = hi[0] - lo[0], hi[1] - lo[1]
    scale = max(abs(lx), abs(ly), 1.0)
    if lx <= tol or ly <= tol or abs(lx - ly) > 1e-8 * scale + tol:
        raise ValueError(f"Mesh must be square (equal x/y extents). "
                         f"Got lx={lx}, ly={ly}.")


def x_boundary_attrs(mesh: Mesh, tol=1e-8):
    """Attributes of boundary faces lying on the x-extremes (the transient
    driver's geometric Dirichlet detection,
    linear_convection_diffusion_1D.cpp:214-258)."""
    lo, hi = mesh.bounding_box()
    centers = mesh.vertices[mesh.bdr_conn].mean(axis=1)
    on_x = (np.abs(centers[:, 0] - lo[0]) <= tol) | (np.abs(centers[:, 0] - hi[0]) <= tol)
    return sorted(set(mesh.bdr_attr[on_x].tolist()))


def y_boundary_attrs(mesh: Mesh, tol=1e-8):
    lo, hi = mesh.bounding_box()
    centers = mesh.vertices[mesh.bdr_conn].mean(axis=1)
    on_y = (np.abs(centers[:, 1] - lo[1]) <= tol) | (np.abs(centers[:, 1] - hi[1]) <= tol)
    return sorted(set(mesh.bdr_attr[on_y].tolist()))


def num_steps(t_final: float, dt: float) -> int:
    """ceil(t_final/dt - 1e-12), as in the reference drivers."""
    import math

    return int(math.ceil(t_final / dt - 1.0e-12))


def make_block_linear_solver(cfg: dict, element_dofs, n, ess_T, ess_p):
    """Optional on-device iterative solver for the ablation (T,p) Newton
    systems (YAML key ``linear_solver``, SURVEY.md §7.3 direct-solver
    replacement).

    Returns None for the default host sparse-LU path (``lu``, the MUMPS
    analog), or a factory ``factory(blocks, face=None, face_elem=None)``
    producing objects with the same ``.solve(rhs) -> ndarray`` surface as
    ``scipy.sparse.linalg.splu`` so the Newton loops are solver-agnostic.
    Tuning keys: ``linear_rtol`` (default 1e-10), ``gmres_restart`` (400),
    ``gmres_maxiter`` (10 cycles)."""
    mode = str(cfg.get("linear_solver", "lu")).lower()
    if mode in ("lu", "direct", "mumps"):
        return None
    if mode not in ("gmres", "iterative", "krylov"):
        raise ValueError(
            f"linear_solver must be 'lu' or 'gmres', got {mode!r}")
    import jax.numpy as jnp
    import numpy as np

    from ..solvers import BlockNewtonKrylov

    bks = BlockNewtonKrylov(
        element_dofs, n, ess_T, ess_p,
        restart=int(cfg.get("gmres_restart", 400)),
        maxiter=int(cfg.get("gmres_maxiter", 10)))
    rtol = float(cfg.get("linear_rtol", 1.0e-10))

    class _Prepared:
        def __init__(self, factors):
            self.factors = factors

        def solve(self, rhs):
            res = bks.solve(self.factors, jnp.asarray(rhs), rtol=rtol)
            if not bool(res.converged):
                raise RuntimeError(
                    f"block GMRES did not converge: residual "
                    f"{float(res.residual):.3e} after {int(res.iters)} "
                    f"restart cycles (raise gmres_restart/gmres_maxiter)")
            return np.asarray(res.x)

    def factory(blocks, face=None, face_elem=None):
        return _Prepared(bks.prepare(blocks, face=face, face_elem=face_elem))

    return factory

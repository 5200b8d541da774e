"""Moving-mesh (ALE) recession machinery.

Clean-room port of the reference ``MeshRecessionHandler``
(/root/reference/myapps/convection_diffusion/mesh_recession_handler.{hpp,cpp}):
- top/bottom boundary DOF maps (:63-154);
- per-step clamping of the top recession velocity by
  max_step_recession/dt and non-negativity (:156-188);
- vector-Laplacian mesh-velocity smoothing with Dirichlet (0, -v_top) on
  the top and 0 on the bottom, CG rtol 1e-12 (:219-279) — the vector
  Laplacian with unit coefficient decouples into per-component scalar
  solves here;
- two-phase prepare/commit so the ALE state remap can run between
  velocity computation and the node move (:322-375);
- element-quality guard via min detJ ratio vs the initial mesh (:302-320).

Works on order-1 nodal meshes (scalar DOFs == vertices), which is what
every reference recession configuration uses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.fespace import FESpace
from ..core.geometry import compute_geometric_factors
from ..core.quadrature import gauss_rule
from ..core.reference_elements import get_reference_element
from ..ops.assembly import SpaceOps, BilinearForm
from ..ops.bc import EssentialBC
from ..solvers import cg, jacobi_preconditioner


class MeshRecessionHandler:
    def __init__(self, mesh, fes: FESpace, bdr_attr_top=1, bdr_attr_bottom=2,
                 max_step_recession=float("inf"), min_quality_ratio=0.05,
                 recession_axis: int | None = None):
        if fes.order != 1:
            raise NotImplementedError(
                "MeshRecessionHandler requires an order-1 nodal mesh")
        self.mesh = mesh
        self.fes = fes
        self.n = fes.nscalar
        # the surface-normal axis the wall recedes along (reference: +y in
        # 2D; +z for 3D slabs).  Defaults to the last coordinate.
        self.axis = mesh.dim - 1 if recession_axis is None else recession_axis
        self.max_step_recession = max_step_recession
        self.min_quality_ratio = min_quality_ratio
        self.top_dofs = np.asarray(fes.boundary_dofs([bdr_attr_top]))
        self.bottom_dofs = np.asarray(fes.boundary_dofs([bdr_attr_bottom]))
        self.vertices = np.asarray(mesh.vertices, dtype=np.float64).copy()
        self.total_recession = 0.0
        self.mesh_velocity = np.zeros((self.n, mesh.dim))
        self._pending_dt = 0.0
        self._pending_mean_v = 0.0

        # quality quadrature tabulation (order 2, reference :308)
        q = gauss_rule(mesh.geom, 2)
        geo = get_reference_element(mesh.geom, 1)
        Bg, Gg = geo.eval(q.points)
        self._qual = (jnp.asarray(Bg), jnp.asarray(Gg),
                      jnp.asarray(q.weights), jnp.asarray(mesh.elem_conn))
        self.initial_min_quality = self._min_quality()
        if not np.isfinite(self.initial_min_quality) or \
                self.initial_min_quality <= 0:
            raise RuntimeError(
                "Invalid initial mesh quality for moving-mesh recession.")

        ess = np.unique(np.concatenate([self.top_dofs, self.bottom_dofs]))
        self._bc = EssentialBC(self.n, ess)

    def restore(self, vertices, total_recession: float):
        """Resume from a checkpoint: set the receded node positions and the
        cumulative recession.  The quality baseline stays the pristine mesh
        (same as a straight-through run).  Raises if the restored mesh
        violates the quality guard."""
        vertices = np.asarray(vertices, dtype=np.float64)
        if vertices.shape != self.vertices.shape:
            raise ValueError(
                f"Restored vertex shape {vertices.shape} != mesh "
                f"{self.vertices.shape}")
        self.vertices = vertices.copy()
        self.total_recession = float(total_recession)
        q = self._min_quality()
        if q <= 0 or q / self.initial_min_quality < self.min_quality_ratio:
            raise RuntimeError(
                "Restored mesh violates the quality guard.")

    def _min_quality(self, vertices=None) -> float:
        Bg, Gg, w, conn = self._qual
        verts = self.vertices if vertices is None else vertices
        coords_e = jnp.asarray(verts)[conn]
        gf = compute_geometric_factors(coords_e, Bg, Gg, w)
        return float(jnp.min(gf.detJ))

    def clamp_top_velocity(self, v_top, dt):
        """Non-negative, <= max_step_recession/dt, only at top dofs."""
        v = np.zeros(self.n)
        vin = np.asarray(v_top)
        vmax = np.inf
        if np.isfinite(self.max_step_recession) and \
                self.max_step_recession > 0 and dt > 0:
            vmax = self.max_step_recession / dt
        vt = vin[self.top_dofs]
        vt = np.where(np.isfinite(vt) & (vt > 0), vt, 0.0)
        if np.isfinite(vmax):
            vt = np.minimum(vt, vmax)
        v[self.top_dofs] = vt
        return v

    def prepare_advance(self, v_top, dt):
        """Compute the mesh velocity (Laplacian smoothing) without moving
        the mesh; returns the (n, dim) nodal mesh-velocity field."""
        self._pending_dt = dt
        self._pending_mean_v = 0.0
        self.mesh_velocity[:] = 0.0
        if dt <= 0 or v_top is None:
            return self.mesh_velocity
        vc = self.clamp_top_velocity(v_top, dt)
        self._pending_mean_v = float(vc[self.top_dofs].mean()) \
            if len(self.top_dofs) else 0.0
        if self._pending_mean_v <= 0:
            return self.mesh_velocity

        # scalar Laplacian per component on the CURRENT geometry (the basis
        # tabulation is static: build SpaceOps once and reuse)
        if not hasattr(self, "_ops"):
            self._ops = SpaceOps(self.fes)
        ops = self._ops
        gf = ops.geometric_factors(jnp.asarray(self.vertices))
        a = BilinearForm(ops).add_diffusion(1.0)
        data = a.assemble(gf)
        apply_A = lambda u: a.apply(data, u)
        diag = jnp.where(self._bc.mask, 1.0, a.assemble_diagonal(data))
        M = jacobi_preconditioner(diag)
        # tangential components: zero everywhere on top/bottom -> zero
        # solutions; only the recession axis carries -v on top, 0 on bottom
        # (top normal is +axis; recession moves inward, reference :251-253)
        u_bc = jnp.zeros(self.n).at[jnp.asarray(self.top_dofs)].set(
            jnp.asarray(-vc[self.top_dofs]))
        B = self._bc.constrained_rhs(apply_A, jnp.zeros(self.n), u_bc)
        # reference rtol 1e-12 (mesh_recession_handler.cpp:270-276), but
        # floored by the runtime precision: in f32 (CMFEM_X64=0) 1e-12 is
        # unreachable and would silently burn maxiter every step
        rtol = max(1e-12, 50.0 * float(jnp.finfo(B.dtype).eps))
        res = cg(self._bc.constrain_operator(apply_A), B, M=M,
                 rtol=rtol, maxiter=500)
        if not bool(res.converged):
            print(f"WARNING: mesh-velocity CG stalled at residual "
                  f"{float(res.residual):.3e} after {int(res.iters)} "
                  "iterations; committing the last iterate.")
        self.mesh_velocity[:, self.axis] = np.asarray(res.x)
        return self.mesh_velocity

    def commit_advance(self):
        """Move the nodes, update recession bookkeeping, guard quality.

        The quality guard runs on the CANDIDATE geometry before anything
        is committed: a guard failure raises with the handler still on
        the pre-step mesh and the pending state cleared, so a driver can
        catch and retry (e.g. with a smaller dt) from a consistent
        state."""
        out = {"delta_recession": 0.0, "max_node_disp": 0.0,
               "total_recession": self.total_recession, "min_quality": 1.0}
        moved = self._pending_mean_v > 0 and self._pending_dt > 0
        cand = self.vertices
        if moved:
            disp = self._pending_dt * self.mesh_velocity
            cand = self.vertices + disp
            out["max_node_disp"] = float(np.abs(disp).max())

        q = self._min_quality(cand)
        ratio = q / self.initial_min_quality
        out["min_quality"] = ratio
        if q <= 0 or ratio < self.min_quality_ratio:
            self._pending_dt = 0.0
            self._pending_mean_v = 0.0
            if q <= 0:
                raise RuntimeError(
                    "Mesh quality failure: non-positive element Jacobian "
                    "detected.")
            raise RuntimeError(
                "Mesh quality ratio below configured minimum threshold.")

        if moved:
            self.vertices = np.asarray(cand)
            delta = self._pending_mean_v * self._pending_dt
            self.total_recession += delta
            out["delta_recession"] = delta
        out["total_recession"] = self.total_recession
        self._pending_dt = 0.0
        self._pending_mean_v = 0.0
        return out

    def mesh_velocity_at_qp(self, ops: SpaceOps):
        """(ne, nq, dim) mesh velocity interpolated to quadrature points."""
        w = jnp.asarray(self.mesh_velocity)
        w_e = w[ops.eldofs]  # (ne, nd, dim)
        return jnp.einsum("qn,end->eqd", ops.B, w_e)

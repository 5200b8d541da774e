"""Semi-Lagrangian ALE remap of per-QP reaction state.

Clean-room port of RemapExtentsALE
(/root/reference/myapps/convection_diffusion/ablation_test_case2_2_2D.cpp:3148-3273):
before the mesh moves, each QP adopts the extents currently stored at the
material point that will occupy its post-move location (x_q + w_q dt),
found by point location + nearest-QP donor.  Must run between
prepare_advance (mesh velocity available) and commit_advance (mesh not yet
moved).

Vectorized: the donor element is almost always the QP's own element (mesh
motion per step is much smaller than an element), so a batched in-element
inverse map handles the bulk; stragglers fall back to the generic locator.
"""

from __future__ import annotations

import numpy as np

from ..core.pointlocate import locate_points
from ..core.reference_elements import QUAD, TRIANGLE


class StructuredStripRemap:
    """Device-resident (jittable) semi-Lagrangian extent remap for
    structured quad strips under VERTICAL-ONLY mesh motion — the scan-path
    replacement for the host-side ``remap_extents_ale`` (the reference's
    FindPoints-based RemapExtentsALE, ablation_test_case2_2_2D.cpp:
    3148-3273).

    On the reference's transfinite strip meshes the x coordinates never
    change (the recession velocity is vertical, and the vector-Laplacian
    smoothing keeps it so), which makes each QP's column index and ref-u
    weight STATIC.  The donor search reduces to a per-QP ``searchsorted``
    over the current y lattice of its column, and the bilinear inverse map
    is closed-form: x(u) is independent of v on a vertical-motion
    trapezoid, so u = u_own and v = (y - y_lo(u)) / (y_hi(u) - y_lo(u))
    exactly.  Donors therefore match the generic host path bit-for-bit
    away from element-edge ties.
    """

    def __init__(self, mesh, ops):
        import jax.numpy as jnp

        from ..solvers.blocksolve import strip_dof_lattice

        if mesh.geom != QUAD:
            raise NotImplementedError(
                "StructuredStripRemap requires a structured quad strip")
        verts0 = np.asarray(mesh.vertices)
        # vertex lattice via the shared tolerance-clustering helper (GMSH
        # emits float jitter in column x coords; one implementation for
        # both the block solver's dof lattice and this vertex lattice)
        vert_lat = strip_dof_lattice(verts0)
        nyv, nxv = vert_lat.shape
        nv = len(verts0)
        xs = verts0[:, 0][vert_lat].mean(axis=0)   # jitter-averaged columns
        row_of = np.empty(nv, dtype=np.int64)
        col_of = np.empty(nv, dtype=np.int64)
        rr, cc = np.indices(vert_lat.shape)
        row_of[vert_lat.ravel()] = rr.ravel()
        col_of[vert_lat.ravel()] = cc.ravel()
        conn = np.asarray(mesh.elem_conn)
        er = row_of[conn].min(axis=1)
        ec = col_of[conn].min(axis=1)
        elem_lat = np.full((nyv - 1, nxv - 1), -1, dtype=np.int64)
        elem_lat[er, ec] = np.arange(len(conn))
        if (elem_lat < 0).any():
            raise ValueError("mesh elements do not tile the strip lattice")

        xq0 = np.asarray(ops.gf.xq).reshape(-1, 2)   # x column is static
        ic = np.clip(np.searchsorted(xs, xq0[:, 0], side="right") - 1,
                     0, nxv - 2)
        sx = (xq0[:, 0] - xs[ic]) / (xs[ic + 1] - xs[ic])
        self.ne, self.nq = np.asarray(ops.gf.wdetJ).shape
        self.nyv = nyv
        self.vert_lat = jnp.asarray(vert_lat)
        self.elem_lat = jnp.asarray(elem_lat)
        self.ic = jnp.asarray(ic)
        self.sx = jnp.asarray(sx)
        self.qp_ref = jnp.asarray(np.asarray(ops.quad.points))

    def __call__(self, extent, verts, xq, wq, dt):
        """Jittable remap: extent (ne, nq, nr), verts (nv, 2) CURRENT
        (pre-move), xq (ne, nq, 2) current QP coords, wq (ne, nq, 2) mesh
        velocity at QPs, dt scalar.  Returns the remapped extents."""
        import jax
        import jax.numpy as jnp

        ne, nq = self.ne, self.nq
        nr = extent.shape[-1]
        # vertical-only-motion contract: the column index / ref-u weight
        # are static, so any horizontal velocity silently picks donors
        # from the wrong column.  Checkable only eagerly (wq is traced
        # in the scan path, where the driver's smoother produces
        # y-velocity by construction).
        try:
            # float() on a traced value raises ConcretizationTypeError
            # (TracerArrayConversionError is its np.asarray sibling)
            wx = float(jnp.max(jnp.abs(wq[..., 0])))
            wy = float(jnp.max(jnp.abs(wq[..., 1])))
            if wx > 1e-10 * max(wy, 1.0):
                raise ValueError(
                    "StructuredStripRemap requires vertical-only mesh "
                    f"motion; got max |w_x| = {wx:g}")
        except jax.errors.ConcretizationTypeError:
            pass
        ylat = verts[:, 1][self.vert_lat]                 # (nyv, nxv)
        Yl = ylat[:, self.ic]                             # (nyv, M)
        Yr = ylat[:, self.ic + 1]
        yedges = ((1.0 - self.sx) * Yl + self.sx * Yr).T  # (M, nyv)
        y_t = (xq[..., 1] + wq[..., 1] * dt).reshape(-1)
        row = jax.vmap(
            lambda ye, yt: jnp.searchsorted(ye, yt, side="right"))(
            yedges, y_t) - 1
        row = jnp.clip(row, 0, self.nyv - 2)
        ylo = jnp.take_along_axis(yedges, row[:, None], axis=1)[:, 0]
        yhi = jnp.take_along_axis(yedges, row[:, None] + 1, axis=1)[:, 0]
        h = yhi - ylo
        vref = (y_t - ylo) / jnp.maximum(h, jnp.finfo(h.dtype).tiny)
        donor = self.elem_lat[row, self.ic]
        d2 = (self.sx[:, None] - self.qp_ref[None, :, 0]) ** 2 \
            + (vref[:, None] - self.qp_ref[None, :, 1]) ** 2
        qnear = jnp.argmin(d2, axis=1)
        Xf = extent.reshape(-1, nr)
        Xn = jnp.clip(Xf[donor * nq + qnear], 0.0, 1.0)
        return Xn.reshape(ne, nq, nr)


class TriStripRemap:
    """Device-resident (jittable) semi-Lagrangian extent remap for
    TRIANGLE strips (the production case-2.2 deck's
    ablation_strip_tri_uniform.msh) under small per-step mesh motion —
    the scan-path replacement for the host ``remap_extents_ale`` on tri
    meshes.

    Contract: the per-step displacement |w dt| (clamped by
    ``max_step_recession``) stays below every QP's distance to its
    element boundary, so the donor point x_q + w_q dt is ALWAYS inside
    the QP's own element (the host path's own-element fast path hits
    100%).  In the production regime the margin is ~3 orders of
    magnitude (per-step recession ~5e-8 m vs Gauss-point edge distance
    ~5e-6 m on the refined tri strip); ``margin()`` exposes the initial
    safe bound so callers can assert the clamp against it.  The affine
    triangle inverse map is closed-form, so the whole remap is a batched
    2x2 solve + nearest-reference-QP gather — fully jittable."""

    def __init__(self, mesh, ops):
        import jax.numpy as jnp

        if mesh.geom != TRIANGLE:
            raise NotImplementedError("TriStripRemap requires triangles")
        self.ne, self.nq = np.asarray(ops.gf.wdetJ).shape
        self.conn = jnp.asarray(np.asarray(mesh.elem_conn))
        self.qp_ref = jnp.asarray(np.asarray(ops.quad.points))
        # initial-mesh safe bound: min over QPs of the barycentric margin
        # scaled to physical length (conservative: uses the min edge
        # height of each element)
        verts0 = np.asarray(mesh.vertices)
        qp = np.asarray(ops.quad.points)
        bary_margin = float(np.min([qp[:, 0].min(), qp[:, 1].min(),
                                    (1.0 - qp.sum(axis=1)).min()]))
        ec = verts0[np.asarray(mesh.elem_conn)]
        e01 = np.linalg.norm(ec[:, 1] - ec[:, 0], axis=1)
        e02 = np.linalg.norm(ec[:, 2] - ec[:, 0], axis=1)
        e12 = np.linalg.norm(ec[:, 2] - ec[:, 1], axis=1)
        hmin = float(np.min(np.stack([e01, e02, e12])))
        self._margin = bary_margin * hmin

    def margin(self):
        """Initial-mesh lower bound on the per-step displacement that
        keeps every donor inside its own element."""
        return self._margin

    def __call__(self, extent, verts, xq, wq, dt):
        """Jittable remap: extent (ne, nq, nr), verts CURRENT (pre-move),
        xq (ne, nq, 2) current QP coords, wq mesh velocity at QPs."""
        import jax.numpy as jnp

        target = xq + wq * dt                       # (ne, nq, 2)
        ec = verts[self.conn]                       # (ne, 3, 2)
        v0 = ec[:, None, 0]
        a00 = (ec[:, 1, 0] - ec[:, 0, 0])[:, None]
        a10 = (ec[:, 1, 1] - ec[:, 0, 1])[:, None]
        a01 = (ec[:, 2, 0] - ec[:, 0, 0])[:, None]
        a11 = (ec[:, 2, 1] - ec[:, 0, 1])[:, None]
        rhs = target - v0
        det = a00 * a11 - a01 * a10
        tiny = jnp.finfo(det.dtype).tiny
        inv = jnp.where(jnp.abs(det) > tiny, 1.0 / det, 0.0)
        r0 = (a11 * rhs[..., 0] - a01 * rhs[..., 1]) * inv
        r1 = (-a10 * rhs[..., 0] + a00 * rhs[..., 1]) * inv
        d2 = (r0[..., None] - self.qp_ref[None, None, :, 0]) ** 2 \
            + (r1[..., None] - self.qp_ref[None, None, :, 1]) ** 2
        qnear = jnp.argmin(d2, axis=2)              # (ne, nq)
        Xn = jnp.take_along_axis(extent, qnear[..., None], axis=1)
        return jnp.clip(Xn, 0.0, 1.0)


def make_scan_remap(mesh, ops):
    """Pick the jittable scan-path remap for this mesh: the structured
    quad-strip lattice remap, or the own-element tri-strip remap."""
    if mesh.geom == QUAD:
        return StructuredStripRemap(mesh, ops)
    if mesh.geom == TRIANGLE:
        return TriStripRemap(mesh, ops)
    raise NotImplementedError(
        f"no jittable scan remap for geometry {mesh.geom}")


def _invert_in_own_element(geom, ecoords, pts):
    """Batched inverse map of pts (m, 2) in their own elements
    ecoords (m, nc, 2). Returns (ref (m, 2), inside (m,))."""
    m = len(pts)
    if geom == TRIANGLE:
        v0 = ecoords[:, 0]
        A = np.stack([ecoords[:, 1] - v0, ecoords[:, 2] - v0], axis=2)
        rhs = pts - v0
        det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
        inv_det = np.where(np.abs(det) > 1e-300, 1.0 / det, 0.0)
        r0 = (A[:, 1, 1] * rhs[:, 0] - A[:, 0, 1] * rhs[:, 1]) * inv_det
        r1 = (-A[:, 1, 0] * rhs[:, 0] + A[:, 0, 0] * rhs[:, 1]) * inv_det
        ref = np.stack([r0, r1], axis=1)
        inside = (r0 >= -1e-9) & (r1 >= -1e-9) & (r0 + r1 <= 1 + 1e-9)
        return ref, inside
    if geom == QUAD:
        r = np.full((m, 2), 0.5)
        c = ecoords
        for _ in range(15):
            u = r[:, 0]
            v = r[:, 1]
            N = np.stack([(1 - u) * (1 - v), u * (1 - v), u * v, (1 - u) * v], 1)
            dNu = np.stack([-(1 - v), (1 - v), v, -v], 1)
            dNv = np.stack([-(1 - u), -u, u, (1 - u)], 1)
            xr = np.einsum("mn,mnd->md", N, c)
            Ju = np.einsum("mn,mnd->md", dNu, c)
            Jv = np.einsum("mn,mnd->md", dNv, c)
            det = Ju[:, 0] * Jv[:, 1] - Ju[:, 1] * Jv[:, 0]
            inv_det = np.where(np.abs(det) > 1e-300, 1.0 / det, 0.0)
            rhs = pts - xr
            du = (Jv[:, 1] * rhs[:, 0] - Jv[:, 0] * rhs[:, 1]) * inv_det
            dv = (-Ju[:, 1] * rhs[:, 0] + Ju[:, 0] * rhs[:, 1]) * inv_det
            r[:, 0] += du
            r[:, 1] += dv
        inside = ((r >= -1e-9) & (r <= 1 + 1e-9)).all(axis=1)
        return np.clip(r, 0, 1), inside
    raise NotImplementedError(geom)


def remap_extents_ale(mesh, ops, extent, mesh_velocity_qp, dt, vertices):
    """Return the remapped extents array (ne, nq, nr).

    extent: committed per-QP extents on the CURRENT (pre-move) mesh;
    mesh_velocity_qp: (ne, nq, dim); vertices: current vertex coords."""
    if dt <= 0:
        return extent
    extent = np.asarray(extent)
    ne, nq, nr = extent.shape
    gf = ops.geometric_factors(np.asarray(vertices))
    xq = np.asarray(gf.xq).reshape(-1, mesh.dim)          # (M, 2)
    w = np.asarray(mesh_velocity_qp).reshape(-1, mesh.dim)
    targets = xq + w * dt
    M = len(targets)
    own_elem = np.repeat(np.arange(ne), nq)

    coords = np.asarray(vertices)[mesh.elem_conn]  # (ne, nc, 2)
    ref, inside = _invert_in_own_element(mesh.geom, coords[own_elem], targets)
    found_elem = np.where(inside, own_elem, -1)

    missing = np.nonzero(~inside)[0]
    if len(missing):
        e2, r2 = locate_points(mesh, targets[missing], vertices=vertices)
        found_elem[missing] = e2
        ref[missing] = r2

    # nearest tabulated reference QP in the donor element
    qp_ref = np.asarray(ops.quad.points)  # (nq, 2)
    d2 = ((ref[:, None, :] - qp_ref[None, :, :]) ** 2).sum(axis=2)
    nearest_q = np.argmin(d2, axis=1)

    new_flat = extent.reshape(-1, nr).copy()
    ok = found_elem >= 0
    src = found_elem[ok] * nq + nearest_q[ok]
    new_flat[ok] = np.clip(extent.reshape(-1, nr)[src], 0.0, 1.0)
    return new_flat.reshape(ne, nq, nr)

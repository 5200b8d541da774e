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

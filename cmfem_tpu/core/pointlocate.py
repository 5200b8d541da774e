"""Point location + field sampling (the ParMesh::FindPoints equivalent).

Used by the ablation drivers for temperature probes, front-depth line
sampling, and the ALE semi-Lagrangian remap
(ablation_test_case1_2D.cpp:748-819, ablation_test_case2_2_2D.cpp:3148-3273).
Array algorithm: bbox candidate filter + per-element inverse map (affine for
tris, Newton for bilinear quads).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh
from .reference_elements import HEXAHEDRON, QUAD, TETRAHEDRON, TRIANGLE


def locate_points(mesh: Mesh, points: np.ndarray, vertices=None, tol=1e-9):
    """Find containing elements and reference coords for query points.

    points (npts, dim) -> (elem_ids (npts,) int64 [-1 if not found],
    ref_coords (npts, dim))."""
    verts = np.asarray(mesh.vertices if vertices is None else vertices)
    pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
    conn = mesh.elem_conn
    coords = verts[conn]  # (ne, nc, dim)
    lo = coords.min(axis=1) - tol
    hi = coords.max(axis=1) + tol

    elem_ids = np.full(len(pts), -1, dtype=np.int64)
    refs = np.zeros((len(pts), mesh.dim))

    for ip, x in enumerate(pts):
        cand = np.nonzero(((x >= lo) & (x <= hi)).all(axis=1))[0]
        for e in cand:
            ok, ref = _invert_map(mesh.geom, coords[e], x, tol)
            if ok:
                elem_ids[ip] = e
                refs[ip] = ref
                break
    return elem_ids, refs


def _invert_map(geom, ecoords, x, tol):
    if geom == TRIANGLE:
        v0, v1, v2 = ecoords[0], ecoords[1], ecoords[2]
        A = np.stack([v1 - v0, v2 - v0], axis=1)
        try:
            r = np.linalg.solve(A, x - v0)
        except np.linalg.LinAlgError:
            return False, np.zeros(2)
        inside = (r[0] >= -1e-9) and (r[1] >= -1e-9) and (r.sum() <= 1 + 1e-9)
        return inside, r
    if geom == QUAD:
        # Newton on the bilinear map
        c = ecoords
        r = np.array([0.5, 0.5])
        for _ in range(20):
            u, v = r
            N = np.array([(1 - u) * (1 - v), u * (1 - v), u * v, (1 - u) * v])
            dNu = np.array([-(1 - v), (1 - v), v, -v])
            dNv = np.array([-(1 - u), -u, u, (1 - u)])
            xr = N @ c
            J = np.stack([dNu @ c, dNv @ c], axis=1)
            try:
                dr = np.linalg.solve(J, x - xr)
            except np.linalg.LinAlgError:
                return False, r
            r = r + dr
            if np.abs(dr).max() < 1e-13:
                break
        inside = (r >= -1e-9).all() and (r <= 1 + 1e-9).all()
        return inside, np.clip(r, 0.0, 1.0)
    if geom == TETRAHEDRON:
        v = ecoords
        A = np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]], axis=1)
        try:
            r = np.linalg.solve(A, x - v[0])
        except np.linalg.LinAlgError:
            return False, np.zeros(3)
        inside = (r >= -1e-9).all() and (r.sum() <= 1 + 1e-9)
        return inside, r
    if geom == HEXAHEDRON:
        # Newton on the trilinear map
        c = ecoords
        r = np.full(3, 0.5)
        for _ in range(25):
            u, v, w = r
            nu = np.array([1 - u, u])
            nv = np.array([1 - v, v])
            nw = np.array([1 - w, w])
            du = np.array([-1.0, 1.0])
            # vertex order: (0,0,0),(1,0,0),(1,1,0),(0,1,0),(0,0,1),...
            iu = [0, 1, 1, 0, 0, 1, 1, 0]
            iv = [0, 0, 1, 1, 0, 0, 1, 1]
            iw = [0, 0, 0, 0, 1, 1, 1, 1]
            N = nu[iu] * nv[iv] * nw[iw]
            dNu = du[iu] * nv[iv] * nw[iw]
            dNv = nu[iu] * du[iv] * nw[iw]
            dNw = nu[iu] * nv[iv] * du[iw]
            xr = N @ c
            J = np.stack([dNu @ c, dNv @ c, dNw @ c], axis=1)
            try:
                dr = np.linalg.solve(J, x - xr)
            except np.linalg.LinAlgError:
                return False, r
            r = r + dr
            if np.abs(dr).max() < 1e-13:
                break
        inside = (r >= -1e-9).all() and (r <= 1 + 1e-9).all()
        return inside, np.clip(r, 0.0, 1.0)
    raise NotImplementedError(geom)


def sample_h1(fes, u, points, vertices=None):
    """Sample an H1 field at physical points; NaN where not found.

    Mirrors SampleFieldAtPoint (FindPoints + GetValue)."""
    elem_ids, refs = locate_points(fes.mesh, points, vertices)
    u = np.asarray(u)
    out = np.full(len(elem_ids), np.nan)
    for i, (e, r) in enumerate(zip(elem_ids, refs)):
        if e < 0:
            continue
        B, _ = fes.ref.eval(r[None, :])
        out[i] = float(B[0] @ u[fes.element_dofs[e]])
    return out


def sample_l2(mesh: Mesh, elem_vals, points, vertices=None):
    """Sample an L2(0) (per-element) field at physical points."""
    elem_ids, _ = locate_points(mesh, points, vertices)
    vals = np.asarray(elem_vals)
    out = np.full(len(elem_ids), np.nan)
    found = elem_ids >= 0
    out[found] = vals[elem_ids[found]]
    return out


def front_depth(mesh: Mesh, elem_vals, x, y_top, y_bottom, threshold,
                ns=250, vertices=None):
    """Depth below y_top where the sampled field first crosses below
    `threshold` along a vertical line (ComputeFrontDepth,
    ablation_test_case1_2D.cpp:779-819)."""
    eps = 1e-9
    y0 = y_top - eps
    y1 = y_bottom + eps
    ys = y0 - np.arange(ns + 1) * (y0 - y1) / ns
    pts = np.stack([np.full(ns + 1, x), ys], axis=1)
    vals = sample_l2(mesh, elem_vals, pts, vertices)
    for k in range(1, ns + 1):
        vp, vc = vals[k - 1], vals[k]
        if np.isfinite(vp) and np.isfinite(vc) and vp > threshold >= vc:
            denom = vp - vc
            frac = 0.0 if abs(denom) < 1e-14 else \
                np.clip((vp - threshold) / denom, 0.0, 1.0)
            y_cross = ys[k - 1] - frac * (ys[k - 1] - ys[k])
            return max(0.0, y_top - y_cross)
    return 0.0

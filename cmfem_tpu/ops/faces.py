"""Boundary-face trace evaluation: element fields on boundary faces.

The TPU-native replacement for MFEM's boundary-face machinery
(``GetBdrFaceTransformations`` + per-face shape evaluation used by the
reference's surface diagnostics and SEB integrator, e.g.
ablation_test_case1_2D.cpp:634-746, ablation_test_case2_1_2D.cpp:2109-2217).

Each boundary face is (adjacent element, local-edge id, orientation); the
element basis is tabulated once per (edge, orientation) combo at the face
quadrature points, so face values/gradients are batched gathers + einsums
and face residual contributions scatter back through the element DOF map.
2D elements (tri/quad) supported; 3D hookup follows the same combo scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.fespace import FESpace
from ..core.geometry import compute_face_factors, FaceFactors
from ..core.quadrature import gauss_rule
from ..core.reference_elements import (
    GEOM_EDGES, GEOM_VERTS, SEGMENT, get_reference_element,
)
from .assembly import SpaceOps


class BoundaryTrace:
    """Trace operators for (a subset of) boundary faces of a 2D mesh."""

    def __init__(self, ops: SpaceOps, attr_marker=None, quad_order=None):
        fes = ops.fes
        mesh = fes.mesh
        if mesh.dim != 2:
            raise NotImplementedError("BoundaryTrace currently supports 2D")
        self.ops = ops
        self.fes = fes
        bdr = fes.bdr
        if attr_marker is None:
            sel = np.arange(len(bdr.attr))
        else:
            sel = np.nonzero(np.isin(bdr.attr, np.asarray(list(attr_marker))))[0]
        self.face_ids = sel
        self.nbf = len(sel)
        self.elem = np.asarray(bdr.elem)[sel]
        conn = np.asarray(mesh.bdr_conn)[sel]  # (nbf, 2)
        econn = np.asarray(mesh.elem_conn)[self.elem]
        edges = GEOM_EDGES[mesh.geom]

        # local edge id + flip per face
        nle = len(edges)
        combo = np.full(self.nbf, -1, dtype=np.int64)
        for k, (a, b) in enumerate(edges):
            va = econn[:, a]
            vb = econn[:, b]
            fwd = (va == conn[:, 0]) & (vb == conn[:, 1])
            rev = (va == conn[:, 1]) & (vb == conn[:, 0])
            combo = np.where(fwd, 2 * k, combo)
            combo = np.where(rev, 2 * k + 1, combo)
        if (combo < 0).any():
            raise ValueError("Boundary face not matched to an element edge")
        self.combo = combo

        p = fes.order
        qorder = quad_order or max(2, 2 * p + 2)
        self.quad = gauss_rule(SEGMENT, qorder)
        s = self.quad.points[:, 0]  # (nqf,)
        ref = fes.ref
        geo = get_reference_element(mesh.geom, 1)
        verts_ref = GEOM_VERTS[mesh.geom]
        Btabs, Gtabs, Bg_tabs, Gg_tabs = [], [], [], []
        for k, (a, b) in enumerate(edges):
            for flip in (False, True):
                ss = 1.0 - s if flip else s
                pts = verts_ref[a][None, :] * (1 - ss)[:, None] + \
                    verts_ref[b][None, :] * ss[:, None]
                B, G = ref.eval(pts)
                Bg, Gg = geo.eval(pts)
                Btabs.append(B)
                Gtabs.append(G)
                Bg_tabs.append(Bg)
                Gg_tabs.append(Gg)
        self.Btab = jnp.asarray(np.stack(Btabs))   # (ncombo, nqf, ndof)
        self.Gtab = jnp.asarray(np.stack(Gtabs))   # (ncombo, nqf, ndof, dim)
        self.Bgtab = jnp.asarray(np.stack(Bg_tabs))
        self.Ggtab = jnp.asarray(np.stack(Gg_tabs))

        self.eldofs = jnp.asarray(fes.element_dofs[self.elem])  # (nbf, ndof)
        self._elem_conn = jnp.asarray(mesh.elem_conn[self.elem])
        self._face_conn = jnp.asarray(conn)
        self._normal_sign = jnp.asarray(np.asarray(bdr.normal_sign)[sel])
        self._combo_j = jnp.asarray(self.combo)
        # face geometry basis (for wdS / normals / positions)
        fref = get_reference_element(SEGMENT, 1)
        Bf, Gf = fref.eval(self.quad.points)
        self._Bf = jnp.asarray(Bf)
        self._Gf = jnp.asarray(Gf)

    # -- geometry ----------------------------------------------------------

    def face_factors(self, vertices=None) -> FaceFactors:
        verts = jnp.asarray(self.fes.mesh.vertices if vertices is None
                            else vertices)
        coords = verts[self._face_conn]
        return compute_face_factors(coords, self._Bf, self._Gf,
                                    self.quad.weights, self._normal_sign)

    def element_invJ(self, vertices=None):
        """(nbf, nqf, dim, dim) inverse element Jacobians at face QPs."""
        from ..core.geometry import _inv_det

        verts = jnp.asarray(self.fes.mesh.vertices if vertices is None
                            else vertices)
        coords = verts[self._elem_conn]  # (nbf, nc, dim)
        Gg = self.Ggtab[self._combo_j]   # (nbf, nqf, nc, dim)
        J = jnp.einsum("fnd,fqnr->fqdr", coords, Gg)
        _, inv = _inv_det(J)
        return inv

    # -- field evaluation --------------------------------------------------

    def values(self, u):
        """(nbf, nqf) trace values of a scalar field."""
        u_e = jnp.asarray(u)[self.eldofs]
        B = self.Btab[self._combo_j]
        return jnp.einsum("fqn,fn->fq", B, u_e)

    def grads(self, u, vertices=None):
        """(nbf, nqf, dim) physical gradients of a scalar field at the
        face quadrature points (one-sided, from the adjacent element)."""
        u_e = jnp.asarray(u)[self.eldofs]
        G = self.Gtab[self._combo_j]
        gref = jnp.einsum("fqnr,fn->fqr", G, u_e)
        invJ = self.element_invJ(vertices)
        return jnp.einsum("fqrd,fqr->fqd", invJ, gref)

    def scatter(self, r_face):
        """Scatter (nbf, nqf) test-function-weighted face integrand into the
        global vector: R_i += sum_q r_face[f,q] * psi_i(x_q)."""
        B = self.Btab[self._combo_j]
        y_e = jnp.einsum("fqn,fq->fn", B, r_face)
        return jax.ops.segment_sum(
            y_e.reshape(-1), self.eldofs.reshape(-1),
            num_segments=self.fes.nscalar)

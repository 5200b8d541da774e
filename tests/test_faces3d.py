"""3D boundary traces: hex quad faces and tet tri faces with orientations."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
from cmfem_tpu.core.mesh import Mesh
from cmfem_tpu.ops import SpaceOps
from cmfem_tpu.ops.faces import BoundaryTrace


def _linear(pts):
    return pts[..., 0] + 2.0 * pts[..., 1] + 3.0 * pts[..., 2]


@pytest.mark.parametrize("order", [1, 2, 3])
def test_hex_boundary_trace_values_grads_area(order):
    m = make_cartesian_mesh_3d(2, 2, 2)
    fes = FESpace(m, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    tr = BoundaryTrace(ops)
    u = fes.interpolate(_linear)

    ff = tr.face_factors()
    # surface area of the unit cube
    assert abs(float(jnp.sum(ff.wdS)) - 6.0) < 1e-12
    # traces of a linear field are exact at face QPs
    np.testing.assert_allclose(np.asarray(tr.values(u)),
                               _linear(np.asarray(ff.xq)), atol=1e-12)
    g = np.asarray(tr.grads(u))
    np.testing.assert_allclose(g[..., 0], 1.0, atol=1e-10)
    np.testing.assert_allclose(g[..., 1], 2.0, atol=1e-10)
    np.testing.assert_allclose(g[..., 2], 3.0, atol=1e-10)
    # outward unit normals: n . (x - center) > 0 on a convex body
    xq = np.asarray(ff.xq) - 0.5
    assert (np.einsum("fqd,fqd->fq", np.asarray(ff.normal), xq) > 0).all()


def test_hex_trace_orientation_invariance():
    """Rolling or reversing the boundary-face vertex cycles must not change
    trace values (the per-combo tabulation resolves the orientation)."""
    m = make_cartesian_mesh_3d(2, 2, 2)
    rng = np.random.default_rng(3)
    conn = np.asarray(m.bdr_conn).copy()
    for i in range(len(conn)):
        r = int(rng.integers(0, 4))
        conn[i] = np.roll(conn[i], r)
        if rng.random() < 0.5:
            conn[i] = conn[i][::-1]
    m2 = Mesh(dim=m.dim, geom=m.geom, vertices=m.vertices,
              elem_conn=m.elem_conn, elem_attr=m.elem_attr,
              bdr_geom=m.bdr_geom, bdr_conn=conn.astype(np.int32),
              bdr_attr=m.bdr_attr)
    fes = FESpace(m2, 2)
    ops = SpaceOps(fes, quad_order=4)
    tr = BoundaryTrace(ops)
    u = fes.interpolate(_linear)
    ff = tr.face_factors()
    np.testing.assert_allclose(np.asarray(tr.values(u)),
                               _linear(np.asarray(ff.xq)), atol=1e-12)
    xq = np.asarray(ff.xq) - 0.5
    assert (np.einsum("fqd,fqd->fq", np.asarray(ff.normal), xq) > 0).all()
    assert abs(float(jnp.sum(ff.wdS)) - 6.0) < 1e-12


def test_hex_trace_scatter_adjoint():
    """scatter is the adjoint of values: r . values(u) == scatter(r) . u."""
    m = make_cartesian_mesh_3d(2, 2, 2)
    fes = FESpace(m, 2)
    ops = SpaceOps(fes, quad_order=4)
    tr = BoundaryTrace(ops, attr_marker=[2])  # z=1 faces only
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.nscalar))
    r = jnp.asarray(rng.standard_normal((tr.nbf, len(tr.quad.weights))))
    lhs = float(jnp.sum(r * tr.values(u)))
    rhs = float(jnp.dot(tr.scatter(r), u))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def _single_tet_mesh(bdr_rolls=(0, 0, 0, 0), reverse=()):
    from cmfem_tpu.core.reference_elements import (
        GEOM_FACES, TETRAHEDRON, TRIANGLE,
    )

    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    faces = []
    for i, f in enumerate(GEOM_FACES[TETRAHEDRON]):
        c = np.roll(np.asarray(f), bdr_rolls[i])
        if i in reverse:
            c = c[::-1]
        faces.append(c)
    return Mesh(dim=3, geom=TETRAHEDRON, vertices=verts,
                elem_conn=np.array([[0, 1, 2, 3]], dtype=np.int32),
                elem_attr=np.ones(1, dtype=np.int32),
                bdr_geom=TRIANGLE,
                bdr_conn=np.asarray(faces, dtype=np.int32),
                bdr_attr=np.arange(1, 5, dtype=np.int32))


def _two_tet_mesh():
    from cmfem_tpu.core.reference_elements import (
        GEOM_FACES, TETRAHEDRON, TRIANGLE,
    )

    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0], [1.0, 1.0, 1.0]])
    conn = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], dtype=np.int32)
    faces = []
    for e in conn:
        for f in GEOM_FACES[TETRAHEDRON]:
            fv = tuple(int(e[i]) for i in f)
            if set(fv) != {1, 2, 3}:  # interior shared face
                faces.append(fv)
    return Mesh(dim=3, geom=TETRAHEDRON, vertices=verts, elem_conn=conn,
                elem_attr=np.ones(2, dtype=np.int32), bdr_geom=TRIANGLE,
                bdr_conn=np.asarray(faces, dtype=np.int32),
                bdr_attr=np.ones(len(faces), dtype=np.int32))


def test_tet_order3_space_and_trace():
    """Order-3 tets: shared-face centroid dofs, cubic exactness, and the
    divergence theorem through the boundary trace."""
    from cmfem_tpu.ops import l2_error

    m = _two_tet_mesh()
    fes = FESpace(m, 3)
    # 5 verts + 9 edges * 2 + 7 faces * 1 centroid node
    assert fes.nscalar == 5 + 18 + 7
    ops = SpaceOps(fes, quad_order=6)

    def cubic(x):
        return (x[..., 0]**3 + 2 * x[..., 1]**2 * x[..., 2]
                - x[..., 0] * x[..., 1] * x[..., 2] + 1.0)

    u = jnp.asarray(fes.interpolate(cubic))
    assert float(l2_error(ops, u, cubic)) < 1e-13

    tr = BoundaryTrace(ops)
    ff = tr.face_factors()
    # flux of grad(x^2+y^2+z^2) = 6 * total volume (1/6 + 1/3)
    q = jnp.asarray(fes.interpolate(
        lambda x: x[..., 0]**2 + x[..., 1]**2 + x[..., 2]**2))
    flux = float(jnp.sum(jnp.einsum("fqd,fqd->fq", tr.grads(q), ff.normal)
                         * ff.wdS))
    assert abs(flux - 3.0) < 1e-12
    # traces of the cubic agree with pointwise evaluation (face QPs hit
    # both orientations of the tabulation)
    np.testing.assert_allclose(np.asarray(tr.values(u)),
                               cubic(np.asarray(ff.xq)), atol=1e-12)


def test_tet_order4_space():
    """Order-4 tets: three orientation-dependent face nodes per shared
    face, canonicalized by sorted-vertex barycentric permutation."""
    from cmfem_tpu.ops import l2_error

    m = _two_tet_mesh()
    fes = FESpace(m, 4)
    # 5 verts + 9 edges * 3 + 7 faces * 3 + 2 element interiors
    assert fes.nscalar == 5 + 27 + 21 + 2
    ops = SpaceOps(fes, quad_order=8)

    def quartic(x):
        return (x[..., 0]**4 + x[..., 1]**3 * x[..., 2]
                - 2 * x[..., 0]**2 * x[..., 1] * x[..., 2]
                + x[..., 2]**4 + 0.5)

    u = jnp.asarray(fes.interpolate(quartic))
    assert float(l2_error(ops, u, quartic)) < 1e-13
    # continuity across the shared face with RANDOM coefficients: the two
    # elements see the face corners in different local orders, so a wrong
    # face-node permutation would show up as an O(1) jump
    rng = np.random.default_rng(1)
    uu = rng.standard_normal(fes.nscalar)
    rv = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    pts_b = rng.dirichlet(np.ones(3), size=9)
    B0, _ = fes.ref.eval(pts_b @ rv[[1, 2, 3]])
    B1, _ = fes.ref.eval(pts_b @ rv[[0, 1, 2]])
    u0 = B0 @ uu[fes.element_dofs[0]]
    u1 = B1 @ uu[fes.element_dofs[1]]
    assert np.abs(u0 - u1).max() < 1e-12
    # boundary traces at p=4 resolve the face-node dofs too
    tr = BoundaryTrace(ops)
    ff = tr.face_factors()
    uq = jnp.asarray(fes.interpolate(quartic))
    np.testing.assert_allclose(np.asarray(tr.values(uq)),
                               quartic(np.asarray(ff.xq)), atol=1e-12)


def test_tet_uniform_refinement():
    """Bey red refinement: 8 positive-volume children, exact volume
    conservation, boundary tris split 1->4 with attributes kept."""
    from cmfem_tpu.core.mesh import _refine_once

    def tet_vol(verts, conn):
        v = verts[conn]
        return np.linalg.det(v[:, 1:] - v[:, :1]) / 6.0

    m = _two_tet_mesh()
    r = _refine_once(m)
    assert len(r.elem_conn) == 16
    vols = tet_vol(r.vertices, r.elem_conn)
    assert vols.min() > 0
    np.testing.assert_allclose(vols.sum(), 0.5, atol=1e-14)  # 1/6 + 1/3
    assert len(r.bdr_conn) == 4 * len(m.bdr_conn)
    # refined mesh builds a working order-3 space
    fes = FESpace(r, 3)
    u = fes.interpolate(_linear)
    np.testing.assert_allclose(
        np.asarray(u), _linear(fes.node_positions), atol=1e-12)
    # shape quality must NOT degrade with depth (shortest-diagonal rule;
    # a fixed octahedron diagonal decays q_min geometrically)
    def qmin(mm):
        v = mm.vertices[mm.elem_conn]
        vol = np.linalg.det(v[:, 1:] - v[:, :1]) / 6.0
        ee = [np.linalg.norm(v[:, a] - v[:, b], axis=1)
              for a in range(4) for b in range(a + 1, 4)]
        return (6 * np.sqrt(2) * vol / np.max(ee, axis=0)**3).min()

    q1 = qmin(r)
    r3 = _refine_once(_refine_once(r))
    assert qmin(r3) > 0.8 * q1


def test_tet_vtu_lattice_and_save(tmp_path):
    """Tet VTU output: p^3 positive sub-tets per element, valid files."""
    from cmfem_tpu.io.vtu import _lattice, VTUCollection
    from cmfem_tpu.core.reference_elements import TETRAHEDRON

    def tet_vol(verts, conn):
        v = verts[conn]
        return np.linalg.det(v[:, 1:] - v[:, :1]) / 6.0

    for p in (1, 2, 3):
        pts, cells, g = _lattice(TETRAHEDRON, p)
        assert len(cells) == p**3
        vv = tet_vol(pts, cells)
        assert vv.min() > 0
        np.testing.assert_allclose(vv.sum(), 1.0 / 6.0, atol=1e-14)

    m = _two_tet_mesh()
    fes = FESpace(m, 3)
    dc = VTUCollection("tets", fes, prefix_path=str(tmp_path))
    dc.save(0, 0.0, {"u": np.asarray(fes.interpolate(_linear))})
    assert (tmp_path / "tets" / "tets.pvd").exists()
    vtu = next((tmp_path / "tets").glob("*.vtu")).read_text()
    assert 'type="UnstructuredGrid"' in vtu


@pytest.mark.parametrize("order", [1, 2])
def test_tet_boundary_trace(order):
    m = _single_tet_mesh(bdr_rolls=(0, 1, 2, 0), reverse=(1, 3))
    fes = FESpace(m, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    tr = BoundaryTrace(ops)
    u = fes.interpolate(_linear)
    ff = tr.face_factors()
    # surface area: 3 right triangles (1/2) + sqrt(3)/2 hypotenuse face
    area = float(jnp.sum(ff.wdS))
    assert abs(area - (1.5 + np.sqrt(3.0) / 2.0)) < 1e-12
    np.testing.assert_allclose(np.asarray(tr.values(u)),
                               _linear(np.asarray(ff.xq)), atol=1e-12)
    g = np.asarray(tr.grads(u))
    np.testing.assert_allclose(g, np.broadcast_to([1.0, 2.0, 3.0], g.shape),
                               atol=1e-10)
    xq = np.asarray(ff.xq) - 0.2
    assert (np.einsum("fqd,fqd->fq", np.asarray(ff.normal), xq) > 0).all()

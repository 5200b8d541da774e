"""TrackedSampler vs the host locate/sample oracle (core.pointlocate),
on the production 2.2 tri strip, static and receded."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.apps.common import load_mesh_from_cfg
from cmfem_tpu.core import FESpace
from cmfem_tpu.core.pointlocate import (front_depth, locate_points,
                                        sample_h1, sample_h1_grad,
                                        sample_l2)
from cmfem_tpu.core.tracksample import (TrackedSampler,
                                        front_depth_from_samples,
                                        line_points)

CFG = {"mesh_file": "Mesh/ablation_strip_tri_uniform.msh",
       "serial_ref_levels": 0,
       "_yaml_dir": "/root/reference/myapps/convection_diffusion/Input"}


@pytest.fixture(scope="module")
def strip():
    mesh = load_mesh_from_cfg(dict(CFG))
    fes = FESpace(mesh, 1)
    return mesh, fes


def _receded(mesh, amount=8e-4):
    """Vertices moved down near the top, like smoothed recession."""
    v = np.asarray(mesh.vertices).copy()
    y0, y1 = v[:, 1].min(), v[:, 1].max()
    w = np.clip((v[:, 1] - y0) / (y1 - y0), 0.0, 1.0) ** 2
    v[:, 1] -= amount * w
    return v


def test_locate_matches_host(strip):
    mesh, fes = strip
    rng = np.random.default_rng(0)
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(axis=0), v.max(axis=0)
    pts = np.column_stack([
        rng.uniform(lo[0], hi[0], 40),
        rng.uniform(lo[1], hi[1], 40)])
    # include points outside (above top) and exactly the probe column
    pts = np.vstack([pts, [[0.005, hi[1] + 1e-3]],
                     [[0.005, 0.046]], [[0.005, 0.0]]])
    s = TrackedSampler(mesh, pts, y_slack=2e-3)
    for verts in (v, _receded(mesh)):
        eid, ref, found = s.locate(jnp.asarray(verts))
        e_host, r_host = locate_points(mesh, pts, vertices=verts)
        np.testing.assert_array_equal(np.asarray(found), e_host >= 0)
        np.testing.assert_array_equal(np.asarray(eid), e_host)
        f = e_host >= 0
        np.testing.assert_allclose(np.asarray(ref)[f], r_host[f],
                                   atol=1e-8)


def test_sample_h1_grad_l2_match_host(strip):
    mesh, fes = strip
    v0 = np.asarray(mesh.vertices)
    verts = _receded(mesh)
    u = 300.0 + 40.0 * verts[:, 0] - 900.0 * verts[:, 1]
    tau = np.linspace(0.0, 1.0, mesh.elem_conn.shape[0])
    pts = np.array([[0.005, y] for y in
                    [0.0499, 0.046, 0.042, 0.026, 0.0]])
    s = TrackedSampler(mesh, pts, y_slack=2e-3)
    loc = s.locate(jnp.asarray(verts))
    got = np.asarray(s.sample_h1(loc, jnp.asarray(u)))
    want = sample_h1(fes, u, pts, vertices=verts)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9,
                               equal_nan=True)
    gotg = np.asarray(s.sample_grad(loc, jnp.asarray(u),
                                    jnp.asarray(verts)))
    wantg = sample_h1_grad(fes, u, pts, vertices=verts)
    np.testing.assert_allclose(gotg, wantg, rtol=1e-7, atol=1e-9,
                               equal_nan=True)
    gotl = np.asarray(s.sample_l2(loc, jnp.asarray(tau)))
    wantl = sample_l2(mesh, tau, pts, vertices=verts)
    np.testing.assert_allclose(gotl, wantl, rtol=0, atol=0,
                               equal_nan=True)


def test_front_depth_matches_host(strip):
    mesh, fes = strip
    verts = _receded(mesh, 5e-4)
    v = np.asarray(verts)
    lo, hi = v.min(axis=0), v.max(axis=0)
    xmid = 0.5 * (lo[0] + hi[0])
    # a tau field with a sharp front at depth ~12 mm from the surface
    ec = v[mesh.elem_conn].mean(axis=1)
    tau = 1.0 / (1.0 + np.exp(-(hi[1] - 0.012 - ec[:, 1]) / 5e-4))
    want98 = front_depth(mesh, tau, xmid, hi[1], lo[1], 0.98, vertices=v)
    want02 = front_depth(mesh, tau, xmid, hi[1], lo[1], 0.02, vertices=v)
    # fixed line from the INITIAL top; current y_top passed at eval time
    v0 = np.asarray(mesh.vertices)
    pts = line_points(xmid, v0[:, 1].max(), v0[:, 1].min())
    s = TrackedSampler(mesh, pts, y_slack=2e-3)
    loc = s.locate(jnp.asarray(verts))
    vals = s.sample_l2(loc, jnp.asarray(tau))
    ys = jnp.asarray(pts[:, 1])
    got98 = float(front_depth_from_samples(vals, ys, hi[1], 0.98))
    got02 = float(front_depth_from_samples(vals, ys, hi[1], 0.02))
    spacing = (v0[:, 1].max() - v0[:, 1].min()) / 250
    assert abs(got98 - want98) < 2 * spacing
    assert abs(got02 - want02) < 2 * spacing
    assert got98 > 5e-3  # the front is real, not a degenerate 0


def test_front_line_stencil_matches_front_depth(strip):
    """Static-mesh front stencil (case-1/2.1 scan post-chunk path)
    reproduces the per-step front_depth sweep exactly."""
    from cmfem_tpu.core.pointlocate import (front_depth,
                                            front_depth_static,
                                            front_line_stencil)

    mesh, fes = strip
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(axis=0), v.max(axis=0)
    xmid = 0.5 * (lo[0] + hi[0])
    ec = v[mesh.elem_conn].mean(axis=1)
    ids, ys = front_line_stencil(mesh, xmid, hi[1], lo[1])
    for depth in (0.008, 0.02, 0.041):
        tau = 1.0 / (1.0 + np.exp(-(hi[1] - depth - ec[:, 1]) / 5e-4))
        for thr in (0.98, 0.02):
            want = front_depth(mesh, tau, xmid, hi[1], lo[1], thr)
            got = front_depth_static(ids, ys, tau, hi[1], thr)
            assert got == pytest.approx(want, abs=1e-12)

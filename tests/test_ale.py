"""ALE MMS driver: maps, SCL terms, and the identity A/B fixture."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmfem_tpu.motion.ale import AleMap, parse_kind

REF = "/root/reference/myapps/convection_diffusion"


def test_parse_kind():
    assert parse_kind("id") == "identity"
    assert parse_kind("MAP_A") == "accuracy_a"
    with pytest.raises(ValueError):
        parse_kind("bogus")


@pytest.mark.parametrize("kind", ["identity", "accuracy_a", "accuracy_b"])
def test_map_gradient_matches_fd(kind):
    m = AleMap(kind)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (5, 2)))
    t = 0.37
    G = np.asarray(m.gradient(x, t))
    eps = 1e-6
    for d in range(2):
        dx = np.zeros((1, 2))
        dx[0, d] = eps
        fd = (np.asarray(m.map_point(x + dx, t))
              - np.asarray(m.map_point(x - dx, t))) / (2 * eps)
        np.testing.assert_allclose(G[:, :, d], fd, atol=1e-8)
    # det consistency
    J = np.asarray(m.jacobian_det(x, t))
    np.testing.assert_allclose(J, np.linalg.det(G), atol=1e-12)
    # the reference's "cofactor" is the adjugate: C = J * G^{-1}
    # (MapCofactor, diffusion_mms_ale.cpp:290-299)
    C = np.asarray(m.cofactor(x, t))
    np.testing.assert_allclose(C, J[:, None, None] * np.linalg.inv(G),
                               atol=1e-12)


@pytest.mark.parametrize("kind", ["accuracy_a", "accuracy_b"])
def test_integrated_flux_divergence_consistency(kind):
    """div_phi_hat matches FD divergence of phi_hat."""
    m = AleMap(kind)
    x = jnp.asarray([[0.3, 0.7], [0.6, 0.2]])
    t0, t1 = 0.1, 0.18
    _, div = m.integrated_grid_flux(x, t0, t1)
    eps = 1e-6
    div_fd = np.zeros(2)
    for d in range(2):
        dx = np.zeros((1, 2))
        dx[0, d] = eps
        pp, _ = m.integrated_grid_flux(x + dx, t0, t1)
        pm, _ = m.integrated_grid_flux(x - dx, t0, t1)
        div_fd += (np.asarray(pp)[:, d] - np.asarray(pm)[:, d]) / (2 * eps)
    np.testing.assert_allclose(np.asarray(div), div_fd, atol=1e-8)


def test_boundary_stays_on_boundary():
    """The maps keep boundary points on the boundary: map B fixes them,
    map A may slide them tangentially but never moves them off the edge."""
    m = AleMap("accuracy_b")
    xb = jnp.asarray([[0.0, 0.3], [1.0, 0.8], [0.5, 0.0], [0.2, 1.0]])
    np.testing.assert_allclose(np.asarray(m.map_point(xb, 0.33)),
                               np.asarray(xb), atol=1e-14)
    ma = AleMap("accuracy_a")
    mapped = np.asarray(ma.map_point(xb, 0.33))
    # normal components fixed (x=0/1 edges keep x; y=0/1 edges keep y)
    assert abs(mapped[0, 0] - 0.0) < 1e-14
    assert abs(mapped[1, 0] - 1.0) < 1e-14
    assert abs(mapped[2, 1] - 0.0) < 1e-14
    assert abs(mapped[3, 1] - 1.0) < 1e-14


@pytest.mark.slow
def test_ale_identity_matches_static(tmp_path):
    """The reference's explicit A/B fixture (diffusion_mms_ale.cpp:21):
    ale_map=identity reproduces the static MMS driver."""
    from cmfem_tpu.apps.diffusion_mms_ale import run as run_ale
    from cmfem_tpu.apps.diffusion_mms import run as run_static

    base = dict(mesh_file=f"{REF}/Mesh/unit_square.msh", order=1,
                alpha=0.1, dt=0.05, t_final=0.15, save_paraview=False)
    oa = run_ale({**base, "ale_map": "identity",
                  "output_path": str(tmp_path / "ale")})
    os_ = run_static({**base, "output_path": str(tmp_path / "static")})
    assert np.abs(oa["u"] - os_["u"]).max() < 1e-8


@pytest.mark.slow
def test_ale_moving_map_accuracy(tmp_path):
    from cmfem_tpu.apps.diffusion_mms_ale import run as run_ale

    out = run_ale({
        "mesh_file": f"{REF}/Mesh/unit_square.msh", "order": 1,
        "serial_ref_levels": 1, "alpha": 0.1, "dt": 0.05, "t_final": 0.25,
        "ale_map": "accuracy_b", "save_paraview": False,
        "output_path": str(tmp_path)})
    # order-1, dt=0.05, moving domain: a few permille
    assert out["final_l2"] < 2e-2

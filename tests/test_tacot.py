"""TACOT material model tests against independent references:
- natural splines vs scipy.interpolate.CubicSpline(bc_type='natural')
- implicit extent solve satisfies its own equation
- custom_jvp derivative vs finite differences
- physical sanity of blended properties on the shipped case-1 deck
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.interpolate import CubicSpline

from cmfem_tpu.physics.tacot import (
    TacotMaterial, PropertyTable, natural_spline_y2, spline_eval,
)

MAT1 = "/root/reference/myapps/convection_diffusion/Input/material_tacot_case1.yaml"


@pytest.fixture(scope="module")
def mat():
    return TacotMaterial.load_yaml(MAT1)


def test_natural_spline_matches_scipy():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 15))
    y = np.sin(x) + 0.1 * rng.standard_normal(15)
    y2 = natural_spline_y2(x, y)
    cs = CubicSpline(x, y, bc_type="natural")
    xq = np.linspace(x[0] + 1e-6, x[-1] - 1e-6, 200)
    v, d, cl = spline_eval(x, jnp.asarray(y), jnp.asarray(y2), jnp.asarray(xq))
    np.testing.assert_allclose(np.asarray(v), cs(xq), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d), cs(xq, 1), atol=1e-10)
    assert not np.any(np.asarray(cl))
    # clamping outside the range
    v2, d2, cl2 = spline_eval(x, jnp.asarray(y), jnp.asarray(y2),
                              jnp.asarray([x[0] - 1, x[-1] + 1]))
    np.testing.assert_allclose(np.asarray(v2), [y[0], y[-1]], atol=1e-14)
    assert np.all(np.asarray(cl2)) and np.all(np.asarray(d2) == 0)


def test_table_pressure_interpolation(mat):
    """Gas table: value at a level matches that level's spline; between
    levels it's the linear blend."""
    t = mat.gas
    T = 1500.0
    for li, p in enumerate(t.p_levels):
        v = float(t.eval(0, p, T))
        cs = CubicSpline(t.T, t.y[li, 0], bc_type="natural")
        # exact-level query uses forward interval; value identical anyway
        np.testing.assert_allclose(v, float(cs(T)), rtol=1e-12)
    p_mid = 0.5 * (t.p_levels[1] + t.p_levels[2])
    v_mid = float(t.eval(0, p_mid, T))
    v1 = float(t.eval(0, t.p_levels[1], T))
    v2 = float(t.eval(0, t.p_levels[2], T))
    np.testing.assert_allclose(v_mid, 0.5 * (v1 + v2), rtol=1e-12)


def test_property_table_ragged_levels():
    """Per-pressure-level T grids of different counts/positions (ragged,
    as the reference's MultiTable2D supports — tacot_material.cpp:693-865)
    must evaluate as per-level splines over each level's own rows,
    linearly blended in p; clamping is per level."""
    t = PropertyTable.from_yaml_node({
        "pressure_tables": [
            {"p": 1.0e3, "rows": [[300.0, 1.0], [600.0, 2.0],
                                  [900.0, 2.5], [1500.0, 4.0]]},
            {"p": 1.0e5, "rows": [[400.0, 10.0], [800.0, 12.0],
                                  [1600.0, 15.0], [2400.0, 16.0],
                                  [3200.0, 18.0]]},
        ]}, 1)
    assert not t.uniform
    assert t.T_tab.shape == (2, 5)
    # per-level values match scipy natural splines on that level's rows
    cs0 = CubicSpline([300.0, 600.0, 900.0, 1500.0], [1.0, 2.0, 2.5, 4.0],
                      bc_type="natural")
    cs1 = CubicSpline([400.0, 800.0, 1600.0, 2400.0, 3200.0],
                      [10.0, 12.0, 15.0, 16.0, 18.0], bc_type="natural")
    Tq = 700.0
    v_mid = float(t.eval(0, 0.5 * (1.0e3 + 1.0e5), Tq))
    np.testing.assert_allclose(v_mid, 0.5 * (cs0(Tq) + cs1(Tq)),
                               rtol=1e-12)
    # level-1's range extends beyond level-0's: at 2000 K level 0 clamps
    # to its 1500 K end value while level 1 interpolates
    v, dp, dT, cp, cT = t.eval(0, 0.5 * (1.0e3 + 1.0e5), 2000.0,
                               with_derivs=True)
    np.testing.assert_allclose(float(v), 0.5 * (4.0 + cs1(2000.0)),
                               rtol=1e-12)
    np.testing.assert_allclose(float(dT), 0.5 * (0.0 + cs1(2000.0, 1)),
                               rtol=1e-12)
    assert bool(cT)          # a contributing level clamped


def test_spline_eval_multi_chunked_matches_unchunked(monkeypatch):
    """Above CMFEM_SPLINE_ONEHOT_MAX the multi-level spline eval chunks
    the query axis through lax.map (the one-hot working set OOM'd the
    refine-3 ablation residual at 22 GB on-chip); results must be
    bit-identical to the unchunked path."""
    import jax.numpy as jnp

    from cmfem_tpu.physics.tacot import natural_spline_y2, \
        spline_eval_multi

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(200.0, 4000.0, 40))
    ys = rng.standard_normal((5, 40))
    y2s = natural_spline_y2(x, ys)
    Tq = rng.uniform(150.0, 4200.0, (37, 9))
    ref = spline_eval_multi(x, ys, y2s, jnp.asarray(Tq))
    monkeypatch.setenv("CMFEM_SPLINE_ONEHOT_MAX", "1000")
    chunked = spline_eval_multi(x, ys, y2s, jnp.asarray(Tq))
    # same selection, same formula; only last-ulp dot reassociation
    # differs between the chunked and whole-array contraction shapes
    np.testing.assert_allclose(np.asarray(ref[0]),
                               np.asarray(chunked[0]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ref[1]),
                               np.asarray(chunked[1]),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_array_equal(np.asarray(ref[2]),
                                  np.asarray(chunked[2]))


def test_reaction_extents_satisfy_implicit_equation(mat):
    T = jnp.asarray([300.0, 600.0, 900.0, 1500.0, 3000.0])
    dt = 0.1
    x_old = jnp.zeros((5, mat.num_reactions))
    x = mat.solve_reaction_extents(T, dt, x_old)
    assert x.shape == (5, mat.num_reactions)
    x_np = np.asarray(x)
    # extents are monotone in T and within [x_old, 1]
    assert (x_np >= 0).all() and (x_np <= 1).all()
    assert (np.diff(x_np, axis=0) >= -1e-12).all()
    # cold temperatures below threshold: no progress
    assert np.allclose(x_np[0], 0.0)
    # implicit equation residual where unclamped
    rate = np.asarray(mat._extent_rate(x, T))
    f = x_np - np.asarray(x_old) - dt * rate
    unclamped = (x_np > 1e-12) & (x_np < 1 - 1e-12)
    assert np.abs(f[unclamped]).max() < 1e-10


def test_extent_jvp_vs_fd(mat):
    T0 = 800.0
    dt = 0.05
    x_old = jnp.asarray([[0.1, 0.05, 0.02]])

    def f(T):
        return mat.solve_reaction_extents(jnp.asarray([T]), dt, x_old)

    eps = 1e-4
    fd = (np.asarray(f(T0 + eps)) - np.asarray(f(T0 - eps))) / (2 * eps)
    _, jvp = jax.jvp(lambda T: mat.solve_reaction_extents(T, dt, x_old),
                     (jnp.asarray([T0]),), (jnp.ones(1),))
    np.testing.assert_allclose(np.asarray(jvp), fd, rtol=1e-5, atol=1e-10)


def test_solid_props_sanity(mat):
    T = jnp.asarray([300.0, 1000.0, 2500.0])
    p = jnp.full(3, 101325.0)
    nr = mat.num_reactions
    virgin_state = jnp.zeros((3, nr))
    char_state = jnp.ones((3, nr))

    sv = mat.solid_props(T, p, virgin_state)
    sc = mat.solid_props(T, p, char_state)
    np.testing.assert_allclose(np.asarray(sv["tau"]), 1.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(sc["tau"]), 0.0, atol=1e-14)
    np.testing.assert_allclose(float(sv["rho_s"][0]), mat.initial_solid_density())
    np.testing.assert_allclose(float(sc["rho_s"][0]), mat.char_solid_density())
    # permeability / porosity blending
    np.testing.assert_allclose(float(sv["K"][0]), mat.K_v)
    np.testing.assert_allclose(float(sc["K"][0]), mat.K_c)
    assert (np.asarray(sv["cp"]) > 0).all()
    assert (np.asarray(sv["k"]) > 0).all()

    # pyrolysis rates from a state change
    dt = 0.1
    x_new = jnp.full((3, nr), 0.5)
    sp = mat.solid_props(T, p, x_new, extent_old=virgin_state, dt=dt)
    expect_total = float(np.sum(mat.rho_eps0[mat.phase] * mat.F * 0.5) / dt)
    np.testing.assert_allclose(np.asarray(sp["pi_total"]), expect_total,
                               rtol=1e-12)


def test_gas_props_ideal_gas(mat):
    T = jnp.asarray([500.0, 2000.0])
    p = jnp.asarray([1000.0, 101325.0])
    g = mat.gas_props(T, p)
    M = np.asarray(g["M"])
    rho = np.asarray(g["rho"])
    np.testing.assert_allclose(rho, np.asarray(p) * M / (mat.R * np.asarray(T)),
                               rtol=1e-12)
    assert (M > 1e-3).all() and (M < 1.0).all()  # kg/mol


def test_material_yaml_validation(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("constants: {R: 8.314}\n")
    with pytest.raises(ValueError):
        TacotMaterial.load_yaml(str(bad))


def test_surface_optics_tables(tmp_path):
    """Optional PATO surface-optics files: 9-column virgin/char files keyed
    by source.path load into (p,T) emissivity/reflectivity tables blended
    by the virgin weight; absent or partial files fall back to 0.85/0.15."""
    import shutil

    optics_dir = tmp_path / "TACOT"
    optics_dir.mkdir()
    # p T cp h ki kj kk emissivity reflectivity (2 p-levels x 3 T rows)
    rows_v, rows_c = [], []
    for p in (1e4, 1e5):
        for T in (300.0, 1500.0, 3000.0):
            rows_v.append(f"{p} {T} 1 2 3 4 5 {0.6 + 1e-5 * T} 0.3 // v")
            rows_c.append(f"{p} {T} 1 2 3 4 5 {0.9 - 1e-5 * T} 0.1")
    (optics_dir / "virgin").write_text("\n".join(rows_v))
    (optics_dir / "char").write_text("\n".join(rows_c))

    src = yaml_path = tmp_path / "mat.yaml"
    base = open(MAT1).read()
    # repoint the source path at our synthetic optics deck
    import re
    patched = re.sub(r"source:\n  path: .*",
                     f"source:\n  path: {optics_dir}", base, count=1)
    yaml_path.write_text(patched)
    mat = TacotMaterial.load_yaml(str(yaml_path))
    assert mat.virgin_optics is not None and mat.char_optics is not None

    T = jnp.asarray([1500.0])
    p = jnp.asarray([5e4])
    X0 = jnp.zeros((1, mat.num_reactions))  # fully virgin: tau = 1
    s = mat.solid_props(T, p, X0)
    # virgin weight ~ 1 -> emissivity ~ virgin table = 0.6 + 1e-5*1500
    np.testing.assert_allclose(float(s["emissivity"][0]), 0.615, atol=1e-3)
    np.testing.assert_allclose(float(s["reflectivity"][0]), 0.3, atol=1e-3)
    np.testing.assert_allclose(float(s["absorptivity"][0]), 0.7, atol=1e-3)
    X1 = jnp.ones((1, mat.num_reactions))   # fully charred
    sc = mat.solid_props(T, p, X1)
    assert float(sc["emissivity"][0]) > float(s["emissivity"][0])  # char ~0.875

    # partial deck (virgin only) -> fallback, matching the reference's
    # both-or-nothing rule
    (optics_dir / "char").unlink()
    mat2 = TacotMaterial.load_yaml(str(yaml_path))
    assert mat2.virgin_optics is None
    s2 = mat2.solid_props(T, p, X0)
    np.testing.assert_allclose(float(s2["emissivity"][0]), 0.85, atol=1e-12)

    # the shipped decks point at an absent author-local path -> fallback
    mat3 = TacotMaterial.load_yaml(MAT1)
    assert mat3.virgin_optics is None

"""DIRK time integration (solvers/timeint.py).

The reference steps everything with backward Euler
(diffusion_mms.cpp:301-305); BASELINE.json config #4 additionally names
SDIRK stepping for the time-dependent convection-diffusion path.  These
tests pin the tableau algebra, the ODE convergence orders, and the
driver-level behavior of `time_integrator: sdirk2|sdirk3`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmfem_tpu.solvers.timeint import (
    get_tableau, make_linear_dirk_step, stage_times,
)
from cmfem_tpu.ops import EssentialBC

REF = "/root/reference/myapps/convection_diffusion"


def test_tableau_order_conditions():
    for name in ("be", "sdirk2", "sdirk3"):
        t = get_tableau(name)
        A = np.array(t.A)
        b = np.array(t.b)
        c = np.array(t.c)
        # consistency + row sums
        np.testing.assert_allclose(A.sum(1), c, atol=1e-14)
        np.testing.assert_allclose(b.sum(), 1.0, atol=1e-14)
        # constant diagonal (the property the shared stage operator uses)
        assert all(abs(A[i, i] - t.gamma) < 1e-15 for i in range(t.stages))
        assert t.stiffly_accurate
        if t.order >= 2:
            np.testing.assert_allclose(b @ c, 0.5, atol=1e-14)
        if t.order >= 3:
            np.testing.assert_allclose(b @ c**2, 1.0 / 3.0, atol=1e-14)
            np.testing.assert_allclose(b @ A @ c, 1.0 / 6.0, atol=1e-14)
    with pytest.raises(ValueError):
        get_tableau("rk4")


class _Direct:
    def __init__(self, x):
        self.x = x
        self.iters = 0


def _ode_error(name, dt):
    """M u' + K u = f on [0,1], stiff upper-triangular K, exact
    u = [sin t, cos 2t]; direct stage solves isolate the tableau."""
    tab = get_tableau(name)
    K = jnp.array([[50.0, 1.0], [0.0, 50.0]])

    def f(t):
        ue = jnp.array([jnp.sin(t), jnp.cos(2 * t)])
        ud = jnp.array([jnp.cos(t), -2 * jnp.sin(2 * t)])
        return ud + K @ ue

    bc = EssentialBC(2, np.array([], dtype=np.int64))
    Sm = jnp.asarray(np.eye(2) + tab.gamma * dt * np.asarray(K))
    solve = lambda op, B, x0: _Direct(jnp.linalg.solve(Sm, B))
    apply_S = lambda v: v + (tab.gamma * dt) * (K @ v)
    step = make_linear_dirk_step(tab, dt, lambda v: v, apply_S, bc, solve)

    u = jnp.array([0.0, 1.0])
    t = 0.0
    for _ in range(int(round(1.0 / dt))):
        ts = stage_times(tab, t, dt)
        fs = jnp.stack([f(ti) for ti in ts])
        u, _ = step(u, fs, jnp.zeros((tab.stages, 0)))
        t += dt
    ue = np.array([np.sin(1.0), np.cos(2.0)])
    return float(np.abs(np.asarray(u) - ue).max())


@pytest.mark.parametrize("name,dts,min_rate", [
    ("be", (0.02, 0.01), 0.95),
    ("sdirk2", (0.02, 0.01), 1.85),
    ("sdirk3", (0.005, 0.0025), 2.7),
])
def test_ode_convergence_order(name, dts, min_rate):
    e0, e1 = (_ode_error(name, dt) for dt in dts)
    rate = np.log2(e0 / e1)
    assert rate > min_rate, (name, e0, e1, rate)


def _mms_err(ti, dt):
    from cmfem_tpu.apps.diffusion_mms import run

    out = run({"mesh_file": f"{REF}/Mesh/unit_square.msh", "order": 3,
               "alpha": 1.0, "dt": dt, "t_final": 0.4,
               "time_integrator": ti, "save_paraview": False,
               "output_path": "/tmp/test_timeint_mms",
               "solver_rtol": 1e-12})
    return out["final_l2"]


@pytest.mark.slow
def test_diffusion_mms_sdirk_driver_rates():
    """Driver-level dt-convergence: sdirk2 shows order 2 (BE's measured
    rate on the same sweep is 0.93), and sdirk3 with its
    derivative-consistent stage BCs beats sdirk2 at equal dt (measured
    8.4e-7 vs 5.7e-6 at dt=0.05; spatial floor 2.8e-8)."""
    e2a, e2b = _mms_err("sdirk2", 0.1), _mms_err("sdirk2", 0.05)
    rate2 = np.log2(e2a / e2b)
    assert rate2 > 1.9, (e2a, e2b, rate2)
    e3b = _mms_err("sdirk3", 0.05)
    assert e3b < e2b / 3.0, (e3b, e2b)


@pytest.mark.slow
def test_transient_cd_sdirk2_beats_be():
    """The 3-Peclet erfc problem is sqrt(t)-singular at t=0 (so no clean
    order line), but value-mode SDIRK2 still cuts the per-step error by
    well over an order of magnitude vs BE at dt=0.01 (measured 1.5e-4 /
    3.1e-4 / 2.5e-3 vs BE 1.2e-2 / 2.6e-2 / 6.3e-2)."""
    from cmfem_tpu.apps.linear_cd_transient import run

    base = {"mesh_file": f"{REF}/Mesh/unit_square.msh", "order": 2,
            "dt": 0.01, "t_final": 0.05, "save_paraview": False,
            "output_path": "/tmp/test_timeint_cdt"}
    e_be = run({**base, "time_integrator": "be"})["final_errors"]
    e_s2 = run({**base, "time_integrator": "sdirk2"})["final_errors"]
    for idx in (3, 5, 7):   # rel-L2 of the three Pe blocks
        assert e_s2[idx] < e_be[idx] / 5.0, (idx, e_s2[idx], e_be[idx])

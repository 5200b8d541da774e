"""Element-sharded ablation Newton step (parallel/ablation_sharded.py) on
the 8-device virtual CPU mesh: the multichip analog of running the
reference ablation drivers under mpirun (SURVEY.md §2.4 / §3.4)."""

import numpy as np
import pytest

REF = "/root/reference/myapps/convection_diffusion"


@pytest.fixture(scope="module")
def small_problem():
    import jax.numpy as jnp

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState

    # small TACOT strip, heated top (attr 3 in the generator)
    mesh = make_cartesian_mesh_2d(3, 7, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([3]))
    T = jnp.full(n, 300.0).at[jnp.asarray(ess)].set(1200.0)
    p = jnp.full(n, 101325.0)
    dt = 0.05
    T_old_q = ops.values_at_qp(jnp.full(n, 300.0))
    p_old_q = ops.values_at_qp(p)
    return sys_, fes, n, ess, T, p, T_old_q, p_old_q, state.extent, dt


def test_sharded_residual_matches_single_device(small_problem):
    import jax
    import jax.numpy as jnp

    from cmfem_tpu.parallel import ShardedAblationNewton, make_device_mesh

    sys_, fes, n, ess, T, p, T_old_q, p_old_q, X_old, dt = small_problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    sh = ShardedAblationNewton(sys_, dev_mesh, ess, ess)
    # ne=21 is NOT a multiple of 8 -> exercises the zero-weight padding
    assert sh.ne_pad % dev_mesh.devices.size == 0 and sh.ne_pad != sh.ne

    RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X_old, dt)
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    R_ref = np.where(mask2, 0.0,
                     np.concatenate([np.asarray(RT), np.asarray(Rp)]))

    R_sh = np.asarray(sh.residual(T, p, sh.pad_elem(T_old_q),
                                  sh.pad_elem(p_old_q), sh.pad_elem(X_old),
                                  dt))
    scale = np.abs(R_ref).max()
    assert np.abs(R_sh - R_ref).max() / scale < 1e-12


def test_sharded_newton_step_matches_single_device(small_problem):
    import jax
    import jax.numpy as jnp

    from cmfem_tpu.parallel import ShardedAblationNewton, make_device_mesh
    from cmfem_tpu.solvers import BlockNewtonKrylov

    sys_, fes, n, ess, T, p, T_old_q, p_old_q, X_old, dt = small_problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    sh = ShardedAblationNewton(sys_, dev_mesh, ess, ess, restart=200,
                               maxiter=10)

    # single-device oracle: same residual + equilibrated block GMRES
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X_old, dt)
    R = jnp.where(jnp.asarray(mask2), 0.0, jnp.concatenate([RT, Rp]))
    blocks = sys_.element_jacobians(T, p, T_old_q, p_old_q, X_old, dt)
    bks = BlockNewtonKrylov(fes.element_dofs, n, ess, ess, restart=200,
                            maxiter=10)
    res_ref = bks.solve(bks.prepare(blocks), -R, rtol=1e-12)
    assert bool(res_ref.converged)
    dx_ref = np.asarray(res_ref.x)

    To_s, po_s, Xo_s = (sh.pad_elem(T_old_q), sh.pad_elem(p_old_q),
                        sh.pad_elem(X_old))
    T1, p1, Rnorm, cycles = sh.newton_step(T, p, To_s, po_s, Xo_s, dt,
                                           rtol=1e-12)
    dx_sh = np.concatenate([np.asarray(T1 - T), np.asarray(p1 - p)])
    num = np.linalg.norm(dx_sh - dx_ref)
    den = np.linalg.norm(dx_ref)
    assert num / den < 1e-6, num / den
    assert float(Rnorm) == pytest.approx(float(jnp.linalg.norm(R)),
                                         rel=1e-12)
    # essential dofs stay pinned
    assert np.abs(np.asarray(T1)[ess] - np.asarray(T)[ess]).max() == 0.0


def test_sharded_two_newton_iterations_reduce_residual(small_problem):
    import jax

    from cmfem_tpu.parallel import ShardedAblationNewton, make_device_mesh

    sys_, fes, n, ess, T, p, T_old_q, p_old_q, X_old, dt = small_problem
    dev_mesh = make_device_mesh(len(jax.devices()))
    sh = ShardedAblationNewton(sys_, dev_mesh, ess, ess, restart=200,
                               maxiter=10)
    To_s, po_s, Xo_s = (sh.pad_elem(T_old_q), sh.pad_elem(p_old_q),
                        sh.pad_elem(X_old))
    hist = []
    for _ in range(6):
        T, p, r, _ = sh.newton_step(T, p, To_s, po_s, Xo_s, dt, rtol=1e-12)
        hist.append(float(r))
    # distributed Newton converges on the coupled nonlinear system (an
    # early overshoot is normal for the undamped iteration — the drivers'
    # loop behaves identically)
    assert hist[-1] < 1e-6 * hist[0], hist

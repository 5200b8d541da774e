"""Working-precision stopping: GMRES noise-floor clamp + stagnation exit
and the Newton stall exit (VERDICT r2 #1 enabler).

On the f32 chip the production decks' f64 tolerances (linear_rtol 1e-10,
newton_rel_tol 1e-6) are unreachable; without these exits every ablation
scan step burned newton_max_iter x restart x gmres_maxiter Krylov
iterations (measured 5.1 s per Newton iteration on-chip) and a 200-step
chunk became hours of device time in one XLA program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmfem_tpu.apps.common import check_linear_result, scan_newton
from cmfem_tpu.solvers.krylov import SolveResult, gmres
from cmfem_tpu.solvers.newton import NewtonConfig, newton_solve


def _spd_system(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    x = rng.standard_normal(n)
    return (jnp.asarray(A, dtype), jnp.asarray(x, dtype),
            jnp.asarray(A @ x, dtype))


def test_gmres_f32_floor_bounds_iterations():
    """rtol far below f32 eps must not burn restart*maxiter iterations:
    the tolerance is clamped at 16 eps |b| and the solve exits there."""
    A, x, b = _spd_system(48, jnp.float32)
    res = gmres(lambda v: A @ v, b, rtol=1e-14, restart=48, maxiter=10)
    # full-rank 48-dim system: one 48-step cycle reaches the floor
    assert int(res.inner_iters) <= 2 * 48
    assert bool(res.converged) or bool(res.stagnated)
    err = float(jnp.linalg.norm(res.x - x) / jnp.linalg.norm(x))
    assert err < 1e-4


def test_gmres_f64_semantics_unchanged():
    A, x, b = _spd_system(48, jnp.float64)
    res = gmres(lambda v: A @ v, b, rtol=1e-12, restart=48, maxiter=10)
    assert bool(res.converged)
    assert not bool(res.stagnated)
    err = float(jnp.linalg.norm(res.x - x) / jnp.linalg.norm(x))
    assert err < 1e-10


def test_gmres_stagnation_flag_on_cycle_cap():
    """A solve stopped by the cycle cap while still progressing must NOT
    be flagged stagnated (callers raise with the gmres_maxiter hint)."""
    A, x, b = _spd_system(64, jnp.float64, seed=3)
    res = gmres(lambda v: A @ v, b, rtol=1e-13, restart=4, maxiter=2)
    assert not bool(res.converged)
    assert not bool(res.stagnated)


def test_scan_newton_stall_exit_accepts_floor():
    """A residual that floors above rel_tol but below stall_accept_rel
    exits after stall_patience non-improving iterations, done=True."""
    n = 4

    def residual(T, p):
        return jnp.full(2 * n, 1.0e-4)

    def solve(T, p, R):
        return T, p, jnp.asarray(0.0), True

    T0 = jnp.zeros(n)
    (T, p, it, r0, rn, done, res_h, upd_h, lin_ok) = jax.jit(
        lambda T, p: scan_newton(T, p, residual=residual, solve=solve,
                                 abs_tol=1e-10, rel_tol=1e-8, max_iter=20)
    )(T0, T0)
    assert bool(done)
    # 3 residual checks: it0 improves (from inf), it1/it2 stall
    assert int(it) == 3
    assert bool(lin_ok)
    assert float(rn) == pytest.approx(1.0e-4 * np.sqrt(2 * n))


def test_scan_newton_divergence_still_fails_fast():
    """rel residual above stall_accept_rel never stall-exits: the loop
    runs to max_iter and reports done=False (reference fail-fast)."""
    n = 4

    def residual(T, p):
        return jnp.full(2 * n, 0.5)

    def solve(T, p, R):
        # nonzero update: Newton keeps moving but never improves
        return T + 0.1, p, jnp.asarray(0.1 * np.sqrt(n)), True

    T0 = jnp.ones(n)
    (T, p, it, r0, rn, done, *_rest) = jax.jit(
        lambda T, p: scan_newton(T, p, residual=residual, solve=solve,
                                 abs_tol=1e-10, rel_tol=1e-8, max_iter=7)
    )(T0, T0)
    assert not bool(done)
    assert int(it) == 7


def test_scan_newton_converged_path_unchanged():
    """A healthy quadratic solve converges by tolerance, not stall."""
    target = jnp.asarray([2.0, -1.0, 0.5])

    def residual(T, p):
        return jnp.concatenate([T - target, p])

    def solve(T, p, R):
        dx = -R
        return T + dx[:3], p + dx[3:], jnp.linalg.norm(dx), True

    T0 = jnp.zeros(3)
    (T, p, it, r0, rn, done, *_rest) = scan_newton(
        T0, T0, residual=residual, solve=solve,
        abs_tol=1e-10, rel_tol=1e-8, max_iter=20)
    assert bool(done)
    assert int(it) == 2  # one solve + the converged check
    np.testing.assert_allclose(np.asarray(T), np.asarray(target), atol=1e-12)


def test_newton_solve_stall_exit():
    """The host harness stall-exits at the floor with converged=True."""
    calls = {"n": 0}

    def residual(x):
        calls["n"] += 1
        return jnp.full(3, 2.0e-4)

    x, result = newton_solve(
        residual, jnp.zeros(3),
        solve_linear=lambda x, rhs, jac: jnp.zeros(3),
        config=NewtonConfig(abs_tol=1e-12, rel_tol=1e-8, max_iter=25))
    assert result.converged
    assert result.iterations == 2
    # and genuine divergence (non-negligible updates, no residual
    # improvement, rel >= stall_accept_rel) still fails
    x, result = newton_solve(
        lambda x: jnp.full(3, 0.7), jnp.ones(3),
        solve_linear=lambda x, rhs, jac: jnp.full(3, 0.2),
        config=NewtonConfig(abs_tol=1e-12, rel_tol=1e-8, max_iter=5))
    assert not result.converged


def test_scan_newton_stol_accepts_negligible_update():
    """PETSc SNESConvergedDefault SNORM semantics: a numerically
    negligible update (|dx| <= stall_dx_rtol |x|) with a stagnant
    residual is accepted even when the step STARTED at the floor
    (r0 ~ rn, rel ~ 1) — the quiescent-step case the relative
    criterion cannot cover."""
    n = 4

    def residual(T, p):
        return jnp.full(2 * n, 15.0)  # floor from the start

    def solve(T, p, R):
        return T, p, jnp.asarray(1.0e-18), True  # negligible update

    T0 = jnp.full(n, 1.0e5)
    (T, p, it, r0, rn, done, *_rest) = scan_newton(
        T0, T0, residual=residual, solve=solve,
        abs_tol=1e-10, rel_tol=1e-8, max_iter=20)
    assert bool(done)
    assert int(it) <= 4


def test_check_linear_result_arbitration():
    ok = SolveResult(jnp.zeros(2), jnp.asarray(3), jnp.asarray(1e-12),
                     jnp.asarray(True), 30, jnp.asarray(False))
    check_linear_result(ok, "t")  # no raise
    stag = SolveResult(jnp.zeros(2), jnp.asarray(3), jnp.asarray(1e-5),
                       jnp.asarray(False), 30, jnp.asarray(True))
    check_linear_result(stag, "t")  # warning only
    hard = SolveResult(jnp.zeros(2), jnp.asarray(10), jnp.asarray(1e-1),
                       jnp.asarray(False), 400, jnp.asarray(False))
    with pytest.raises(RuntimeError, match="did not converge"):
        check_linear_result(hard, "t")

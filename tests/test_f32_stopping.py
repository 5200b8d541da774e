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
    (T, p, it, r0, rn, done, res_h, upd_h, lin_ok, nw_stalled) = jax.jit(
        lambda T, p: scan_newton(T, p, residual=residual, solve=solve,
                                 abs_tol=1e-10, rel_tol=1e-8, max_iter=20)
    )(T0, T0)
    assert bool(done)
    # 3 residual checks: it0 improves (from inf), it1/it2 stall
    assert int(it) == 3
    assert bool(lin_ok)
    assert float(rn) == pytest.approx(1.0e-4 * np.sqrt(2 * n))


def test_scan_newton_flat_residual_accepted_as_floor():
    """SEMANTIC CHANGE with stall criterion (c): a residual that stays
    FLAT while Newton keeps producing nonzero updates is accepted as the
    working-precision evaluation floor (small-dt f32 regime of the
    production case-2.2 deck) instead of failing at max_iter.  Genuine
    divergence — a RISING residual — still fails fast
    (test_scan_newton_flat_stall_rejects_divergence)."""
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
    assert bool(done)
    assert int(it) <= 4
    # disabling criterion (c) restores the old fail-fast behavior
    (T, p, it, r0, rn, done, *_rest) = jax.jit(
        lambda T, p: scan_newton(T, p, residual=residual, solve=solve,
                                 abs_tol=1e-10, rel_tol=1e-8, max_iter=7,
                                 stall_flat_factor=0.0)
    )(T0, T0)
    assert not bool(done)


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
    # a FLAT non-improving residual is now accepted as the evaluation
    # floor (stall criterion (c)); disabling it restores old fail-fast
    x, result = newton_solve(
        lambda x: jnp.full(3, 0.7), jnp.ones(3),
        solve_linear=lambda x, rhs, jac: jnp.full(3, 0.2),
        config=NewtonConfig(abs_tol=1e-12, rel_tol=1e-8, max_iter=5,
                            stall_flat_factor=0.0))
    assert not result.converged
    # genuine divergence (rising residual) never flat-exits
    state = {"r": 0.5}

    def rising(x):
        state["r"] *= 1.4
        return jnp.full(3, state["r"])

    x, result = newton_solve(
        rising, jnp.ones(3),
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


def test_scan_newton_flat_stall_accepts_evaluation_floor():
    """Criterion (c): the residual floors FLAT at a value well above
    stall_accept_rel * r0 (the small-dt f32 regime of the production
    case-2.2 deck, where the evaluation floor sits only ~4x below R0 and
    criteria (a)/(b) can never fire).  Synthetic residual with an exact
    floor f: R = sign(T - T*) * max(|T - T*|, f)."""
    import jax.numpy as jnp

    from cmfem_tpu.apps.common import scan_newton

    n = 8
    Tstar = jnp.full(n, 2.0)
    f = 0.25  # per-dof floor

    def residual(T, p):
        d = T - Tstar
        Rt = jnp.sign(jnp.where(d == 0, 1.0, d)) * jnp.maximum(
            jnp.abs(d), f)
        return jnp.concatenate([Rt, jnp.zeros(n)])

    def solve(T, p, R):
        dT = R[:n]
        return T - dT, p, jnp.linalg.norm(dT), True

    # start 4 floors away: r0 = max(1, |R0|) ~ 4f sqrt(n), floor rel ~ 0.25
    T0 = Tstar + 4 * f
    (T, p, it, r0, rn, done, *_rest) = scan_newton(
        T0, jnp.zeros(n), residual=residual, solve=solve,
        abs_tol=1e-10, rel_tol=1e-8, max_iter=20,
        stall_accept_rel=1e-3)  # (a) can never fire
    assert bool(done)
    assert int(it) <= 6
    # accepted at the floor, not below it
    assert float(rn) == pytest.approx(f * np.sqrt(n), rel=1e-6)


def test_scan_newton_flat_stall_rejects_divergence():
    """A rising residual must NOT flat-exit: fail-fast is preserved."""
    import jax.numpy as jnp

    from cmfem_tpu.apps.common import scan_newton

    n = 4

    def residual(T, p):
        # grows 1.3x per accepted update
        return jnp.concatenate([T, jnp.zeros(n)])

    def solve(T, p, R):
        T_new = 1.3 * T  # diverges
        return T_new, p, jnp.linalg.norm(T_new - T), True

    T0 = jnp.full(n, 1.0)
    (T, p, it, r0, rn, done, *_rest) = scan_newton(
        T0, jnp.zeros(n), residual=residual, solve=solve,
        abs_tol=1e-10, rel_tol=1e-12, max_iter=12,
        stall_accept_rel=1e-3)
    assert not bool(done)
    assert int(it) == 12


def test_cg_stagnation_window():
    """cg flags (not raises) stagnation at the working-precision floor:
    an inconsistent system can never meet rtol; the window exit reports
    stagnated=True and check_standalone_linear accepts it with a
    warning."""
    import jax.numpy as jnp

    from cmfem_tpu.solvers.krylov import cg
    from cmfem_tpu.apps.common import check_standalone_linear

    # f32 arithmetic with the deck's f64 rtol: the residual floors near
    # eps(f32) * cond-scale and can never reach 1e-12 relative
    d = jnp.asarray(np.logspace(0, 2, 200), jnp.float32)
    apply_A = lambda v: d * v
    b = jnp.ones(200, jnp.float32)
    res = cg(apply_A, b, rtol=1e-12, maxiter=2000, stall_window=32)
    assert not bool(res.converged)
    assert bool(res.stagnated)
    assert float(res.rel_residual) < 1e-4  # floored, i.e. actually solved
    check_standalone_linear(res, "CG")  # accepted with a warning

    # a reachable tolerance still converges normally (no stagnation)
    res2 = cg(apply_A, b, rtol=1e-4, maxiter=2000, stall_window=32)
    assert bool(res2.converged)
    assert not bool(res2.stagnated)


def test_scan_newton_flat_stall_rejects_oscillating_divergence():
    """ADVICE r3 #2: criterion (c) judges the window MAXIMUM against the
    pre-update best, so an oscillating divergence (1.0 -> 5.0 -> 1.1)
    must not flat-exit on the dip back near the best."""
    import jax.numpy as jnp

    from cmfem_tpu.apps.common import scan_newton

    seq = jnp.asarray([1.0, 5.0, 1.1, 6.0, 1.2, 7.0, 1.3, 8.0])

    def residual(T, p):
        it = jnp.asarray(T[0], jnp.int32)
        r = seq[jnp.minimum(it, seq.shape[0] - 1)]
        # 4-vector with norm == seq[it]
        return jnp.full(4, r / 2.0)

    def solve(T, p, R):
        return T + 1.0, p, jnp.asarray(1.0), True

    T0 = jnp.zeros(2)
    (T, p, it, r0, rn, done, res_h, upd_h, lin_ok, nw_stalled) = \
        scan_newton(T0, jnp.zeros(2), residual=residual, solve=solve,
                    abs_tol=1e-10, rel_tol=1e-12, max_iter=8,
                    stall_accept_rel=0.0, stall_dx_rtol=0.0)
    assert not bool(done)
    assert not bool(nw_stalled)
    assert int(it) == 8


def test_scan_newton_flat_stall_gated_on_linear_ok():
    """Criterion (c)'s justification is 'after one good linear solve';
    a flat residual with a FAILED linear solve must not flat-exit."""
    import jax.numpy as jnp

    from cmfem_tpu.apps.common import scan_newton

    def residual(T, p):
        return jnp.full(4, 0.5)

    def solve(T, p, R):
        return T + 0.1, p, jnp.asarray(0.1), False  # lin_ok = False

    T0 = jnp.ones(2)
    (T, p, it, r0, rn, done, res_h, upd_h, lin_ok, nw_stalled) = \
        scan_newton(T0, jnp.zeros(2), residual=residual, solve=solve,
                    abs_tol=1e-10, rel_tol=1e-12, max_iter=6,
                    stall_accept_rel=0.0, stall_dx_rtol=0.0)
    assert not bool(done)
    assert not bool(lin_ok)


def test_scan_newton_reports_stalled_flag():
    """A flat-floor acceptance sets the distinct stalled flag; a
    tolerance convergence does not."""
    import jax.numpy as jnp

    from cmfem_tpu.apps.common import scan_newton

    def residual(T, p):
        return jnp.full(4, 0.5)

    def solve(T, p, R):
        return T + 0.1, p, jnp.asarray(0.1), True

    T0 = jnp.ones(2)
    out = scan_newton(T0, jnp.zeros(2), residual=residual, solve=solve,
                      abs_tol=1e-10, rel_tol=1e-12, max_iter=7)
    assert bool(out[5]) and bool(out[9])  # done via stall -> stalled

    target = jnp.asarray([2.0, -1.0])

    def residual2(T, p):
        return jnp.concatenate([T - target, p])

    def solve2(T, p, R):
        dT = -(T - target)
        return T + dT, p, jnp.linalg.norm(dT), True

    out = scan_newton(jnp.zeros(2), jnp.zeros(2), residual=residual2,
                      solve=solve2, abs_tol=1e-10, rel_tol=1e-8,
                      max_iter=7)
    assert bool(out[5]) and not bool(out[9])


def test_check_standalone_linear_rejects_high_rel_stagnation():
    """ADVICE r3 #3: a stagnated standalone solve is accepted only when
    the achieved rel residual is below the precision-floor bound; a
    defeated preconditioner stalling at rel ~0.5 raises."""
    import pytest as _pytest

    from cmfem_tpu.apps.common import check_standalone_linear
    from cmfem_tpu.solvers.krylov import SolveResult

    import jax.numpy as jnp

    bad = SolveResult(jnp.zeros(4), jnp.asarray(50), jnp.asarray(0.5),
                      jnp.asarray(False), stagnated=jnp.asarray(True),
                      rel_residual=jnp.asarray(0.5))
    with _pytest.raises(RuntimeError, match="ABOVE the acceptance floor"):
        check_standalone_linear(bad, "CG")

    ok = SolveResult(jnp.zeros(4), jnp.asarray(50), jnp.asarray(1e-6),
                     jnp.asarray(False), stagnated=jnp.asarray(True),
                     rel_residual=jnp.asarray(1e-6))
    check_standalone_linear(ok, "CG")  # accepted with a warning


def test_newton_solve_flat_stall_matches_scan_semantics():
    """Host-path newton_solve: oscillating divergence must not flat-exit
    and a flat floor sets result.stalled."""
    import jax.numpy as jnp

    from cmfem_tpu.solvers.newton import NewtonConfig, newton_solve

    seq = [1.0, 5.0, 1.1, 6.0, 1.2, 7.0, 1.3, 8.0]
    state = {"it": 0}

    def residual_osc(x):
        r = seq[min(state["it"], len(seq) - 1)]
        state["it"] += 1
        return jnp.full(4, r / 2.0)

    cfg = NewtonConfig(abs_tol=1e-10, rel_tol=1e-12, max_iter=8,
                       stall_accept_rel=0.0, stall_dx_rtol=0.0)
    x, res = newton_solve(residual_osc, jnp.zeros(2),
                          lambda x, rhs, js: jnp.ones(2), cfg)
    assert not res.converged

    x, res = newton_solve(lambda x: jnp.full(4, 0.5), jnp.ones(2),
                          lambda x, rhs, js: jnp.full(2, 0.1),
                          NewtonConfig(abs_tol=1e-10, rel_tol=1e-12,
                                       max_iter=7))
    assert res.converged and res.stalled

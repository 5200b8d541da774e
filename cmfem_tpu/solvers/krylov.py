"""Jittable Krylov solvers: preconditioned CG and restarted GMRES.

TPU-native replacement for the PETSc KSP solves the reference performs
(GMRES+Jacobi in Input/petsc.opts, GMRES+BJacobi/ILU in petsc_nonlinear.opts,
CG in mesh_recession_handler.cpp:270-276).  Everything is
``lax.while_loop``-based with static shapes, so the solves stay on device
and fuse under jit.  Reductions are plain ``jnp`` sums, which lower to XLA
collectives when the operands are sharded over a device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray  # final residual norm (CG: preconditioned rz norm^1/2 proxy)
    converged: jnp.ndarray


def _identity(x):
    return x


def cg(apply_A: Callable, b, x0=None, M: Callable | None = None,
       rtol=1e-12, atol=0.0, maxiter=1000) -> SolveResult:
    """Preconditioned conjugate gradients for SPD operators."""
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0).astype(b.dtype)
    M = M or _identity

    r0 = (b - apply_A(x0)).astype(b.dtype)
    z0 = M(r0)
    rz0 = jnp.vdot(r0, z0)
    bnorm = jnp.linalg.norm(b)
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(k < maxiter, jnp.vdot(r, r) > tol2)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = apply_A(p).astype(b.dtype)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r).astype(b.dtype)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    z0 = z0.astype(b.dtype)
    state = (x0, r0, z0, z0, rz0.astype(b.dtype), jnp.asarray(0))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state)
    rnorm = jnp.linalg.norm(r)
    return SolveResult(x, k, rnorm, rnorm <= jnp.sqrt(tol2) + 1e-300)


def gmres(apply_A: Callable, b, x0=None, M: Callable | None = None,
          rtol=1e-12, atol=0.0, restart=50, maxiter=20) -> SolveResult:
    """Restarted GMRES(m) with left preconditioning.

    maxiter counts outer restarts; total Krylov iterations <= restart*maxiter.
    Static shapes: the Krylov basis is a fixed (restart+1, n) array."""
    b = jnp.asarray(b)
    n = b.shape[0]
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    M = M or _identity

    bnorm = jnp.linalg.norm(M(b))
    tol = jnp.maximum(rtol * bnorm, atol)
    m = restart

    def arnoldi_step(carry, j):
        V, H, brk = carry
        v = V[j]
        w = M(apply_A(v))
        # modified Gram-Schmidt (vectorized over previous basis; masked)
        mask = (jnp.arange(m + 1) <= j).astype(w.dtype)
        coeffs = (V @ w) * mask  # (m+1,)
        w = w - V.T @ coeffs
        # reorthogonalize once for f64 robustness
        coeffs2 = (V @ w) * mask
        w = w - V.T @ coeffs2
        coeffs = coeffs + coeffs2
        hj1 = jnp.linalg.norm(w)
        Hcol = coeffs.at[j + 1].set(hj1)
        H = H.at[:, j].set(Hcol)
        vnext = jnp.where(hj1 > 1e-300, w / hj1, w)
        V = V.at[j + 1].set(vnext)
        return (V, H, brk), None

    def restart_cycle(x):
        r = M(b - apply_A(x))
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=b.dtype)
        V = V.at[0].set(jnp.where(beta > 1e-300, r / beta, r))
        H = jnp.zeros((m + 1, m), dtype=b.dtype)
        (V, H, _), _ = jax.lax.scan(arnoldi_step, (V, H, False), jnp.arange(m))
        # least squares: min || beta e1 - H y ||
        e1 = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)
        y, _, _, _ = jnp.linalg.lstsq(H, e1, rcond=None)
        x_new = x + V[:m].T @ y
        res = jnp.linalg.norm(M(b - apply_A(x_new)))
        return x_new, res, beta

    def cond(state):
        x, res, k = state
        return jnp.logical_and(k < maxiter, res > tol)

    def body(state):
        x, res, k = state
        x, res, _ = restart_cycle(x)
        return (x, res, k + 1)

    r_init = jnp.linalg.norm(M(b - apply_A(x0)))
    x, res, k = jax.lax.while_loop(cond, body, (x0, r_init, jnp.asarray(0)))
    return SolveResult(x, k, res, res <= tol)

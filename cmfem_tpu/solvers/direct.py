"""Dense direct solve (LU) for small systems.

Replaces the reference's MUMPS distributed LU (Input/petsc_ablation*.opts:
`-ksp_type preonly -pc_type lu -pc_factor_mat_solver_type mumps`) for the
smoke-scale ablation Newton systems.  The global matrix is assembled by
scattering dense element matrices; LU runs on device via
``jax.scipy.linalg.lu_factor``."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_solve(A, b):
    """x = A^{-1} b via LU with partial pivoting."""
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    lu, piv = jax.scipy.linalg.lu_factor(A)
    return jax.scipy.linalg.lu_solve((lu, piv), b)


def dense_factor(A):
    return jax.scipy.linalg.lu_factor(jnp.asarray(A))


def dense_apply_factor(fac, b):
    return jax.scipy.linalg.lu_solve(fac, jnp.asarray(b))

"""Essential (Dirichlet) boundary-condition elimination.

Replicates MFEM ``FormLinearSystem`` / ``RecoverFEMSolution`` semantics
(DIAG_ONE policy): constrained rows/columns are replaced by identity and the
known boundary values are moved to the RHS
(/root/reference/myapps/convection_diffusion/linear_convection_diffusion_2D.cpp:349-377).
Implemented as masked operator application so the matrix-free path never
materializes the eliminated system.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class EssentialBC:
    """Mask-based essential-dof elimination for an n-dof scalar/vector space."""

    def __init__(self, n: int, ess_dofs):
        self.n = n
        ess = np.asarray(ess_dofs, dtype=np.int64).reshape(-1)
        mask = np.zeros(n, dtype=bool)
        mask[ess] = True
        self.ess_dofs = jnp.asarray(ess)
        self.mask = jnp.asarray(mask)
        self.free = jnp.asarray(~mask)

    def constrain_operator(self, apply_fn):
        """A_c x = A x on free rows with x zeroed at essential dofs, plus
        identity on essential rows."""

        free = self.free
        mask = self.mask

        def constrained(x):
            xf = jnp.where(free, x, 0.0)
            y = apply_fn(xf)
            return jnp.where(free, y, 0.0) + jnp.where(mask, x, 0.0)

        return constrained

    def constrained_rhs(self, apply_fn, b, u_bc):
        """B = b - A u_bc on free rows; B[ess] = u_bc[ess].

        u_bc must carry the boundary values at essential dofs (its free
        entries are ignored)."""
        xb = jnp.where(self.mask, u_bc, 0.0)
        B = jnp.asarray(b) - apply_fn(xb)
        return jnp.where(self.free, B, xb)

    def apply_values(self, x, u_bc):
        """Overwrite essential entries of x with u_bc values."""
        return jnp.where(self.mask, u_bc, x)

    def zero_essential(self, x):
        return jnp.where(self.free, x, 0.0)

    def constrain_dense(self, A, diag=1.0):
        """Row/col elimination on a dense matrix (direct-solve path)."""
        A = jnp.asarray(A)
        freef = self.free.astype(A.dtype)
        A = A * freef[:, None] * freef[None, :]
        return A + jnp.diag(jnp.where(self.mask, diag, 0.0))

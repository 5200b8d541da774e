from .krylov import cg, gmres, SolveResult
from .precond import jacobi_preconditioner, chebyshev_preconditioner, power_iteration_lmax
from .multigrid import GeometricMG, StructuredMG
from .direct import dense_solve
from .newton import NewtonConfig, NewtonResult, newton_solve
from .blocksolve import BlockNewtonKrylov
from .timeint import DIRKTableau, get_tableau, make_linear_dirk_step, stage_times

__all__ = [
    "cg",
    "gmres",
    "SolveResult",
    "jacobi_preconditioner",
    "chebyshev_preconditioner",
    "power_iteration_lmax",
    "dense_solve",
    "NewtonConfig",
    "NewtonResult",
    "newton_solve",
    "StructuredMG",
    "GeometricMG",
    "BlockNewtonKrylov",
    "DIRKTableau",
    "get_tableau",
    "make_linear_dirk_step",
    "stage_times",
]

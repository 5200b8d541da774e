from .assembly import (
    SpaceOps,
    OperatorData,
    BilinearForm,
    domain_lf,
    boundary_lf,
    l2_error,
    l2_norm_fn,
    linf_error,
)
from .bc import EssentialBC

__all__ = [
    "SpaceOps",
    "OperatorData",
    "BilinearForm",
    "domain_lf",
    "boundary_lf",
    "l2_error",
    "l2_norm_fn",
    "linf_error",
    "EssentialBC",
]

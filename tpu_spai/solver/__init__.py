"""Preconditioned Conjugate Gradient engine + preconditioners.

TPU-native equivalent of the reference's native solver backend
(pymathprim ``linalg.PreconditionedConjugateGradient``, used from
neural_cg/utils/validate.py:54-160): a `lax.while_loop` PCG whose per
iteration work is one SpMV + one preconditioner apply + 2 dots + 3 axpys,
in fp64 / fp32 / mixed precision, plus host reference preconditioners
(Jacobi / IC0 / AINV / FSAI / AMG) for parity baselines.
"""

from .cg import CGResult, pcg, pcg_trace
from .gsel_solver import (
    GselSpaiPrec,
    GselSpaiPrecDS,
    build_gsel_csr,
    pcg_gsel,
    pcg_gsel_ds,
)
from .preconditioners import (
    identity_prec,
    jacobi_prec,
    spai_prec,
    spai_scaled_prec,
    llt_prec,
    extract_diagonal,
)

__all__ = [
    "CGResult",
    "pcg",
    "pcg_trace",
    "GselSpaiPrec",
    "GselSpaiPrecDS",
    "build_gsel_csr",
    "pcg_gsel",
    "pcg_gsel_ds",
    "identity_prec",
    "jacobi_prec",
    "spai_prec",
    "spai_scaled_prec",
    "llt_prec",
    "extract_diagonal",
]

"""Device compute kernels: SpMV, transpose-SpMV, SPAI apply, segment ops.

Two interchangeable backends with identical semantics:
  * ``spmv_xla``    — pure-XLA gather/einsum/segment-sum formulations; runs
    everywhere (CPU tests, TPU), fully differentiable. Default.
  * ``spmv_pallas`` — hand-scheduled Pallas TPU kernels for the hot paths.

Select via the ``impl=`` argument on the dispatch wrappers or the
``TPU_SPAI_KERNELS`` environment variable (``xla`` | ``pallas``).
"""

from .spmv_xla import (
    spmv_coo,
    spmv_ell,
    spmv_t_ell,
    spmv,
    spmv_t,
    spai_apply,
    llt_apply,
)

__all__ = [
    "spmv_coo",
    "spmv_ell",
    "spmv_t_ell",
    "spmv",
    "spmv_t",
    "spai_apply",
    "llt_apply",
]

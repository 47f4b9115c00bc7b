"""tpu_spai — TPU-native learned sparse-preconditioner framework.

A brand-new JAX/XLA/Pallas implementation of the capability surface of
Adversarr/LearningSparsePreconditioner4GPU (NeurIPS 2025, arXiv 2510.27517):
a sparse linear-algebra core (block-COO/ELL storage, SpMV, preconditioned CG),
a GNN that predicts sparse approximate-inverse factors over the matrix
sparsity graph, self-supervised training, PDE data generation, and
benchmark/condition-number harnesses — designed TPU-first (static shapes,
gather/segment-sum message passing, `lax.while_loop` solvers, `shard_map`
row-partitioned distribution) rather than translated from the CUDA reference.

Double precision is enabled at import time (the solver stack validates in
fp64, matching the reference's `validate.py` convention); set the environment
variable ``TPU_SPAI_NO_X64=1`` before import to opt out.
"""

import os

if not os.environ.get("TPU_SPAI_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules at package
    import): `tpu_spai.pcg`, `tpu_spai.csr_to_graph`, ..."""
    from importlib import import_module

    table = {
        "csr_to_graph": "tpu_spai.sparse",
        "graph_to_csr": "tpu_spai.sparse",
        "BlockGraph": "tpu_spai.sparse",
        "pcg": "tpu_spai.solver",
        "pcg_trace": "tpu_spai.solver",
        "spai_prec": "tpu_spai.solver",
        "jacobi_prec": "tpu_spai.solver",
        "spmv": "tpu_spai.kernels",
        "spai_apply": "tpu_spai.kernels",
    }
    if name in table:
        return getattr(import_module(table[name]), name)
    raise AttributeError(name)

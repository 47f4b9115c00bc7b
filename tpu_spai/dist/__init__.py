"""Distributed execution: row-partitioned SpMV + CG over a device mesh.

This layer is new design (the reference is strictly single-GPU — SURVEY
§2.10): matrices are bandwidth-reduced (RCM), block rows partitioned into
equal contiguous shards, and the only communication per CG iteration is

  * neighbor halo exchange of boundary x segments via `jax.lax.ppermute`
    (the banded structure after RCM guarantees halos touch only adjacent
    shards), overlapped with local SpMV by XLA's latency-hiding scheduler,
  * `psum` all-reduce for the CG dot products.

Data-parallel *training* is plain pjit batch sharding (see
tpu_spai.dist.data_parallel); no TP/PP is warranted for a 16-wide GNN —
the row-partitioned solver IS the model-parallel axis of this workload.
"""

from .partition import PartitionedSystem, partition_system
from .cg import dist_pcg, dist_spmv_reference
from .gsel_dist import (
    PartitionedGsel,
    dist_pcg_gsel,
    dist_pcg_gsel_rr,
    partition_gsel,
)
from .gnn import (
    PartitionedGnnGraph,
    dist_gnn_factor,
    dist_neural_pcg,
    partition_gnn_inference,
)

__all__ = [
    "PartitionedSystem",
    "partition_system",
    "dist_pcg",
    "dist_spmv_reference",
    "PartitionedGsel",
    "partition_gsel",
    "dist_pcg_gsel",
    "dist_pcg_gsel_rr",
    "PartitionedGnnGraph",
    "partition_gnn_inference",
    "dist_gnn_factor",
    "dist_neural_pcg",
]

"""Graph neural network over matrix sparsity graphs (flax.linen).

TPU-native re-design of the reference's PyG model stack
(neural_cg/nn/gnns.py, nn/basic_layers.py): message passing is expressed
as gather → MLP → `jax.ops.segment_sum`, with static padded shapes, instead
of torch_scatter CUDA kernels. The capability surface matches
`NodeEdgeProcessing` (encode-process-decode, node/edge residuals, optional
MessageNorm) and the graph ops (lower-triangular restriction, two-hop
expansion) used by the NeuralPCG/NIF baselines.
"""

from .layers import FeedForward, MPLayer, NodeEdgeProcessing, PositionalEncoding
from .graph_ops import lower_triangular_mask, drop_small_mask, two_hop_host
from . import losses

__all__ = [
    "FeedForward",
    "MPLayer",
    "NodeEdgeProcessing",
    "PositionalEncoding",
    "lower_triangular_mask",
    "drop_small_mask",
    "two_hop_host",
    "losses",
]

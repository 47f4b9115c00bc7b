"""Data pipeline: folder-contract datasets, feature assembly, padded batching.

Parity surface: neural_cg/data.py (RawData/make_data/FolderDataset/
MultiFolderDataset) and utils/datamodule.py, re-designed around static
shapes: graphs are concatenated with index offsets (like PyG collation) and
then padded to (node, edge) buckets so variable-topology datasets compile a
bounded number of XLA programs; per-sample semantics use segment ids
instead of `batch.ptr` slicing.
"""

from .batching import GraphBatch, collate
from .sample import RawSample, GraphSample, make_features
from .folder import FolderDataset, MultiFolderDataset, split_dataset

__all__ = [
    "GraphBatch",
    "collate",
    "RawSample",
    "GraphSample",
    "make_features",
    "FolderDataset",
    "MultiFolderDataset",
    "split_dataset",
]

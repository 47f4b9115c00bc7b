"""Raw sample containers and the feature switchboard.

Parity with neural_cg/data.py:173-336 (`RawData` + `make_data`): the same
feature flags drive which node/edge features are assembled, matrix
normalization (mean / frob / l1 / none), fp64 diagonal extras, and the
random- or file-based RHS. Everything here is host-side numpy; `collate`
moves the result to device.
"""

from __future__ import annotations

import dataclasses
from typing import List, Literal, Optional

import numpy as np

AggKind = Literal["disable", "sum", "mean", "max", "min"]


@dataclasses.dataclass
class RawSample:
    """One linear system in graph form (host numpy); ~ RawData (data.py:173)."""

    block_values: Optional[np.ndarray]  # [nE, b, b]
    diagonals: Optional[np.ndarray]  # [n, b]
    edge_index: np.ndarray  # [2, nE] block-level
    node_features: Optional[np.ndarray]  # [n, F]
    lhs: Optional[np.ndarray]  # [n, b]
    rhs: Optional[np.ndarray]  # [n, b]
    mask: np.ndarray  # [n, b]
    num_nodes: int
    block_size: int


@dataclasses.dataclass
class GraphSample:
    """Feature-assembled sample ready for batching (host numpy)."""

    x: np.ndarray  # [n, Fn]
    edge_attr: np.ndarray  # [n, Fe]
    edge_index: np.ndarray  # [2, nE]
    matrix_values: np.ndarray  # [nE, b, b] (normalized)
    mask: np.ndarray  # [n, b]
    residual: np.ndarray  # [n, b]
    num_nodes: int
    block_size: int
    diagonal: Optional[np.ndarray] = None
    inv_diag: Optional[np.ndarray] = None
    rsqrt_diag: Optional[np.ndarray] = None
    gt: Optional[np.ndarray] = None
    matrix_scale: float = 1.0


def _aggregate_edge_to_node(
    edge_index: np.ndarray, edge_attr: np.ndarray, num_nodes: int, reduce: str
) -> np.ndarray:
    """Scatter edge features to their target node (data.py:186-204)."""
    tgt = edge_index[1]
    f = edge_attr.shape[1]
    if reduce in ("sum", "mean"):
        out = np.zeros((num_nodes, f), dtype=edge_attr.dtype)
        np.add.at(out, tgt, edge_attr)
        if reduce == "mean":
            cnt = np.bincount(tgt, minlength=num_nodes).astype(edge_attr.dtype)
            out /= np.maximum(cnt, 1.0)[:, None]
    elif reduce in ("max", "min"):
        fill = -np.inf if reduce == "max" else np.inf
        out = np.full((num_nodes, f), fill, dtype=edge_attr.dtype)
        ufunc = np.maximum if reduce == "max" else np.minimum
        ufunc.at(out, tgt, edge_attr)
        out[~np.isfinite(out)] = 0.0
    else:
        raise ValueError(f"unknown reduce {reduce}")
    return out


def make_features(
    raw: RawSample,
    use_matrix_as_edge_feature: bool = True,
    use_mask_as_node_feature: bool = True,
    use_node_features_as_edge_feature: bool = False,
    use_edge_features_as_node_feature: AggKind = "disable",
    use_random_rhs: bool = True,
    normalize_matrix: "bool | str" = "mean",
    rng: Optional[np.random.Generator] = None,
    is_inference: bool = False,
) -> GraphSample:
    """RawSample -> GraphSample; mirrors make_data (data.py:218-336)."""
    if use_node_features_as_edge_feature and use_edge_features_as_node_feature != "disable":
        raise ValueError("cannot enable both feature enhancers")
    bv = raw.block_values
    scale = 1.0
    if normalize_matrix is True or normalize_matrix == "mean":
        scale = 1.0 / float(np.mean(np.abs(bv)))
    elif normalize_matrix == "frob":
        scale = 1.0 / float(np.linalg.norm(bv))
    elif normalize_matrix == "l1":
        # 1 / max row-sum of |A| (data.py:252-263)
        import scipy.sparse as sp

        from ..sparse.convert import graph_to_csr

        absmat = graph_to_csr(raw.edge_index, np.abs(bv), raw.num_nodes * raw.block_size)
        row_sum = absmat @ np.ones(absmat.shape[1])
        scale = 1.0 / (float(np.max(row_sum)) + 1e-7)
    elif normalize_matrix in ("none", False):
        scale = 1.0
    else:
        raise ValueError(f"unknown normalize_matrix {normalize_matrix!r}")

    n, b = raw.num_nodes, raw.block_size
    mask = raw.mask.astype(np.float32)

    node_feats: List[np.ndarray] = []
    if raw.node_features is not None:
        node_feats.append(raw.node_features.astype(np.float32))
    if use_mask_as_node_feature:
        node_feats.append(mask)

    edge_feats: List[np.ndarray] = []
    if use_matrix_as_edge_feature:
        edge_feats.append((scale * bv).reshape(bv.shape[0], -1).astype(np.float32))
    if use_node_features_as_edge_feature:
        nf = np.concatenate(node_feats, axis=-1)
        edge_feats += [nf[raw.edge_index[0]], nf[raw.edge_index[1]]]
    if not edge_feats:
        raise ValueError("no edge feature found")
    edge_attr = np.concatenate(edge_feats, axis=-1)

    if use_edge_features_as_node_feature != "disable":
        node_feats.append(
            _aggregate_edge_to_node(
                raw.edge_index, edge_attr, n, use_edge_features_as_node_feature
            )
        )
    if not node_feats:
        raise ValueError("no node feature found")
    x = np.concatenate(node_feats, axis=-1)

    out = GraphSample(
        x=x,
        edge_attr=edge_attr,
        edge_index=raw.edge_index,
        matrix_values=(bv * scale).astype(np.float32),
        mask=mask,
        residual=np.zeros((n, b), dtype=np.float32),
        num_nodes=n,
        block_size=b,
        matrix_scale=scale,
    )

    if raw.diagonals is not None:
        # fp64 first, then cast (data.py:316-323)
        diag = raw.diagonals.astype(np.float64) * scale
        out.diagonal = diag.astype(np.float32)
        out.inv_diag = (1.0 / (diag + 1e-7)).astype(np.float32)
        out.rsqrt_diag = (1.0 / np.sqrt(diag + 1e-7)).astype(np.float32)

    if not is_inference:
        if use_random_rhs:
            rng = rng or np.random.default_rng()
            rhs = rng.standard_normal((n, b)).astype(np.float32)
        else:
            assert raw.rhs is not None, "use_random_rhs=False requires rhs"
            rhs = raw.rhs.astype(np.float32)
            if raw.lhs is not None:
                out.gt = (raw.lhs / scale).astype(np.float32)
        out.residual = rhs * mask
    return out

"""Training workspaces: model + loss + preconditioner postprocessing.

Parity with the reference's LightningModules:
  * SimpleWorkspace     ~ neural_cg/workspace.py:26-246 (paper method:
    GNN edge output -> [E,b,b] factor; d = eps r + L L^T r; loss(batch,d,L))
  * ScaledWorkspace     ~ scaled_workspace.py:26-255 (Jacobi-scaled apply
    during training; inference folds D^{-1/2} into the factor)
  * NeuralPCGWorkspace  ~ nif.py:23-205 (lower-triangular restriction, LLT)
  * NIFWorkspace        ~ nif.py:209-396 (two-hop + drop tolerance + LLT)

Design: a workspace is a thin, stateless recipe object; `loss_fn(params,
batch)` is a pure function suitable for `jax.value_and_grad` under jit.
Host-side helpers (`factor_csr`) extract the predicted factor as scipy CSR
for the benchmark/validation boundary — the same device->host hop the
reference performs in `to_csr_cpu` (validate.py:22-51).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..data.batching import GraphBatch
from ..gnn.layers import NodeEdgeProcessing
from ..gnn.losses import create_loss
from ..gnn.graph_ops import lower_triangular_mask, drop_small_mask, apply_edge_mask
from ..kernels.spmv_xla import spai_apply, llt_apply
from ..sparse.convert import graph_to_csr


def _gnn_kwargs(gnn_cfg: dict) -> dict:
    """Map the config tree (configs/gnn.yaml, mirroring the reference's
    config/gnn.yaml) onto NodeEdgeProcessing fields."""
    c = dict(gnn_cfg)
    return dict(
        node_features=c["node_features"],
        edge_features=c["edge_features"],
        num_mp_layers=c["num_mp_layers"],
        node_residual=c["node_residual"],
        edge_residual=c["edge_residual"],
        node_encoder=dict(c["node_encoder"]),
        edge_encoder=dict(c["edge_encoder"]),
        node_decoder=dict(c["node_decoder"]),
        edge_decoder=dict(c["edge_decoder"]),
        node_mlp=dict(c["node_mlp"]),
        edge_mlp=dict(c["edge_mlp"]),
        msg_mlp=dict(c["msg_mlp"]),
        msg_norm=bool(c.get("msg_norm", False)),
        aggr=c.get("aggr", "add"),
        remat=bool(c.get("remat", False)),
        scan_mp=bool(c.get("scan_mp", False)),
        # 'torch' = the reference's Linear reset (kaiming-uniform a=sqrt(5)
        # + uniform bias); 'lecun' = flax default (round-1 divergence)
        weight_init=c.get("weight_init", "lecun"),
    )


class SimpleWorkspace:
    """The paper's production method (M^{-1} = eps I + L L^T)."""

    name = "simple"
    needs_inv_diag = False

    def __init__(
        self,
        gnn: dict,
        loss: dict,
        block_size: int,
        epsilon: float,
        batch_less: bool = False,
        **_unused,
    ):
        self.block_size = block_size
        self.epsilon = float(epsilon)
        self.model = NodeEdgeProcessing(
            node_out_features=None,
            edge_out_features=block_size * block_size,
            **_gnn_kwargs(gnn),
        )
        self.loss_fn_inner = create_loss(
            loss["name"], batch_less=batch_less, block_size=block_size,
            **(loss.get("params") or {}),
        )

    # -- pure functions (jit-safe) -----------------------------------------

    def init_params(self, key, batch: GraphBatch):
        return self.model.init(
            key, batch.x, batch.edge_index, batch.edge_attr, batch.edge_valid
        )

    def predict_blocks(self, params, batch: GraphBatch) -> jax.Array:
        """GNN forward -> per-edge factor blocks [E, b, b]
        (workspace.py:92-94). Messages are weighted by `edge_valid` so the
        bucket-padding edges (wired to node 0 for static shapes) cannot
        inject MLP-bias noise into real nodes."""
        _, edge_out = self.model.apply(
            params, batch.x, batch.edge_index, batch.edge_attr,
            batch.edge_valid,
        )
        b = self.block_size
        return edge_out.reshape(-1, b, b)

    def precondition_train(self, batch: GraphBatch, blocks: jax.Array) -> jax.Array:
        lg = batch.graph.with_blocks(blocks)
        return spai_apply(lg, batch.residual, self.epsilon, mask=batch.mask)

    def loss(self, params, batch: GraphBatch) -> Tuple[jax.Array, dict]:
        blocks = self.predict_blocks(params, batch)
        d = self.precondition_train(batch, blocks)
        loss = self.loss_fn_inner(batch, d, blocks)
        aux = {"factor_norm": jnp.linalg.norm(blocks)}
        return loss, aux

    # -- host-side boundary -------------------------------------------------

    def postprocess_blocks(self, batch: GraphBatch, blocks: np.ndarray) -> np.ndarray:
        return blocks

    def factor_csr(
        self, params, batch: GraphBatch, n_valid_edges: Optional[int] = None
    ) -> sp.csr_matrix:
        """Predicted factor as fp64 scipy CSR with Dirichlet masking
        (~ inference_step, workspace.py:195-205)."""
        blocks = np.asarray(self.predict_blocks(params, batch), dtype=np.float64)
        blocks = self.postprocess_blocks(batch, blocks)
        n = batch.n_nodes * self.block_size
        ei = np.stack(
            [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
        )
        return graph_to_csr(
            ei, blocks, n, mask=batch.mask, n_valid_edges=n_valid_edges
        )

    def solver_prec_kind(self) -> str:
        return "spai"


class ScaledWorkspace(SimpleWorkspace):
    """Jacobi-scaled variant: train-time d = eps D^{-1} r + L D^{-1} L^T r;
    solve-time folds D^{-1/2} into the factor (scaled_workspace.py:137-147,
    199-212)."""

    name = "scaled"
    needs_inv_diag = True

    def precondition_train(self, batch: GraphBatch, blocks: jax.Array) -> jax.Array:
        assert batch.inv_diag is not None, "scaled workspace needs inv_diag"
        lg = batch.graph.with_blocks(blocks)
        return spai_apply(
            lg, batch.residual, self.epsilon, mask=batch.mask, diag=batch.inv_diag
        )

    def postprocess_blocks(self, batch: GraphBatch, blocks: np.ndarray) -> np.ndarray:
        # L <- L @ diag(rsqrt_diag): scale block columns by the rsqrt of the
        # column dof's diagonal (the D^{-1/2} fold).
        rsq = np.asarray(batch.rsqrt_diag, dtype=np.float64)  # [N, b]
        col = np.asarray(batch.graph.edge_col)
        return blocks * rsq[col][:, None, :]


class NeuralPCGWorkspace(SimpleWorkspace):
    """NeuralPCG baseline: restrict prediction to the lower triangle and use
    the L L^T product form (nif.py:23-205). Validation uses triangular-solve
    IC preconditioning on host."""

    name = "npcg"

    def precondition_train(self, batch: GraphBatch, blocks: jax.Array) -> jax.Array:
        tri = lower_triangular_mask(batch.edge_index).astype(blocks.dtype)
        lg = batch.graph.with_blocks(apply_edge_mask(blocks, tri))
        return llt_apply(lg, batch.residual, mask=batch.mask)

    def loss(self, params, batch: GraphBatch):
        blocks = self.predict_blocks(batch=batch, params=params)
        tri = lower_triangular_mask(batch.edge_index).astype(blocks.dtype)
        blocks = apply_edge_mask(blocks, tri)
        d = llt_apply(
            batch.graph.with_blocks(blocks), batch.residual, mask=batch.mask
        )
        loss = self.loss_fn_inner(batch, d, blocks)
        return loss, {"factor_norm": jnp.linalg.norm(blocks)}

    def postprocess_blocks(self, batch: GraphBatch, blocks: np.ndarray) -> np.ndarray:
        row = np.asarray(batch.graph.edge_row)
        col = np.asarray(batch.graph.edge_col)
        return blocks * (col <= row)[:, None, None]

    def solver_prec_kind(self) -> str:
        return "ichol"


class NIFWorkspace(NeuralPCGWorkspace):
    """NIF baseline: two-hop-expanded topology (host, at data prep) +
    lower-triangular + magnitude drop tolerance (nif.py:209-396)."""

    name = "nif"

    def __init__(self, *args, drop_tol: float = 1e-4, **kwargs):
        super().__init__(*args, **kwargs)
        self.drop_tol = float(drop_tol)

    def loss(self, params, batch: GraphBatch):
        blocks = self.predict_blocks(batch=batch, params=params)
        m = drop_small_mask(blocks, batch.edge_index, self.drop_tol).astype(
            blocks.dtype
        )
        blocks = apply_edge_mask(blocks, m)
        d = llt_apply(
            batch.graph.with_blocks(blocks), batch.residual, mask=batch.mask
        )
        loss = self.loss_fn_inner(batch, d, blocks)
        return loss, {"factor_norm": jnp.linalg.norm(blocks)}

    def postprocess_blocks(self, batch: GraphBatch, blocks: np.ndarray) -> np.ndarray:
        row = np.asarray(batch.graph.edge_row)
        col = np.asarray(batch.graph.edge_col)
        tri = (col <= row)
        mag = np.abs(blocks.reshape(blocks.shape[0], -1)).max(axis=-1)
        return blocks * (tri & (mag >= self.drop_tol))[:, None, None]


_WORKSPACES = {
    "simple": SimpleWorkspace,
    "scaled": ScaledWorkspace,
    "npcg": NeuralPCGWorkspace,
    "nif": NIFWorkspace,
}


def get_workspace(name: str):
    """~ train.py:17-25 / train_nif.py:16-22 workspace registry."""
    if name not in _WORKSPACES:
        raise ValueError(f"Unknown workspace name: {name}")
    return _WORKSPACES[name]

"""Flax GNN layers: encode-process-decode over matrix sparsity graphs.

Capability parity with the reference model stack:
  * ``FeedForward``         ~ neural_cg/nn/basic_layers.py:73-109
  * ``MPLayer``             ~ basic_layers.py:145-225 (gather → MLP →
    segment-sum scatter; node/edge residuals; optional MessageNorm — note
    the reference's MessageNorm is dead code due to the ``hasattr`` typo at
    basic_layers.py:200, so ``msg_norm`` here defaults to functional but the
    shipped configs disable it for behavioral parity)
  * ``NodeEdgeProcessing``  ~ neural_cg/nn/gnns.py:9-97
  * ``PositionalEncoding``  ~ basic_layers.py:47-70 (unused by the
    production path, provided for completeness)

TPU-first notes: all ops are gathers, dense MLPs and `segment_sum` — no
scatter kernels; shapes are static (padded nodes/edges with masks), so one
compilation serves a whole bucketed dataset. The MLPs are tiny (16-wide by
default, config/gnn.yaml), so the hot cost is the per-edge gather/concat —
kept fusable by expressing everything in plain XLA ops.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    name = name.lower()
    table = {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "gelu": nn.gelu,
        "elu": nn.elu,
        "leaky_relu": nn.leaky_relu,
        "none": lambda x: x,
    }
    if name not in table:
        raise ValueError(f"Activation {name} not supported.")
    return table[name]


class _Norm(nn.Module):
    """Pre-normalization: none / layer / rms ('batch' aliases to rms,
    replicating the reference's alias at basic_layers.py:38)."""

    kind: str

    @nn.compact
    def __call__(self, x):
        kind = self.kind.lower()
        if kind == "none":
            return x
        if kind in ("layer", "layernorm", "layer_norm"):
            return nn.LayerNorm()(x)
        if kind in ("rms", "rmsnorm", "rms_norm", "batch", "batchnorm", "batch_norm"):
            return nn.RMSNorm()(x)
        raise ValueError(f"Normalization {self.kind} not supported.")


class FeedForward(nn.Module):
    """MLP: pre-norm → lift → (num_layers-1) hidden → proj.

    ``num_layers`` counts the lift + hidden stages (the projection adds one
    more linear), matching the reference layer count.

    ``weight_init``: 'lecun' (flax default) or 'torch' — the reference's
    torch Linear reset (utils/weight_init.py:2-4 walks reset_parameters):
    kaiming-uniform(a=√5) on W and U(±1/√fan_in) on b, i.e. BOTH drawn
    U(±1/√fan_in). Flax's lecun-normal + zero bias was a documented
    round-1 divergence (PARITY_MAP §2.3); 'torch' closes it.
    """

    out_channels: int
    hidden_channels: Optional[int] = None  # defaults to out_channels
    num_layers: int = 2
    pre_norm: str = "none"
    activation: str = "gelu"
    out_activation: str = "none"
    weight_init: str = "lecun"

    def _dense(self, feats: int, x):
        if self.weight_init == "torch":
            bound = 1.0 / float(x.shape[-1]) ** 0.5

            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(
                    key, shape, dtype, minval=-bound, maxval=bound
                )

            return nn.Dense(feats, kernel_init=init, bias_init=init)(x)
        return nn.Dense(feats)(x)

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_channels or self.out_channels
        act = get_activation(self.activation)
        x = _Norm(self.pre_norm)(x)
        x = act(self._dense(hidden, x))
        for _ in range(1, self.num_layers):
            x = act(self._dense(hidden, x))
        x = self._dense(self.out_channels, x)
        return get_activation(self.out_activation)(x)


class MessageNorm(nn.Module):
    """MsgNorm (Li et al. 2020): out = x + s * ||x||_2 * msg/||msg||_2."""

    learn_scale: bool = True

    @nn.compact
    def __call__(self, x, msg):
        msg_n = msg / (jnp.linalg.norm(msg, axis=-1, keepdims=True) + 1e-12)
        x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        if self.learn_scale:
            s = self.param("scale", nn.initializers.ones, (1,))
        else:
            s = 1.0
        return msg_n * x_norm * s


class MPLayer(nn.Module):
    """One message-passing round over (node_attr, edge_index, edge_attr).

    message  : msg_mlp([x_dst ‖ x_src ‖ e])  → segment-sum/mean to dst
    node upd : node_mlp(aggregated)  (+ residual)
    edge upd : edge_mlp([x_dst ‖ x_src ‖ e]) (+ residual)

    Convention: ``edge_index[0]`` is the matrix row (message destination),
    ``edge_index[1]`` the column (source) — i.e. x_i = x[row], x_j = x[col],
    matching PyG's default flow with (row, col) edges as built by the
    reference's data pipeline.
    """

    node_channels: int
    edge_channels: int
    node_residual: bool = True
    edge_residual: bool = True
    node_mlp: Optional[dict] = None
    edge_mlp: Optional[dict] = None
    msg_mlp: Optional[dict] = None
    aggr: str = "add"
    msg_norm: bool = False
    weight_init: str = "lecun"

    def _ff_kwargs(self, cfg: Optional[dict]) -> dict:
        return {"weight_init": self.weight_init, **(cfg or {})}

    @nn.compact
    def __call__(self, node_attr, edge_index, edge_attr, edge_weight=None):
        n_nodes = node_attr.shape[0]
        dst, src = edge_index[0], edge_index[1]
        x_i = node_attr[dst]
        x_j = node_attr[src]
        feats = jnp.concatenate([x_i, x_j, edge_attr], axis=-1)

        msg = FeedForward(
            out_channels=self.node_channels, **self._ff_kwargs(self.msg_mlp),
            name="msg_mlp",
        )(feats)
        if edge_weight is not None:
            msg = msg * edge_weight[:, None]
        agg = jax.ops.segment_sum(msg, dst, num_segments=n_nodes)
        if self.aggr == "mean":
            ones = (
                jnp.ones_like(msg[:, :1])
                if edge_weight is None
                else edge_weight[:, None]
            )
            cnt = jax.ops.segment_sum(ones, dst, num_segments=n_nodes)
            agg = agg / jnp.maximum(cnt, 1.0)
        elif self.aggr != "add":
            raise ValueError(f"aggr {self.aggr} not supported")

        if self.msg_norm:
            agg = MessageNorm(name="node_msg_norm")(node_attr, agg)

        node_new = FeedForward(
            out_channels=self.node_channels, **self._ff_kwargs(self.node_mlp),
            name="node_mlp",
        )(agg)
        node_out = node_attr + node_new if self.node_residual else node_new

        edge_new = FeedForward(
            out_channels=self.edge_channels, **self._ff_kwargs(self.edge_mlp),
            name="edge_mlp",
        )(feats)
        edge_out = edge_attr + edge_new if self.edge_residual else edge_new
        return node_out, edge_out


class _MPScanBody(nn.Module):
    """nn.scan body wrapping one MPLayer: carry = (x, e, edge_index,
    edge_weight). Stacked params live under ``mp_scan/mp`` with a
    leading layer axis (see {stack,unstack}_mp_params)."""

    node_channels: int
    edge_channels: int
    node_residual: bool = True
    edge_residual: bool = True
    node_mlp: Optional[dict] = None
    edge_mlp: Optional[dict] = None
    msg_mlp: Optional[dict] = None
    aggr: str = "add"
    msg_norm: bool = False
    weight_init: str = "lecun"
    remat: bool = False

    @nn.compact
    def __call__(self, carry, _xs):
        x, e, edge_index, edge_weight = carry
        cls = nn.remat(MPLayer) if self.remat else MPLayer
        x, e = cls(
            node_channels=self.node_channels,
            edge_channels=self.edge_channels,
            node_residual=self.node_residual,
            edge_residual=self.edge_residual,
            node_mlp=self.node_mlp,
            edge_mlp=self.edge_mlp,
            msg_mlp=self.msg_mlp,
            aggr=self.aggr,
            msg_norm=self.msg_norm,
            weight_init=self.weight_init,
            name="mp",
        )(x, edge_index, e, edge_weight)
        return (x, e, edge_index, edge_weight), None


def _walk_convert(tree, fn):
    """Apply fn to every dict node in a nested params/opt-state tree
    (NamedTuples/tuples/lists recursed; fn sees dicts bottom-up)."""
    if isinstance(tree, dict):
        return fn({k: _walk_convert(v, fn) for k, v in tree.items()})
    if hasattr(tree, "_fields"):  # NamedTuple (optax states)
        return type(tree)(*(_walk_convert(v, fn) for v in tree))
    if isinstance(tree, (tuple, list)):
        return type(tree)(_walk_convert(v, fn) for v in tree)
    return tree


def stack_mp_params(tree):
    """Layered checkpoint format (mp_0..mp_{L-1}) -> nn.scan format
    (mp_scan/mp with leading layer axis). Works on params AND optax
    state trees (any dict holding the layered keys)."""
    import numpy as np

    def fn(d):
        mps = sorted(
            (k for k in d if k.startswith("mp_") and k[3:].isdigit()),
            key=lambda k: int(k[3:]),
        )
        if not mps:
            return d
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[d[k] for k in mps],
        )
        out = {k: v for k, v in d.items() if k not in mps}
        out["mp_scan"] = {"mp": stacked}
        return out

    return _walk_convert(tree, fn)


def unstack_mp_params(tree):
    """nn.scan format -> layered checkpoint format (the on-disk
    convention: every committed checkpoint stays loadable by layered
    models and the slotted/dist inference paths)."""
    import numpy as np

    def fn(d):
        if "mp_scan" not in d or not isinstance(d["mp_scan"], dict):
            return d
        stacked = d["mp_scan"]["mp"]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        out = {k: v for k, v in d.items() if k != "mp_scan"}
        for i in range(n):
            out[f"mp_{i}"] = jax.tree_util.tree_map(
                lambda x, i=i: np.asarray(x)[i], stacked
            )
        return out

    return _walk_convert(tree, fn)


class NodeEdgeProcessing(nn.Module):
    """Encode-process-decode GNN producing per-edge block entries.

    Mirrors gnns.py:9-97: node/edge FeedForward encoders, ``num_mp_layers``
    MPLayers, then an edge decoder on [edge ‖ x_row ‖ x_col]; node decoder
    is identity when ``node_out_features`` is None (the production setting —
    the model's output is the factor entries on edges).
    """

    node_out_features: Optional[int] = None
    edge_out_features: int = 1
    node_features: int = 16
    edge_features: int = 16
    num_mp_layers: int = 4
    node_residual: bool = True
    edge_residual: bool = True
    node_encoder: Optional[dict] = None
    edge_encoder: Optional[dict] = None
    node_decoder: Optional[dict] = None
    edge_decoder: Optional[dict] = None
    node_mlp: Optional[dict] = None
    edge_mlp: Optional[dict] = None
    msg_mlp: Optional[dict] = None
    aggr: str = "add"
    msg_norm: bool = False
    weight_init: str = "lecun"
    # Rematerialize each MP layer in the backward pass (jax.checkpoint):
    # activation memory drops from O(num_mp_layers * E * 3F) to one
    # layer's worth, at ~1/3 extra forward FLOPs — the TPU-idiomatic
    # memory/compute trade for large variable-topology batches.
    remat: bool = False
    # nn.scan over the MP layers: one traced/compiled layer body instead
    # of num_mp_layers inlined copies — shrinks the training-step program
    # ~L-fold (the round-1k "3x sum-of-parts" step overhead was program-
    # scheduling cost that grows with program size). Param tree gains a
    # stacked `mp_scan/mp` subtree; checkpoints stay in the layered
    # format on disk ({stack,unstack}_mp_params convert on save/load).
    scan_mp: bool = False

    def _ff_kwargs(self, cfg: Optional[dict]) -> dict:
        return {"weight_init": self.weight_init, **(cfg or {})}

    @nn.compact
    def __call__(self, node_attr, edge_index, edge_attr, edge_weight=None):
        x = FeedForward(
            out_channels=self.node_features,
            **self._ff_kwargs(self.node_encoder),
            name="node_enc",
        )(node_attr)
        e = FeedForward(
            out_channels=self.edge_features,
            **self._ff_kwargs(self.edge_encoder),
            name="edge_enc",
        )(edge_attr)

        if self.scan_mp and self.num_mp_layers > 0:
            scan_cls = nn.scan(
                _MPScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_mp_layers,
            )
            (x, e, _, _), _ = scan_cls(
                node_channels=self.node_features,
                edge_channels=self.edge_features,
                node_residual=self.node_residual,
                edge_residual=self.edge_residual,
                node_mlp=self.node_mlp,
                edge_mlp=self.edge_mlp,
                msg_mlp=self.msg_mlp,
                aggr=self.aggr,
                msg_norm=self.msg_norm,
                weight_init=self.weight_init,
                remat=self.remat,
                name="mp_scan",
            )((x, e, edge_index, edge_weight), None)
        else:
            mp_cls = nn.remat(MPLayer) if self.remat else MPLayer
            for i in range(self.num_mp_layers):
                x, e = mp_cls(
                    node_channels=self.node_features,
                    edge_channels=self.edge_features,
                    node_residual=self.node_residual,
                    edge_residual=self.edge_residual,
                    node_mlp=self.node_mlp,
                    edge_mlp=self.edge_mlp,
                    msg_mlp=self.msg_mlp,
                    aggr=self.aggr,
                    msg_norm=self.msg_norm,
                    weight_init=self.weight_init,
                    name=f"mp_{i}",
                )(x, edge_index, e, edge_weight)

        edge_dec_in = jnp.concatenate(
            [e, x[edge_index[0]], x[edge_index[1]]], axis=-1
        )
        edge_out = FeedForward(
            out_channels=self.edge_out_features,
            **self._ff_kwargs(self.edge_decoder),
            name="edge_dec",
        )(edge_dec_in)

        if self.node_out_features is None:
            node_out = x
        else:
            node_out = FeedForward(
                out_channels=self.node_out_features,
                **self._ff_kwargs(self.node_decoder),
                name="node_dec",
            )(x)
        return node_out, edge_out


class PositionalEncoding(nn.Module):
    """Sine positional encoding with exp-scaled frequencies (unused by the
    production path; parity with basic_layers.py:47-70)."""

    n_freqs: int = 1
    base_freq: float = float(jnp.pi)
    exp_scaling: bool = True

    def output_dim(self, input_dim: int) -> int:
        return (1 + self.n_freqs) * input_dim

    @nn.compact
    def __call__(self, x):
        freqs = jnp.arange(1, self.n_freqs + 1, dtype=x.dtype) * self.base_freq
        if self.exp_scaling:
            freqs = jnp.exp2(freqs)
        ys = [jnp.sin(x[..., [i]] * freqs) for i in range(x.shape[-1])]
        return jnp.concatenate(ys + [x], axis=-1)

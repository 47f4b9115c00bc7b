"""Row-partitioned (model-parallel) GNN inference with halo feature exchange.

SURVEY §2.10's last first-class component: for matrices that need N shards
to *solve*, the preconditioner must also be *constructed* sharded — the
reference's GNN capability surface (neural_cg/nn/gnns.py:77-97) at
multi-device scale. Design (TPU-native, no reference analog to copy):

  * nodes are row-partitioned with the SAME RCM + chunk/halo geometry as
    the distributed solver (`partition_gsel`); edges live with their
    destination (matrix-row) shard;
  * every message-passing round exchanges the `halo` boundary rows of the
    *updated* node-feature block with the ring neighbors
    (`jax.lax.ppermute` via dist/cg._halo_exchange) — a halo node's state
    is always computed by its owner (full neighbor set) and mirrored,
    never recomputed from a partial neighborhood;
  * each shard additionally carries "ghost" edges — the transposed
    partners of its boundary edges (dst in the halo zone, src local).
    Their edge-state chain depends only on endpoint features + their own
    state, so the shard replicates it locally; at decode time they yield
    exactly the off-shard L^T entries the local solve rows need. No
    edge-value exchange is required anywhere;
  * the decoder's per-edge factor values scatter into pre-built gsel slot
    maps (`l_map`/`lt_map`, one gather per shard) producing the
    `PartitionedGsel` value planes that feed `dist_pcg_gsel` directly —
    construction and solve share one partition, zero host round-trips.

Scalar (block_size=1) factors only for now; the BSR families expand to
scalar CSR before the solver anyway (kernels/gsel.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..gnn.layers import FeedForward, MPLayer, NodeEdgeProcessing
from .cg import AXIS, _halo_exchange
from .gsel_dist import PartitionedGsel, dist_pcg_gsel, partition_gsel_permuted
from .partition import rcm_permutation


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGnnGraph:
    """Host-prepped sharded inference graph + factor slot maps.

    Leading axis of every array is the shard axis (shard_map splits it).
    Edge arrays hold [local edges | ghost edges | padding]; `l_map` /
    `lt_map` index the decoder's per-edge value vector (sentinel = e_pad,
    which reads the appended zero)."""

    pg_a: PartitionedGsel  # system planes (values of A)
    node_feat: jax.Array  # f32 [P, chunk, Fn]
    edge_feat: jax.Array  # f32 [P, E_pad, Fe]
    edge_dst: jax.Array  # i32 [P, E_pad] extended-frame row
    edge_src: jax.Array  # i32 [P, E_pad] extended-frame col
    edge_valid: jax.Array  # f32 [P, E_pad] 1 real / 0 pad
    l_map: jax.Array  # i32 [P, S, GK', T] slot -> edge value index
    lt_map: jax.Array  # i32 [P, S, GK', T]
    e_pad: int = _static(default=0)
    n_local: jax.Array = None  # i32 [P] local edge counts (diagnostics)


def partition_gnn_inference(
    a: sp.spmatrix,
    node_feats: np.ndarray,
    edge_feats: np.ndarray,
    n_shards: int,
    reorder: bool = True,
    group: int = 16,
) -> Tuple[PartitionedGnnGraph, np.ndarray]:
    """Partition matrix + input features for sharded GNN inference.

    ``edge_feats`` rows align with ``sp.csr_matrix(a).tocoo()`` entry
    order (canonical CSR order); ``node_feats`` with the original row
    order. Returns (graph, perm) with the same ordering contract as
    `partition_gsel`."""
    a = sp.csr_matrix(a, dtype=np.float64)
    a.sort_indices()
    n = a.shape[0]
    node_feats = np.asarray(node_feats, np.float32).reshape(n, -1)
    edge_feats = np.asarray(edge_feats, np.float32).reshape(a.nnz, -1)

    perm = rcm_permutation(a) if reorder else np.arange(n)
    # carry original edge ids through the permutation so features follow
    eid = sp.csr_matrix(
        (np.arange(a.nnz, dtype=np.float64) + 1.0, a.indices, a.indptr),
        shape=a.shape,
    )
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    eid_p = eid[perm][:, perm].tocsr()
    eid_p.sort_indices()
    coo = ap.tocoo()  # csr order: row-major, cols sorted
    orig_of = (eid_p.tocoo().data - 1.0).astype(np.int64)
    ef_p = edge_feats[orig_of]
    nf_p = node_feats[perm]

    pg_a = partition_gsel_permuted(ap, n_shards, group=group)
    chunk, halo = pg_a.chunk, pg_a.halo
    ext = chunk + 2 * halo

    row, col = coo.row, coo.col
    shard_of = row // chunk
    csr_pos = np.arange(len(row))

    loc_lists, ghost_lists = [], []
    for s in range(n_shards):
        lo, hi = s * chunk, (s + 1) * chunk
        loc = np.flatnonzero(shard_of == s)
        ghost = np.flatnonzero(
            ((row >= lo - halo) & (row < lo) | (row >= hi) & (row < hi + halo))
            & (col >= lo)
            & (col < hi)
        )
        loc_lists.append(loc)
        ghost_lists.append(ghost)
    n_loc = np.array([len(x) for x in loc_lists])
    e_pad = int(
        max(len(ll) + len(gg) for ll, gg in zip(loc_lists, ghost_lists))
    )
    assert e_pad < 2**24, "edge ids must stay f32-exact in the slot maps"

    fe = ef_p.shape[1]
    dst = np.zeros((n_shards, e_pad), np.int32)
    src = np.zeros((n_shards, e_pad), np.int32)
    ef_s = np.zeros((n_shards, e_pad, fe), np.float32)
    ev = np.zeros((n_shards, e_pad), np.float32)
    nf_s = np.zeros((n_shards, chunk, node_feats.shape[1]), np.float32)
    # per-shard edge-position lookup over GLOBAL coords (for lt_map)
    pos_mats = []
    for s in range(n_shards):
        sel = np.concatenate([loc_lists[s], ghost_lists[s]])
        k = len(sel)
        dst[s, :k] = row[sel] - s * chunk + halo
        src[s, :k] = col[sel] - s * chunk + halo
        ef_s[s, :k] = ef_p[sel]
        ev[s, :k] = 1.0
        lo = s * chunk
        nf_b = nf_p[lo : min(lo + chunk, n)]
        nf_s[s, : nf_b.shape[0]] = nf_b
        pos_mats.append(
            sp.csr_matrix(
                (np.arange(k, dtype=np.float64) + 1.0, (row[sel], col[sel])),
                shape=(n, n),
            )
        )

    # L slot map: same pattern as A; data = local edge position + 1.
    # Local edges keep csr order, so position = csr_pos - first-of-shard.
    first = np.zeros(n_shards, np.int64)
    for s in range(n_shards):
        first[s] = loc_lists[s][0] if len(loc_lists[s]) else 0
    l_ids = csr_pos - first[shard_of] + 1.0
    aid = sp.csr_matrix((l_ids, (row, col)), shape=(n, n))
    pg_l = partition_gsel_permuted(aid, n_shards, halo=halo, group=group)

    # L^T slot map: entry (i, j) needs the value of L[j, i] — the
    # transposed partner's position in owner(i)'s [local|ghost] list.
    lt_data = np.zeros(len(row))
    for s in range(n_shards):
        sel = loc_lists[s]
        if len(sel) == 0:
            continue
        lookup = pos_mats[s][col[sel], row[sel]]
        if sp.issparse(lookup):  # scipy returns sparse for some index forms
            lookup = lookup.todense()
        part = np.asarray(lookup).ravel()
        assert (part > 0).all(), "transposed partner missing from ghost set"
        lt_data[sel] = part
    bid = sp.csr_matrix((lt_data, (row, col)), shape=(n, n))
    pg_lt = partition_gsel_permuted(bid, n_shards, halo=halo, group=group)

    for q in (pg_l, pg_lt):
        assert (
            q.k_width == pg_a.k_width
            and q.q_chunks == pg_a.q_chunks
            and q.chunk == chunk
            and q.halo == halo
        ), "slot-map geometry diverged from the system planes"

    def to_map(planes):
        v = np.asarray(planes.vals)
        m = np.rint(v).astype(np.int32) - 1
        return jnp.asarray(np.where(m < 0, e_pad, m))

    return (
        PartitionedGnnGraph(
            pg_a=pg_a,
            node_feat=jnp.asarray(nf_s),
            edge_feat=jnp.asarray(ef_s),
            edge_dst=jnp.asarray(dst),
            edge_src=jnp.asarray(src),
            edge_valid=jnp.asarray(ev),
            l_map=to_map(pg_l),
            lt_map=to_map(pg_lt),
            e_pad=e_pad,
            n_local=jnp.asarray(n_loc.astype(np.int32)),
        ),
        perm,
    )


def _submodules(model: NodeEdgeProcessing):
    """The encoder/MP/decoder stack as standalone modules sharing the
    parameter subtrees of a trained `NodeEdgeProcessing`."""
    ne = FeedForward(
        out_channels=model.node_features, **(model.node_encoder or {})
    )
    ee = FeedForward(
        out_channels=model.edge_features, **(model.edge_encoder or {})
    )
    mps = [
        MPLayer(
            node_channels=model.node_features,
            edge_channels=model.edge_features,
            node_residual=model.node_residual,
            edge_residual=model.edge_residual,
            node_mlp=model.node_mlp,
            edge_mlp=model.edge_mlp,
            msg_mlp=model.msg_mlp,
            aggr=model.aggr,
            msg_norm=model.msg_norm,
        )
        for _ in range(model.num_mp_layers)
    ]
    ed = FeedForward(
        out_channels=model.edge_out_features, **(model.edge_decoder or {})
    )
    return ne, ee, mps, ed


def _local_forward(model, params, pgnn, nf, ef, dst, src, ev, axis=AXIS):
    """One shard's encode-process-decode with per-layer halo exchange.

    Op-for-op the single-device NodeEdgeProcessing forward: halo node rows
    are mirrored from their owner after every MP round, so local rows see
    exactly the global computation; ghost-edge states ride the same edge
    list (their messages land in halo rows, which the next exchange
    overwrites)."""
    p = params["params"]
    ne, ee, mps, ed = _submodules(model)
    chunk, halo = pgnn.pg_a.chunk, pgnn.pg_a.halo
    idx = jnp.stack([dst, src])

    x = ne.apply({"params": p["node_enc"]}, nf)  # [chunk, F]
    e = ee.apply({"params": p["edge_enc"]}, ef)  # [E_pad, F]
    for i, mp in enumerate(mps):
        x_ext = _halo_exchange(x, halo, axis)  # [ext, F]
        x_new, e = mp.apply({"params": p[f"mp_{i}"]}, x_ext, idx, e, ev)
        x = x_new[halo : halo + chunk]
    x_ext = _halo_exchange(x, halo, axis)
    dec_in = jnp.concatenate([e, x_ext[dst], x_ext[src]], axis=-1)
    vals = ed.apply({"params": p["edge_dec"]}, dec_in)  # [E_pad, b^2]
    return vals[:, 0] * ev  # scalar factors; padding rows forced to 0


def dist_gnn_factor(
    model: NodeEdgeProcessing,
    params,
    pgnn: PartitionedGnnGraph,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> jax.Array:
    """Sharded GNN forward -> per-edge factor values [P, E_pad]."""
    from jax.sharding import PartitionSpec as P

    assert model.edge_out_features == 1, "scalar (b=1) factors only"

    shard_map = _get_shard_map()
    if mesh is None:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[: pgnn.pg_a.n_shards]), (AXIS,)
        )
    spec = P(AXIS)

    def body(nf, ef, dst, src, ev):
        return _local_forward(
            model, params, pgnn, nf[0], ef[0], dst[0], src[0], ev[0]
        )[None]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=spec,
        check_rep=False,
    )
    return fn(
        pgnn.node_feat, pgnn.edge_feat, pgnn.edge_dst, pgnn.edge_src,
        pgnn.edge_valid,
    )


def factor_planes(
    pgnn: PartitionedGnnGraph, evals: jax.Array
) -> Tuple[PartitionedGsel, PartitionedGsel]:
    """Decoder values [P, E_pad] -> (L, L^T) PartitionedGsel planes."""
    ev = jnp.concatenate(
        [evals.astype(jnp.float32), jnp.zeros((evals.shape[0], 1), jnp.float32)],
        axis=1,
    )  # sentinel zero at index e_pad

    def fill(m):
        return jax.vmap(lambda e, mm: e[mm])(ev, m)

    pl = dataclasses.replace(pgnn.pg_a, vals=fill(pgnn.l_map))
    plt = dataclasses.replace(pgnn.pg_a, vals=fill(pgnn.lt_map))
    return pl, plt


def dist_neural_pcg(
    model: NodeEdgeProcessing,
    params,
    pgnn: PartitionedGnnGraph,
    b: jax.Array,  # [P, chunk] partitioned rhs
    epsilon: float = 3e-3,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    impl: str = "pallas",
    mesh: Optional[jax.sharding.Mesh] = None,
):
    """Fully sharded neural solve: dist GNN construction + dist SPAI-PCG.

    The whole pipeline runs on the mesh: sharded forward, slot-map value
    fill, then `dist_pcg_gsel` — no single-device materialization of the
    factor at any point."""
    evals = dist_gnn_factor(model, params, pgnn, mesh=mesh)
    pl, plt = factor_planes(pgnn, evals)
    return dist_pcg_gsel(
        pgnn.pg_a, b, pl=pl, plt=plt, epsilon=epsilon, rtol=rtol,
        max_iter=max_iter, impl=impl, mesh=mesh,
    )


def _get_shard_map():
    try:
        from jax import shard_map as _sm  # jax >= 0.8

        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw)

        return shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

        return shard_map

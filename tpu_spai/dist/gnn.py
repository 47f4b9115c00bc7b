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

Block factors (block_size b > 1, the elasticity families — reference
`nif.py:259`, edge_out = b^2): the GNN message-passes over the BLOCK
graph (one node per b-block row), the decoder emits b^2 channels per
block edge, and the slot maps index the FLATTENED [E_pad*b^2] decoder
output — the scalar expansion (kernels/gsel.py single-device analog)
happens entirely inside the slot-map gather, shard-locally. The scalar
partition chunk is constrained to a multiple of b (chunk_multiple) so
block rows never straddle shards, which keeps decoder values co-located
with the scalar solve rows that need them.
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
from .gsel_dist import (
    PartitionedGsel,
    _get_shard_map,
    dist_pcg_gsel,
    dist_pcg_gsel_rr,
    partition_gsel_permuted,
)
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
    l_map: jax.Array  # i32 [P, S, GK', T] slot -> flat edge value index
    lt_map: jax.Array  # i32 [P, S, GK', T]
    e_pad: int = _static(default=0)  # block-edge capacity per shard
    n_local: jax.Array = None  # i32 [P] local edge counts (diagnostics)
    b: int = _static(default=1)  # block size (scalar matrix = b * n_blk)
    # optional Dirichlet-mask (+ scaled-ws rsqrt) folds as slot planes:
    # factor value' = value * scale + add (slotted_block.scalar_scale_add
    # semantics, partitioned). None = no masking.
    scale_f: Optional[jax.Array] = None  # f32 [P, S, GK', T]
    scale_r: Optional[jax.Array] = None
    add_p: Optional[jax.Array] = None


def partition_gnn_inference(
    a: sp.spmatrix,
    node_feats: np.ndarray,
    edge_feats: np.ndarray,
    n_shards: int,
    reorder: bool = True,
    group: int = 16,
    block_size: int = 1,
    mask_dof: Optional[np.ndarray] = None,
    rsqrt_dof: Optional[np.ndarray] = None,
    double_single: bool = True,
) -> Tuple[PartitionedGnnGraph, np.ndarray]:
    """Partition matrix + input features for sharded GNN inference.

    ``mask_dof`` (original scalar-dof order): Dirichlet mask folded into
    the factor planes at decode time — value' = m[R] m[C] (rsqrt[..]) v
    + (1-m[R]) on the diagonal, matching the single-device
    `scalar_scale_add`. Pass ``a`` with the MASKED values but the RAW
    block pattern (e.g. ``a_masked + 0 * a_raw``) so the GNN sees every
    stored edge while the solve sees the Dirichlet system.

    ``a`` is the SCALAR matrix (n = b * n_blk rows). For block_size b=1,
    ``edge_feats`` rows align with ``sp.csr_matrix(a).tocoo()`` entry
    order (canonical CSR order) and ``node_feats`` with the row order.
    For b>1, features live at the BLOCK level: ``node_feats`` has one
    row per block node and ``edge_feats`` aligns with the canonical coo
    order of the collapsed block pattern (`(row//b, col//b)` uniqued) —
    the order `collate`'s block graphs emit. Returns (graph, perm) with
    perm over BLOCK nodes (b=1: plain rows), same contract as
    `partition_gsel`."""
    b = int(block_size)
    bb = b * b
    a = sp.csr_matrix(a, dtype=np.float64)
    a.sort_indices()
    n_s = a.shape[0]
    assert n_s % b == 0, (n_s, b)
    n = n_s // b  # block nodes
    node_feats = np.asarray(node_feats, np.float32).reshape(n, -1)

    # block pattern (b=1: the matrix pattern itself)
    coo_s0 = a.tocoo()
    pat = sp.csr_matrix(
        (np.ones(a.nnz), (coo_s0.row // b, coo_s0.col // b)), shape=(n, n)
    )
    pat.sum_duplicates()
    pat.sort_indices()
    e_blk = pat.nnz
    edge_feats = np.asarray(edge_feats, np.float32).reshape(e_blk, -1)

    perm = rcm_permutation(pat) if reorder else np.arange(n)
    # carry original edge ids through the permutation so features follow
    eid = sp.csr_matrix(
        (np.arange(e_blk, dtype=np.float64) + 1.0, pat.indices, pat.indptr),
        shape=pat.shape,
    )
    eid_p = eid[perm][:, perm].tocsr()
    eid_p.sort_indices()
    coo = eid_p.tocoo()  # csr order: row-major, cols sorted
    orig_of = (coo.data - 1.0).astype(np.int64)
    ef_p = edge_feats[orig_of]
    nf_p = node_feats[perm]

    # scalar system over the EXPANDED block pattern (explicit zeros kept:
    # A, L and L^T must share one slot geometry even where A has a
    # structurally-zero scalar entry inside a stored block)
    perm_s = (perm[:, None] * b + np.arange(b)[None, :]).reshape(-1)
    ap_s = a[perm_s][:, perm_s].tocsr()
    ap_s.sort_indices()
    row, col = coo.row, coo.col  # block coords, permuted frame
    i_idx, j_idx = np.divmod(np.arange(bb), b)
    rows_s = (row[:, None] * b + i_idx[None, :]).reshape(-1)
    cols_s = (col[:, None] * b + j_idx[None, :]).reshape(-1)
    vals_s = np.asarray(ap_s[rows_s, cols_s]).reshape(-1)
    a_exp = sp.csr_matrix((vals_s, (rows_s, cols_s)), shape=(n_s, n_s))

    pg_a = partition_gsel_permuted(
        a_exp, n_shards, group=group, chunk_multiple=b,
        double_single=double_single,
    )
    chunk_s, halo_s = pg_a.chunk, pg_a.halo
    chunk, halo = chunk_s // b, halo_s // b  # block-level geometry

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
    assert e_pad * bb + 1 < 2**24, (
        "flat edge ids must stay f32-exact in the slot maps"
    )

    fe = ef_p.shape[1]
    dst = np.zeros((n_shards, e_pad), np.int32)
    src = np.zeros((n_shards, e_pad), np.int32)
    ef_s = np.zeros((n_shards, e_pad, fe), np.float32)
    ev = np.zeros((n_shards, e_pad), np.float32)
    nf_s = np.zeros((n_shards, chunk, node_feats.shape[1]), np.float32)
    # per-shard edge-position lookup over GLOBAL block coords (for lt_map)
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

    # L slot map over the scalar grid: the nonzero at (b*r+i, b*c+j)
    # reads flat decoder index pos(e)*b^2 + i*b+j, where pos(e) is the
    # block edge's position in its owner's [local|ghost] list. Local
    # edges keep csr order, so pos = csr_pos - first-of-shard.
    first = np.zeros(n_shards, np.int64)
    for s in range(n_shards):
        first[s] = loc_lists[s][0] if len(loc_lists[s]) else 0
    pos_l = (csr_pos - first[shard_of]).astype(np.float64)
    ch = (i_idx * b + j_idx).astype(np.float64)  # [bb]
    l_ids = (pos_l[:, None] * bb + ch[None, :] + 1.0).reshape(-1)
    aid = sp.csr_matrix((l_ids, (rows_s, cols_s)), shape=(n_s, n_s))
    pg_l = partition_gsel_permuted(
        aid, n_shards, halo=halo_s, group=group, chunk_multiple=b
    )

    # L^T slot map: scalar entry (b*r+i, b*c+j) needs L[b*c+j, b*r+i] =
    # (block edge (c, r))[j, i] — the transposed partner's position in
    # owner(r)'s [local|ghost] list, channel-transposed (j*b+i).
    lt_pos = np.zeros(len(row))
    for s in range(n_shards):
        sel = loc_lists[s]
        if len(sel) == 0:
            continue
        lookup = pos_mats[s][col[sel], row[sel]]
        if sp.issparse(lookup):  # scipy returns sparse for some index forms
            lookup = lookup.todense()
        part = np.asarray(lookup).ravel()
        assert (part > 0).all(), "transposed partner missing from ghost set"
        lt_pos[sel] = part - 1.0
    ch_t = (j_idx * b + i_idx).astype(np.float64)
    lt_ids = (lt_pos[:, None] * bb + ch_t[None, :] + 1.0).reshape(-1)
    bid = sp.csr_matrix((lt_ids, (rows_s, cols_s)), shape=(n_s, n_s))
    pg_lt = partition_gsel_permuted(
        bid, n_shards, halo=halo_s, group=group, chunk_multiple=b
    )

    for q in (pg_l, pg_lt):
        assert (
            q.k_width == pg_a.k_width
            and q.q_chunks == pg_a.q_chunks
            and q.chunk == chunk_s
            and q.halo == halo_s
        ), "slot-map geometry diverged from the system planes"

    def to_map(planes):
        v = np.asarray(planes.vals)
        m = np.rint(v).astype(np.int32) - 1
        return jnp.asarray(np.where(m < 0, e_pad * bb, m))

    # Dirichlet mask / rsqrt folds as value planes over the same geometry
    scale_f = scale_r = add_p = None
    if mask_dof is not None:
        m_p = np.asarray(mask_dof, np.float64).reshape(-1)[perm_s]
        base = m_p[rows_s] * m_p[cols_s]
        if rsqrt_dof is not None:
            rs_p = np.asarray(rsqrt_dof, np.float64).reshape(-1)[perm_s]
            sf_d = base * rs_p[cols_s]
            sr_d = base * rs_p[rows_s]
        else:
            sf_d = sr_d = base
        add_d = np.where(rows_s == cols_s, 1.0 - m_p[rows_s], 0.0)

        def part_vals(data):
            pg = partition_gsel_permuted(
                sp.csr_matrix((data, (rows_s, cols_s)), shape=(n_s, n_s)),
                n_shards, halo=halo_s, group=group, chunk_multiple=b,
            )
            assert pg.k_width == pg_a.k_width and pg.chunk == chunk_s
            return pg.vals

        scale_f = part_vals(sf_d)
        scale_r = part_vals(sr_d)
        add_p = part_vals(add_d)

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
            b=b,
            scale_f=scale_f,
            scale_r=scale_r,
            add_p=add_p,
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
    # block-level geometry (scalar chunk/halo are b-multiples by
    # construction — partition_gsel_permuted chunk_multiple=b)
    chunk = pgnn.pg_a.chunk // pgnn.b
    halo = pgnn.pg_a.halo // pgnn.b
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
    if pgnn.b == 1:
        return vals[:, 0] * ev  # scalar factors; padding rows forced to 0
    return vals * ev[:, None]  # [E_pad, b^2]; padding rows forced to 0


def dist_gnn_factor(
    model: NodeEdgeProcessing,
    params,
    pgnn: PartitionedGnnGraph,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> jax.Array:
    """Sharded GNN forward -> per-edge factor values [P, E_pad]."""
    from jax.sharding import PartitionSpec as P

    assert model.edge_out_features == pgnn.b**2, (
        "decoder channels must equal block_size^2",
        model.edge_out_features, pgnn.b,
    )

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
    """Decoder values [P, E_pad] (b=1) or [P, E_pad, b^2] -> (L, L^T)
    PartitionedGsel planes (slot maps index the flattened channels)."""
    flat = evals.reshape(evals.shape[0], -1)
    ev = jnp.concatenate(
        [flat.astype(jnp.float32), jnp.zeros((flat.shape[0], 1), jnp.float32)],
        axis=1,
    )  # sentinel zero at flat index e_pad * b^2

    def fill(m):
        return jax.vmap(lambda e, mm: e[mm])(ev, m)

    vf = fill(pgnn.l_map)
    vr = fill(pgnn.lt_map)
    if pgnn.scale_f is not None:
        vf = vf * pgnn.scale_f + pgnn.add_p
        vr = vr * pgnn.scale_r + pgnn.add_p
    # vals_lo belongs to A only — the factor is f32-born (GNN output)
    pl = dataclasses.replace(pgnn.pg_a, vals=vf, vals_lo=None)
    plt = dataclasses.replace(pgnn.pg_a, vals=vr, vals_lo=None)
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
    precision: str = "rr",  # 'rr' (TPU) | 'f64' (host mesh) | 'f32'
):
    """Fully sharded neural solve: dist GNN construction + dist SPAI-PCG.

    The whole pipeline runs on the mesh: sharded forward, slot-map value
    fill, then the distributed PCG — no single-device materialization of
    the factor at any point. ``precision='rr'`` (default) runs the
    group-anchored residual-replacement tier with the ds_a A-matvec
    (`dist_pcg_gsel_rr`): fp64-grade TRUE-residual stopping matching the
    host oracle's iteration counts; requires the graph partitioned with
    double_single=True (partition_gnn_inference default)."""
    evals = dist_gnn_factor(model, params, pgnn, mesh=mesh)
    pl, plt = factor_planes(pgnn, evals)
    if precision == "f64":
        # honest tier on host-simulated meshes: ds pair arithmetic
        # collapses under XLA:CPU fusion (kernels/ds.py caveat), making
        # the rr tier's anchored trajectory bistable there; native f64
        # reproduces the host oracle deterministically
        from .gsel_dist import dist_pcg_gsel_f64

        assert pgnn.pg_a.vals_lo is not None, (
            "partition_gnn_inference(double_single=True) required for f64"
        )
        return dist_pcg_gsel_f64(
            pgnn.pg_a, b, pl=pl, plt=plt, epsilon=epsilon, rtol=rtol,
            max_iter=max_iter, mesh=mesh,
        )
    if precision == "rr":
        assert pgnn.pg_a.vals_lo is not None, (
            "partition_gnn_inference(double_single=True) required for rr"
        )
        return dist_pcg_gsel_rr(
            pgnn.pg_a, b, pl=pl, plt=plt, epsilon=epsilon, rtol=rtol,
            max_iter=max_iter, impl=impl, mesh=mesh, a_ds=True,
        )
    return dist_pcg_gsel(
        pgnn.pg_a, b, pl=pl, plt=plt, epsilon=epsilon, rtol=rtol,
        max_iter=max_iter, impl=impl, mesh=mesh,
    )



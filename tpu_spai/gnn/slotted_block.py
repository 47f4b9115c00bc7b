"""Slot-layout GNN inference for block matrices (block_size b > 1).

Extends the b=1 fully-on-device preconditioner construction
(gnn/slotted.py) to the elasticity families (3x3 blocks, reference
`training/elast_twist.sh`, `data.block_size=3`): the GNN message-passes
over the BLOCK graph's slot grid (one slot per 3x3 block), the decoder
emits all b^2 channels per block slot, and two precomputed index planes
expand those channels straight into gsel solver planes of the b*n-sized
SCALAR matrix — zero host work per sample after layout construction.

Mapping (fixed per topology):
  * block slot grid `sg` over (rows_b, cols_b) — drives the GNN exactly
    as in the b=1 path (slotted_gnn_forward with out_channels=b^2);
  * expanded scalar pattern: the nonzero at (b*r+i, b*c+j) comes from
    block edge e=(r,c), channel i*b+j. Its gsel slot stores `perm_f` =
    flat index pos_b(e)*b^2 + (i*b+j) into the flattened decoder planes;
  * the transpose factor L^T at (b*r+i, b*c+j) equals L[b*c+j, b*r+i] =
    (block of edge (c,r))[j, i]; the reverse-orientation decoder output
    at block slot (r,c) IS the (c,r) prediction (slotted.py dual
    orientation), so `perm_r` only transposes the channel: j*b+i.

Dirichlet masking and the scaled workspace's D^{-1/2} fold
(scaled_workspace.py:199-212; apply_dbc_masking semantics of
sparse/convert.py) become per-slot scale/add planes computed host-side
once per sample from the scalar row/col of every slot.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.gsel import GselPlanes
from .slotted import SlotGraph, build_slot_graph


def _static(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSlotLayout:
    """Fixed-topology device layout for block-matrix slot inference."""

    sg: SlotGraph  # block-graph slot grid (GNN MP + decoder)
    pattern: GselPlanes  # expanded scalar pattern (vals = zeros)
    perm_f: jax.Array  # int32 [S,GK,T] into flat [pos*b^2 + i*b+j]
    perm_r: jax.Array  # int32 [S,GK,T], channel-transposed (j*b+i)
    mask: jax.Array  # f32 [S,GK,T] valid-slot mask of the scalar grid
    # gsel-formulated expansion gathers (round 4): the permutation
    # perm_f/perm_r as 1-nnz-per-row gsel planes, so the plane expansion
    # runs the windowed select-gather kernel instead of a 128-lane row
    # gather (512 B/element — 16 ms of the 28 ms n=50k construction,
    # output/r4_prec50k_profile.json). None = fall back to _take_lanes.
    gf_f: Optional[GselPlanes] = None
    gf_r: Optional[GselPlanes] = None
    b: int = _static(default=1)
    # host-only scalar coordinates per slot (flat, -1 on padding) for the
    # per-sample scale/add planes; excluded from the pytree leaves
    srow: Optional[np.ndarray] = _static(default=None)
    scol: Optional[np.ndarray] = _static(default=None)


def build_block_slot_layout(
    rows_b,
    cols_b,
    n_b: int,
    b: int,
    group: int = 16,
    lane_groups: int = 8,
    window=None,
) -> Optional[BlockSlotLayout]:
    """Build the two-level layout from the block graph's directed edges.

    `rows_b/cols_b`: block-level directed edges in storage order (the
    order `predict_blocks` emits [E, b, b] values). Pattern must be
    symmetric (SPD block matrices). Returns None if either grid is
    unbandable (caller falls back to host factor assembly). `window`
    follows build_slot_graph (None = auto-pick vs lane groups)."""
    import scipy.sparse as sp

    from ..solver.gsel_solver import build_gsel_csr

    rows_b = np.asarray(rows_b)
    cols_b = np.asarray(cols_b)
    e = len(rows_b)
    sg = build_slot_graph(
        rows_b, cols_b, np.ones(e, np.float32), n_b,
        group=group, lane_groups=lane_groups, window=window,
    )
    if sg is None:
        return None

    # flat block-slot position of each edge
    perm_b = np.asarray(sg.perm).reshape(-1)
    sel = np.asarray(sg.mask).reshape(-1) > 0
    pos_b = np.full(e, -1, np.int64)
    pos_b[perm_b[sel]] = np.flatnonzero(sel)
    if (pos_b < 0).any():  # every edge must own a slot
        return None

    # expanded scalar ids matrix: data = pos_b(e)*b^2 + i*b + j + 1
    bb = b * b
    i_idx, j_idx = np.divmod(np.arange(bb), b)
    rows_s = (rows_b[:, None] * b + i_idx[None, :]).reshape(-1)
    cols_s = (cols_b[:, None] * b + j_idx[None, :]).reshape(-1)
    ids = (pos_b[:, None] * bb + np.arange(bb)[None, :] + 1).reshape(-1)
    n_s = n_b * b
    a_ids = sp.csr_matrix(
        (ids.astype(np.float64), (rows_s, cols_s)), shape=(n_s, n_s)
    )
    g_ids = build_gsel_csr(a_ids, dtype=np.float64)
    if g_ids is None:
        return None

    ids_s = np.asarray(g_ids.vals, np.float64)
    mask = (ids_s > 0).astype(np.float32)
    pf = np.maximum(ids_s.astype(np.int64) - 1, 0)
    pos, ch = np.divmod(pf, bb)
    ci, cj = np.divmod(ch, b)
    pr = pos * bb + cj * b + ci

    # scalar coordinates per slot for host-side scale/add construction
    e_of_pos = np.full(len(perm_b), -1, np.int64)
    e_of_pos[np.flatnonzero(sel)] = perm_b[sel]
    edge = e_of_pos[pos]
    valid = mask.reshape(-1) > 0
    srow = np.where(valid, rows_b[edge].reshape(-1) * b + ci.reshape(-1), -1)
    scol = np.where(valid, cols_b[edge].reshape(-1) * b + cj.reshape(-1), -1)

    pattern = dataclasses.replace(
        g_ids,
        vals=jnp.zeros(ids_s.shape, jnp.float32),
        vals_lo=None,
    )

    # gsel-formulated expansion permutation: one entry per valid dest
    # slot at (dest_flat, src_flat); applied as a windowed select-gather
    # (the _take_lanes row gather costs 512 B/element — dominant at
    # n ~ 50k). Built pattern-only, once per topology.
    def perm_planes(pidx):
        n_dest = pidx.size
        vmask = mask.reshape(-1) > 0
        dst = np.flatnonzero(vmask)
        src = pidx.reshape(-1)[dst]
        src_len = int(
            np.prod(np.asarray(jnp.shape(sg.mask))) * bb
        )
        pm = sp.csr_matrix(
            (np.ones(len(dst), np.float32), (dst, src)),
            shape=(n_dest, src_len),
        )
        # windows are wider than a matrix band (dest iterates K' faster
        # than rows): a 512-chunk window is ~256 KB VMEM — cheap
        return build_gsel_csr(pm, max_q=512)

    gf_f = perm_planes(pf)
    gf_r = perm_planes(pr) if gf_f is not None else None
    if gf_r is None:
        gf_f = None  # both or neither (shared code path)

    return BlockSlotLayout(
        sg=sg,
        pattern=pattern,
        perm_f=jnp.asarray(pf.astype(np.int32)),
        perm_r=jnp.asarray(pr.astype(np.int32)),
        mask=jnp.asarray(mask),
        gf_f=gf_f,
        gf_r=gf_r,
        b=b,
        srow=srow,
        scol=scol,
    )


def _take_lanes(srcf: jax.Array, idx: jax.Array) -> jax.Array:
    """Element gather reformulated TPU-fast: 128-lane ROW gather +
    on-the-fly lane select.

    XLA lowers a flat element gather (`jnp.take(src, idx)`) to a ~0.5
    GB/s scalar loop on TPU — 4.8 ms of the measured 6.9 ms construct at
    heat_r20 scale (output/r3_prec_profile.json). Gathering whole
    128-lane rows keeps the loads vectorized; the lane pick is a VPU
    compare+reduce the compiler fuses into the gather consumer."""
    pad = (-srcf.shape[0]) % 128
    if pad:
        srcf = jnp.pad(srcf, (0, pad))
    src2 = srcf.reshape(-1, 128)
    rows = idx // 128
    lanes = idx % 128
    g = src2[rows]  # [M, 128] row gather (vector slices)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == lanes[:, None]
    )
    return jnp.sum(g * sel.astype(g.dtype), axis=1)


def expand_block_planes(
    layout: BlockSlotLayout, planes_f: jax.Array, planes_r: jax.Array,
    impl: Optional[str] = None,
):
    """Decoder plane tensors [S_b, b^2, GK_b, T_b] -> scalar-grid value
    planes ([S,GK,T] f32) for L and L^T.

    Uses the gsel-formulated permutation gather when the layout carries
    it (windowed select — plane traffic ~bytes-proportional), else two
    128-lane row-gather takes (512 B/element)."""
    bb = layout.b * layout.b

    def flat(p):
        s, c, gk, t = p.shape
        assert c == bb
        return p.transpose(0, 2, 3, 1).reshape(-1)  # pos*b^2 + ch order

    shape = layout.mask.shape
    if layout.gf_f is not None:
        from ..solver.gsel_solver import gsel_matvec

        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        use = impl if impl in ("pallas", "xla") else "xla"
        vf = gsel_matvec(layout.gf_f, flat(planes_f), use)
        vr = gsel_matvec(layout.gf_r, flat(planes_r), use)
    else:
        vf = _take_lanes(flat(planes_f), layout.perm_f.reshape(-1))
        vr = _take_lanes(flat(planes_r), layout.perm_r.reshape(-1))
    return (
        vf.reshape(shape) * layout.mask,
        vr.reshape(shape) * layout.mask,
    )


def scalar_scale_add(
    layout: BlockSlotLayout,
    mask_dof: np.ndarray,
    rsqrt_dof: Optional[np.ndarray] = None,
):
    """Per-sample masking (+ optional scaled-workspace D^{-1/2} fold) as
    slot planes: value' = value * scale + add.

    Forward factor entry (R,C): m[R]*m[C]*rsqrt[C] * v + (1-m[R]) on the
    diagonal; the transpose factor folds rsqrt on its column dof, which
    is the forward ROW (L^T[R,C] = L[C,R]). Returns f32 jnp planes
    (scale_f, add_f, scale_r, add_r)."""
    m = np.asarray(mask_dof, np.float64).reshape(-1)
    r_, c_ = layout.srow, layout.scol
    valid = r_ >= 0
    rr = np.where(valid, r_, 0)
    cc = np.where(valid, c_, 0)
    base = np.where(valid, m[rr] * m[cc], 0.0)
    if rsqrt_dof is not None:
        rs = np.asarray(rsqrt_dof, np.float64).reshape(-1)
        sf = base * rs[cc]
        sr = base * rs[rr]
    else:
        sf = sr = base
    add = np.where(valid & (r_ == c_), 1.0 - m[rr], 0.0)
    shape = layout.mask.shape
    return (
        jnp.asarray(sf.reshape(shape), jnp.float32),
        jnp.asarray(add.reshape(shape), jnp.float32),
        jnp.asarray(sr.reshape(shape), jnp.float32),
        jnp.asarray(add.reshape(shape), jnp.float32),
    )

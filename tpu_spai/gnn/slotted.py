"""Slot-layout GNN inference: TPU-native preconditioner construction.

The flax path (gnn/layers.py) expresses message passing as per-edge row
gathers + segment_sum — XLA lowers both to scalar-core loops on TPU
(measured 10.3 ms for a 4-layer/16-wide forward at n=15.6k, E=189k vs
0.19 ms for the reference GPU, misc/tab_to_latex_benchmark.py). This
module reruns the SAME trained parameters over the gsel slot grid
(kernels/gsel.py) where every op is TPU-native:

  * x_j (source-node) features: hardware dynamic-gather per feature plane
    (kernels/gsel_pallas.py machinery) — no scalar gathers;
  * x_i (destination) features: the tile's own rows — a reshape;
  * message aggregation: masked sum over the K' sublane axis — free, the
    scatter disappears entirely (slots of a row share a lane);
  * MLPs: channel-axis einsum contractions on plane tensors [S,C,GK',T];
  * edge states are kept for BOTH orientations of every slot, so the
    decoder emits the factor values for Â and Âᵀ on the SAME slot grid —
    the SPAI preconditioner planes are `replace(pattern_planes, vals=...)`
    with zero device-side permutation (the pattern is symmetric).

Replaces the reference's torch_geometric inference path
(neural_cg/nn/gnns.py:77-97) for the timed preconditioner-construction
benchmark; training keeps the differentiable flax path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.gsel import LANE, GselPlanes, build_gsel, expand_window


# all channel contractions pin full-f32 MXU precision: the TPU default
# (bf16 passes) makes the compiled forward drift ~1e-2 from the CPU/flax
# path (caught by scripts/tpu_kernel_gate.py round 2)
_HI = jax.lax.Precision.HIGHEST

def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlotGraph:
    """Slot-grid view of a symmetric-pattern sparse graph.

    pattern: GselPlanes of the (symmetric) sparsity; `vals` holds the
      matrix entries (usable directly as the A-operator for the solve).
    mask:  f32 [S, GK', T] — 1 on real slots, 0 on padding.
    perm / perm_rev: int32 [S, GK', T] — original edge index of the slot's
      edge / of its reversed edge (by construction of a symmetric pattern
      both exist); arbitrary on padding slots.
    """

    pattern: GselPlanes
    mask: jax.Array
    perm: jax.Array
    perm_rev: jax.Array

    @property
    def n(self) -> int:
        return self.pattern.n_rows


def gnn_width_from_params(params) -> int:
    """Feature width of a NodeEdgeProcessing param tree (the node
    encoder's output channels) — feed to fused_safe_group(nf=...)."""
    p = params["params"] if "params" in params else params
    denses = sorted(
        (k for k in p["node_enc"] if k.startswith("Dense_")),
        key=lambda k: int(k[6:]),
    )
    return int(p["node_enc"][denses[-1]]["kernel"].shape[1])


def fused_safe_group(
    k_width: int, n_cols: int = 0, nf: int = 16, window: int = 1,
    q_chunks: int = 64,
) -> int:
    """Largest tile group whose fused-MP working set fits scoped VMEM.

    window=1 (lane-group grids): the empirical production bound
    (~16 live [16, G*K'*128] f32 tensors — G=6 at K'=23 / G=7 at K'=21
    verified on v5e, inside scan bodies included).

    window=2: byte model calibrated on v5e compile reports — resident x
    planes ([nf, n_chunks, 128] f32) + per-slot-lane live-plane bytes
    from `fused_vmem_per_slotlane(nf)` (650 B at nf=16, ~3700 B at
    nf=48). Callers should pass n_cols — with the default 0 the model
    reduces to a plane-only budget (adequate for n <~ 30k).

    Width-aware (round 4, VERDICT item 1): pass `nf` = the GNN feature
    width. nf<=16 keeps the proven 15 MiB default-limit budget
    byte-for-byte; wider models budget against the raised per-kernel
    vmem_limit_bytes that gnn/slotted_fused.py now sets (48 MiB target
    — leaves room for the double-buffered block windows, which also
    scale with nf, inside v5e's 128 MiB VMEM)."""
    from .slotted_fused import fused_vmem_per_slotlane

    # nf<=16 pins per-lane cost to the EMPIRICALLY PROVEN 650 B
    # constant (not the analytic 650.24 estimate) so production grids
    # and gate decisions at the proven width are byte-for-byte
    # identical to the pre-width-aware sizing (ADVICE r4)
    per = 650.0 if nf <= 16 else fused_vmem_per_slotlane(nf)
    budget_mib = 15.0 if nf <= 16 else 48.0
    if window == 1:
        # empirical w1 bound at nf=16 scaled by budget and per-lane cost
        units = int(13312 * (budget_mib / 15.0) * (650.0 / per))
        return max(1, units // (k_width * LANE))
    n_chunks = -(-n_cols // LANE) + q_chunks
    x_bytes = nf * n_chunks * LANE * 4
    if x_bytes > STREAM_X_BYTES:
        # kernel streams the per-group window instead (window_or_stream):
        # only the [nf, Qg, 128] scratch stays resident
        x_bytes = nf * q_chunks * LANE * 4
    budget = int(budget_mib * 2**20) - x_bytes
    return max(1, min(16, int(budget // (per * k_width * LANE))))


def build_slot_graph(
    rows, cols, values, n: int, group: int = 16, lane_groups: int = 8,
    window=None,
) -> Optional[SlotGraph]:
    """Build the slot grid from directed edge lists (symmetric pattern).

    `rows/cols/values`: the graph's directed edges in *storage order* (the
    order edge features and GNN outputs use). Pattern must be symmetric —
    every (r, c) has a (c, r) — which holds for all problem families
    (SPD matrices).

    window=2 (excludes lane_groups>1) packs slot rows with 2-chunk
    windows (kernels/gsel.py): K' reaches the max row degree on FEM
    patterns, shrinking every per-slot plane the GNN streams — measured
    1.3x (n=15.6k) to 2.6x (n=117k) on the fused forward (docs/PERF.md
    round-1n). window=None (default) probes both schemes on the pattern
    and keeps window=2 iff it cuts slots ≥20% (locality-free random
    patterns pack better with lane groups; FEM packs better windowed)."""
    import scipy.sparse as sp

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    e = len(rows)
    ids = np.arange(1, e + 1, dtype=np.float64)  # 0 reserved for padding
    a_ids = sp.csr_matrix((ids, (rows, cols)), shape=(n, n))
    at_ids = sp.csr_matrix((ids, (cols, rows)), shape=(n, n))
    a_val = sp.csr_matrix(
        (np.asarray(values, np.float64).reshape(-1), (rows, cols)), shape=(n, n)
    )
    probe = None
    if window is None:
        probe_w2 = build_gsel(a_ids, group=group, lane_groups=1, window=2)
        probe_ng = build_gsel(a_ids, group=group, lane_groups=lane_groups)
        if probe_w2 is not None and (
            probe_ng is None or probe_w2.slots <= 0.8 * probe_ng.slots
        ):
            window, probe = 2, probe_w2
        else:
            window, probe = 1, probe_ng
    if window > 1:
        lane_groups = 1
    # identical pattern => identical slot assignment across the three builds;
    # shrink the tile group until a grid step's blocks fit scoped VMEM
    # (mirrors solver.gsel_solver.build_gsel_csr)
    g_ids = None
    while group >= 1:
        if probe is not None and probe.group == group:
            g_ids, probe = probe, None  # reuse the winning auto probe
        else:
            g_ids = build_gsel(a_ids, group=group, lane_groups=lane_groups,
                               window=window)
        if g_ids is None:
            if group == 1:
                return None
            group //= 2
            continue
        gk = g_ids.group * g_ids.k_width
        step_bytes = (
            gk * g_ids.q_chunks * lane_groups * window
            + 2 * gk * g_ids.tile * 4
        )
        if step_bytes <= int(2.5 * 2**20) or group == 1:
            break
        group = max(1, group // 2)
        g_ids = None
    if g_ids is None:
        return None
    group = g_ids.group
    g_idt = build_gsel(at_ids, group=group, lane_groups=lane_groups,
                       window=window)
    g_val = build_gsel(a_val, group=group, lane_groups=lane_groups,
                       window=window)
    ids_s = np.asarray(g_ids.vals)
    mask = (ids_s > 0).astype(np.float32)
    perm = np.maximum(ids_s.astype(np.int64) - 1, 0).astype(np.int32)
    perm_rev = np.maximum(
        np.asarray(g_idt.vals).astype(np.int64) - 1, 0
    ).astype(np.int32)
    return SlotGraph(
        pattern=g_val,
        mask=jnp.asarray(mask),
        perm=jnp.asarray(perm),
        perm_rev=jnp.asarray(perm_rev),
    )


def slot_scatter(sg: SlotGraph, edge_arr, reverse: bool = False) -> jax.Array:
    """[E, C] edge array -> [S, C, GK', T] plane tensor (device take —
    one-time per forward, feature dim is tiny)."""
    arr = jnp.asarray(edge_arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    perm = sg.perm_rev if reverse else sg.perm
    out = jnp.take(arr, perm.reshape(-1), axis=0)  # [S*GK'*T, C]
    s, gk, t = perm.shape
    out = out.reshape(s, gk, t, -1).transpose(0, 3, 1, 2)
    return out * sg.mask[:, None, :, :]


def slot_gather_edges(sg: SlotGraph, planes: jax.Array) -> jax.Array:
    """[S, C, GK', T] plane tensor -> [E, C] edge array (inverse of
    slot_scatter; used to hand slot outputs back to edge-ordered code)."""
    s, c, gk, t = planes.shape
    flat = planes.transpose(0, 2, 3, 1).reshape(-1, c)
    e_total = int(jnp.max(sg.perm)) + 1 if sg.perm.size else 0
    out = jnp.zeros((e_total, c), planes.dtype)
    sel = sg.mask.reshape(-1) > 0
    # padding slots carry perm 0 too: send them out of range (dropped)
    idx = jnp.where(sel, sg.perm.reshape(-1), e_total)
    return out.at[idx].set(flat, mode="drop")


# ---------------------------------------------------------------------------
# feature gather: x [n, F] -> [S, F, GK', T] (x_j per slot)


def gather_feats_xla(g: GselPlanes, x: jax.Array) -> jax.Array:
    """Reference implementation (CPU/tests)."""
    nf = x.shape[1]
    qg = g.q_chunks
    n_chunks = -(-g.n_cols // LANE) + qg
    xt = jnp.zeros((nf, n_chunks * LANE), jnp.float32)
    xt = xt.at[:, : g.n_cols].set(x.T.astype(jnp.float32))
    xc = xt.reshape(nf, n_chunks, LANE)

    def one_dot(ohp, xw):
        return jnp.einsum(
            "kq,fqc->fkc", ohp.astype(jnp.float32), xw,
            precision=jax.lax.Precision.HIGHEST,
        )

    def step(carry, inp):
        oh, li, base = inp
        xw = jax.lax.dynamic_slice(
            xc, (jnp.int32(0), base, jnp.int32(0)), (nf, qg, LANE)
        )
        li32 = li.astype(jnp.int32)
        if g.window == 2:
            u = li32 & 255
            lane_b = jnp.broadcast_to((u & 127)[None], (nf,) + li.shape)
            sub_b = jnp.broadcast_to((u >> 7)[None], (nf,) + li.shape)
            g0 = jnp.take_along_axis(one_dot(oh[:, :qg], xw), lane_b, axis=2)
            g1 = jnp.take_along_axis(one_dot(oh[:, qg:], xw), lane_b, axis=2)
            gv = jnp.where(sub_b == 1, g1, g0)
        else:
            op = one_dot(oh, expand_window(xw, g.lane_groups))
            gv = jnp.take_along_axis(
                op, jnp.broadcast_to(li32[None], (nf,) + li32.shape), axis=2
            )
        return carry, gv

    _, out = jax.lax.scan(step, None, (g.onehot, g.lidx, g.group_base))
    return out  # [S, F, GK', T]


# stream the x planes from HBM per grid step (instead of keeping them
# VMEM-resident) above this size — see kernels/gsel_pallas.window_or_stream
STREAM_X_BYTES = 2 * 2**20


def _gather_kernel(nf: int, qg: int, gk: int, ng: int = 1, window: int = 1,
                   stream_x: bool = False):
    from jax.experimental import pallas as pl

    from ..kernels.gsel_pallas import batched_select_gather, window_or_stream

    def kernel(base_ref, oh_ref, l_ref, x_ref, out_ref, *scratch):
        s = pl.program_id(0)
        oh = oh_ref[0].astype(jnp.float32)  # [GK', W*NG*Qg]
        li = l_ref[0].astype(jnp.int32)  # [GK', T], stored int8
        xw = window_or_stream(base_ref[s], x_ref, qg, scratch)
        out_ref[0] = batched_select_gather(xw, oh, li, nf, gk, ng, window)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gather_feats_pallas(
    g: GselPlanes, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """x [n, F] -> gathered x_j planes [S, F, GK', T] via hw lane gather."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = x.shape[1]
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    gk = grp * kp
    n_steps = g.n_steps
    n_chunks = -(-g.n_cols // LANE) + qg
    xt = jnp.zeros((nf, n_chunks * LANE), jnp.float32)
    xt = xt.at[:, : g.n_cols].set(x.T.astype(jnp.float32))
    xc = xt.reshape(nf, n_chunks, LANE)

    ng = g.lane_groups
    stream_x = xc.size * 4 > STREAM_X_BYTES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, gk, g.window * ng * qg), lambda s, *_: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            # x planes: VMEM-resident when small, streamed per step when big
            pl.BlockSpec(memory_space=pl.ANY if stream_x else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nf, gk, t), lambda s, *_: (s, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((nf, qg, LANE), jnp.float32), pltpu.SemaphoreType.DMA]
            if stream_x
            else []
        ),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _gather_kernel(nf, qg, gk, ng, g.window, stream_x),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_steps, nf, gk, t), jnp.float32),
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, xc)
    return out


# ---------------------------------------------------------------------------
# plane-layout parameter application (reuses the flax parameter tree)


def _norm_params(p: dict):
    """The flax tree nests the pre-norm as _Norm_0/{LayerNorm,RMSNorm}_0."""
    sub = p.get("_Norm_0", {})
    if "LayerNorm_0" in sub:
        return "layer", sub["LayerNorm_0"]
    if "RMSNorm_0" in sub:
        return "rms", sub["RMSNorm_0"]
    return "none", None


def _ffn_planes_parts(p: dict, parts) -> jax.Array:
    """FeedForward whose first Dense consumes concat(parts, axis=1) —
    computed part-by-part so the [S, sum(C), GK', T] concat (hundreds of
    MB of HBM traffic at production sizes) is never materialized.

    Parts may carry a lazy broadcast over the K' axis (x_i, the
    destination features, are k-independent): each part is contracted in
    whatever compact shape it has, and only the [S, H, GK', T] result is
    full-size. The pre-norm is commuted past the contraction — per-slot
    statistics (mu, rsigma) are scalars along the channel axis, so
      norm(concat) @ W = rs * (concat @ (scale*W)) - (rs*mu) * (scale@W)
                         + bias_n @ W + bias_0
    which needs only elementwise full-size work after the compact
    contractions. `parts` entries are (tensor, expand) with expand mapping
    the contracted result to full [S, H, GK', T] (identity for full-size
    parts, lazy broadcast for x_i)."""
    kind, np_ = _norm_params(p)
    denses = sorted(
        (k for k in p if k.startswith("Dense_")), key=lambda k: int(k[6:])
    )
    k0 = p[denses[0]]["kernel"]
    b0 = p[denses[0]]["bias"]
    c_tot = k0.shape[0]
    sizes = [q.shape[1] for q, _ in parts]
    offs = np.cumsum([0] + sizes)

    out = None
    s1 = s2 = None
    for (q, expand), o, c in zip(parts, offs[:-1], sizes):
        w = k0[o : o + c]  # [c, H]
        if kind != "none":
            w = w * np_["scale"][o : o + c][:, None]
            p1 = expand(jnp.sum(q, axis=1, keepdims=True))
            p2 = expand(jnp.sum(jnp.square(q), axis=1, keepdims=True))
            s1 = p1 if s1 is None else s1 + p1
            s2 = p2 if s2 is None else s2 + p2
        term = expand(jnp.einsum("sckt,ch->shkt", q, w, precision=_HI))
        out = term if out is None else out + term
    if kind != "none":
        mu = s1 / c_tot
        rs = (
            jax.lax.rsqrt(s2 / c_tot - jnp.square(mu) + 1e-6)
            if kind == "layer"
            else jax.lax.rsqrt(s2 / c_tot + 1e-6)
        )
        sw = jnp.einsum(
            "c,ch->h", np_["scale"], k0, precision=_HI
        )  # scale-weighted column sums
        out = rs * out - (rs * mu) * sw[None, :, None, None]
        if kind == "layer":
            out = out + jnp.einsum("c,ch->h", np_["bias"], k0, precision=_HI)[
                None, :, None, None
            ]
    x = jax.nn.gelu(out + b0[None, :, None, None])
    for i, k in enumerate(denses[1:]):
        x = jnp.einsum("sckt,ch->shkt", x, p[k]["kernel"], precision=_HI) + p[k]["bias"][
            None, :, None, None
        ]
        if i < len(denses) - 2:
            x = jax.nn.gelu(x)
    return x


def _ffn_planes(p: dict, x: jax.Array) -> jax.Array:
    """FeedForward (gnn/layers.py:66-90) on plane tensors [S, C, GK', T]
    with channels on axis 1, reading the flax param tree verbatim."""
    kind, np_ = _norm_params(p)
    if kind == "layer":
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        x = xn * np_["scale"][None, :, None, None] + np_["bias"][
            None, :, None, None
        ]
    elif kind == "rms":
        ms = jnp.mean(jnp.square(x), axis=1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-6)
        x = x * np_["scale"][None, :, None, None]
    denses = sorted(
        (k for k in p if k.startswith("Dense_")), key=lambda k: int(k[6:])
    )
    for i, k in enumerate(denses):
        kern = p[k]["kernel"]
        x = jnp.einsum("sckt,ch->shkt", x, kern, precision=_HI) + p[k]["bias"][
            None, :, None, None
        ]
        if i < len(denses) - 1:
            x = jax.nn.gelu(x)
    return x


def _ffn_nodes(p: dict, x: jax.Array) -> jax.Array:
    """FeedForward on node tensors [n, C] (channels last)."""
    kind, np_ = _norm_params(p)
    if kind == "layer":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        x = x * np_["scale"] + np_["bias"]
    elif kind == "rms":
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), -1, keepdims=True) + 1e-6)
        x = x * np_["scale"]
    denses = sorted(
        (k for k in p if k.startswith("Dense_")), key=lambda k: int(k[6:])
    )
    for i, k in enumerate(denses):
        x = x @ p[k]["kernel"] + p[k]["bias"]
        if i < len(denses) - 1:
            x = jax.nn.gelu(x)
    return x


@partial(
    jax.jit,
    static_argnames=(
        "node_residual", "edge_residual", "impl", "interpret", "plane_dtype",
        "out_channels",
    ),
)
def slotted_gnn_forward(
    params,
    sg: SlotGraph,
    node_feats: jax.Array,  # [n, Fn]
    e_fwd: jax.Array,  # [S, Fe, GK', T] (slot_scatter of edge features)
    e_rev: jax.Array,  # same, reversed orientation
    node_residual: bool = True,
    edge_residual: bool = True,
    impl: str = "pallas",
    interpret: bool = False,
    plane_dtype=None,  # jnp.bfloat16 halves the HBM-bound plane traffic
    out_channels: int = 1,
):
    """NodeEdgeProcessing forward (gnns.py:77-97) over the slot grid.

    Returns (vals_fwd, vals_rev): [S, GK', T] factor values for Â and Âᵀ
    on the pattern's slot grid — drop them into `replace(pattern,
    vals=...)` to get the SPAI operator planes. With `out_channels` = b^2
    (block matrices) the value tensors keep the channel axis
    ([S, b^2, GK', T], row-major i*b+j) for gnn/slotted_block.py."""
    p = params["params"] if "params" in params else params
    g = sg.pattern
    s_, gk, t = sg.mask.shape
    grp = g.group
    kp = g.k_width
    n = g.n_rows
    mask = sg.mask[:, None, :, :]

    gather = (
        (lambda xx: gather_feats_pallas(g, xx, interpret=interpret))
        if impl in ("pallas", "fused")
        else (lambda xx: gather_feats_xla(g, xx))
    )

    pd = plane_dtype or jnp.float32
    mask = mask.astype(pd)
    x = _ffn_nodes(p["node_enc"], node_feats)  # [n, F]
    ef = (_ffn_planes(p["edge_enc"], e_fwd.astype(pd)) * mask).astype(pd)
    er = (_ffn_planes(p["edge_enc"], e_rev.astype(pd)) * mask).astype(pd)

    def tile_compact(xn):
        # [n, F] -> [S, F, G, T] destination features (k-independent)
        nf = xn.shape[1]
        npad = s_ * grp * t
        xp = jnp.zeros((npad, nf), jnp.float32).at[:n].set(xn)
        return xp.reshape(s_, grp, t, nf).transpose(0, 3, 1, 2)

    def expand_k(z):
        # lazy broadcast [S, H, G, T] -> [S, H, GK', T] (k-major slot rows)
        h = z.shape[1]
        return jnp.broadcast_to(
            z[:, :, None, :, :], (s_, h, kp, grp, t)
        ).reshape(s_, h, gk, t)

    ident = lambda z: z  # noqa: E731

    if impl in ("fused", "fused_interpret"):
        # fused Pallas MP rounds: gnn/slotted_fused.py keeps one tile
        # group's planes VMEM-resident per grid step
        from .slotted_fused import fold_dec_ffn, fold_ffn, fused_mp_layer

        interp = impl == "fused_interpret" or interpret
        nf_ch = x.shape[1]
        ce_ch = ef.shape[1]
        ef_p = ef.astype(jnp.float32)
        er_p = er.astype(jnp.float32)
        for key in sorted(k for k in p if k.startswith("mp_")):
            lp = p[key]
            m_ffn, m_norm = fold_ffn(lp["msg_mlp"])
            e_ffn, e_norm = fold_ffn(lp["edge_mlp"])
            agg_n, ef_p, er_p = fused_mp_layer(
                g, sg.mask, x, ef_p, er_p, m_ffn, e_ffn,
                msg_norm=m_norm, edge_norm=e_norm,
                edge_residual=edge_residual, interpret=interp,
            )
            node_new = _ffn_nodes(lp["node_mlp"], agg_n)
            x = x + node_new if node_residual else node_new
        d_ffn, d_norm = fold_dec_ffn(p["edge_dec"], ce_ch, nf_ch)
        _, dec_f, dec_r = fused_mp_layer(
            g, sg.mask, x, ef_p, er_p, d_ffn, d_ffn,
            msg_norm=d_norm, edge_norm=d_norm,
            edge_residual=False, interpret=interp,
        )
        if out_channels > 1:
            m = sg.mask[:, None]
            return x, dec_f[:, :out_channels] * m, dec_r[:, :out_channels] * m
        vals_fwd = dec_f[:, 0] * sg.mask
        vals_rev = dec_r[:, 0] * sg.mask
        return x, vals_fwd, vals_rev

    for key in sorted(k for k in p if k.startswith("mp_")):
        lp = p[key]
        xj = gather(x).astype(pd)  # [S, F, GK', T]
        xi = tile_compact(x).astype(pd)  # [S,F,G,T]; K'-broadcast stays lazy
        msg = _ffn_planes_parts(
            lp["msg_mlp"], ((xi, expand_k), (xj, ident), (ef, ident))
        ) * mask
        # aggregation: sum over K' (slots of a row share a lane) — the
        # segment_sum is a sublane reduction, no scatter
        agg = jnp.sum(msg.reshape(s_, -1, kp, grp, t), axis=2)  # [S,F,G,T]
        agg_n = agg.transpose(0, 2, 3, 1).reshape(-1, agg.shape[1])[:n]
        node_new = _ffn_nodes(lp["node_mlp"], agg_n)
        x = x + node_new if node_residual else node_new
        e_new_f = _ffn_planes_parts(
            lp["edge_mlp"], ((xi, expand_k), (xj, ident), (ef, ident))
        ).astype(pd)
        ef = (ef + e_new_f if edge_residual else e_new_f) * mask
        e_new_r = _ffn_planes_parts(
            lp["edge_mlp"], ((xj, ident), (xi, expand_k), (er, ident))
        ).astype(pd)
        er = (er + e_new_r if edge_residual else e_new_r) * mask

    xj = gather(x).astype(pd)
    xi = tile_compact(x).astype(pd)
    dec_f = _ffn_planes_parts(
        p["edge_dec"], ((ef, ident), (xi, expand_k), (xj, ident))
    )
    dec_r = _ffn_planes_parts(
        p["edge_dec"], ((er, ident), (xj, ident), (xi, expand_k))
    )
    if out_channels > 1:
        m = sg.mask[:, None]
        return (
            x,
            dec_f[:, :out_channels].astype(jnp.float32) * m,
            dec_r[:, :out_channels].astype(jnp.float32) * m,
        )
    vals_fwd = dec_f[:, 0].astype(jnp.float32) * sg.mask
    vals_rev = dec_r[:, 0].astype(jnp.float32) * sg.mask
    return x, vals_fwd, vals_rev

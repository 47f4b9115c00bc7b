"""Round-3 decomposition of the two BENCH_r02 gaps (VERDICT items 1+2):

A. Preconditioner CONSTRUCTION on the trained heat_r20 model: the
   NeuralSlot prec row recorded 58.5 ms vs the reference's 0.19 ms CUDA
   construction. Measures (i) the round-2 protocol (eager construct +
   block_until_ready — a relay NO-OP per CLAUDE.md), (ii) honest
   one-dispatch fused construct + host fetch, (iii) chained-differenced
   device-only construct time, (iv) sub-parts (GNN forward vs
   expand+scale).

B. CG ITERATION cost on the same trained factor (n=9,261): the rds
   solve ran at 459 us/iter vs ~30-50 us of summed kernels. Max-iter
   differencing of the production tiers + custom body ablations (dots
   precision, re-anchor cond, papply, axpys) to find where it goes.

Emits JSON to output/r3_prec_profile.json. Run ON THE TPU, serialized:
    timeout 1800 python scripts/r3_prec_profile.py
"""

import dataclasses
import json
import sys
import time
from functools import partial

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401  (enables x64)
from tpu_spai.cli.train import CONFIG_DIR, build_dataset
from tpu_spai.config import cli_config
from tpu_spai.data.batching import collate
from tpu_spai.data.folder import split_dataset
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.gnn.slotted import (
    fused_safe_group,
    gnn_width_from_params,
    slot_scatter,
    slotted_gnn_forward,
)
from tpu_spai.gnn.slotted_block import (
    build_block_slot_layout,
    expand_block_planes,
    scalar_scale_add,
)
from tpu_spai.kernels.ds import (
    DS,
    ds_add,
    ds_axpy,
    ds_dot,
    ds_from_f64,
    ds_scale,
    ds_sub,
)
from tpu_spai.solver import GselSpaiPrec, build_gsel_csr
from tpu_spai.solver.gsel_solver import gsel_matvec, pcg_gsel, pcg_gsel_rr
from tpu_spai.sparse.convert import graph_to_csr
from tpu_spai.train import get_workspace
from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

OUT = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def time_min(fn, reps=7):
    """min-of-N wall seconds for fn() (fn must force a host fetch)."""
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def diff_chain(fn, m1, m2, reps=7):
    """(minT(m2)-minT(m1))/(m2-m1) with host-fetch forcing."""
    fetch(fn(m2))
    fetch(fn(m1))
    ts = {m1: [], m2: []}
    for _ in range(reps):
        for m in (m1, m2):
            t0 = time.perf_counter()
            fetch(fn(m))
            ts[m].append(time.perf_counter() - t0)
    return (min(ts[m2]) - min(ts[m1])) / (m2 - m1)


# ------------------------------------------------------------------ setup
argv = [
    "exp_name=bench",
    "data.prefix=generated/heat_r20",
    "pretrained=outputs/heat_r20_v2/checkpoints",
    "data.is_fixed_topology=true", "data.has_shared_features=true",
    "data.use_node_features=true", "data.use_mask_as_node_feature=true",
    "data.load_into_memory=true",
] + sys.argv[1:]
cfg = cli_config(argv, CONFIG_DIR, "basic")
dataset = build_dataset(cfg)
ws_cls = get_workspace(cfg.select("workspace", "simple"))
workspace = ws_cls(
    gnn=cfg.gnn, loss=cfg.loss, block_size=dataset.block_size,
    epsilon=float(cfg.epsilon),
)
tr, va = split_dataset(len(dataset), cfg.split["train"], seed=42)
batch = collate([dataset.get(va[0])])
params = workspace.init_params(jax.random.key(0), batch)
ckpt = latest_checkpoint(cfg.select("pretrained"))
params = load_checkpoint(ckpt, params)
log(f"loaded {ckpt}")

n_valid = int(np.sum(np.asarray(batch.node_valid)))
msize = n_valid * batch.block_size
e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
ei = np.stack(
    [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
)
a_csr = graph_to_csr(
    ei[:, :e_valid], np.asarray(batch.graph.blocks)[:e_valid], msize,
    mask=np.asarray(batch.mask)[:n_valid],
)
rtol = 1e-6

import scipy.sparse as sp

b_sz = batch.block_size
bb = b_sz * b_sz
ei_v = ei[:, :e_valid]
a_blk = sp.csr_matrix(
    (np.ones(e_valid), (ei_v[0], ei_v[1])), shape=(n_valid, n_valid)
)
bperm = rcm_permutation(a_blk)
bpos = np.empty_like(bperm)
bpos[bperm] = np.arange(n_valid)
layout = build_block_slot_layout(bpos[ei_v[0]], bpos[ei_v[1]], n_valid, b_sz)
impl = "pallas" if jax.default_backend() == "tpu" else "xla"
if impl == "pallas":
    pat = layout.sg.pattern
    gsafe = fused_safe_group(
        pat.k_width, pat.n_cols, nf=gnn_width_from_params(params),
        window=pat.window, q_chunks=pat.q_chunks,
    )
    if layout.sg.pattern.group > gsafe:
        layout = build_block_slot_layout(
            bpos[ei_v[0]], bpos[ei_v[1]], n_valid, b_sz, group=gsafe
        )
gnn_impl = "fused" if impl == "pallas" else impl
xp = jnp.asarray(np.asarray(batch.x)[:n_valid][bperm], jnp.float32)
ea_v = np.asarray(batch.edge_attr)[:e_valid]
m_dof = np.asarray(batch.mask)[:n_valid][bperm].reshape(-1)


def layout_operands(lay):
    sgb = lay.sg
    e_f = slot_scatter(sgb, ea_v)
    e_r = slot_scatter(sgb, ea_v, reverse=True)
    sf, af, sr, ar = scalar_scale_add(lay, m_dof, None)
    return sgb, e_f, e_r, sf, af, sr, ar


# the scoped-VMEM model (fused_safe_group) is marginal near the limit;
# retry with halved tile group on a compile-time VMEM OOM (same loop as
# cli/infer.py)
while True:
    sgb, e_f, e_r, sf, af, sr, ar = layout_operands(layout)
    try:
        _t, _pf, _pr = slotted_gnn_forward(
            params, sgb, xp, e_f, e_r, impl=gnn_impl, out_channels=bb
        )
        _pf.block_until_ready()
        break
    except jax.errors.JaxRuntimeError as exc:
        gcur = layout.sg.pattern.group
        if "Scoped allocation" not in str(exc) or gcur <= 1:
            raise
        log(f"VMEM OOM at group={gcur}; retrying with {gcur // 2}")
        layout = build_block_slot_layout(
            bpos[ei_v[0]], bpos[ei_v[1]], n_valid, b_sz,
            group=max(1, gcur // 2), window=layout.sg.pattern.window,
        )
log(f"n={msize} e={e_valid} slots={layout.sg.pattern.slots} "
    f"scalar_slots={layout.pattern.slots} impl={impl} "
    f"group={layout.sg.pattern.group}")


# ------------------------------------------------- A. construction timing
def construct_eager():
    _, pf, pr = slotted_gnn_forward(
        params, sgb, xp, e_f, e_r, impl=gnn_impl, out_channels=bb
    )
    if bb == 1:
        pf, pr = pf[:, None], pr[:, None]
    vf, vr = expand_block_planes(layout, pf, pr)
    return vf * sf + af, vr * sr + ar


perm_f, perm_r, lmask = layout.perm_f, layout.perm_r, layout.mask
sgb, e_f, e_r, sf, af, sr, ar = layout_operands(layout)


@partial(jax.jit, static_argnames=("impl_", "bb_"))
def construct_fused(params, sgb, perm_f, perm_r, lmask, xp, e_f, e_r,
                    sf, af, sr, ar, impl_, bb_):
    _, pf, pr = slotted_gnn_forward(
        params, sgb, xp, e_f, e_r, impl=impl_, out_channels=bb_
    )
    if bb_ == 1:
        pf, pr = pf[:, None], pr[:, None]

    def flat(p):
        return p.transpose(0, 2, 3, 1).reshape(-1)

    vf = jnp.take(flat(pf), perm_f.reshape(-1)).reshape(lmask.shape) * lmask
    vr = jnp.take(flat(pr), perm_r.reshape(-1)).reshape(lmask.shape) * lmask
    return vf * sf + af, vr * sr + ar


def c_fused():
    return construct_fused(
        params, sgb, perm_f, perm_r, lmask, xp, e_f, e_r, sf, af, sr, ar,
        impl_=gnn_impl, bb_=bb,
    )


@partial(jax.jit, static_argnames=("r", "impl_", "bb_"))
def construct_chain(params, sgb, perm_f, perm_r, lmask, xp, e_f, e_r,
                    sf, af, sr, ar, r, impl_, bb_):
    def body(xc, _):
        vf, vr = construct_fused(
            params, sgb, perm_f, perm_r, lmask, xc, e_f, e_r, sf, af, sr,
            ar, impl_=impl_, bb_=bb_,
        )
        # true data dependency the compiler cannot eliminate
        return xc + vf.ravel()[0] * 1e-30, (vf.ravel()[0] + vr.ravel()[0])

    _, outs = jax.lax.scan(body, xp, None, length=r)
    return outs[-1]


@partial(jax.jit, static_argnames=("r", "impl_", "bb_"))
def gnnfwd_chain(params, sgb, xp, e_f, e_r, r, impl_, bb_):
    def body(xc, _):
        _, pf, pr = slotted_gnn_forward(
            params, sgb, xc, e_f, e_r, impl=impl_, out_channels=bb_
        )
        return xc + pf.ravel()[0] * 1e-30, pf.ravel()[0] + pr.ravel()[0]

    _, outs = jax.lax.scan(body, xp, None, length=r)
    return outs[-1]


log("A: compiling + timing construction variants...")
# (i) round-2 protocol: eager ops, block_until_ready sync
vf0, _ = construct_eager()
vf0.block_until_ready()
t_old = time_min(lambda: construct_eager()[0].block_until_ready())
# (ii) eager + full host fetch of both planes
t_eager_fetch = time_min(lambda: [np.asarray(v) for v in construct_eager()])
# (iii) fused single dispatch + full fetch
fetch(c_fused())
t_fused_fetch = time_min(lambda: [np.asarray(v) for v in c_fused()])
# scalar-fetch variant (what a fused construct+solve program would pay)
t_fused_scalar = time_min(lambda: np.asarray(c_fused()[0].ravel()[0]))
# (iv) chained device-only per-construct
chain = lambda r: construct_chain(  # noqa: E731
    params, sgb, perm_f, perm_r, lmask, xp, e_f, e_r, sf, af, sr, ar,
    r=r, impl_=gnn_impl, bb_=bb,
)
t_chain = diff_chain(chain, 4, 24)
gchain = lambda r: gnnfwd_chain(  # noqa: E731
    params, sgb, xp, e_f, e_r, r=r, impl_=gnn_impl, bb_=bb,
)
t_gnn = diff_chain(gchain, 4, 24)
OUT["construct"] = {
    "old_protocol_ms": round(t_old * 1e3, 3),
    "eager_fetch_ms": round(t_eager_fetch * 1e3, 3),
    "fused_fetch_ms": round(t_fused_fetch * 1e3, 3),
    "fused_scalar_fetch_ms": round(t_fused_scalar * 1e3, 3),
    "chained_device_ms": round(t_chain * 1e3, 3),
    "chained_gnn_fwd_ms": round(t_gnn * 1e3, 3),
    "chained_expand_scale_ms": round((t_chain - t_gnn) * 1e3, 3),
}
log(json.dumps(OUT["construct"], indent=2))

# ------------------------------------------------- B. iteration ablation
log("B: building solver operands...")
blocks64 = (
    np.asarray(batch.graph.blocks)[:e_valid].reshape(-1, bb).astype(np.float64)
)
blocks_v = blocks64.astype(np.float32)
ap_sc = slot_scatter(sgb, blocks_v)
a_vf, _ = expand_block_planes(layout, ap_sc, ap_sc)
lo_v = (blocks64 - blocks_v.astype(np.float64)).astype(np.float32)
lo_sc = slot_scatter(sgb, lo_v)
a_lo, _ = expand_block_planes(layout, lo_sc, lo_sc)
s_sys, a_sys, _, _ = scalar_scale_add(layout, m_dof, None)
apl = dataclasses.replace(
    layout.pattern, vals=a_vf * s_sys + a_sys, vals_lo=a_lo * s_sys
)
vf, vr = c_fused()
lpl = dataclasses.replace(layout.pattern, vals=vf)
ltp = dataclasses.replace(layout.pattern, vals=vr)
sprec = GselSpaiPrec(lpl, ltp, jnp.float32(workspace.epsilon))
rng = np.random.default_rng(0)
sperm = (bperm[:, None] * b_sz + np.arange(b_sz)[None, :]).reshape(-1)
b_slot = jnp.asarray((a_csr @ np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64))[sperm], jnp.float64)

# production solves at rtol=1e-6, timed like cli.infer (dispatch + fetch)
for name, fn in (
    ("rds", lambda: pcg_gsel_rr(apl, b_slot, prec=sprec, rtol=rtol,
                                max_iter=msize, impl=impl,
                                spmv_precision="ds_a")),
    ("rr", lambda: pcg_gsel_rr(apl, b_slot, prec=sprec, rtol=rtol,
                               max_iter=msize, impl=impl,
                               spmv_precision="f32")),
):
    res = fn()
    iters = int(res.iters)
    t = time_min(lambda: np.asarray(fn().x))
    OUT[f"solve_{name}"] = {
        "ms": round(t * 1e3, 3), "iters": iters,
        "us_per_iter_incl_overhead": round(t / max(iters, 1) * 1e6, 1),
    }
    log(f"production {name}: {t*1e3:.2f} ms, {iters} iters "
        f"({t/max(iters,1)*1e6:.0f} us/iter incl overhead)")

# differenced per-iteration cost of the production tiers (never converge)
tiny = 1e-30
for name, mk in (
    ("rds", lambda m: pcg_gsel_rr(apl, b_slot, prec=sprec, rtol=tiny,
                                  max_iter=m, impl=impl,
                                  spmv_precision="ds_a")),
    ("rr", lambda m: pcg_gsel_rr(apl, b_slot, prec=sprec, rtol=tiny,
                                 max_iter=m, impl=impl,
                                 spmv_precision="f32")),
    ("f32chunk", lambda m: pcg_gsel(apl, b_slot.astype(jnp.float32),
                                    prec=sprec, rtol=tiny, max_iter=m,
                                    dot_dtype="chunk64", impl=impl)),
):
    us = diff_chain(lambda m, mk=mk: mk(m).x, 40, 240) * 1e6
    OUT[f"iter_{name}_us"] = round(us, 1)
    log(f"differenced {name}: {us:.1f} us/iter")

# ---- custom body ablations (mirror _rr_run rds composition) ----
from tpu_spai.kernels.gsel_pallas import gsel_spmv_ds_pallas
from tpu_spai.kernels.gsel import gsel_spmv_ds_xla

spmv_ds = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla


def mv_ds(gp, v):
    yh, yl = spmv_ds(gp, v.hi, v.lo)
    return DS(yh, yl)


def mv_f32(gp, v):
    yh = gsel_matvec(gp, v.hi, impl)
    return DS(yh, jnp.zeros_like(yh))


def dot_f64(x: DS, y: DS):
    return jnp.vdot(
        x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64),
        y.hi.astype(jnp.float64) + y.lo.astype(jnp.float64),
    )


def make_loop(body_fn):
    """Jittable ablation while_loop; apl/prec/b passed as ARGS (never
    close over device arrays under jit — CLAUDE.md)."""

    @jax.jit
    def run(g_a, pl_f, pl_t, b64, m):
        bds = ds_from_f64(b64)
        x = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
        st = (x, bds, bds, jnp.float64(1.0), jnp.float64(1.0),
              jnp.int32(0), jnp.float64(1.0))

        def cond(s):
            return s[5] < m

        def body(s):
            return body_fn(g_a, pl_f, pl_t, bds, *s)

        st = jax.lax.while_loop(cond, body, st)
        return st[0].hi

    return run


def body_full(g_a, pl_f, pl_t, bds, x, r, d, delta, rn2, it, anchor, *,
              a_ds=True, dot=ds_dot, cond_anchor=True, prec=True):
    def papply(rr_):
        lt = gsel_matvec(pl_t, rr_.hi, impl)
        return DS(
            gsel_matvec(pl_f, lt, impl) + jnp.float32(3e-3) * rr_.hi,
            jnp.zeros_like(rr_.hi),
        )

    q = mv_ds(g_a, d) if a_ds else mv_f32(g_a, d)
    dq = dot(d, q)
    alpha = ds_from_f64(delta / dq)
    nalpha = DS(-alpha.hi, -alpha.lo)
    x = ds_axpy(alpha, d, x)
    r = ds_axpy(nalpha, q, r)
    rn2_rec = dot(r, r)
    if cond_anchor:
        do_rep = (rn2_rec <= 0.0625 * anchor) | ((it + 1) % 64 == 0)
        r = jax.lax.cond(
            do_rep,
            lambda xr: ds_sub(bds, mv_ds(g_a, xr[0])),
            lambda xr: xr[1],
            (x, r),
        )
        anchor = jnp.where(do_rep, dot(r, r), anchor)
    s = papply(r) if prec else r
    delta_new = dot(r, s)
    beta = ds_from_f64(delta_new / delta)
    d = ds_add(s, ds_scale(beta, d))
    rn2 = dot(r, r)
    return x, r, d, delta_new, rn2, it + 1, anchor


ablations = {
    "full_rds_copy": dict(),
    "no_anchor_cond": dict(cond_anchor=False),
    "f32A": dict(a_ds=False),
    "f64_dots": dict(dot=dot_f64),
    "no_prec": dict(prec=False),
    "f32A_no_anchor": dict(a_ds=False, cond_anchor=False),
}
for name, kw in ablations.items():
    run = make_loop(partial(body_full, **kw))
    us = diff_chain(
        lambda m: run(apl, lpl, ltp, b_slot, jnp.int32(m)), 40, 240
    ) * 1e6
    OUT[f"abl_{name}_us"] = round(us, 1)
    log(f"ablation {name}: {us:.1f} us/iter")


# single-op chained costs (operands as args, scan-chained)
@partial(jax.jit, static_argnames=("r", "kind"))
def op_chain(g_a, v0, r, kind):
    def body(v, _):
        if kind == "spmv":
            v2 = gsel_matvec(g_a, v, impl) * 1e-2
        elif kind == "spmv_ds":
            h, _l = spmv_ds(g_a, v, v * 1e-8)
            v2 = h * 1e-2
        elif kind == "ds_dot":
            d = ds_dot(DS(v, v * 1e-8), DS(v, v * 1e-8))
            v2 = v * (1.0 + 1e-30 * d).astype(jnp.float32)
        elif kind == "f64_dot":
            d = jnp.vdot(v.astype(jnp.float64), v.astype(jnp.float64))
            v2 = v * (1.0 + 1e-30 * d).astype(jnp.float32)
        elif kind == "ds_axpy":
            a = ds_from_f64(jnp.float64(1e-30))
            o = ds_axpy(a, DS(v, v * 1e-8), DS(v * 0.999, v * 1e-9))
            v2 = o.hi
        else:
            raise ValueError(kind)
        return v2, None

    v, _ = jax.lax.scan(body, v0, None, length=r)
    return v


x0 = jnp.asarray(rng.standard_normal(int(b_slot.shape[0])), jnp.float32)
for kind in ("spmv", "spmv_ds", "ds_dot", "f64_dot", "ds_axpy"):
    try:
        us = diff_chain(
            lambda m, k=kind: op_chain(apl, x0, r=m, kind=k), 100, 1100
        ) * 1e6
        OUT[f"op_{kind}_us"] = round(us, 2)
        log(f"op {kind}: {us:.2f} us")
    except Exception as exc:  # noqa: BLE001
        log(f"op {kind} failed: {exc}")

import os as _os

_out = _os.environ.get("PREC_PROFILE_OUT", "output/r3_prec_profile.json")
with open(_out, "w") as f:
    json.dump(OUT, f, indent=2)
log(f"wrote {_out}")
print(json.dumps(OUT))

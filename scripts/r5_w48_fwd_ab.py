"""On-chip A/B of the w48 fused GNN forward (VERDICT r4 item 6).

The round-4 profile split the 14.5 ms w48 construction into 9.6 ms GNN
forward + 4.9 ms expansion; pass-count modeling says the forward is
MXU-pass-bound: the three FFNs' Dense_0 stages run nine narrow
[H=48, M] dots at HIGHEST (6-pass) precision, each filling ~48/128 of
the MXU rows. Variants measured IN ONE PROCESS (phase-invariant):

  base      unstacked stage-1, HIGHEST  (the round-4 shipping path)
  stacked   stacked stage-1,   HIGHEST  (math-identical regrouping)
  stacked3  stacked stage-1,   HIGH     (3-pass FFN matmuls, ~1e-6 rel)

For each: chained-differenced per-forward ms + the fused construction
chain, plus the flagship sample's rr iteration count under the variant
(does the precision change move convergence?).

Run ON the TPU, serialized: timeout 1800 python scripts/r5_w48_fwd_ab.py
Writes output/r5_w48_fwd_ab.json.
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import jax.random as jr
import scipy.sparse as sp

import tpu_spai  # noqa: F401
from tpu_spai.cli.train import CONFIG_DIR, build_dataset
from tpu_spai.config import cli_config
from tpu_spai.data.batching import collate
from tpu_spai.data.folder import split_dataset
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.gnn import slotted_fused as sf
from tpu_spai.gnn.construct import make_slot_constructor
from tpu_spai.gnn.slotted import fused_safe_group, gnn_width_from_params
from tpu_spai.gnn.slotted_block import build_block_slot_layout
from tpu_spai.sparse.convert import graph_to_csr
from tpu_spai.train import get_workspace
from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chain(fn, r1=4, r2=24, reps=5):
    import time

    np.asarray(fn(r2))
    np.asarray(fn(r1))
    ts = {r1: [], r2: []}
    for _ in range(reps):
        for m in (r1, r2):
            t0 = time.perf_counter()
            np.asarray(fn(m))
            ts[m].append(time.perf_counter() - t0)
    return (min(ts[r2]) - min(ts[r1])) / (r2 - r1)


def main():
    cfg = cli_config([
        "exp_name=bench", "data.prefix=generated/heat_r20",
        "gnn_features=48",
        "data.is_fixed_topology=true", "data.has_shared_features=true",
        "data.use_node_features=true", "data.use_mask_as_node_feature=true",
        "data.load_into_memory=true",
    ], CONFIG_DIR, "basic")
    ds_ = build_dataset(cfg)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds_.block_size,
        epsilon=float(cfg.epsilon),
    )
    tr, va = split_dataset(len(ds_), cfg.split["train"], seed=42)
    batch = collate([ds_.get(va[0])])
    params = ws.init_params(jr.key(0), batch)
    params = load_checkpoint(
        latest_checkpoint("outputs/heat_r20_w48/checkpoints"), params)
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    gnn_impl = "fused" if impl == "pallas" else impl

    n_valid = int(np.sum(np.asarray(batch.node_valid)))
    e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
    ei = np.stack([np.asarray(batch.graph.edge_row),
                   np.asarray(batch.graph.edge_col)])
    ei_v = ei[:, :e_valid]
    a_blk = sp.csr_matrix(
        (np.ones(e_valid), (ei_v[0], ei_v[1])), shape=(n_valid, n_valid))
    bperm = rcm_permutation(a_blk)
    bpos = np.empty_like(bperm)
    bpos[bperm] = np.arange(n_valid)
    b_sz = batch.block_size
    layout = build_block_slot_layout(
        bpos[ei_v[0]], bpos[ei_v[1]], n_valid, b_sz)
    pat = layout.sg.pattern
    gsafe = fused_safe_group(
        pat.k_width, pat.n_cols, nf=gnn_width_from_params(params),
        window=pat.window, q_chunks=pat.q_chunks)
    if pat.group > gsafe:
        layout = build_block_slot_layout(
            bpos[ei_v[0]], bpos[ei_v[1]], n_valid, b_sz, group=gsafe)
    sc = make_slot_constructor(
        layout, params, batch, bperm, scaled=False, impl=impl,
        gnn_impl=gnn_impl)

    from tpu_spai.gnn.construct import _construct, _construct_chain
    from tpu_spai.gnn.slotted import slotted_gnn_forward

    bb = b_sz * b_sz

    @partial(jax.jit, static_argnames=("r",))
    def fwd_chain(params_, sgb, xp, e_f, e_r, r):
        def body(xc, _):
            _t, pf, pr = slotted_gnn_forward(
                params_, sgb, xc, e_f, e_r, impl=gnn_impl, out_channels=bb)
            return xc + pf.ravel()[0] * 1e-30, pf.ravel()[0] + pr.ravel()[0]

        _, outs = jax.lax.scan(body, xp, None, length=r)
        return outs[-1]

    lay = sc.layout
    xp, e_f, e_r, sff, aff, srr, arr = sc.ops

    # flagship system planes on the layout grid (for per-variant
    # iteration counts: does FFN-dot precision move convergence?)
    from tpu_spai.gnn.slotted import slot_scatter
    from tpu_spai.gnn.slotted_block import (
        expand_block_planes,
        scalar_scale_add,
    )
    from tpu_spai.solver.gsel_solver import (
        GselSpaiPrec,
        pcg_gsel_rr,
    )
    import dataclasses as _dc

    blocks_v = np.asarray(batch.graph.blocks)[:e_valid]
    mask_v = np.asarray(batch.mask)[:n_valid].reshape(-1)
    a_csr = graph_to_csr(ei_v, blocks_v, n_valid, mask=mask_v)
    b64 = a_csr @ mask_v.astype(np.float64)
    blocks64 = blocks_v.astype(np.float64).reshape(e_valid, -1)
    b_hi = blocks64.astype(np.float32)
    ap_sc = slot_scatter(lay.sg, b_hi)
    a_vf, _ = expand_block_planes(lay, ap_sc, ap_sc)
    lo_sc = slot_scatter(
        lay.sg, (blocks64 - b_hi.astype(np.float64)).astype(np.float32))
    a_lo, _ = expand_block_planes(lay, lo_sc, lo_sc)
    s_sys, a_sys, _, _ = scalar_scale_add(lay, mask_v[bperm])
    g_sys = _dc.replace(
        lay.pattern, vals=a_vf * s_sys + a_sys, vals_lo=a_lo * s_sys)
    b_p = jnp.asarray(b64[(bperm[:, None] * b_sz
                           + np.arange(b_sz)[None, :]).reshape(-1)
                          if b_sz > 1 else bperm])

    def variant_iters(vf, vr):
        prec = GselSpaiPrec(
            _dc.replace(lay.pattern, vals=vf),
            _dc.replace(lay.pattern, vals=vr),
            jnp.float32(float(ws.epsilon)), impl=impl)
        r = pcg_gsel_rr(
            g_sys, b_p, prec=prec, rtol=1e-6, max_iter=20000, impl=impl,
            spmv_precision="ds_a", escalate_on_rebound=False)
        return int(r.iters), int(r.rebounds)

    out = {"impl": impl, "variants": {}}
    variants = [
        ("base", "0", jax.lax.Precision.HIGHEST),
        ("stacked", "1", jax.lax.Precision.HIGHEST),
        ("stacked3", "1", jax.lax.Precision.HIGH),
        # 1-pass bf16 FFN dots (gather dot stays HIGHEST/exact): the
        # factor is a preconditioner — if iterations hold, this is the
        # big forward lever (6 passes -> 1 per learned contraction)
        ("stacked1", "1", jax.lax.Precision.DEFAULT),
    ]
    # R5_AB_ONLY=stacked3,stacked1 limits the timed variants (each costs
    # ~13 min of fused-kernel compilation on the relay; the first queue6
    # run timed out after base+stacked). base still provides the drift
    # reference via one cheap un-timed construct() when filtered out.
    only = os.environ.get("R5_AB_ONLY", "")
    only_set = set(only.split(",")) if only else None
    for name, stk, prec in variants:
        os.environ["TPU_SPAI_FUSED_STACKED"] = stk
        sf._FFN_PRECISION = prec
        sf.fused_mp_layer.clear_cache()
        fwd_chain.clear_cache()
        _construct.clear_cache()
        _construct_chain.clear_cache()
        if only_set is not None and name not in only_set:
            if name == "base":
                vf, _vr = sc.construct()
                out["_vf0"] = np.asarray(vf).ravel()
                log("base: drift reference only (filtered)")
            continue
        try:
            t_fwd = time_chain(lambda r: fwd_chain(
                params, lay.sg, xp, e_f, e_r, r=r))
            t_con = time_chain(lambda r: _construct_chain(
                params, lay.sg, lay.perm_f, lay.perm_r, lay.gf_f, lay.gf_r,
                lay.mask, xp, e_f, e_r, sff, aff, srr, arr,
                gnn_impl=gnn_impl, bb=bb, reps=r))
            row = {"fwd_ms": round(t_fwd * 1e3, 3),
                   "construct_ms": round(t_con * 1e3, 3)}
            # factor-value drift vs the base variant (first variant)
            vf, vr = sc.construct()
            v = np.asarray(vf).ravel()
            if name == "base":
                out["_vf0"] = v
                row["vals_rel_drift"] = 0.0
            else:
                v0 = out["_vf0"]
                row["vals_rel_drift"] = float(
                    np.linalg.norm(v - v0)
                    / max(np.linalg.norm(v0), 1e-30))
            row["iters"], row["rebounds"] = variant_iters(vf, vr)
            out["variants"][name] = row
            log(f"{name}: fwd {row['fwd_ms']} ms construct "
                f"{row['construct_ms']} ms drift {row['vals_rel_drift']:.2e}"
                f" iters {row['iters']} (reb {row['rebounds']})")
        except Exception as exc:  # noqa: BLE001
            out["variants"][name] = {"error": f"{type(exc).__name__}: {exc}"}
            log(f"{name} FAILED: {exc}")
    out.pop("_vf0", None)
    # restore defaults
    os.environ["TPU_SPAI_FUSED_STACKED"] = "1"
    sf._FFN_PRECISION = jax.lax.Precision.HIGHEST
    with open("output/r5_w48_fwd_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

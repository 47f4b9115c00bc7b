"""Round-4 training-step decomposition (VERDICT r3 weak #6 / item 6).

The round-1k finding: a full 48x6 train step at the reference-scale
synthetic bucket lands at ~3x the sum of its measured parts; the round-3
nn.scan A/B killed the program-duplication hypothesis (speedup 0.966).
This script decomposes the step the way r3_prec_profile decomposed
inference — every part CHAINED inside one jitted lax.scan program with a
data dependency and host-fetch forcing (CLAUDE.md protocol), so the
~22.5 ms relay dispatch floor and host overheads cancel out of the
per-part numbers:

  fwd            loss forward only
  grad           value_and_grad with the production remat=True
  grad_noremat   value_and_grad with remat=False (isolates recompute)
  step_chain     grad + adamw update, params/opt carried through the scan
  step_wall      the round-1k protocol: single dispatched steps, host
                 fetch each (what the training loop actually pays)

Attribution:
  step_chain - grad       = optimizer + update cost inside one program
  grad - grad_noremat     = remat recompute tax
  step_wall - step_chain  = dispatch/relay/host interleave (NOT XLA)

Run ON the TPU, serialized:  timeout 2400 python scripts/r4_step_profile.py
Writes output/r4_step_profile.json.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401
from tpu_spai.data.batching import collate
from tpu_spai.data.folder import FolderDataset
from tpu_spai.datagen.synthetic import SyntheticDatagen


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def diff_chain(fn, m1, m2, reps=6):
    """(minT(m2)-minT(m1))/(m2-m1) seconds with host-fetch forcing."""
    np.asarray(jax.tree_util.tree_leaves(fn(m2))[0])
    np.asarray(jax.tree_util.tree_leaves(fn(m1))[0])
    ts = {m1: [], m2: []}
    for _ in range(reps):
        for m in (m1, m2):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(m))[0])
            ts[m].append(time.perf_counter() - t0)
    return (min(ts[m2]) - min(ts[m1])) / (m2 - m1)


def main():
    import optax

    from tpu_spai.train import get_workspace

    wd = "/tmp/r3_scan_ab"  # share the r3 A/B dataset (one-time gen)
    if not os.path.isdir(f"{wd}/synthetic/mat"):
        log("generating synthetic reference-scale samples (one-time)...")
        SyntheticDatagen(
            prefix=f"{wd}/synthetic", max_count=2, low=10240, high=20480,
            sparsity=3e-4, alpha=1e-3, seed=7,
        ).generate()
    ds = FolderDataset(
        f"{wd}/synthetic", is_fixed_topology=False,
        has_shared_features=False, use_node_features=False,
        use_edge_features_as_node_feature="mean",
    )
    t0 = time.perf_counter()
    batch = collate([ds.get(0), ds.get(1)])
    collate_s = time.perf_counter() - t0
    e_pad = int(np.asarray(batch.graph.edge_row).shape[0])
    log(f"batch: {batch.n_nodes} nodes, {e_pad} padded edges, "
        f"collate {collate_s*1e3:.0f} ms")

    loss_cfg = {"name": "RelativeL2Loss_ANorm", "params": {}}

    def gnn_cfg(remat):
        mlp = {"pre_norm": "layer", "hidden_channels": 48, "num_layers": 2}
        return {
            "node_features": 48, "edge_features": 48, "num_mp_layers": 6,
            "node_residual": True, "edge_residual": True,
            "node_encoder": {"hidden_channels": 48, "num_layers": 2},
            "edge_encoder": {"hidden_channels": 48, "num_layers": 2},
            "node_decoder": {"hidden_channels": 48, "num_layers": 2},
            "edge_decoder": {"hidden_channels": 48, "num_layers": 2},
            "node_mlp": mlp, "edge_mlp": mlp, "msg_mlp": mlp,
            "remat": remat,
        }

    out = {"edges_padded": e_pad, "collate_ms": round(collate_s * 1e3, 1)}

    ws = get_workspace("simple")(
        gnn=gnn_cfg(True), loss=loss_cfg, block_size=1, epsilon=3e-3,
    )
    ws_nr = get_workspace("simple")(
        gnn=gnn_cfg(False), loss=loss_cfg, block_size=1, epsilon=3e-3,
    )
    params = ws.init_params(jax.random.key(0), batch)
    tx = optax.adamw(1e-3)
    opt0 = tx.init(params)

    # ---- chained parts -------------------------------------------------
    @partial(jax.jit, static_argnums=(2, 3))
    def chain_part(params, batch, r, kind):
        def body(c, _):
            p2 = jax.tree_util.tree_map(lambda w: w + c * 1e-30, params)
            if kind == "fwd":
                v = jnp.asarray(ws.loss(p2, batch)[0]).ravel()[0]
            elif kind == "grad":
                (v, _), g = jax.value_and_grad(ws.loss, has_aux=True)(
                    p2, batch)
                # consume EVERY grad leaf: touching only one lets XLA
                # dead-code-eliminate most of the backward (~540 ms of
                # it at this bucket — the source of the round-1k
                # "3x sum-of-parts" artifact)
                v = jnp.asarray(v).ravel()[0] + sum(
                    q.ravel()[0] for q in jax.tree_util.tree_leaves(g))
            else:  # grad_noremat
                (v, _), g = jax.value_and_grad(ws_nr.loss, has_aux=True)(
                    p2, batch)
                v = jnp.asarray(v).ravel()[0] + sum(
                    q.ravel()[0] for q in jax.tree_util.tree_leaves(g))
            return c + v * 1e-30, v

        _, vs = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
        return vs[-1]

    for kind in ("fwd", "grad", "grad_noremat"):
        t = diff_chain(lambda m, k=kind: chain_part(params, batch, m, k),
                       2, 8)
        out[f"{kind}_ms"] = round(t * 1e3, 1)
        log(kind, out[f"{kind}_ms"], "ms")

    # ---- chained FULL steps (params/opt carried) -----------------------
    @partial(jax.jit, static_argnums=3)
    def chain_step(params, opt, batch, r):
        def body(carry, _):
            p, o = carry
            (lv, _), g = jax.value_and_grad(ws.loss, has_aux=True)(p, batch)
            upd, o = tx.update(g, o, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
            return (p, o), jnp.asarray(lv).ravel()[0]

        (_, _), ls = jax.lax.scan(body, (params, opt), None, length=r)
        return ls[-1]

    t_step = diff_chain(lambda m: chain_step(params, opt0, batch, m), 2, 8)
    out["step_chain_ms"] = round(t_step * 1e3, 1)
    log("step_chain", out["step_chain_ms"], "ms")

    # ---- wall-dispatched steps (round-1k protocol) ---------------------
    @jax.jit
    def step1(params, opt, batch):
        (lv, _), g = jax.value_and_grad(ws.loss, has_aux=True)(params, batch)
        upd, opt = tx.update(g, opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        return params, opt, lv

    p, o = params, opt0
    p, o, lv = step1(p, o, batch)
    float(jnp.asarray(lv).ravel()[0])
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        p, o, lv = step1(p, o, batch)
        float(jnp.asarray(lv).ravel()[0])
        ts.append(time.perf_counter() - t0)
    out["step_wall_ms_min"] = round(min(ts) * 1e3, 1)
    out["step_wall_ms_med"] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)
    log("step_wall", out["step_wall_ms_min"], "ms (min)")

    # ---- attribution ---------------------------------------------------
    out["attribution"] = {
        "remat_recompute_ms": round(
            out["grad_ms"] - out["grad_noremat_ms"], 1),
        "optimizer_update_ms": round(
            out["step_chain_ms"] - out["grad_ms"], 1),
        "dispatch_host_ms": round(
            out["step_wall_ms_min"] - out["step_chain_ms"], 1),
        "step_chain_over_grad": round(
            out["step_chain_ms"] / max(out["grad_ms"], 1e-9), 2),
        "step_wall_over_chain": round(
            out["step_wall_ms_min"] / max(out["step_chain_ms"], 1e-9), 2),
    }
    os.makedirs("output", exist_ok=True)
    with open("output/r4_step_profile.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Isolate the rr/ds iteration-inflation cause on heat_r20 sample 40.

Numpy fp64 re-implementations of the device loop, toggling one detail at
a time:
  pcg_plain       textbook PCG, fp64 values           -> expect ~host(111)
  pcg_replace     + the vdV-Ye replacement/anchor rule -> replacement bug?
  pcg_f32vals     textbook, f32-rounded A and L values -> storage rounding?
  pcg_f32arith    f32 vectors, f64 dots (rr analog)    -> arithmetic?

Usage: python scripts/rr_diag.py [sample=40]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pcg(a, b, papply, rtol=1e-6, max_iter=50000, replace=False, k_rep=64,
        dtype=np.float64):
    n = len(b)
    x = np.zeros(n, dtype)
    bd = b.astype(dtype)
    r = bd.copy()
    s = papply(r).astype(dtype)
    d = s.copy()
    delta = float(r.astype(np.float64) @ s.astype(np.float64))
    bnorm2 = float(b @ b)
    tol2 = rtol * rtol * bnorm2
    rn2_anchor = float(r.astype(np.float64) @ r.astype(np.float64))
    it = 0
    while it < max_iter:
        rn2 = float(r.astype(np.float64) @ r.astype(np.float64))
        if rn2 <= tol2:
            break
        q = (a @ d.astype(np.float64)).astype(dtype)
        dq = float(d.astype(np.float64) @ q.astype(np.float64))
        alpha = delta / dq
        x = (x + dtype(alpha) * d).astype(dtype)
        r = (r - dtype(alpha) * q).astype(dtype)
        rn2_rec = float(r.astype(np.float64) @ r.astype(np.float64))
        if replace:
            do_rep = (
                rn2_rec <= 0.0625 * rn2_anchor
                or (it + 1) % k_rep == 0
                or rn2_rec <= tol2
            )
            if do_rep:
                r = (bd - (a @ x.astype(np.float64)).astype(dtype)).astype(dtype)
                rn2_anchor = float(
                    r.astype(np.float64) @ r.astype(np.float64))
        s = papply(r).astype(dtype)
        delta_new = float(r.astype(np.float64) @ s.astype(np.float64))
        beta = delta_new / delta
        d = (s + dtype(beta) * d).astype(dtype)
        delta = delta_new
        it += 1
    true_rel = np.linalg.norm(a @ x.astype(np.float64) - b) / np.linalg.norm(b)
    return it, true_rel


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    sample = int(kv.get("sample", 40))

    import yaml

    import tpu_spai  # noqa: F401
    from tpu_spai.cli.train import build_dataset
    from tpu_spai.config import _wrap
    from tpu_spai.data.batching import collate
    from tpu_spai.solver.host_baselines import get_pcg_iter_time
    from tpu_spai.sparse.convert import graph_to_csr
    from tpu_spai.train import get_workspace
    from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

    ckpt_dir = "outputs/heat_r20_v2/checkpoints"
    with open(os.path.join(ckpt_dir, "config.yaml")) as f:
        cfg = _wrap(yaml.safe_load(f))
    dataset = build_dataset(cfg)
    ws = get_workspace(cfg.select("workspace", "simple"))(
        gnn=cfg["gnn"], loss=cfg["loss"], block_size=dataset.block_size,
        epsilon=float(cfg["epsilon"]),
    )
    batch = collate([dataset.get(sample)])
    params = ws.init_params(jax.random.key(0), batch)
    params = load_checkpoint(latest_checkpoint(ckpt_dir), params)

    n_valid = int(np.sum(np.asarray(batch.node_valid)))
    msize = n_valid * batch.block_size
    e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
    ei = np.stack(
        [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
    )
    a = graph_to_csr(
        ei[:, :e_valid], np.asarray(batch.graph.blocks)[:e_valid],
        msize, mask=np.asarray(batch.mask)[:n_valid],
    )
    l = ws.factor_csr(params, batch, n_valid_edges=e_valid)[:msize, :msize]
    eps = float(ws.epsilon)
    r = np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64)
    b = a @ r

    it_host, _, _ = get_pcg_iter_time(a, r, l, eps, rtol=1e-6)
    print(f"host oracle: {it_host}")

    lt = l.T.tocsr()
    papply64 = lambda rr: eps * rr + l @ (lt @ rr)  # noqa: E731

    it, rel = pcg(a, b, papply64)
    print(f"pcg_plain fp64:        {it}  true_rel {rel:.2e}")
    it, rel = pcg(a, b, papply64, replace=True)
    print(f"pcg_replace fp64:      {it}  true_rel {rel:.2e}")

    a32 = a.copy()
    a32.data = a32.data.astype(np.float32).astype(np.float64)
    l32 = l.copy()
    l32.data = l32.data.astype(np.float32).astype(np.float64)
    lt32 = l32.T.tocsr()
    pap32v = lambda rr: eps * rr + l32 @ (lt32 @ rr)  # noqa: E731
    it, rel = pcg(a32, b, pap32v)
    print(f"pcg_f32vals fp64arith: {it}  true_rel {rel:.2e}")

    pap32 = lambda rr: (  # noqa: E731
        np.float32(eps) * rr.astype(np.float32)
        + (l32 @ (lt32 @ rr.astype(np.float64))).astype(np.float32)
    )
    it, rel = pcg(a32, b, pap32, replace=True, dtype=np.float32)
    print(f"pcg_f32arith+replace:  {it}  true_rel {rel:.2e}")


if __name__ == "__main__":
    main()

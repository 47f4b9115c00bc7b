"""Condition-number study (~ reference cond.py).

Per test sample computes the spectral condition number kappa = max/min |eig|
and the Kaporin number (mean/geomean of eigenvalues) of M^{-1} A for:
  neural (the learned SPAI), none, diag (Jacobi), ainv (Z D^{-1} Z^T from
  the native AINV), ichol ((L L^T)^{-1} from the native IC0),
then writes `cond_<exp>.csv` / `kaporin_<exp>.csv` plus boxplots
(cond.py:22-38, 106-178).

Usage:
    python -m tpu_spai.cli.cond exp_name=heat data.prefix=generated/heat \
        pretrained=outputs/heat/checkpoints [max_samples=16]
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Tuple

import jax
import numpy as np
import pandas as pd

import tpu_spai  # noqa: F401
from ..config import cli_config
from ..data.batching import collate
from ..logging_utils import get_logger
from ..native import ainv as native_ainv, ic0 as native_ic0
from ..sparse.convert import graph_to_csr
from ..train import get_workspace
from ..train.checkpoints import latest_checkpoint, load_checkpoint
from .train import CONFIG_DIR, build_dataset

log = get_logger()


def geometric_mean(x: np.ndarray) -> float:
    return float(np.exp(np.log(x).mean()))


def condition_number(a: np.ndarray, m=None) -> Tuple[float, float]:
    """(kappa, kaporin) of M A (cond.py:22-38)."""
    ma = m @ a if m is not None else a
    ev = np.abs(np.linalg.eigvalsh(ma))
    standard = ev.max() / ev.min()
    kaporin = float(np.mean(ev)) / geometric_mean(ev)
    return float(standard), kaporin


def precondition_dense(workspace, params, batch, a_dense, n_valid_edges):
    """Dense M = L L^T + eps I (workspace.py:207-211; scaled variant folds
    D^{-1} per scaled_workspace.py:215-220)."""
    msize = a_dense.shape[0]
    l_csr = workspace.factor_csr(params, batch, n_valid_edges=n_valid_edges)[
        :msize, :msize
    ]
    m = (l_csr @ l_csr.T).toarray()
    if workspace.name == "scaled":
        dinv = np.diag(1.0 / np.diag(a_dense))
        return m + workspace.epsilon * dinv
    return m + workspace.epsilon * np.eye(msize)


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    dataset = build_dataset(cfg)
    ws_cls = get_workspace(cfg.select("workspace", "simple"))
    workspace = ws_cls(
        gnn=cfg.gnn, loss=cfg.loss, block_size=dataset.block_size,
        epsilon=float(cfg.epsilon),
    )

    from ..data.folder import split_dataset

    _, va = split_dataset(len(dataset), cfg.split["train"], seed=42)
    example = collate([dataset.get(va[0])])
    params = workspace.init_params(jax.random.key(0), example)
    pretrained = cfg.select("pretrained", "")
    if pretrained:
        ckpt = Path(pretrained)
        if ckpt.is_dir() and (ckpt / "latest.json").exists():
            ckpt = latest_checkpoint(ckpt)
        params = load_checkpoint(ckpt, params)
        log.info(f"Loaded pretrained model from {ckpt}")

    max_samples = int(cfg.select("max_samples", 0)) or len(va)
    stat, stat_k = {}, {}

    def put(name, pair):
        stat.setdefault(name, []).append(pair[0])
        stat_k.setdefault(name, []).append(pair[1])

    for i in va[:max_samples]:
        batch = collate([dataset.get(i)])
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
        a_dense = a_csr.toarray()

        def guarded(name, fn):
            # classical factorizations can break down on hostile samples
            # (AINV pivots ~0, IC0 non-existence) — log and skip the
            # method, keep the study going (reference-style robustness,
            # infer.py:361-370)
            try:
                put(name, fn())
            except Exception as e:  # noqa: BLE001
                log.warning(f"sample {i}: {name} skipped ({e})")
                put(name, (np.nan, np.nan))

        guarded("neural", lambda: condition_number(
            a_dense, precondition_dense(workspace, params, batch, a_dense, e_valid)
        ))
        guarded("none", lambda: condition_number(a_dense))
        guarded("diag", lambda: condition_number(
            a_dense, np.diag(1.0 / np.diag(a_dense))
        ))

        def _ainv():
            z, p = native_ainv(a_csr)
            if not np.all(np.isfinite(1.0 / p)):
                raise FloatingPointError("AINV pivot breakdown")
            return condition_number(
                a_dense, (z @ np.diag(1.0 / p) @ z.T.toarray())
            )

        guarded("ainv", _ainv)

        def _ichol():
            lfac = native_ic0(a_csr).toarray()
            return condition_number(a_dense, np.linalg.inv(lfac @ lfac.T))

        guarded("ichol", _ichol)
        log.info(f"sample {i}: " + ", ".join(f"{k}={v[-1]:.1f}" for k, v in stat.items()))

    exp_name = cfg.exp_name
    out_dir = Path(cfg.select("out_dir", "output"))
    out_dir.mkdir(parents=True, exist_ok=True)

    def do_save(d, name):
        table = pd.DataFrame(d)
        fname = out_dir / f"{name}_{exp_name}.csv"
        table.to_csv(fname, index=False)
        log.info(f"saved {fname}")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(10, 6))
            table.boxplot()
            plt.title("Condition Number Distribution")
            plt.ylabel("Condition Number")
            if name == "cond":
                plt.yscale("log")
            plt.savefig(out_dir / f"{name}_{exp_name}.png", dpi=150)
            plt.close()
        except Exception as e:  # noqa: BLE001
            log.warning(f"plot skipped: {e}")

    do_save(stat, "cond")
    do_save(stat_k, "kaporin")
    return stat, stat_k


if __name__ == "__main__":
    main()

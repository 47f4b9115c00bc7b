"""Inference on the heat-multisource dataset (~ infer_neural_pcg_heat.py).

Per sample compares: scipy PCG with the learned factor (triangular-solve IC
apply, the NeuralPCG convention), device PCG, Jacobi, IC0 and
unpreconditioned baselines (reference do_inference,
infer_neural_pcg_heat.py:142-186).

Usage:
    python -m tpu_spai.cli.infer_neural_pcg_heat exp_name=heatmultisource \
        pretrained=outputs/heatmultisource/checkpoints [max_samples=8]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import numpy as np

import tpu_spai  # noqa: F401
from ..bench import Timestat
from ..config import cli_config
from ..data.adapters import HeatMultiSourceDataset
from ..data.batching import collate
from ..logging_utils import get_logger
from ..solver.host_baselines import (
    get_cg_iter_time,
    get_pcg_ichol_iter_time,
)
from ..sparse.convert import graph_to_csr
from ..train import get_workspace
from ..train.checkpoints import latest_checkpoint, load_checkpoint
from .train import CONFIG_DIR

log = get_logger()


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    dataset = HeatMultiSourceDataset(
        n_domains=int(cfg.select("n_domains", 4)),
        steps_per_domain=int(cfg.select("steps_per_domain", 4)),
        seed=int(cfg.select("seed", 42)),
    )
    workspace = get_workspace(cfg.select("workspace", "npcg"))(
        gnn=cfg.gnn, loss=cfg.loss, block_size=1, epsilon=float(cfg.epsilon),
    )
    example = collate([dataset.get(0)])
    params = workspace.init_params(jax.random.key(0), example)
    pretrained = cfg.select("pretrained", "")
    if pretrained:
        ckpt = Path(pretrained)
        if ckpt.is_dir() and (ckpt / "latest.json").exists():
            ckpt = latest_checkpoint(ckpt)
        params = load_checkpoint(ckpt, params)
        log.info(f"loaded {ckpt}")

    rtol = float(cfg.select("rtol", 1e-6))
    stats = Timestat()
    max_samples = int(cfg.select("max_samples", 8))
    import scipy.sparse as sp

    for i in range(min(max_samples, len(dataset))):
        batch = collate([dataset.get(i)])
        n_valid = int(np.sum(np.asarray(batch.node_valid)))
        e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
        ei = np.stack(
            [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
        )
        a_csr = graph_to_csr(
            ei[:, :e_valid], np.asarray(batch.graph.blocks)[:e_valid], n_valid,
            mask=np.asarray(batch.mask)[:n_valid],
        )
        r = np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64)
        for m in ("none", "diagonal", "ic"):
            it, p, s = get_cg_iter_time(a_csr, r, rtol=rtol, method=m,
                                        raise_on_fail=False)
            stats.put(f"PCG-{m}-cpu", s, p, it, n_valid)
        l_csr = workspace.factor_csr(params, batch, n_valid_edges=e_valid)[
            :n_valid, :n_valid
        ]
        l_lo = sp.tril(l_csr, format="csr")
        dia = l_lo.diagonal()
        if np.any(dia == 0):
            l_lo = sp.csr_matrix(l_lo + sp.diags((dia == 0) * 1.0))
        try:
            it, s = get_pcg_ichol_iter_time(a_csr, l_lo, r, rtol=rtol)
            stats.put("Neural", s, 0.0, it, n_valid)
        except Exception as e:  # noqa: BLE001
            log.error(f"neural solve failed on sample {i}: {e}")
    stats.print(log.info)
    out_dir = Path(cfg.select("out_dir", "output"))
    out_dir.mkdir(parents=True, exist_ok=True)
    fname = out_dir / f"infer_heatmultisource.csv"
    stats.timestat_to_dataframe().to_csv(fname, index=False)
    log.info(f"saved {fname}")
    return stats


if __name__ == "__main__":
    main()

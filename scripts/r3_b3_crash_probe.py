"""Isolate the armadillo-scale (n=17,454, b=3) TPU worker crash.

The b=3 device solve kernel-faults the shared worker (seen in round-2
evaluate() and reproducibly at round-3 validation epoch 99). CPU-side
plane validation is clean (bounds, one-hots, XLA numerics — see the
session log), so this probes the Pallas kernels on the real chip one at
a time, stopping at the first fault. Each probe forces with a host
fetch. EXPECT a possible worker crash (~3-10 min recovery): run alone,
under timeout, when nothing else is queued.

    timeout 1200 python scripts/r3_b3_crash_probe.py
"""

import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401
from tpu_spai.cli.train import CONFIG_DIR, build_dataset
from tpu_spai.config import cli_config
from tpu_spai.data.batching import collate
from tpu_spai.data.folder import split_dataset
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.solver import GselSpaiPrec
from tpu_spai.solver.gsel_solver import build_gsel_csr, gsel_matvec, pcg_gsel, pcg_gsel_rr
from tpu_spai.sparse.convert import graph_to_csr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = cli_config(
    ["exp_name=stretch_armadillo", "data.prefix=generated/stretch_armadillo",
     "data.block_size=3", "workspace=scaled"],
    CONFIG_DIR, "basic",
)
ds = build_dataset(cfg)
tr, va = split_dataset(len(ds), cfg.split["train"], seed=42)
b = collate([ds.get(va[0])])
n_valid = int(np.sum(np.asarray(b.node_valid)))
e_valid = int(np.sum(np.asarray(b.edge_seg) == 0))
msize = n_valid * b.block_size
ei = np.stack([np.asarray(b.graph.edge_row), np.asarray(b.graph.edge_col)])
a_csr = graph_to_csr(
    ei[:, :e_valid], np.asarray(b.graph.blocks)[:e_valid], msize,
    mask=np.asarray(b.mask)[:n_valid],
)
wperm = rcm_permutation(a_csr)
a_p = a_csr[wperm][:, wperm].tocsr()
a_p.sort_indices()
ga = build_gsel_csr(a_p, double_single=True)
log(f"planes: n={msize} steps={ga.n_steps} kw={ga.k_width} qc={ga.q_chunks} "
    f"win={ga.window} group={ga.group}")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(msize), jnp.float32)
ref = a_p @ np.asarray(x, np.float64)


def probe(name, fn):
    log(f"--- probe: {name}")
    try:
        out = fn()
        log(f"    ok: {out}")
        return True
    except Exception as exc:  # noqa: BLE001
        log(f"    FAULT at {name}: {type(exc).__name__}: {exc}")
        return False


ok = probe("spmv_pallas_f32", lambda: float(np.linalg.norm(
    np.asarray(gsel_matvec(ga, x, "pallas"))[:msize] - ref
) / np.linalg.norm(ref)))

if ok:
    from tpu_spai.kernels.gsel_pallas import gsel_spmv_ds_pallas

    def ds_probe():
        h, lo = gsel_spmv_ds_pallas(ga, x, jnp.zeros_like(x))
        y = np.asarray(h, np.float64) + np.asarray(lo, np.float64)
        return float(np.linalg.norm(y[:msize] - ref) / np.linalg.norm(ref))

    ok = probe("spmv_ds_pallas", ds_probe)

if ok:
    # identity-ish factor planes for the prec apply path
    import scipy.sparse as sp

    l_csr = sp.tril(a_p).tocsr()
    l_csr.sort_indices()
    gl = build_gsel_csr(l_csr)
    gt = build_gsel_csr(sp.csr_matrix(l_csr.T).tocsr())
    if gl is None or gt is None:
        log("factor planes unbandable; skipping prec probes")
    else:
        prec = GselSpaiPrec(gl, gt, jnp.float32(3e-3))
        ok = probe("prec_apply(2 spmvs)", lambda: float(np.asarray(
            gsel_matvec(gl, gsel_matvec(gt, x, "pallas"), "pallas")
        ).sum()))
        if ok:
            ok = probe("pcg_gsel f32 30 iters", lambda: int(pcg_gsel(
                ga, x, prec=prec, rtol=1e-30, max_iter=30,
                dot_dtype="chunk64", impl="pallas",
            ).iters))
        if ok:
            ok = probe("pcg_gsel_rr rds 30 iters", lambda: int(pcg_gsel_rr(
                ga, x.astype(jnp.float64), prec=prec, rtol=1e-30,
                max_iter=30, impl="pallas", spmv_precision="ds_a",
            ).iters))
        if ok:
            ok = probe("pcg_gsel f32 full solve", lambda: int(pcg_gsel(
                ga, x, prec=prec, rtol=1e-6, max_iter=msize,
                dot_dtype="chunk64", impl="pallas",
            ).iters))
log("probe sequence done")

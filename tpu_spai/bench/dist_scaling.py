"""Distributed scaling-efficiency measurement (BASELINE scaling target).

Measures row-partitioned SpMV + distributed-CG timing at 1/2/4/8 shards on
whatever mesh is available (the CI environment simulates 8 devices on CPU;
on a real pod slice the same code measures ICI scaling). Reports per-shard
efficiency = T(1) / (P * T(P)) for a fixed-size problem (strong scaling).

Usage: python -m tpu_spai.bench.dist_scaling [--n 200000] [--out DIST_SCALING.md]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120_000)
    ap.add_argument("--band", type=int, default=8)
    ap.add_argument("--out", default="DIST_SCALING.md")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        # must happen before ANY backend query (default_backend() would
        # initialize the TPU and fight a concurrent TPU job)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax.sharding import Mesh

    import tpu_spai  # noqa: F401
    from ..dist import dist_pcg, partition_system
    from ..dist.partition import scatter_vector

    n = args.n
    rng = np.random.default_rng(0)
    diags = [np.full(n, 4.0)]
    offs = [0]
    for k in range(1, args.band):
        v = -0.4 * rng.random(n - k)
        diags += [v, v]
        offs += [k, -k]
    a = sp.csr_matrix(sp.diags(diags, offs))
    a.sort_indices()
    xstar = rng.standard_normal(n)
    b = a @ xstar

    devices = jax.devices()
    rows = [
        "# Distributed CG strong scaling",
        "",
        f"matrix: banded SPD n={n}, nnz={a.nnz}; backend={devices[0].platform} "
        f"x{len(devices)} devices; fixed problem, rtol=1e-8.",
        "",
        "NOTE: on a CPU-simulated mesh all shards share one physical CPU, so"
        " efficiency here only validates the halo-exchange machinery (identical"
        " iteration counts across shardings = correctness); real ICI scaling"
        " requires a pod slice.",
        "",
        "| shards | iters | solve (s) | efficiency |",
        "|---|---|---|---|",
    ]
    t1 = None
    for p in (1, 2, 4, 8):
        if p > len(devices):
            break
        mesh = Mesh(np.array(devices[:p]), ("shards",))
        system, perm = partition_system(a, n_shards=p)
        bs = scatter_vector(b, perm, system)
        res = dist_pcg(system, bs, mesh, rtol=1e-8, max_iter=5000)
        np.asarray(res.x)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = dist_pcg(system, bs, mesh, rtol=1e-8, max_iter=5000)
            np.asarray(res.x)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        if t1 is None:
            t1 = t
        eff = t1 / (p * t)
        rows.append(f"| {p} | {int(res.iters)} | {t:.3f} | {eff:.2f} |")
        print(rows[-1], flush=True)
    out = Path(args.out)
    out.write_text("\n".join(rows) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

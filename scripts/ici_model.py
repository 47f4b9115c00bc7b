"""Analytic ICI scaling model for the distributed SPAI-PCG.

VERDICT round-2 weak item 7: the CPU-mesh efficiency column in
DIST_SCALING.md validates only correctness; this script provides the
missing bytes-per-iteration vs ICI-bandwidth model standing in for the
pod-slice measurement this single-chip environment cannot make.

Per CG iteration, dist_pcg_gsel exchanges halos THREE times (the A-SpMV
and the two SPAI factor SpMVs each need their input vector's boundary
band) and reduces 2 scalars by psum. With RCM band partitioning the halo
is the matrix half-bandwidth rounded up to whole 128-row chunks; the
measured interior/boundary split overlaps ~2/3 of each local SpMV with
its exchange (docs/DIST_SCALING.md round-1 overlap section).

Inputs: REAL partition geometry (dist/partition.py on the benchmark heat
operators) + the measured isolated-SpMV time (docs/ROOFLINE.md, ~17 ps/nnz
at n=117k: 24.9 us / 1.47M nnz) + public v5e ICI figures (~45 GB/s per direction per link,
~1 us hop latency — jax-ml.github.io/scaling-book). Writes
output/ici_model.json and prints the markdown table for DIST_SCALING.md.

Usage: python scripts/ici_model.py [res=48]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_GBPS = 45.0  # per direction per link, v5e (public scaling-book figure)
ICI_LAT_S = 1e-6  # per hop
S_PER_NNZ = 24.9e-6 / 1_472_689  # measured gsel SpMV @ n=117k (ROOFLINE.md)
OVERLAP = 2.0 / 3.0  # interior fraction overlapping the exchange
EXCHANGES_PER_ITER = 3  # A-SpMV + 2 SPAI factor SpMVs
PSUMS_PER_ITER = 2  # CG dots (scalar latency, bandwidth-negligible)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    res = int(kv.get("res", 48))

    from tpu_spai.bench.roofline import build_heat
    from tpu_spai.dist.partition import partition_system

    a = build_heat(res)
    n, nnz = a.shape[0], a.nnz
    rows = []
    for p in (2, 4, 8, 16):
        try:
            system, _ = partition_system(a, p, dtype=np.float32)
        except ValueError as exc:
            rows.append({"shards": p, "error": str(exc)})
            continue
        halo_rows = system.halo
        chunk = system.chunk
        # one-direction bytes on the busiest link per exchange: one halo
        # band of f32 (each SpMV also returns halo partials in the
        # reverse direction — same size, opposite direction, so the
        # per-direction link load is halo_bytes per exchange)
        halo_bytes = halo_rows * 4
        t_comm = EXCHANGES_PER_ITER * (halo_bytes / (ICI_GBPS * 1e9)
                                       + ICI_LAT_S)
        t_psum = PSUMS_PER_ITER * 2 * ICI_LAT_S  # ring latency-dominated
        t_comp = (nnz / p) * S_PER_NNZ * 3  # 3 SpMVs/iter local
        t_exposed = max(0.0, t_comm - OVERLAP * t_comp) + t_psum
        t_iter = t_comp + t_exposed
        eff = t_comp / (p * 0 + t_iter)  # vs perfect scaling of compute
        rows.append({
            "shards": p,
            "chunk_rows": chunk,
            "halo_rows": int(halo_rows),
            "halo_kb_per_exchange": round(halo_bytes / 1024, 1),
            "t_comp_us": round(t_comp * 1e6, 1),
            "t_comm_us": round((t_comm + t_psum) * 1e6, 1),
            "t_iter_us": round(t_iter * 1e6, 1),
            "parallel_efficiency": round(eff, 3),
            "speedup": round((nnz * S_PER_NNZ * 3) / t_iter, 2),
        })

    out = {
        "matrix": {"res": res, "n": n, "nnz": int(nnz)},
        "model": {
            "ici_gbps_per_dir": ICI_GBPS,
            "ici_hop_latency_s": ICI_LAT_S,
            "s_per_nnz_measured": S_PER_NNZ,
            "overlap_fraction": OVERLAP,
            "exchanges_per_iter": EXCHANGES_PER_ITER,
        },
        "rows": rows,
    }
    os.makedirs("output", exist_ok=True)
    with open("output/ici_model.json", "w") as f:
        json.dump(out, f, indent=1)

    print(f"heat res={res}: n={n} nnz={nnz}")
    print("| shards | halo rows | halo KB/exch | t_comp us | t_comm us "
          "| t_iter us | efficiency | speedup |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['shards']} | — partition infeasible: {r['error']} |")
            continue
        print(f"| {r['shards']} | {r['halo_rows']} "
              f"| {r['halo_kb_per_exchange']} | {r['t_comp_us']} "
              f"| {r['t_comm_us']} | {r['t_iter_us']} "
              f"| {r['parallel_efficiency']} | {r['speedup']} |")
    print("wrote output/ici_model.json")


if __name__ == "__main__":
    main()

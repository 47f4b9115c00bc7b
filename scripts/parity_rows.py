"""Summarize cli.infer all_infer CSVs into PARITY.md-style rows.

Usage: python scripts/parity_rows.py output/heat_bunny [output/poisson_pipe ...]
Prints, per directory: mean iterations and mean total ms per Key.
"""

import glob
import os
import sys

import pandas as pd


def main():
    for d in sys.argv[1:]:
        files = sorted(glob.glob(os.path.join(d, "all_infer_*.csv")))
        if not files:
            print(f"{d}: no all_infer CSV")
            continue
        df = pd.read_csv(files[-1])
        n = df["Matrix Size"].max()
        print(f"\n== {d} (n={n}, {os.path.basename(files[-1])}, "
              f"{df.groupby('Key').size().iloc[0]} samples)")
        df["total_ms"] = df["Solve Time (ms)"] + df["Precond Time (ms)"]
        g = df.groupby("Key").agg(
            iters=("#Iteration", "mean"),
            solve_ms=("Solve Time (ms)", "mean"),
            prec_ms=("Precond Time (ms)", "mean"),
            total_ms=("total_ms", "mean"),
        ).round(2)
        print(g.to_string())


if __name__ == "__main__":
    main()

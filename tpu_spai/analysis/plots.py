"""Plotting tools for benchmark CSVs (misc/plot_*.py equivalents).

Each function has a CLI: ``python -m tpu_spai.analysis.plots <tool> ...``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from . import relabel


def plot_scalability(input_csv: str, step: int = 32, out: str = None):
    """Log-log solve-time / total-time / iterations vs matrix size
    (misc/plot_scalability.py; input: per-sample all_infer_*.csv)."""
    df = pd.read_csv(input_csv)
    df["Key"] = relabel(df["Key"].tolist())
    df["Size"] = (df["Matrix Size"] / step).round() * step
    df["Total Time (ms)"] = df["Solve Time (ms)"] + df["Precond Time (ms)"]
    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    for metric, ax in zip(
        ["Solve Time (ms)", "Total Time (ms)", "#Iteration"], axes
    ):
        g = df.groupby(["Key", "Size"])[metric].mean().reset_index()
        for key, grp in g.groupby("Key"):
            ax.plot(grp["Size"], grp[metric], marker="o", label=key)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("Matrix Size")
        ax.set_ylabel(metric)
        ax.grid(True, which="both", alpha=0.3)
    axes[0].legend(fontsize=8)
    out = out or str(Path(input_csv).with_suffix(".scalability.png"))
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_converge(case_dir: str, filename: str, rtols, out: str = None):
    """Total time + iterations across an rtol sweep
    (misc/plot_converge.py; inputs: output/<case>/infer_<file>_<rtol>.csv)."""
    frames = []
    for rtol in rtols:
        p = Path(case_dir) / f"infer_{filename}_{rtol}.csv"
        if not p.exists():
            continue
        df = pd.read_csv(p)
        df["rtol"] = float(10.0 ** -int(rtol))
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no infer_{filename}_*.csv under {case_dir}")
    df = pd.concat(frames)
    df["Key"] = relabel(df["Key"].tolist())
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for key, grp in df.groupby("Key"):
        grp = grp.sort_values("rtol")
        axes[0].plot(grp["rtol"], grp["Total Time (ms)"], marker="o", label=key)
        axes[1].plot(grp["rtol"], grp["#Iteration"], marker="o", label=key)
    for ax, ylab in zip(axes, ["Total Time (ms)", "#Iteration"]):
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.invert_xaxis()
        ax.set_xlabel("relative tolerance")
        ax.set_ylabel(ylab)
        ax.grid(True, which="both", alpha=0.3)
    axes[0].legend(fontsize=8)
    out = out or str(Path(case_dir) / f"converge_{filename}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_bars(input_csv: str, out: str = None):
    """Stacked precond+solve bars per method (misc/plot_bars.py)."""
    df = pd.read_csv(input_csv)
    df["Key"] = relabel(df["Key"].tolist())
    agg = df.groupby("Key")[["Precond Time (ms)", "Solve Time (ms)"]].mean()
    fig, ax = plt.subplots(figsize=(10, 5))
    x = np.arange(len(agg))
    ax.bar(x, agg["Solve Time (ms)"], label="Solve")
    ax.bar(x, agg["Precond Time (ms)"], bottom=agg["Solve Time (ms)"],
           label="Precond")
    ax.set_xticks(x)
    ax.set_xticklabels(agg.index, rotation=30, ha="right")
    ax.set_ylabel("Time (ms)")
    ax.legend()
    out = out or str(Path(input_csv).with_suffix(".bars.png"))
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_cond(input_csv: str, out: str = None, log_scale: bool = True):
    """Condition-number boxplots (misc/plot_cond.py)."""
    df = pd.read_csv(input_csv)
    fig, ax = plt.subplots(figsize=(10, 6))
    df.boxplot(ax=ax)
    if log_scale:
        ax.set_yscale("log")
    ax.set_ylabel("Condition Number")
    out = out or str(Path(input_csv).with_suffix(".png"))
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def compute_stats(input_csv: str, min_size: int = 0, max_size: int = 10**9):
    """Aggregate per-sample CSV over a size range (misc/compute_stats.py).
    Returns the aggregate frame (Key, Total/Solve/Precond, #Iteration)."""
    df = pd.read_csv(input_csv)
    df = df[(df["Matrix Size"] >= min_size) & (df["Matrix Size"] <= max_size)]
    g = df.groupby("Key")[["Solve Time (ms)", "Precond Time (ms)", "#Iteration"]].mean()
    g.insert(0, "Total Time (ms)", g["Solve Time (ms)"] + g["Precond Time (ms)"])
    return g.round(4).reset_index()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpu_spai.analysis.plots")
    sub = ap.add_subparsers(dest="tool", required=True)
    s = sub.add_parser("scalability")
    s.add_argument("--input", required=True)
    s.add_argument("--step", type=int, default=32)
    s = sub.add_parser("converge")
    s.add_argument("case_dir")
    s.add_argument("filename")
    s.add_argument("rtols", nargs="+")
    s = sub.add_parser("bars")
    s.add_argument("--input", dest="input_file", required=True)
    s = sub.add_parser("cond")
    s.add_argument("--input", required=True)
    s = sub.add_parser("stats")
    s.add_argument("--csv", required=True)
    s.add_argument("--min-size", type=int, default=0)
    s.add_argument("--max-size", type=int, default=10**9)
    args = ap.parse_args(argv)
    if args.tool == "scalability":
        print(plot_scalability(args.input, args.step))
    elif args.tool == "converge":
        print(plot_converge(args.case_dir, args.filename, args.rtols))
    elif args.tool == "bars":
        print(plot_bars(args.input_file))
    elif args.tool == "cond":
        print(plot_cond(args.input))
    elif args.tool == "stats":
        print(compute_stats(args.csv, args.min_size, args.max_size))


if __name__ == "__main__":
    main()

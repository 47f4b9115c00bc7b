"""LaTeX benchmark tables (~ misc/tab_to_latex.py, tab_to_latex_benchmark.py).

Builds the paper-style comparison table: rows = rtol levels, columns =
{Diag, IC, AINV, Ours} x {CPU, TPU}, cells = "total-ms (iters)" with the
best per row bolded, plus a construction-time row.

Usage:
    python -m tpu_spai.analysis.latex output/<case> <filename> 2 4 6 8
reads ``infer_<filename>_<rtol>.csv`` for each rtol exponent.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List

import numpy as np
import pandas as pd

COLS = [
    ("PCG-diagonal-cpu", "Diag."),
    ("PCG-ic-cpu", "IC"),
    ("PCG-ainv-cpu", "AINV"),
    ("Neural", "Ours"),
    ("PCG-diagonal-tpu", "Diag."),
    ("PCG-none-tpu", "None"),
    ("Neural+TPU", "Ours"),
]


def _fmt(row: pd.Series) -> str:
    return f"{row['Total Time (ms)']:.1f} ({row['#Iteration']:.1f})"


def tab_to_latex(case_dir: str, filename: str, rtols: List[str]) -> str:
    frames: Dict[str, pd.DataFrame] = {}
    for r in rtols:
        p = Path(case_dir) / f"infer_{filename}_{r}.csv"
        if p.exists():
            frames[r] = pd.read_csv(p).set_index("Key")
    if not frames:
        raise FileNotFoundError(f"no infer_{filename}_*.csv in {case_dir}")
    keys = [k for k, _ in COLS if any(k in df.index for df in frames.values())]
    headers = [lbl for k, lbl in COLS if k in keys]

    lines = [
        r"\begin{table}[htbp]",
        r"\centering",
        r"\caption{Comparison between PCG preconditioners: total time (ms) "
        r"and iteration counts per tolerance level; best per row in bold.}",
        r"\label{tab:time-stats}",
        r"\begin{tabular}{l" + "c" * len(keys) + "}",
        r"\toprule",
        "Stage & " + " & ".join(headers) + r" \\",
        r"\midrule",
    ]
    # construction-time row (from the tightest-tolerance file)
    df0 = frames[rtols[-1]]
    cons = []
    for k in keys:
        cons.append(f"{df0.loc[k, 'Precond Time (ms)']:.2f}" if k in df0.index else "-")
    lines.append("Construction & " + " & ".join(cons) + r" \\")
    for r in rtols:
        if r not in frames:
            continue
        df = frames[r]
        totals = [
            df.loc[k, "Total Time (ms)"] if k in df.index else np.inf for k in keys
        ]
        best = int(np.argmin(totals))
        cells = []
        for j, k in enumerate(keys):
            if k not in df.index:
                cells.append("-")
                continue
            cell = _fmt(df.loc[k])
            cells.append(r"\textbf{" + cell + "}" if j == best else cell)
        lines.append(rf"$10^{{-{r}}}$ & " + " & ".join(cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("case_dir")
    ap.add_argument("filename")
    ap.add_argument("rtols", nargs="+")
    args = ap.parse_args(argv)
    print(tab_to_latex(args.case_dir, args.filename, args.rtols))


if __name__ == "__main__":
    main()

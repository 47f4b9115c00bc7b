"""Benchmark row collection + CSV export.

The two CSV schemas are a compatibility contract with the reference's
plotting/LaTeX scripts (they consume these exact column names,
/root/reference/misc/plot_scalability.py, misc/tab_to_latex*.py):
  * aggregate: `Key, Total Time (ms), Solve Time (ms), Precond Time (ms),
    #Iteration`
  * per-sample: `Key, Solve Time (ms), Precond Time (ms), #Iteration,
    Matrix Size`

Internally this is a flat append-only row log (one record per measured
solve) aggregated at export time — rows arrive interleaved across methods
and samples, so there is no per-method mutable state to keep in sync.
"""

from __future__ import annotations

from typing import List, NamedTuple

import pandas as pd


class SolveRecord(NamedTuple):
    """One measured solve: times in seconds, size = matrix rows."""

    label: str
    solve_s: float
    factor_s: float
    iters: float
    n_rows: int


class Timestat:
    """Append-only log of `SolveRecord`s with the reference CSV exports."""

    def __init__(self) -> None:
        self.rows: List[SolveRecord] = []

    def put(self, key: str, solve_time: float, prec_time: float,
            iteration: float, matrix_size: int) -> None:
        self.rows.append(
            SolveRecord(key, float(solve_time), float(prec_time),
                        float(iteration), int(matrix_size))
        )

    def _grouped(self) -> "pd.core.groupby.DataFrameGroupBy":
        df = pd.DataFrame(self.rows)
        # sort=False keeps first-appearance order, like the reference table
        return df.groupby("label", sort=False)

    def print(self, log=print) -> None:
        if not self.rows:
            return
        for label, grp in self._grouped():
            s = grp["solve_s"].mean() * 1000
            f = grp["factor_s"].mean() * 1000
            it = grp["iters"].mean()
            log(f"{label:>18}: total {s + f:8.2f} ms  solve {s:8.2f} ms  "
                f"prec {f:7.2f} ms  {it:8.1f} iters")

    def timestat_to_dataframe(self) -> pd.DataFrame:
        """Aggregate CSV: per-label means, ms."""
        out = []
        for label, grp in self._grouped():
            s = grp["solve_s"].mean() * 1000
            f = grp["factor_s"].mean() * 1000
            out.append({
                "Key": label,
                "Total Time (ms)": round(s + f, 4),
                "Solve Time (ms)": round(s, 4),
                "Precond Time (ms)": round(f, 4),
                "#Iteration": round(grp["iters"].mean(), 4),
            })
        return pd.DataFrame(out)

    def all_time_stat(self) -> pd.DataFrame:
        """Per-sample CSV: one row per record, ms + matrix size."""
        out = [{
            "Key": r.label,
            "Solve Time (ms)": round(r.solve_s * 1000, 4),
            "Precond Time (ms)": round(r.factor_s * 1000, 4),
            "#Iteration": round(r.iters, 4),
            "Matrix Size": r.n_rows,
        } for r in self.rows]
        return pd.DataFrame(out)

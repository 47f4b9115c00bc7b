"""Benchmark aggregation + CSV export (~ infer.py:30-151 Timestat).

Reproduces the reference's CSV schemas exactly so its misc/ plotting and
LaTeX-table scripts work unchanged:
  * aggregate: `Key, Total Time (ms), Solve Time (ms), Precond Time (ms),
    #Iteration`
  * per-sample: `Key, Solve Time (ms), Precond Time (ms), #Iteration,
    Matrix Size`
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import pandas as pd


@dataclasses.dataclass
class InferenceTimestat:
    all_solve_time: List[float]
    all_prec_time: List[float]
    all_iteration: List[float]
    all_matrix_size: List[int]


class Timestat:
    def __init__(self):
        self.stat_dict: Dict[str, InferenceTimestat] = {}

    def put(self, key: str, solve_time: float, prec_time: float,
            iteration: float, matrix_size: int):
        st = self.stat_dict.setdefault(key, InferenceTimestat([], [], [], []))
        st.all_solve_time.append(solve_time)
        st.all_prec_time.append(prec_time)
        st.all_iteration.append(iteration)
        st.all_matrix_size.append(matrix_size)

    def print(self, log=print):
        for key, stat in self.stat_dict.items():
            s = np.mean(stat.all_solve_time) * 1000
            p = np.mean(stat.all_prec_time) * 1000
            i = np.mean(stat.all_iteration)
            log(f"{key:>18}: total {s + p:8.2f} ms  solve {s:8.2f} ms  "
                f"prec {p:7.2f} ms  {i:8.1f} iters")

    def timestat_to_dataframe(self) -> pd.DataFrame:
        data = []
        for key, stat in self.stat_dict.items():
            s = np.mean(stat.all_solve_time) * 1000
            p = np.mean(stat.all_prec_time) * 1000
            data.append({
                "Key": key,
                "Total Time (ms)": s + p,
                "Solve Time (ms)": s,
                "Precond Time (ms)": p,
                "#Iteration": np.mean(stat.all_iteration),
            })
        df = pd.DataFrame(data)
        num = ["Total Time (ms)", "Solve Time (ms)", "Precond Time (ms)", "#Iteration"]
        df[num] = df[num].round(4)
        return df

    def all_time_stat(self) -> pd.DataFrame:
        data = []
        for key, stat in self.stat_dict.items():
            for s, p, i, m in zip(stat.all_solve_time, stat.all_prec_time,
                                  stat.all_iteration, stat.all_matrix_size):
                data.append({
                    "Key": key,
                    "Solve Time (ms)": s * 1000,
                    "Precond Time (ms)": p * 1000,
                    "#Iteration": i,
                    "Matrix Size": m,
                })
        df = pd.DataFrame(data)
        num = ["Solve Time (ms)", "Precond Time (ms)", "#Iteration", "Matrix Size"]
        df[num] = df[num].round(4)
        return df

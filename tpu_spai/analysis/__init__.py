"""Analysis & plotting of benchmark CSVs (~ reference misc/*.py).

Consumers of the infer/cond CSV outputs:
  * ``plot_converge``    — total time + iterations vs rtol sweep
  * ``plot_scalability`` — log-log time/iters vs matrix size (per-sample CSV)
  * ``plot_bars``        — stacked precond+solve time bars per method
  * ``plot_cond``        — condition-number boxplots
  * ``compute_stats``    — per-size-range aggregation of per-sample CSVs
  * ``tab_to_latex``     — LaTeX benchmark tables across rtol files

All operate on the same CSV schemas the reference's misc/ scripts consume
(`Key, Total/Solve/Precond Time (ms), #Iteration[, Matrix Size]`), with
method keys mapped Neural->Ours+CPU, Neural+TPU->Ours+TPU etc.
"""

METHOD_LABELS = {
    "Neural": "Ours+CPU",
    "Neural+CUDA": "Ours+CUDA",
    "Neural+TPU": "Ours+TPU",
    "PCG-ainv-cpu": "AINV+CPU",
    "PCG-ic-cpu": "IC+CPU",
    "PCG-fsai-cpu": "FSAI+CPU",
    "PCG-diagonal-cpu": "Diag+CPU",
    "PCG-none-cpu": "None+CPU",
    "PCG-diagonal-tpu": "Diag+TPU",
    "PCG-none-tpu": "None+TPU",
    "Cholmod": "Direct",
}


def relabel(method):
    if not isinstance(method, str):
        return [METHOD_LABELS.get(m, m) for m in method]
    return METHOD_LABELS.get(method, method)

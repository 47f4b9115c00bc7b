"""jax.profiler integration + roofline counters (SURVEY §5 tracing gap).

The reference only has wall-clock brackets (workspace.py:200-202,
Timestat); this module provides first-class tracing for the TPU build:

  * `trace(logdir)` — context manager around `jax.profiler.trace`, viewable
    in TensorBoard/XProf (`tensorboard --logdir <dir>`),
  * `spmv_roofline` — nnz/s and achieved-bandwidth counters for a measured
    SpMV time (the BASELINE metric),
  * `annotate` — `jax.profiler.TraceAnnotation` passthrough for labeling
    solver phases inside traces.

Usage:
    from tpu_spai.bench.profile import trace
    with trace("/tmp/trace"):
        pcg_windowed(...)  # one solve
"""

from __future__ import annotations

import contextlib
from typing import Optional

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v6e": 1640.0}


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_hbm_gbps() -> float:
    import jax

    kind = str(getattr(jax.devices()[0], "device_kind", "")).lower()
    return next((v for k, v in HBM_GBPS.items() if k in kind), 819.0)


def spmv_roofline(nnz: int, n: int, seconds: float, dtype_bytes: int = 4) -> dict:
    """Roofline counters for one SpMV: value+index+x reads, y write."""
    min_bytes = nnz * (2 * dtype_bytes + 4) + n * dtype_bytes
    bw = device_hbm_gbps()
    gbps = min_bytes / seconds / 1e9
    return {
        "nnz_per_s": nnz / seconds,
        "effective_gbps": gbps,
        "roofline_frac": gbps / bw,
        "min_bytes": min_bytes,
    }

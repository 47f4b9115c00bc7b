"""CPU-only checkpoint probe for the stretch_armadillo4_h2b training.

Watches outputs/stretch_armadillo4_h2b/checkpoints; for every new
checkpoint runs a host-only cli.infer (Neural + diagonal rows, 2 val
samples) and appends one JSON line to output/r5_h2_probe.jsonl. Pure
CPU — safe to run concurrently with the TPU training (never touches
the device; backend forced per tests/conftest.py's mechanism).

The training's own val is capped at test_max_iter=1000 (uninformative
until neural crosses into the win zone: host landscape on h2 is
none 8476 / diagonal 3733 / FSAI 932 — output/stretch_armadillo4_h2).
This probe runs uncapped host CG so the learning curve is visible the
whole way down.

Usage: nohup python scripts/r5_h2_probe.py &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

CKPT_DIR = "outputs/stretch_armadillo4_h2b/checkpoints"
OUT = "output/r5_h2_probe.jsonl"
DONE = set()


def probe_one(ck: str):
    import csv
    import glob
    import shutil
    import tempfile

    from tpu_spai.cli import infer as infer_cli

    td = tempfile.mkdtemp()
    # stage the single checkpoint so `pretrained=` resolves to it even
    # while the trainer keeps writing newer ones
    stage = os.path.join(td, "ck")
    shutil.copytree(ck, stage)
    out_dir = os.path.join(td, "out")
    try:
        infer_cli.main([
            "exp_name=stretch_armadillo4_h2", "data.prefix=generated/stretch_armadillo4_h2",
            "data.block_size=3", "workspace=scaled", "gnn_features=48",
            "check_methods=[diagonal]", "check_devices=[cpu]",
            "backend=cpu",  # host rows only — no pseudo-device rows
            f"pretrained={stage}", "max_samples=2", "repeat=1", "warmup=0",
            f"out_dir={out_dir}",
        ])
        row = {}
        for f in glob.glob(os.path.join(out_dir, "infer_*.csv")):
            with open(f) as fh:
                for rec in csv.DictReader(fh):
                    name = rec.get("Key", "")
                    it = rec.get("#Iteration")
                    if name and it:
                        row[name] = float(it)
        return row
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main():
    while True:
        cks = sorted(glob_ckpts())
        new = [c for c in cks if c not in DONE]
        for ck in new:
            ep = os.path.basename(ck)
            t0 = time.time()
            try:
                row = probe_one(ck)
                rec = {"ckpt": ep, "iters": row, "probe_s": round(time.time() - t0, 1)}
            except Exception as exc:  # noqa: BLE001
                rec = {"ckpt": ep, "error": f"{type(exc).__name__}: {exc}"}
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            DONE.add(ck)
        if not new:
            time.sleep(120)


def glob_ckpts():
    import glob

    return [
        c for c in glob.glob(os.path.join(CKPT_DIR, "epoch_*"))
        if not c.endswith("_opt") and os.path.isdir(c)
    ]


if __name__ == "__main__":
    main()

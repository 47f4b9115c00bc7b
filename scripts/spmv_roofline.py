"""Isolated gsel-SpMV roofline measurement on the real TPU.

Thin CLI over tpu_spai.bench.roofline (shared with bench.py): chained
power-iteration scan, min-of-N differencing, achieved GB/s over the
bytes the kernel actually streams. VERDICT round-2 item 1.

Usage: timeout 900 python scripts/spmv_roofline.py [--sizes 24,48]
Writes output/roofline/spmv_roofline.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="24,48")
    ap.add_argument("--out", default="output/roofline/spmv_roofline.json")
    args = ap.parse_args()

    import jax

    import tpu_spai  # noqa: F401
    from tpu_spai.bench.roofline import spmv_roofline_row

    print(f"device: {jax.devices()[0]}")
    results = []
    for res in [int(s) for s in args.sizes.split(",")]:
        row = spmv_roofline_row(res)
        if row is None:
            print(f"res={res}: unbandable, skipped")
            continue
        results.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"hbm_gbps": 819.0, "rows": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
